package graft.dedup

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators for LLM-training-data pipelines over the
  * `documents` fixture: exact (hash-groupBy), MinHash+LSH banded candidate
  * generation, SimHash signatures + hamming-banded pairs, and n-gram
  * Jaccard verification via an inverted shingle index.
  *
  * Cross-engine determinism: every hash is md5 (identical lowercase-hex
  * output in Spark and DuckDB), and MinHash minimizes the hex STRING
  * lexicographically — fixed-length hex makes string-min equal to
  * 128-bit-value min, so no hex→int parsing (which the two engines do
  * differently) is ever needed. At production scale one would swap md5
  * for xxhash64 (cheaper, codegen'd); the plan shapes are unchanged.
  *
  * Scale notes (100 TB posture):
  *  - exact dedup: one shuffle keyed on the text hash; map-side partial
  *    aggregation collapses duplicates before the exchange.
  *  - MinHash: signatures are ONE groupBy(doc_id) with k min-aggregates
  *    (partial aggs collapse map-side); candidate pairs come from a
  *    self-join on (band, signature) — never an all-pairs product. A
  *    bucket-size cap bounds the per-bucket quadratic blowup on
  *    degenerate buckets (e.g. boilerplate-heavy corpora).
  *  - n-gram Jaccard: inverted-index join on shingles with a document-
  *    frequency cap (standard prefix-filtering practice: ultra-common
  *    shingles carry no dedup signal but create quadratic join fanout).
  *  - SimHash pairs: 16-bit chunk banding (pigeonhole: hamming ≤ 3 over
  *    64 bits guarantees ≥1 of 4 chunks equal), then exact hamming via
  *    higher-order functions — again joins + aggs only.
  */
object Dedup {

  val NumHashes = 16
  val Bands = 4
  val RowsPerBand = 4 // NumHashes = Bands * RowsPerBand
  val ShingleSize = 3
  val SimHashBits = 64
  val MaxHamming = 3
  val JaccardThreshold = 0.8
  /** Shingles appearing in more docs than this are dropped from the
    * inverted index (and, symmetrically, from the compared sets).
    */
  val MaxShingleDf = 500
  /** LSH buckets larger than this are dropped before pair expansion. */
  val MaxBucketSize = 200

  private def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")
      .filter(col("text").isNotNull && length(col("text")) > 0)

  /** Whitespace tokens of the lowered text (non-empty only). */
  private def toksCol: Column =
    filter(split(lower(col("text")), "\\s+"), t => length(t) > 0)

  /** Word `ShingleSize`-grams as an array column (empty if too short). */
  private def shinglesCol: Column = {
    val toks = toksCol
    when(size(toks) < ShingleSize, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), size(toks) - (ShingleSize - 1)),
        i => concat_ws(" ", slice(toks, i, lit(ShingleSize)))))
  }

  /** (doc_id, s): per-document DISTINCT shingles (set semantics). */
  def shingles(d: DataFrame): DataFrame =
    d.select(col("doc_id"), explode(shinglesCol).as("s")).distinct()

  /** (doc_id, h0..h{k-1}): MinHash signature, one groupBy. */
  def minhashSignatures(sh: DataFrame): DataFrame = {
    val aggs = (0 until NumHashes).map(i =>
      min(md5(concat_ws("|", lit(i), col("s")))).as(s"h$i"))
    sh.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
  }

  /** (doc_id, band, sig): banded LSH buckets from the signature. */
  def lshBuckets(mh: DataFrame): DataFrame = {
    val bandStructs = (0 until Bands).map { b =>
      val sig = concat((b * RowsPerBand until (b + 1) * RowsPerBand)
        .map(i => col(s"h$i")): _*)
      struct(lit(b).as("band"), sig.as("sig"))
    }
    mh.select(col("doc_id"), explode(array(bandStructs: _*)).as("bs"))
      .select(col("doc_id"), col("bs.band").as("band"), col("bs.sig").as("sig"))
  }

  /** Distinct candidate pairs (doc_a < doc_b) sharing any LSH bucket,
    * with oversized buckets dropped before the pair expansion.
    */
  def minhashCandidates(d: DataFrame): DataFrame = {
    val buckets = lshBuckets(minhashSignatures(shingles(d)))
    val small = buckets.groupBy("band", "sig")
      .agg(count(lit(1)).as("bucket_n"))
      .filter(col("bucket_n") <= MaxBucketSize)
      .select("band", "sig")
    val kept = buckets.join(small, Seq("band", "sig"))
    val a = kept.select(col("band"), col("sig"), col("doc_id").as("doc_a"))
    val b = kept.select(col("band"), col("sig"), col("doc_id").as("doc_b"))
    a.join(b, Seq("band", "sig"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
  }

  /** (doc_id, simhash): 64-bit SimHash over unigram token frequencies,
    * emitted as a 64-char bit string (portable across engines; parsing
    * hex to int64 is NOT portable, bit strings are).
    */
  def simhashSignatures(d: DataFrame): DataFrame = {
    val tokCounts = d.select(col("doc_id"), explode(toksCol).as("t"))
      .groupBy("doc_id", "t").agg(count(lit(1)).as("cnt"))
    // First 16 hex chars of md5(term) = 64 hash bits; digit p value 0–15.
    val withDigits = (1 to 16).foldLeft(
      tokCounts.withColumn("h", substring(md5(col("t")), 1, 16))) {
      case (df, p) =>
        df.withColumn(s"dv$p",
          instr(lit("0123456789abcdef"), substring(col("h"), p, 1)) - 1)
    }
    val bitSums = (0 until SimHashBits).map { b =>
      val p = b / 4 + 1
      val shift = 3 - b % 4
      val bit = shiftright(col(s"dv$p"), shift).bitwiseAND(lit(1))
      sum((bit * 2 - 1) * col("cnt")).as(s"s$b")
    }
    val sums = withDigits.groupBy("doc_id").agg(bitSums.head, bitSums.tail: _*)
    val bitChars = (0 until SimHashBits).map(b =>
      when(col(s"s$b") > 0, "1").otherwise("0"))
    sums.select(col("doc_id"), concat(bitChars: _*).as("simhash"))
  }

  /** Near-dup pairs by SimHash: band the 64-bit signature into 4 16-bit
    * chunks (hamming ≤ 3 ⟹ at least one chunk identical), bucket-join,
    * then exact hamming distance via zip_with/aggregate (no UDF).
    */
  def simhashPairs(d: DataFrame): DataFrame = {
    val sigs = simhashSignatures(d)
    val chunkStructs = (0 until 4).map(c =>
      struct(lit(c).as("chunk_id"),
        substring(col("simhash"), c * 16 + 1, 16).as("chunk")))
    val buckets = sigs.select(col("doc_id"), col("simhash"),
      explode(array(chunkStructs: _*)).as("cs"))
      .select(col("doc_id"), col("simhash"),
        col("cs.chunk_id").as("chunk_id"), col("cs.chunk").as("chunk"))
    val a = buckets.select(col("chunk_id"), col("chunk"),
      col("doc_id").as("doc_a"), col("simhash").as("sh_a"))
    val b = buckets.select(col("chunk_id"), col("chunk"),
      col("doc_id").as("doc_b"), col("simhash").as("sh_b"))
    val ham = aggregate(
      zip_with(split(col("sh_a"), ""), split(col("sh_b"), ""),
        (x, y) => when(x === y, 0).otherwise(1)),
      lit(0), (acc, x) => acc + x)
    a.join(b, Seq("chunk_id", "chunk"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("sh_a"), col("sh_b")).distinct()
      .withColumn("hamming", ham.cast("long"))
      .filter(col("hamming") <= MaxHamming)
      .select("doc_a", "doc_b", "hamming")
  }

  /** Exact n-gram Jaccard over the df-capped shingle sets, via the
    * inverted-index join (never all-pairs).
    */
  def ngramJaccard(d: DataFrame,
      threshold: Double = JaccardThreshold): DataFrame = {
    val sh = shingles(d)
    val rare = sh.groupBy("s").agg(count(lit(1)).as("df"))
      .filter(col("df") <= MaxShingleDf).select("s")
    val shf = sh.join(rare, "s")
    val sizes = shf.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val a = shf.select(col("s"), col("doc_id").as("doc_a"))
    val b = shf.select(col("s"), col("doc_id").as("doc_b"))
    val inter = a.join(b, "s").filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("ix"))
    inter
      .join(sizes.select(col("doc_id").as("doc_a"), col("n").as("na")), "doc_a")
      .join(sizes.select(col("doc_id").as("doc_b"), col("n").as("nb")), "doc_b")
      .withColumn("jaccard",
        col("ix").cast("double") / (col("na") + col("nb") - col("ix")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "jaccard")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Exact dedup: one row per distinct normalized text, keeper = min id.
    "dedup_exact" -> ((s, dir) =>
      docs(s, dir)
        .groupBy(sha2(lower(col("text")), 256).as("text_hash"))
        .agg(min(col("doc_id")).as("keep_doc_id"), count(lit(1)).as("n_copies"))
        .orderBy("text_hash")),
    "dedup_minhash_candidates" -> ((s, dir) =>
      minhashCandidates(docs(s, dir)).orderBy("doc_a", "doc_b")),
    "dedup_simhash" -> ((s, dir) =>
      simhashSignatures(docs(s, dir)).orderBy("doc_id")),
    "dedup_simhash_pairs" -> ((s, dir) =>
      simhashPairs(docs(s, dir)).orderBy("doc_a", "doc_b")),
    "dedup_ngram_jaccard" -> ((s, dir) =>
      ngramJaccard(docs(s, dir)).orderBy("doc_a", "doc_b"))
  )

  // ---- DuckDB oracle SQL ------------------------------------------------

  /** Shared CTE prefix: admitted docs → tokens → distinct shingles. */
  private val shCte: String =
    s"""WITH d AS (
       |  SELECT doc_id,
       |         list_filter(regexp_split_to_array(lower(text), '\\s+'),
       |                     t -> length(t) > 0) AS toks
       |  FROM documents
       |  WHERE text IS NOT NULL AND length(text) > 0
       |), sh AS (
       |  SELECT DISTINCT doc_id,
       |         array_to_string(list_slice(toks, i, i + ${ShingleSize - 1}), ' ') AS s
       |  FROM d, LATERAL (SELECT unnest(generate_series(1, greatest(len(toks) - ${ShingleSize - 1}, 0))) AS i)
       |)""".stripMargin

  private val minhashSelects: String =
    (0 until NumHashes).map(i => s"min(md5('$i|' || s)) AS h$i").mkString(",\n         ")

  private val bandSelects: String =
    (0 until Bands).map { b =>
      val sig = (b * RowsPerBand until (b + 1) * RowsPerBand)
        .map(i => s"h$i").mkString(" || ")
      s"SELECT doc_id, $b AS band, $sig AS sig FROM mh"
    }.mkString("\n  UNION ALL ")

  private val simhashDigits: String =
    (1 to 16).map(p =>
      s"strpos('0123456789abcdef', substr(h, $p, 1)) - 1 AS dv$p")
      .mkString(",\n         ")

  private val simhashBitSums: String =
    (0 until SimHashBits).map { b =>
      val p = b / 4 + 1
      val shift = 3 - b % 4
      s"sum((((dv$p >> $shift) & 1) * 2 - 1) * cnt) AS s$b"
    }.mkString(",\n         ")

  private val simhashConcat: String =
    (0 until SimHashBits).map(b =>
      s"CASE WHEN s$b > 0 THEN '1' ELSE '0' END").mkString(" || ")

  /** CTE producing sig(doc_id, simhash) — shared by both simhash oracles. */
  private val simhashCte: String =
    s"""WITH d AS (
       |  SELECT doc_id,
       |         list_filter(regexp_split_to_array(lower(text), '\\s+'),
       |                     t -> length(t) > 0) AS toks
       |  FROM documents
       |  WHERE text IS NOT NULL AND length(text) > 0
       |), tc AS (
       |  SELECT doc_id, t, count(*) AS cnt
       |  FROM (SELECT doc_id, unnest(toks) AS t FROM d) GROUP BY 1, 2
       |), dg AS (
       |  SELECT doc_id, cnt,
       |         $simhashDigits
       |  FROM (SELECT doc_id, cnt, substr(md5(t), 1, 16) AS h FROM tc)
       |), bits AS (
       |  SELECT doc_id,
       |         $simhashBitSums
       |  FROM dg GROUP BY doc_id
       |), sig AS (
       |  SELECT doc_id, $simhashConcat AS simhash FROM bits
       |)""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "dedup_exact" ->
      """SELECT sha256(lower(text)) AS text_hash,
        |  min(doc_id) AS keep_doc_id, count(*) AS n_copies
        |FROM documents
        |WHERE text IS NOT NULL AND length(text) > 0
        |GROUP BY 1 ORDER BY text_hash""".stripMargin,
    "dedup_minhash_candidates" ->
      s"""$shCte, mh AS (
         |  SELECT doc_id,
         |         $minhashSelects
         |  FROM sh GROUP BY doc_id
         |), bands AS (
         |  $bandSelects
         |), small AS (
         |  SELECT band, sig FROM bands GROUP BY 1, 2 HAVING count(*) <= $MaxBucketSize
         |), kept AS (
         |  SELECT bands.* FROM bands JOIN small USING (band, sig)
         |)
         |SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |FROM kept a JOIN kept b
         |  ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
         |ORDER BY doc_a, doc_b""".stripMargin,
    "dedup_simhash" ->
      s"""$simhashCte
         |SELECT doc_id, simhash FROM sig ORDER BY doc_id""".stripMargin,
    "dedup_simhash_pairs" ->
      s"""$simhashCte, chunks AS (
         |  SELECT doc_id, simhash, c AS chunk_id,
         |         substr(simhash, c * 16 + 1, 16) AS chunk
         |  FROM sig, LATERAL (SELECT unnest(generate_series(0, 3)) AS c)
         |), cand AS (
         |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |         a.simhash AS sh_a, b.simhash AS sh_b
         |  FROM chunks a JOIN chunks b
         |    ON a.chunk_id = b.chunk_id AND a.chunk = b.chunk
         |   AND a.doc_id < b.doc_id
         |)
         |SELECT doc_a, doc_b, CAST(hamming(sh_a, sh_b) AS BIGINT) AS hamming
         |FROM cand WHERE hamming(sh_a, sh_b) <= $MaxHamming
         |ORDER BY doc_a, doc_b""".stripMargin,
    "dedup_ngram_jaccard" ->
      s"""$shCte, rare AS (
         |  SELECT s FROM sh GROUP BY s HAVING count(*) <= $MaxShingleDf
         |), shf AS (
         |  SELECT sh.* FROM sh JOIN rare USING (s)
         |), sizes AS (
         |  SELECT doc_id, count(*) AS n FROM shf GROUP BY 1
         |), inter AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS ix
         |  FROM shf a JOIN shf b ON a.s = b.s AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2
         |)
         |SELECT doc_a, doc_b,
         |       CAST(ix AS DOUBLE) / CAST(na.n + nb.n - ix AS DOUBLE) AS jaccard
         |FROM inter
         |JOIN sizes na ON na.doc_id = doc_a
         |JOIN sizes nb ON nb.doc_id = doc_b
         |WHERE CAST(ix AS DOUBLE) / CAST(na.n + nb.n - ix AS DOUBLE) >= $JaccardThreshold
         |ORDER BY doc_a, doc_b""".stripMargin
  )
}
