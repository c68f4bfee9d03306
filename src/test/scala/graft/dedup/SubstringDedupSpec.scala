package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import scala.util.Random

/** Sliding exact-substring dedup: the winnow-anchored operator must
  * equal a brute-force longest-common-run reference (anchors are only
  * a candidate filter — lossless at the minSpan bar), and must catch
  * the non-chunk-aligned verbatim quote `text_chunk_dedup`
  * structurally misses.
  */
class SubstringDedupSpec extends SparkSpec {

  private def frame(docs: Seq[(Long, String)]): DataFrame = {
    val s = spark
    import s.implicits._
    docs.toDF("doc_id", "text")
  }

  /** Brute-force reference: for every pair, all matching
    * k-token-window positions, grouped by diagonal, longest
    * consecutive run → span; reported iff span ≥ minSpan.
    */
  private def reference(docs: Seq[(Long, String)], k: Int,
      minSpan: Int): Map[(Long, Long), (Long, Long)] = {
    val toks = docs.toMap.view.mapValues(
      _.toLowerCase.split("\\s+").filter(_.nonEmpty).toVector).toMap
    val ws = toks.view.mapValues(t =>
      if (t.size >= k) t.sliding(k).map(_.mkString(" ")).toVector
      else Vector.empty[String]).toMap
    val ids = docs.map(_._1).sorted
    (for {
      i <- ids.indices
      j <- (i + 1) until ids.size
      a = ids(i); b = ids(j)
    } yield {
      val posB = ws(b).zipWithIndex.groupBy(_._1)
        .view.mapValues(_.map(_._2)).toMap
      val matches = for {
        (w, pa) <- ws(a).zipWithIndex
        pb <- posB.getOrElse(w, Vector.empty)
      } yield (pa, pb)
      if (matches.isEmpty) None
      else {
        val maxrun = matches.groupBy { case (pa, pb) => pa - pb }
          .values.map { ms =>
            val pas = ms.map(_._1).sorted
            var best = 1; var cur = 1
            for (t <- 1 until pas.size) {
              if (pas(t) == pas(t - 1) + 1) { cur += 1; best = best.max(cur) }
              else cur = 1
            }
            best
          }.max
        val span = maxrun + k - 1
        if (span >= minSpan)
          Some((a, b) -> (span.toLong, matches.size.toLong))
        else None
      }
    }).flatten.toMap
  }

  private def run(docs: Seq[(Long, String)]): Map[(Long, Long), (Long, Long)] =
    Dedup.substringPairs(frame(docs)).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap

  /** Random docs over a small vocabulary with PLANTED shared spans at
    * random (unaligned) offsets — some above the 50-token bar, some
    * below it.
    */
  private def corpus(seed: Long): Seq[(Long, String)] = {
    val rnd = new Random(seed)
    val vocab = Vector.tabulate(60)(i => s"w$i")
    def randToks(n: Int) = Vector.fill(n)(vocab(rnd.nextInt(vocab.size)))
    val base = (0L until 30L).map(id => id -> randToks(40 + rnd.nextInt(80)))
    // plant 6 shared spans (lengths straddling the bar) into pairs
    val planted = Seq(60, 55, 50, 49, 35, 80).zipWithIndex.foldLeft(base.toMap) {
      case (m, (len, i)) =>
        val a = (i * 2).toLong
        val b = (i * 2 + 1).toLong
        val span = randToks(len)
        def splice(t: Vector[String]) = {
          val at = rnd.nextInt(t.size + 1)
          t.take(at) ++ span ++ t.drop(at)
        }
        m + (a -> splice(m(a))) + (b -> splice(m(b)))
    }
    planted.toSeq.sortBy(_._1).map { case (id, t) => id -> t.mkString(" ") }
  }

  test("winnow-anchored result equals the brute-force reference") {
    for (seed <- Seq(7L, 21L)) {
      val docs = corpus(seed)
      val got = run(docs)
      val want = reference(docs, Dedup.SubstrGram, Dedup.SubstrMinSpan)
      assert(got === want, s"seed=$seed")
      assert(want.nonEmpty, s"seed=$seed planted spans must yield pairs")
      // the bar binds: at least one planted pair must be BELOW it
      assert(want.size < 6, s"seed=$seed some planted spans must miss the bar")
    }
  }

  test("a non-aligned 300-token quote is caught; chunk dedup misses it") {
    val rnd = new Random(99L)
    val vocab = Vector.tabulate(80)(i => s"q$i")
    def randToks(n: Int) = Vector.fill(n)(vocab(rnd.nextInt(vocab.size)))
    val quote = randToks(300)
    // doc 1: quote at offset 0 (chunk-aligned there); doc 2: quote at
    // offset 17 — NOT a multiple of ChunkTokens=32, so no 32-token
    // chunk boundary in doc 2 lines up with doc 1's chunking of the
    // same span
    val doc1 = quote ++ randToks(40)
    val doc2 = randToks(17) ++ quote ++ randToks(40)
    val docs = Seq(1L -> doc1.mkString(" "), 2L -> doc2.mkString(" "))
    val got = run(docs)
    assert(got.contains((1L, 2L)))
    assert(got((1L, 2L))._1 === 300L, "span must be the full quote")
    // chunk dedup on the same two docs: no cross-doc chunk collision
    val chunkCross = graft.text.Analysis.chunkDedup(frame(docs))
      .filter(col("n_docs") >= 2).count()
    assert(chunkCross === 0L,
      "aligned chunking must miss the offset quote (that is the gap " +
        "this operator closes)")
  }

  test("spans below the guarantee bar are not reported") {
    // two docs sharing exactly 49 tokens (< 50): never reported, even
    // though they share many 25-gram windows
    val rnd = new Random(5L)
    val vocab = Vector.tabulate(40)(i => s"s$i")
    def randToks(n: Int) = Vector.fill(n)(vocab(rnd.nextInt(vocab.size)))
    val shared = randToks(49)
    val docs = Seq(
      1L -> (randToks(30) ++ shared ++ randToks(30)).mkString(" "),
      2L -> (randToks(11) ++ shared ++ randToks(45)).mkString(" "))
    val got = run(docs)
    val want = reference(docs, Dedup.SubstrGram, Dedup.SubstrMinSpan)
    assert(got === want)
    // the reference can still report the pair if the random flanks
    // happen to extend the span; with disjoint vocab draws that is
    // vanishingly unlikely — assert the expected shape
    assert(!got.contains((1L, 2L)))
  }

  test("key-seq kernel ≡ positional chain; winnow-select ≡ sliding min") {
    val s = spark
    import s.implicits._
    val docs = corpus(3L)
    val d = frame(docs)
    val toks = filter(split(lower(col("text")), "\\s+"), t => length(t) > 0)
    val k = Dedup.SubstrGram
    val chain = d.select(col("doc_id"),
        transform(graft.functions.Ngrams.shingleOfN(toks, k),
          g => graft.functions.PortableHash.key64(g, production = false))
          .as("ks"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val kernel = d.select(col("doc_id"),
        graft.functions.GraftFunctions.graftGramKeySeq(
          toks, lit(k), lit(false)).as("ks"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(kernel === chain)
    // winnow-select vs a driver-side sliding min
    val w = Dedup.SubstrWinnow
    val winnow = d.select(col("doc_id"),
        graft.functions.GraftFunctions.graftWinnowSelect(
          graft.functions.GraftFunctions.graftGramKeySeq(
            toks, lit(k), lit(false)), lit(w)).as("sel"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toVector).toMap
    chain.foreach { case (id, ks) =>
      val want =
        if (ks.size < w) Vector.empty[Long]
        else ks.sliding(w).map(_.min).toVector.distinct.sorted
      assert(winnow(id) === want, s"doc $id")
    }
  }
}
