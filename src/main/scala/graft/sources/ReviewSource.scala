package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Reference-parity input surface (SURVEY §1.1, §2.1 S1–S4).
  *
  * The reference consumes newline-delimited JSON with two string fields
  * (/root/reference/chi_square.py:31–33, run_chi:61–63) under permissive
  * semantics: malformed lines are dropped
  * (multi_jobs_hdfs.py:92–94, run_chi:74–75) and records with missing or
  * empty text/category are skipped (run_chi:62–65 — canon D4; the
  * admission filter itself lives in [[graft.text.Tokenize.admitted_docs]]).
  *
  * Spark-first shape: an explicit StructType (never schema inference —
  * at 100 TB an inference pass is a full extra scan of the corpus) with
  * DROPMALFORMED, so bad lines die in the scan, not in a downstream
  * task. Works identically for `file://`, `hdfs://`, `s3a://` paths —
  * the reference's hand-rolled `hadoop fs -cat` subprocess (S2,
  * multi_jobs_hdfs.py:23–37) is subsumed by Hadoop-FS-native readers.
  */
object ReviewSource {

  /** Exactly the two consumed fields; extra JSON keys are ignored by
    * schema projection (the reference ignores them too).
    */
  val ReviewSchema: StructType = StructType(Seq(
    StructField("reviewText", StringType, nullable = true),
    StructField("category", StringType, nullable = true)))

  /** JSONL reviews with malformed lines dropped (S1 + S4). */
  def readReviews(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(ReviewSchema)
      .option("mode", "DROPMALFORMED")
      .json(path)

  /** The same permissive contract over headerless CSV — the other
    * classic text-ingest format: explicit schema (no inference scan),
    * DROPMALFORMED so over-wide / badly-quoted rows die in the scan.
    * Field order is positional (reviewText, category), matching
    * [[ReviewSchema]].
    *
    * `multiLine=true` because Spark's CSV WRITER quotes embedded
    * newlines — without it a quoted multi-line field splits into
    * malformed fragments that DROPMALFORMED silently drops, losing
    * real rows (not just injected junk). The cost is per-FILE rather
    * than per-line splitting; review-scale files (the write side
    * controls file sizes) keep parallelism, and correctness of the
    * lose-only-the-malformed-rows contract wins over split
    * granularity.
    */
  def readReviewsCsv(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(ReviewSchema)
      .option("mode", "DROPMALFORMED")
      .option("multiLine", "true")
      .csv(path)

  /** Stopword side file: one token per line, lowercased on load exactly
    * like the 4-stage reference variant (run_chi:44,
    * multi_jobs_hdfs.py:21); blank lines ignored (S3).
    *
    * The list is collected to the driver (stopword files are KBs) and
    * shipped to executors inside the plan as a literal — the Spark
    * equivalent of the reference's distributed-cache file.
    */
  def loadStopwords(spark: SparkSession, path: String): Seq[String] =
    spark.read.textFile(path)
      .collect()
      .iterator
      .map(_.trim.toLowerCase)
      .filter(_.nonEmpty)
      .toSeq
      .distinct
}
