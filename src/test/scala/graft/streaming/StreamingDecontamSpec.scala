package graft.streaming

import graft.SparkSpec
import graft.dedup.Dedup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class StreamingDecontamSpec extends SparkSpec {

  /** Corpus with planted leakage: doc 1 copies an eval doc verbatim,
    * doc 2 embeds a 6-token eval phrase mid-text (= two overlapping
    * 5-grams), doc 3 is clean, doc 4 is too short to shingle (always
    * clean by construction).
    */
  private val evalDocs = Seq(
    (100L, "the quick brown fox jumps over the lazy dog tonight"),
    (101L, "pack my box with five dozen fresh liquor jugs now"))
  private val corpus = Seq(
    (1L, "the quick brown fox jumps over the lazy dog tonight"),
    (2L, "prefix words box with five dozen fresh liquor trailing tail"),
    (3L, "completely unrelated clean text about training data pipelines"),
    (4L, "too short"))

  private def evalDf = {
    val s = spark; import s.implicits._
    evalDocs.toDF("doc_id", "text")
  }
  private def corpusDf = {
    val s = spark; import s.implicits._
    corpus.toDF("doc_id", "text")
  }

  test("scalar key chain: eval-copy shares all keys, embedded phrase its two") {
    val keys100 = StreamingDecontam.keysOf(evalDocs.head._2)
    assert(StreamingDecontam.keysOf(corpus.head._2) === keys100,
      "verbatim copy must share every key")
    val evalSet = StreamingDecontam.evalKeySet(evalDf)
    assert(keys100.subsetOf(evalSet), "evalKeySet must hold the batch keys")
    assert(StreamingDecontam.keysOf(corpus(1)._2).count(evalSet.contains) === 2,
      "exactly the two planted overlapping 5-grams ('box with five dozen " +
        "fresh', 'with five dozen fresh liquor') match")
    assert(StreamingDecontam.keysOf("too short").isEmpty)
    assert(StreamingDecontam.keysOf(null).isEmpty)
  }

  test("one-batch replay verdicts equal batch decontaminate + report") {
    val s = spark; import s.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = s.sqlContext
    val keptBatch = Dedup.decontaminate(
        corpusDf.withColumn("lang", org.apache.spark.sql.functions.lit("en"))
          .withColumn("source", org.apache.spark.sql.functions.lit("s"))
          .withColumn("n_chars", org.apache.spark.sql.functions.length(
            org.apache.spark.sql.functions.col("text"))),
        evalDf)
      .collect().map(_.getLong(0)).toSet
    val reportBatch = Dedup.decontaminationReport(corpusDf, evalDf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    val evalSet = StreamingDecontam.evalKeySet(evalDf)
    val stream = MemoryStream[StreamingDecontam.Doc]
    val q = StreamingDecontam.verdicts(stream.toDS(), evalSet)
      .writeStream.format("memory").queryName("decontam_replay")
      .outputMode("append").start()
    try {
      stream.addData(corpus.map { case (id, t) => StreamingDecontam.Doc(id, t) })
      q.processAllAvailable()
      val got = spark.table("decontam_replay").collect()
        .map(r => (r.getLong(0), r.getBoolean(1), r.getLong(2)))
      assert(got.length === corpus.length, "one verdict per arrival")
      val streamKept = got.filter(!_._2).map(_._1).toSet
      assert(streamKept === keptBatch,
        s"stream kept $streamKept, batch kept $keptBatch")
      val streamShared = got.filter(_._2).map(v => v._1 -> v._3).toMap
      assert(streamShared === reportBatch,
        s"stream n_shared $streamShared, batch report $reportBatch")
    } finally q.stop()
  }

  test("bloom-path replay equals the batch report, no driver key set") {
    val s = spark; import s.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = s.sqlContext
    val reportBatch = Dedup.decontaminationReport(corpusDf, evalDf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    // side inputs: fixed-size sketch + the DISTRIBUTED exact key frame
    // (never collected — the X93 discipline on the streaming arm)
    val bloom = StreamingDecontam.evalBloom(evalDf)
    val evalKeys = Dedup.decontamEvalKeys(evalDf)
    val stream = MemoryStream[StreamingDecontam.Doc]
    val q = StreamingDecontam.bloomReport(stream.toDS(), bloom, evalKeys)
      .writeStream.format("memory").queryName("decontam_bloom_replay")
      .outputMode("update").start()
    try {
      stream.addData(corpus.map { case (id, t) => StreamingDecontam.Doc(id, t) })
      q.processAllAvailable()
      val got = spark.table("decontam_bloom_replay").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === reportBatch,
        "one row per contaminated arrival, n_shared_keys identical to " +
          "the batch report; clean docs emit nothing")
      // the bloom predicate must be IN the executed plan (the map-side
      // discard is the point of the variant)
      val out = new java.io.ByteArrayOutputStream()
      Console.withOut(new java.io.PrintStream(out)) { q.explain() }
      assert(out.toString.contains("might_contain"),
        s"bloom predicate missing from plan:\n${out.toString.take(2000)}")
    } finally q.stop()
  }

  test("verdict stream plans no shuffle and no state store") {
    val s = spark; import s.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = s.sqlContext
    val evalSet = StreamingDecontam.evalKeySet(evalDf)
    val stream = MemoryStream[StreamingDecontam.Doc]
    val q = StreamingDecontam.verdicts(stream.toDS(), evalSet)
      .writeStream.format("memory").queryName("decontam_plan")
      .outputMode("append").start()
    try {
      stream.addData(corpus.map { case (id, t) => StreamingDecontam.Doc(id, t) })
      q.processAllAvailable()
      // stateless: no stateful operator registered in the progress
      assert(q.lastProgress.stateOperators.isEmpty,
        s"expected zero state operators, saw ${q.lastProgress.stateOperators.length}")
    } finally q.stop()
  }
}
