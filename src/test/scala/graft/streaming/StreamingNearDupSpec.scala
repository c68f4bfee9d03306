package graft.streaming

import graft.SparkSpec
import graft.dedup.Dedup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class StreamingNearDupSpec extends SparkSpec {

  /** Near-dup-rich corpus: exact copies and one-token mutations of a
    * handful of base docs (the NgramPropertySpec recipe) — guarantees
    * shared LSH buckets, plus a too-short doc the signature chain must
    * skip.
    */
  private def corpus: Seq[(Long, String)] = {
    val bases = Seq(
      "alpha beta gamma delta epsilon zeta eta theta iota kappa",
      "one two three four five six seven eight nine ten",
      "red green blue cyan magenta yellow black white gray pink")
    val docs = bases.zipWithIndex.flatMap { case (t, i) =>
      Seq(t, t, t.replaceAll("\\w+$", "omega")) // base, copy, mutation
    }
    (docs :+ "xy").zipWithIndex.map { case (t, i) => (i.toLong, t) }
  }

  test("scalar signature chain bit-equals the batch column chain") {
    val s = spark; import s.implicits._
    val df = corpus.toDF("doc_id", "text")
    val batch = Dedup.minhashSignatures(Dedup.shingles(df))
      .collect().map(r => r.getLong(0) ->
        (0 until Dedup.NumHashes).map(i => r.getLong(i + 1)).toArray).toMap
    for ((id, text) <- corpus) {
      StreamingNearDup.sigOf(text) match {
        case Some(sig) =>
          assert(batch.contains(id), s"doc $id scalar-signed, batch didn't")
          assert(sig.toSeq === batch(id).toSeq, s"signature diverged for $id")
        case None =>
          assert(!batch.contains(id),
            s"doc $id skipped by scalar chain but batch-signed")
      }
    }
    assert(StreamingNearDup.sigOf("xy").isEmpty, "short doc must skip")
  }

  test("one-batch replay emits exactly the batch candidate set") {
    val s = spark; import s.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = s.sqlContext
    val df = corpus.toDF("doc_id", "text")
    val want = Dedup.minhashCandidates(df)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(want.nonEmpty, "corpus must plant candidate pairs")
    val stream = MemoryStream[StreamingNearDup.Doc]
    val q = StreamingNearDup.candidates(stream.toDS())
      .writeStream.format("memory").queryName("neardup_replay")
      .outputMode("append").start()
    try {
      stream.addData(corpus.map { case (id, t) => StreamingNearDup.Doc(id, t) })
      q.processAllAvailable()
      val got = spark.table("neardup_replay").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got === want,
        "streaming replay diverged from batch minhashCandidates")
    } finally q.stop()
  }

  test("arrivals across batches pair against admitted state, and the cap poisons") {
    val s = spark; import s.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = s.sqlContext
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val stream = MemoryStream[StreamingNearDup.Doc]
    // cap = 2: two admitted copies fill every shared bucket; the third
    // copy must poison rather than emit a third pair
    val q = StreamingNearDup.candidates(stream.toDS(), maxBucketSize = 2)
      .writeStream.format("memory").queryName("neardup_state")
      .outputMode("append").start()
    try {
      stream.addData(StreamingNearDup.Doc(1L, base))
      q.processAllAvailable()
      assert(spark.table("neardup_state").count() === 0, "singleton: no pairs")
      stream.addData(StreamingNearDup.Doc(2L, base))
      q.processAllAvailable()
      val afterTwo = spark.table("neardup_state").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(afterTwo === Set((1L, 2L)), "cross-batch pair against state")
      stream.addData(StreamingNearDup.Doc(3L, base))
      q.processAllAvailable()
      val afterThree = spark.table("neardup_state").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(afterThree === Set((1L, 2L)),
        "the over-cap arrival must poison its buckets, not expand pairs")
    } finally q.stop()
  }

  test("redelivered doc_id neither self-pairs nor double-counts the cap") {
    val s = spark; import s.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = s.sqlContext
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val stream = MemoryStream[StreamingNearDup.Doc]
    // cap = 2: a redelivery that double-counted would poison the bucket
    // and suppress the legitimate pair with doc 2
    val q = StreamingNearDup.candidates(stream.toDS(), maxBucketSize = 2)
      .writeStream.format("memory").queryName("neardup_redelivery")
      .outputMode("append").start()
    try {
      stream.addData(StreamingNearDup.Doc(1L, base))
      q.processAllAvailable()
      stream.addData(StreamingNearDup.Doc(1L, base)) // at-least-once replay
      q.processAllAvailable()
      assert(spark.table("neardup_redelivery").count() === 0,
        "a redelivered doc must not pair with itself")
      stream.addData(StreamingNearDup.Doc(2L, base))
      q.processAllAvailable()
      val got = spark.table("neardup_redelivery").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got === Set((1L, 2L)),
        "redelivery must not consume cap headroom (bucket wrongly poisoned)")
    } finally q.stop()
  }
}
