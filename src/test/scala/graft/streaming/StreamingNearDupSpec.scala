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

  // ---- event-time TTL (candidatesTtl) — deterministic: the eviction
  // clock is the WATERMARK, driven entirely by the timestamps the test
  // feeds, never the wall clock. Watermark semantics: batch N runs with
  // the watermark computed from batches < N, so an eviction lands one
  // batch after the timestamp that makes it due. Timestamps start at
  // t=1000s, NOT 0: Spark's initial watermark is epoch 0 and its
  // late-row filter drops a row AT the watermark, so a ts=0 doc
  // silently never enters state (measured here — the t=0 variant of
  // the lease-extension test lost every doc-1 pair).

  private def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)

  test("event-time TTL evicts idle buckets: cross-eviction pairs are lost (the recall consequence)") {
    val s = spark; import s.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = s.sqlContext
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val other = "solo lone unique single apart separate detached isolated remote distant"
    val stream = MemoryStream[StreamingNearDup.TsDoc]
    val q = StreamingNearDup.candidatesTtl(stream.toDS(), ttlMs = 100000L)
      .writeStream.format("memory").queryName("neardup_ttl")
      .outputMode("append").start()
    try {
      stream.addData(StreamingNearDup.TsDoc(1L, base, ts(1000)))
      q.processAllAvailable()
      // an unrelated doc 200 s later advances the watermark past doc
      // 1's 100 s lease; its buckets time out and evict
      stream.addData(StreamingNearDup.TsDoc(9L, other, ts(1200)))
      q.processAllAvailable()
      // doc 1's near-twin arrives AFTER eviction: fresh empty bucket,
      // the cross-eviction pair (1,2) is never emitted
      stream.addData(StreamingNearDup.TsDoc(2L, base, ts(1210)))
      q.processAllAvailable()
      assert(spark.table("neardup_ttl").count() === 0,
        "an evicted bucket must not remember pre-eviction members")
      // but pairing WITHIN a live lease still works
      stream.addData(StreamingNearDup.TsDoc(3L, base, ts(1220)))
      q.processAllAvailable()
      val got = spark.table("neardup_ttl").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got === Set((2L, 3L)),
        "post-eviction arrivals must pair within the new window")
    } finally q.stop()
  }

  test("event-time TTL eviction forgets poison: a once-oversized bucket re-admits") {
    val s = spark; import s.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = s.sqlContext
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val other = "solo lone unique single apart separate detached isolated remote distant"
    val stream = MemoryStream[StreamingNearDup.TsDoc]
    val q = StreamingNearDup.candidatesTtl(stream.toDS(), ttlMs = 100000L,
        maxBucketSize = 2)
      .writeStream.format("memory").queryName("neardup_ttl_poison")
      .outputMode("append").start()
    try {
      // three copies in one batch exceed cap=2: the bucket poisons
      stream.addData(Seq(1L, 2L, 3L).map(StreamingNearDup.TsDoc(_, base, ts(1000))))
      q.processAllAvailable()
      assert(spark.table("neardup_ttl_poison").count() === 0,
        "over-cap batch must poison, emitting nothing")
      // watermark jumps past the poison lease: the marker evicts too
      stream.addData(StreamingNearDup.TsDoc(9L, other, ts(1200)))
      q.processAllAvailable()
      stream.addData(StreamingNearDup.TsDoc(4L, base, ts(1210)))
      q.processAllAvailable()
      stream.addData(StreamingNearDup.TsDoc(5L, base, ts(1215)))
      q.processAllAvailable()
      val got = spark.table("neardup_ttl_poison").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got === Set((4L, 5L)),
        "eviction must reset the drop-oversized-bucket rule for the new window")
    } finally q.stop()
  }

  test("a touch inside the lease extends it: no eviction while near-dups keep arriving") {
    val s = spark; import s.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = s.sqlContext
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val stream = MemoryStream[StreamingNearDup.TsDoc]
    val q = StreamingNearDup.candidatesTtl(stream.toDS(), ttlMs = 100000L)
      .writeStream.format("memory").queryName("neardup_ttl_touch")
      .outputMode("append").start()
    try {
      // each arrival lands 80 s after the previous — inside the 100 s
      // lease, which the touch renews — so the 240 s total span (well
      // past one TTL) evicts nothing and every cross pair is emitted
      for ((id, t) <- Seq((1L, 1000L), (2L, 1080L), (3L, 1160L), (4L, 1240L))) {
        stream.addData(StreamingNearDup.TsDoc(id, base, ts(t)))
        q.processAllAvailable()
      }
      val got = spark.table("neardup_ttl_touch").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got === Set((1L, 2L), (1L, 3L), (2L, 3L), (1L, 4L), (2L, 4L), (3L, 4L)),
        "renewed leases must keep the full membership pairing")
    } finally q.stop()
  }
}
