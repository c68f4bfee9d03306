package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.StreamingQuery

/** Top-level so Spark can build an encoder without an outer scope. */
case class AttribEv(user_id: Long, event_id: Long, ts: Timestamp)

class StreamingAttributionSpec extends SparkSpec {

  // offset the timebase well past epoch 0: the initial watermark IS
  // epoch 0, and rows at or below the watermark are late-filtered
  private def t(min: Long) = new Timestamp((1000000L + min) * 60000L)

  private def stopAfter[T](q: StreamingQuery)(body: => T): T =
    try body finally q.stop()

  // Data is added BEFORE start() so everything lands in micro-batch 0,
  // where the watermark is still at its initial value: the assertions
  // pin the JOIN SEMANTICS deterministically. (Across later batches the
  // watermark advances and evicts out-of-horizon views — that is the
  // state-cleanup contract, not a semantics change, and its timing
  // depends on how the trigger slices addData into batches.)
  test("interval join attributes purchases to in-horizon views only") {
    val s = spark; import s.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = s.sqlContext
    val views = MemoryStream[AttribEv]
    val purchases = MemoryStream[AttribEv]
    // user 1: views at 0 and 30 min, purchase at 45 min → both attributed;
    // the view at 200 min is AFTER the purchase → not attributed.
    // user 2: view at 0, purchase at 90 min → outside the 60-min horizon.
    views.addData(Seq(AttribEv(1, 100, t(0)), AttribEv(1, 101, t(30)),
      AttribEv(1, 102, t(200)), AttribEv(2, 200, t(0))))
    purchases.addData(Seq(AttribEv(1, 900, t(45)), AttribEv(2, 901, t(90))))
    val q = StreamingAttribution.attributed(views.toDF(), purchases.toDF())
      .writeStream.format("memory").queryName("attr_stream")
      .outputMode("append").start()
    stopAfter(q) {
      q.processAllAvailable()
      val got = s.table("attr_stream")
        .select("user_id", "purchase_id", "view_id")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got === Set((1L, 900L, 100L), (1L, 900L, 101L)))
    }
  }

  test("one-batch replay of the fixture equals the batch events_attribution") {
    val s = spark; import s.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = s.sqlContext
    val dir = "/root/testdata/sf0.001"
    val raw = graft.sources.EventSource.load(s, dir)
      .selectExpr("user_id", "event_id", "ts", "event_type")
    def slice(kind: String): Seq[AttribEv] =
      raw.filter(org.apache.spark.sql.functions.col("event_type") === kind)
        .selectExpr("user_id", "event_id", "ts").as[AttribEv].collect().toSeq

    val views = MemoryStream[AttribEv]
    val purchases = MemoryStream[AttribEv]
    views.addData(slice("view"))
    purchases.addData(slice("purchase"))
    val q = StreamingAttribution.attributed(views.toDF(), purchases.toDF())
      .writeStream.format("memory").queryName("attr_replay")
      .outputMode("append").start()
    val got = stopAfter(q) {
      q.processAllAvailable()
      s.table("attr_replay")
        .select("user_id", "purchase_id", "view_id", "dt_us")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .sorted.toSeq
    }
    val want = graft.SparkEntry.queries("events_attribution")(s, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sorted.toSeq
    assert(got == want,
      "streaming replay must emit exactly the batch banded-join pairs")
  }
}
