package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.StreamingQuery

case class RawEvent(event_id: Long, ts: Timestamp, event_type: String,
    value: Double)

class StreamingSpec extends SparkSpec {

  /** Minute offsets start one day after the epoch: rows at or before the
    * initial watermark (epoch 0) would be discarded as late data.
    */
  private def ts(minutes: Long): Timestamp =
    new Timestamp((1440 + minutes) * 60000L)

  private def stopAfter[T](q: StreamingQuery)(body: => T): T =
    try body finally q.stop()

  test("streaming hourly counts converge to the batch twin's result") {
    val s = spark; import s.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = s.sqlContext
    val data = Seq(
      RawEvent(1, ts(5), "click", 1.5),
      RawEvent(2, ts(25), "click", 2.5),
      RawEvent(3, ts(61), "click", 4.0),
      RawEvent(4, ts(70), "buy", 10.0))

    val stream = MemoryStream[RawEvent]
    val q = StreamingCounts.hourlyCounts(stream.toDF())
      .writeStream.format("memory").queryName("hourly")
      .outputMode("complete").start()
    stopAfter(q) {
      stream.addData(data.take(2))
      q.processAllAvailable()
      stream.addData(data.drop(2))
      q.processAllAvailable()
      val got = s.table("hourly")
        .collect()
        .map(r => (r.getTimestamp(0), r.getString(1)) ->
          (r.getLong(2), r.getDouble(3))).toMap
      val want = StreamingCounts.hourlyCounts(data.toDF())
        .collect()
        .map(r => (r.getTimestamp(0), r.getString(1)) ->
          (r.getLong(2), r.getDouble(3))).toMap
      assert(got === want)
      assert(got((ts(0), "click")) === ((2L, 4.0)))
    }
  }

  test("stateful sessionization: gap closes in-stream, timeout closes at watermark") {
    val s = spark; import s.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = s.sqlContext
    val stream = MemoryStream[StreamingSessionize.Event]
    val q = StreamingSessionize.sessions(stream.toDS(), gapMinutes = 30)
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    stopAfter(q) {
      // batch 1: user 100 at minute 0 and 10 → one open session
      stream.addData(Seq(
        StreamingSessionize.Event(100, ts(0), 1),
        StreamingSessionize.Event(100, ts(10), 2)))
      q.processAllAvailable()
      assert(s.table("sessions").count() === 0, "session must still be open")

      // batch 2: minute 180 event → gap 170 min > 30 min closes it inline
      stream.addData(Seq(StreamingSessionize.Event(100, ts(180), 3)))
      q.processAllAvailable()
      val afterGap = s.table("sessions").as[StreamingSessionize.Session].collect()
      assert(afterGap.toSeq === Seq(
        StreamingSessionize.Session(100, ts(0), ts(10), 2)))

      // batch 3: another user far in the future pushes the watermark
      // (180+30 min timeout << 600-60 watermark) → timeout branch fires
      stream.addData(Seq(StreamingSessionize.Event(200, ts(600), 4)))
      q.processAllAvailable()
      val afterTimeout = s.table("sessions").as[StreamingSessionize.Session]
        .collect().toSet
      assert(afterTimeout.contains(
        StreamingSessionize.Session(100, ts(180), ts(180), 1)))
    }
  }

  test("batch sessionize and streaming sessionize agree on a replay") {
    val s = spark; import s.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = s.sqlContext
    // trace: user 1 sessions {0,10},{50},{100}; user 2 {0}
    val trace = Seq(
      StreamingSessionize.Event(1, ts(0), 1),
      StreamingSessionize.Event(1, ts(10), 2),
      StreamingSessionize.Event(1, ts(50), 3),
      StreamingSessionize.Event(1, ts(100), 4),
      StreamingSessionize.Event(2, ts(0), 5))

    val stream = MemoryStream[StreamingSessionize.Event]
    val q = StreamingSessionize.sessions(stream.toDS(), gapMinutes = 30)
      .writeStream.format("memory").queryName("replay")
      .outputMode("append").start()
    stopAfter(q) {
      stream.addData(trace)
      q.processAllAvailable()
      // flush the open tails with a watermark-advancing sentinel
      stream.addData(Seq(StreamingSessionize.Event(999, ts(100000), 6)))
      q.processAllAvailable()
      val got = s.table("replay").as[StreamingSessionize.Session]
        .collect().filter(_.user_id != 999)
        .map(x => (x.user_id, x.session_start, x.session_end, x.n_events))
        .toSet
      assert(got === Set(
        (1L, ts(0), ts(10), 2L),
        (1L, ts(50), ts(50), 1L),
        (1L, ts(100), ts(100), 1L),
        (2L, ts(0), ts(0), 1L)))
    }
  }
}
