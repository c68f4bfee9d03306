package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.StreamingQuery

class StreamingAnomalySpec extends SparkSpec {

  private def ts(minutes: Long): Timestamp =
    new Timestamp((1440 + minutes) * 60000L)

  private def stopAfter[T](q: StreamingQuery)(body: => T): T =
    try body finally q.stop()

  test("streamed z-scores match the batch expression; quiet hours pass") {
    val s = spark; import s.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = s.sqlContext
    // reference stats: clicks run mean 1/hour with sd √7.2 (the batch
    // fixture's moments); 9 clicks in hour 0 → z = 8/√7.2 ≈ 2.98 must
    // alert, the single hour-9 click (z = 0) must not
    val sd = math.sqrt(7.2)
    val stats = Seq(("click", 1.0, sd)).toDF("event_type", "mean_n", "sd_n")
    val data = (1 to 9).map(i => RawEvent(i.toLong, ts(i), "click", 1.0)) :+
      RawEvent(10L, ts(9 * 60), "click", 1.0)

    val stream = MemoryStream[RawEvent]
    val q = StreamingAnomaly.score(stream.toDF(), stats)
      .writeStream.format("memory").queryName("anomalies")
      .outputMode("append").start()
    stopAfter(q) {
      stream.addData(data)
      q.processAllAvailable()
      // advance the watermark past hour 0 so its window finalizes
      stream.addData(RawEvent(11L, ts(11 * 60), "click", 1.0))
      q.processAllAvailable()
      val got = s.table("anomalies").collect()
      assert(got.length === 1, got.mkString("; "))
      val r = got.head
      assert(r.getAs[String]("event_type") === "click")
      assert(r.getAs[Long]("n") === 9L)
      // batch expression verbatim: (n − mean)/sd on the same doubles
      assert(r.getAs[Double]("z") === (9.0 - 1.0) / sd)
    }
  }
}
