package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.StreamingQuery

class StreamingDedupSpec extends SparkSpec {

  private def stopAfter[T](q: StreamingQuery)(body: => T): T =
    try body finally q.stop()

  test("dedup-on-arrival: first copy admitted, later copies dropped across batches") {
    val s = spark; import s.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = s.sqlContext
    val stream = MemoryStream[StreamingDedup.Doc]
    val q = StreamingDedup.dedup(stream.toDS())
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").start()
    stopAfter(q) {
      // batch 1: two distinct texts + an in-batch duplicate (higher id)
      stream.addData(Seq(
        StreamingDedup.Doc(10, "alpha beta"),
        StreamingDedup.Doc(11, "gamma delta"),
        StreamingDedup.Doc(12, "Alpha Beta"))) // same text modulo case
      q.processAllAvailable()
      val b1 = s.table("dedup_stream").as[StreamingDedup.Kept].collect()
      assert(b1.map(_.doc_id).sorted.toSeq == Seq(10L, 11L),
        "in-batch duplicate must lose to the min doc_id")

      // batch 2: a cross-batch duplicate (dropped — state remembers) and
      // a genuinely new text (admitted), plus an empty doc (filtered)
      stream.addData(Seq(
        StreamingDedup.Doc(20, "ALPHA BETA"),
        StreamingDedup.Doc(21, "epsilon"),
        StreamingDedup.Doc(22, "")))
      q.processAllAvailable()
      val b2 = s.table("dedup_stream").as[StreamingDedup.Kept].collect()
      assert(b2.map(_.doc_id).sorted.toSeq == Seq(10L, 11L, 21L),
        "cross-batch duplicate must not be re-admitted")
    }
  }

  test("single-batch replay emits exactly the batch twin's keeper set") {
    val s = spark; import s.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = s.sqlContext
    // a static slice of the documents fixture, replayed as ONE batch
    val dir = "/root/testdata/sf0.001"
    val docs = s.read.parquet(s"$dir/documents.parquet")
      .selectExpr("doc_id", "text").as[StreamingDedup.Doc].collect().toSeq

    val stream = MemoryStream[StreamingDedup.Doc]
    val q = StreamingDedup.dedup(stream.toDS())
      .writeStream.format("memory").queryName("dedup_replay")
      .outputMode("append").start()
    val got = stopAfter(q) {
      stream.addData(docs)
      q.processAllAvailable()
      s.table("dedup_replay").as[StreamingDedup.Kept].collect()
        .map(_.doc_id).sorted.toSeq
    }
    // batch twin: dedup_apply keeps min(doc_id) per normalized-text hash
    val want = graft.SparkEntry.queries("dedup_apply")(s, dir)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(got == want,
      "one-batch streaming replay must equal the batch keeper set " +
        "(same hash, same min-doc_id tie-break)")
  }
}
