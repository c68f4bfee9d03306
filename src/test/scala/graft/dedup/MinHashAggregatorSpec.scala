package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MinHashAggregatorSpec extends SparkSpec {

  test("typed one-pass aggregator equals the declarative 16-min form") {
    val s = spark; import s.implicits._
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .filter(col("text").isNotNull && length(col("text")) > 0)
    val sh = Dedup.shingles(d)
    val bases = sh.select(col("doc_id"),
      conv(substring(md5(col("s")), 1, 7), 16, 10).cast("long").as("hbase"))
      .as[(Long, Long)]

    val typed = MinHashAggregator.signatures(bases)
      .collect().map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    val declarative = Dedup.minhashSignatures(sh)
      .collect().map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    assert(typed.keySet === declarative.keySet)
    for (k <- typed.keys) assert(typed(k) === declarative(k), s"doc $k")
  }

  test("merge is commutative/associative: split-input invariance") {
    val s = spark; import s.implicits._
    val all = (1L to 100L).map(x => (x % 5, x * 7919L))
    val full = MinHashAggregator.signatures(all.toDS())
      .collect().map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    val shuffled = MinHashAggregator.signatures(
      scala.util.Random.shuffle(all).toDS().repartition(7))
      .collect().map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    assert(full === shuffled)
  }
}
