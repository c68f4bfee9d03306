package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("split membership is stable across runs and partitionings") {
    val d = spark.read.parquet(s"$dir/documents.parquet")
    val a = Sampling.split(d, "doc_id")
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = Sampling.split(d.repartition(13), "doc_id")
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a === b)
  }

  test("split proportions are near 90/5/5 and partition the corpus") {
    val d = spark.read.parquet(s"$dir/documents.parquet")
    val n = d.count().toDouble
    val sizes = Sampling.split(d, "doc_id")
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sizes.values.sum.toDouble === n)
    assert(math.abs(sizes("train") / n - 0.90) < 0.05, sizes.toString)
    assert(sizes.contains("val") && sizes.contains("test"), sizes.toString)
  }
}
