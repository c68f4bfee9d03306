package graft.stats

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TopKSpec extends SparkSpec {
  import spark.implicits._

  test("grouped top-k with (score desc, term asc) tie-break (D5)") {
    val df = Seq(
      ("X", "b", 2.0), ("X", "a", 2.0), ("X", "c", 9.0), ("X", "d", 1.0),
      ("Y", "z", 5.0)).toDF("category", "term", "chi2")
    val got = TopK.perGroup(df, Seq(col("category")),
        Seq(col("chi2").desc, col("term").asc), 3)
      .select("category", "term", "rank").as[(String, String, Int)]
      .collect().toSet
    assert(got === Set(
      ("X", "c", 1), ("X", "a", 2), ("X", "b", 3), ("Y", "z", 1)))
  }

  test("plan uses WindowGroupLimit (heap top-k pushed below the shuffle)") {
    // SURVEY T1: InferWindowGroupLimit must fire on this plan shape so the
    // window shuffle carries O(groups·k) rows at scale, not the full input.
    val df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .groupBy("lang", "source").agg(count("*").cast("double").as("chi2"))
      .withColumnRenamed("source", "term")
    val plan = TopK.perGroup(df, Seq(col("lang")),
      Seq(col("chi2").desc, col("term").asc), 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan)
  }

  test("empty groups are dropped (T4): no rank rows for absent categories") {
    val df = Seq.empty[(String, String, Double)].toDF("category", "term", "chi2")
    assert(TopK.perGroup(df, Seq(col("category")),
      Seq(col("chi2").desc), 3).count() === 0)
  }
}
