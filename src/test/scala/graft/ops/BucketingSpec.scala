package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Demonstrates (and pins) the co-located-join story for 100 TB scale:
  * two tables bucketed on the join key load with compatible
  * partitioning, so the join plans ZERO exchanges — the shuffle happened
  * once at write time and is amortized over every subsequent join.
  */
class BucketingSpec extends SparkSpec {

  test("bucketed tables join without any shuffle exchange") {
    // the fixture is small enough that AQE would broadcast; disable so
    // the plan shows the co-located shuffle-join path bucketing buys
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try bucketedJoinBody()
    finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }

  private def bucketedJoinBody(): Unit = {
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    val dir = "/root/testdata/sf0.001"
    spark.read.parquet(s"$dir/orders.parquet")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("b_orders")
    spark.read.parquet(s"$dir/lineitem.parquet")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("b_lineitem")

    val joined = spark.table("b_lineitem")
      .join(spark.table("b_orders"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"))
    joined.collect()
    val plan = joined.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    // the join itself must not shuffle either side: both scans report
    // bucketed output partitioning. (The final small aggregate may.)
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
      plan.take(1500))
    assert(plan.contains("Bucketed: true"), plan.take(1500))
    val exchBeforeAgg = "Exchange hashpartitioning\\((?:l_orderkey|o_orderkey)".r
      .findAllIn(plan).size
    assert(exchBeforeAgg === 0,
      s"join must consume bucketed layout, not re-shuffle:\n${plan.take(2500)}")

    // and the result matches the unbucketed join
    val expect = spark.read.parquet(s"$dir/lineitem.parquet")
      .join(spark.read.parquet(s"$dir/orders.parquet"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = joined.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === expect)
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
  }
}
