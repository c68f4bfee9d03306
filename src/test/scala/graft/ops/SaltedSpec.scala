package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SaltedSpec extends SparkSpec {

  test("salted aggregation equals direct aggregation on skewed data") {
    // 100k rows, 99% on one hot key
    val df = spark.range(100000).selectExpr(
      "CASE WHEN id % 100 = 0 THEN concat('k', id % 7) ELSE 'hot' END AS k",
      "CAST(id AS DOUBLE) AS v")
    val direct = df.groupBy("k")
      .agg(sum(col("v")).as("sum"), count(lit(1)).as("count"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    val salted = Salted.sumCountByKey(df, Seq("k"), col("v"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    // sums of doubles: both orders are partial-sum trees over the same
    // values; compare count exactly, sum within float-assoc tolerance
    assert(salted.keySet === direct.keySet)
    for (k <- direct.keys) {
      assert(salted(k)._2 === direct(k)._2, s"count for $k")
      // n·ε summation-error bound: 1e5 values × 2.2e-16 ≈ 2e-11 relative
      assert(math.abs(salted(k)._1 - direct(k)._1) <= math.abs(direct(k)._1) * 1e-9,
        s"sum for $k")
    }
  }

  test("first-stage groups spread the hot key over many sub-keys") {
    val df = spark.range(10000).selectExpr("'hot' AS k", "CAST(id AS DOUBLE) AS v")
    val firstStage = df
      .withColumn("__salt", Salted.saltCol())
      .groupBy("k", "__salt").count()
    // the single hot key becomes ~DefaultBuckets partial groups
    assert(firstStage.count() > Salted.DefaultBuckets / 2)
  }

  test("constant-value hot key still spreads (the case value-derived salt broke)") {
    // 10k rows, ONE key, ONE value — a value-derived salt collapses this
    // to a single first-stage group; the position-derived salt must not.
    val df = spark.range(10000).selectExpr("'hot' AS k", "CAST(42 AS DOUBLE) AS v")
    val firstStage = df
      .withColumn("__salt", Salted.saltCol())
      .groupBy("k", "__salt").count()
    assert(firstStage.count() > Salted.DefaultBuckets / 2)
    // and the merged result is unchanged
    val merged = Salted.sumCountByKey(df, Seq("k"), col("v")).collect()
    assert(merged.length === 1)
    assert(merged(0).getDouble(1) === 42.0 * 10000)
    assert(merged(0).getLong(2) === 10000L)
  }

  test("plan shape: two exchanges (salted partial, then final merge)") {
    val df = spark.range(1000).selectExpr("'a' AS k", "CAST(id AS DOUBLE) AS v")
    val plan = Salted.sumCountByKey(df, Seq("k"), col("v"))
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges === 2, plan.take(1500))
  }
}
