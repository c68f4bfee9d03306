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

  test("audit->mitigation wire: keySkew flags the hot column, saltedJoin fixes it") {
    // skewed fact: 95% of rows on fk=1; dim: one row per key
    val fact = spark.range(20000).selectExpr(
      "CASE WHEN id % 20 = 0 THEN id % 7 ELSE 1 END AS fk",
      "CAST(id AS DOUBLE) AS v")
    val dim = spark.range(7).selectExpr("id AS fk", "concat('d', id) AS name")
    // 1. the rel_key_skew audit frame flags fk (and only fk at a 50%
    //    threshold: ~95% of fact rows share one key)
    val audit = graft.rel.Relational.keySkew(fact, Seq("fk", "v"))
    val flagged = Salted.skewedKeys(audit, threshold = 0.5)
    assert(flagged.map(_._1) === Seq("fk"))
    assert(flagged.head._2 > 0.9)
    // 2. the salted join returns exactly the plain join's rows
    val plain = fact.join(dim, "fk")
      .select("fk", "v", "name").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).sorted.toSeq
    val salted = Salted.saltedJoin(fact, dim, "fk")
      .select("fk", "v", "name").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).sorted.toSeq
    assert(salted === plain)
    // 3. and it BEATS the naive shuffle on balance: the biggest
    //    (key, salt) reduce group is ~1/buckets of the naive hot-key
    //    group — the stage's straggler bound, measured not asserted-by-
    //    faith. (Wall-clock comparisons are host-noise; group size IS
    //    the quantity a skewed reducer is linear in.)
    val naiveMax = fact.groupBy("fk").count()
      .agg(max("count")).head().getLong(0)
    val saltedMax = fact.withColumn("__salt", Salted.saltCol())
      .groupBy("fk", "__salt").count()
      .agg(max("count")).head().getLong(0)
    assert(naiveMax >= 19000L, s"fixture skew collapsed? naiveMax=$naiveMax")
    assert(saltedMax * 4 < naiveMax,
      s"salting must cut the straggler bound ≥4x: $saltedMax vs $naiveMax")
  }

  test("plan shape: two exchanges (salted partial, then final merge)") {
    val df = spark.range(1000).selectExpr("'a' AS k", "CAST(id AS DOUBLE) AS v")
    val plan = Salted.sumCountByKey(df, Seq("k"), col("v"))
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges === 2, plan.take(1500))
  }

  test("registered rel_salted_join: salted exchanges replace the skewed one") {
    val df = Salted.queries("rel_salted_join")(spark, "/root/testdata/sf0.001")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // the join's exchanges partition on (lang, __salt) — the measured
    // hot key spreads over buckets reduce tasks — and NO exchange
    // partitions on the bare skewed key
    // (the dim-BUILD aggregate still exchanges on bare lang — harmless:
    // map-side partials collapse the hot key to one row per partition
    // before that shuffle; it is the JOIN's row stream that skews)
    val saltedEx = "hashpartitioning\\(lang[^)]*__salt".r.findAllIn(plan).size
    assert(saltedEx >= 2, s"expected both join sides salted:\n${plan.take(2000)}")
    // shuffle-hash join, not broadcast: the dim-not-broadcastable case
    // is the one salting exists for
    assert(plan.contains("ShuffledHashJoin"), plan.take(2000))
  }
}
