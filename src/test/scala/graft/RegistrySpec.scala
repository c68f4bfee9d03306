package graft

import org.apache.spark.sql.functions.col

/** Whole-registry integrity net: every `SparkEntry.queries` entry must
  * execute at sf0.001, return rows, have an oracle twin, and never plan
  * an unbounded cartesian product. Catches a broken registration or a
  * plan regression in ANY query before the driver does.
  */
class RegistrySpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("every registered query has an oracle twin (column-named match)") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(o.subsetOf(q), s"oracle without query: ${o -- q}")
    assert(q === o, s"queries without oracle (must be deliberate): ${q -- o}")
  }

  test("every registered query executes at sf0.001 with rows and sane plans") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try {
          val df = fn(spark, dir)
          val plan = df.queryExecution.executedPlan.toString
          val n = df.count()
          val problems = Seq(
            if (n == 0) Some(s"$name: 0 rows") else None,
            // broadcast NL joins are fine (bounded build side: the N
            // cross-join, query batches, centroids); an unbounded
            // CartesianProduct never is
            if (plan.contains("CartesianProduct"))
              Some(s"$name: CartesianProduct in plan") else None
          ).flatten
          problems
        } catch {
          case e: Throwable => Seq(s"$name: ${String.valueOf(e.getMessage).take(200)}")
        }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("flagship entry returns rows (driver t1 smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
