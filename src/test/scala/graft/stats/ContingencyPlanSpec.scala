package graft.stats

import graft.SparkSpec

/** The termCat subtree (tokenize → explode → first aggregate) feeds both
  * the join left side and the termTotal aggregate. At 100 TB that subtree
  * IS the dominant cost — if the exchange reuse does not deduplicate it,
  * the whole tokenize→explode→aggregate pipeline runs twice. This spec
  * pins the reuse so a refactor can't silently lose it.
  */
class ContingencyPlanSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("the shared termCat exchange is planned once and reused (AQE final plan)") {
    val df = graft.pipeline.ChiSquareQueries.queries("chi2_top_terms")(spark, dir)
    df.collect() // materialize so AQE finalizes the adaptive plan
    val full = df.queryExecution.executedPlan.toString
    // AdaptiveSparkPlan prints the final plan first, then the initial
    // plan — only the final section reflects what actually executed
    val finalPlan = full.split("== Initial Plan ==").head
    assert(finalPlan.contains("isFinalPlan=true"), full.take(500))
    assert(finalPlan.contains("ReusedExchange"),
      s"termCat subtree must be shuffled once and reused:\n${finalPlan.take(3000)}")
    // exactly one tokenize→explode in the executed plan: the reused
    // exchange replaces the second copy
    val generates = "Generate explode".r.findAllIn(finalPlan).size
    assert(generates === 1,
      s"expected exactly 1 explode in the final plan, got $generates")
  }
}
