package graft.rel

import graft.SparkSpec

/** Explain-based plan hygiene for the relational workout — these are the
  * assertions the scale notes in [[Relational]]'s scaladoc point at.
  */
class RelationalSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    Relational.queries(name)(spark, dir).queryExecution.executedPlan.toString

  test("rel_pricing_summary pushes the shipdate filter into the scan") {
    val p = plan("rel_pricing_summary")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"), p.take(2000))
  }

  test("rel_pricing_summary prunes columns: no l_partkey/l_suppkey read") {
    val p = plan("rel_pricing_summary")
    val readSchema = p.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(!readSchema.contains("l_partkey") && !readSchema.contains("l_suppkey"),
      readSchema)
  }

  test("rel_top_orders broadcasts customer and semi-reduces orders first") {
    val p = plan("rel_top_orders")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(p.contains("PushedFilters: [IsNotNull(c_mktsegment), EqualTo(c_mktsegment,BUILDING)"),
      "customer filter must reach the scan: " + p.take(2000))
  }

  test("rel_nation_revenue: all three dimension joins are broadcasts") {
    val p = plan("rel_nation_revenue")
    val n = "BroadcastHashJoin".r.findAllIn(p).size
    assert(n === 3, s"expected 3 broadcast joins, got $n:\n${p.take(2000)}")
    assert(!p.contains("SortMergeJoin"), p.take(2000))
  }

  test("rel_priority_top_orders uses the window group-limit rewrite") {
    val p = plan("rel_priority_top_orders")
    assert(p.contains("WindowGroupLimit"), p.take(2000))
  }

  test("rel_customer_orders plans exactly one scan of orders") {
    val p = plan("rel_customer_orders")
    val ordersScans = p.linesIterator.count(l =>
      l.contains("FileScan") && l.contains("orders.parquet"))
    assert(ordersScans === 1,
      s"orders must be scanned once, saw $ordersScans:\n${p.take(2000)}")
  }
}
