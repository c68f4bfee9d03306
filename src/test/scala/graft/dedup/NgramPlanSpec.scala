package graft.dedup

/** Pins `dedup_ngram_jaccard`'s linear single-consumer shape: the AQE
  * FINAL plan must contain exactly one corpus scan and no join of any
  * kind. The previous formulation planned the scan+distinct+index
  * subtree three times and relied on AQE runtime exchange reuse to
  * collapse the scans — correct that day, but canonicalization-fragile
  * (higher-order-function lambdas) and still re-ran the post-shuffle
  * index aggregation per consumer. This spec fails if a refactor
  * reintroduces either a second scan or a size join.
  */
class NgramPlanSpec extends graft.SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("ngram jaccard final plan: one corpus scan, zero joins") {
    val df = graft.SparkEntry.queries("dedup_ngram_jaccard")(spark, dir)
    df.collect()
    val full = df.queryExecution.executedPlan.toString
    assert(full.contains("isFinalPlan=true"), full.take(500))
    val fin = full.split("== Initial Plan ==")(0)
    def cnt(re: String): Int = re.r.findAllIn(fin).size
    assert(cnt("Scan parquet") == 1, s"expected exactly 1 corpus scan:\n$fin")
    assert(cnt("Join") == 0, s"size lookups must not join back:\n$fin")
    // the chain never needed exchange reuse — nothing to reuse
    assert(cnt("ReusedExchange") == 0, fin)
  }
}
