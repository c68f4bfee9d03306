package graft.dedup

/** Pins `dedup_ngram_jaccard`'s plan shape after the r12 frequency-
  * order redesign: the AQE final plan holds exactly TWO corpus scans
  * (the posting subtree feeds the per-key df count AND the df join's
  * probe side — both map-side only, no exchange between scan and
  * shuffle) and exactly ONE join — the co-partitioned (key ⋈ df)
  * annotation join that replaced a collect_set index whose array
  * states spilled GBs at sf10. No pair-level join and no size
  * join-back may reappear: verification happens in-bucket in the
  * native graft_jaccard_pairs kernel, so everything after the per-doc
  * aggregate is join-free. (The pre-r12 zero-join single-scan shape
  * read well but measured worse at two orders up: its index aggregate
  * carried array partial states for 10⁷ key groups — 16 GB of spill
  * at sf10 vs this plan's fixed-width count states; 43.1 s → 9.2 s.)
  */
class NgramPlanSpec extends graft.SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("ngram jaccard final plan: two map-side scans, one df join") {
    val df = graft.SparkEntry.queries("dedup_ngram_jaccard")(spark, dir)
    df.collect()
    val full = df.queryExecution.executedPlan.toString
    assert(full.contains("isFinalPlan=true"), full.take(500))
    val fin = full.split("== Initial Plan ==")(0)
    def cnt(re: String): Int = re.r.findAllIn(fin).size
    assert(cnt("Scan parquet") == 2,
      s"expected the posting subtree twice (df count + probe):\n$fin")
    assert(cnt("Join") == 1,
      s"exactly the df annotation join — no pair/size join-backs:\n$fin")
  }
}
