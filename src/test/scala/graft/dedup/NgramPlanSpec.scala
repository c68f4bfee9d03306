package graft.dedup

/** Pins `dedup_ngram_jaccard`'s plan shape after the r12 redesigns:
  * corpus-scale streams carry SCALARS only (the prefix self-join that
  * enumerates PPJoin candidates moves (shk, doc_id) rows; per-doc key
  * arrays move once per CANDIDATE in the verify joins), verification
  * runs through the two-pointer graft_sorted_ix kernel, and NO
  * operator holds array-typed aggregation state keyed on a
  * corpus-scale key: the only array-building aggregate is the per-DOC
  * collect_list behind the key views (~|docs| groups), never per-KEY
  * buckets (~10⁷ groups at sf10 — the shape that spilled 6–16 GB in
  * every earlier iteration: collect_set index r11, collect_list
  * buckets + in-bucket kernel, ks-on-every-posting self-join, all
  * measured early r12). The plan's joins are exactly: the scalar
  * prefix self-join and the two candidate-sized verify join-backs
  * (the df annotation join runs ONCE inside the standing docsets
  * memo — `Dedup.docsetsFor`, r13 — so the query plan reads the
  * checkpointed table instead of re-planning that subtree).
  */
class NgramPlanSpec extends graft.SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("ngram jaccard final plan: scalar candidates, kernel verify, no per-key array state") {
    val df = graft.SparkEntry.queries("dedup_ngram_jaccard")(spark, dir)
    df.collect()
    val full = df.queryExecution.executedPlan.toString
    assert(full.contains("isFinalPlan=true"), full.take(500))
    val fin = full.split("== Initial Plan ==")(0)
    def cnt(re: String): Int = re.r.findAllIn(fin).size
    // per-doc view aggregates only — a per-key (shk-keyed) aggregate
    // with array state must never reappear
    assert(cnt("HashAggregate\\(keys=\\[shk[^\\]]*\\], functions=\\[(partial_)?collect") == 0,
      s"per-key array-state aggregate reappeared:\n$fin")
    // verification via the two-pointer kernel
    assert(fin.contains("graft_sorted_ix"),
      s"kernel verification (graft_sorted_ix) missing:\n$fin")
    // prefix self-join + two verify join-backs (df join inside the memo)
    assert(cnt("(BroadcastHash|SortMerge|ShuffledHash)Join") == 3,
      s"expected prefix self-join + 2 verify joins:\n$fin")
    // and the docsets subtree is NOT re-planned: no gram-keys kernel,
    // no df-count aggregate — the plan starts from the checkpointed memo
    assert(!fin.contains("graft_gram_keys"),
      s"docsets subtree re-planned (memo not used):\n$fin")
  }
}
