package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Writes docs/PLANS.md: the formatted physical plan of each headline
  * query plus the scale-relevant observations to look for in it. Run
  * after plan-affecting changes: `sbt "runMain graft.PlanDump"`.
  */
object PlanDump {

  private val Headliners = Seq(
    "rel_disjunctive_revenue" ->
      "The cross-table-OR showcase (TPC-H Q19 shape): Catalyst cannot factor an OR spanning both join sides, so each side carries its own explicit disjunctive hull — the part scan's PushedFilters shows the brand/size Or(...) tree and the lineitem scan the quantity envelope (RelationalSpec pins both) — and the exact three-branch predicate runs as the post-join residual. Without the hulls both scans read everything and the OR evaluates on the full join output.",
    "dedup_near_apply" ->
      "End-to-end near-dedup with DISTRIBUTED connected components, exact to FIXPOINT since r11: the cap-bounded verified pair table feeds min-label propagation rounds (neighbor min + pointer-doubling label-of-label hop, so convergence is O(log diameter)), each round's node-bounded label table materialized via eager localCheckpoint (or reliable checkpoint when a dir is given) with a changed-flag probe over the fresh blocks deciding convergence; no edge or label crosses the driver, the final label table enters one AQE-broadcast corpus left-join, and the label pass is shared with dedup_cluster_sizes through a per-fixture cache.",
    "chi2_top_terms" ->
      "One explode feeds the shared termCat exchange (ReusedExchange in the AQE final plan); category totals and N broadcast; WindowGroupLimit bounds the top-k shuffle.",
    "dedup_minhash_candidates" ->
      "Signature stage is ONE narrow map: the native graft_minhash kernel folds all 16 affine minima per doc straight off the token array (no shingle explode, no doc_id exchange — the column chain kept that shape and is spec-pinned bit-equal in both hash modes); the first shuffle in the whole query is the (band, sig) bucket aggregate, and pair expansion stays in-bucket with the oversized-bucket guard upstream.",
    "dedup_ngram_jaccard" ->
      "Linear single-consumer chain: ONE corpus scan, zero joins, by construction (NgramPlanSpec). Per-doc kept hash sets are built once (collect_set straight off the raw shingle multiset — no string-distinct exchange), only PPJoin prefixes re-enter the candidate index, and verification (array_intersect on the carried sets) runs inside the pair expansion — the candidate stream shrinks ~25x vs the exhaustive posting-pair expansion. Disclosed trade: the prefix-index shuffle carries each doc's set ~(1-t)*n times; for very large per-doc n, switch to indexing (doc_id, n, shk) and joining candidates back to the docsets table.",
    "sim_cosine_ann_lsh" ->
      "Bucket equi-join between the broadcast query batch and the corpus; dot products are the native graft_dot codegen expression.",
    "sim_cosine_ann_ivf" ->
      "Narrow-map cell assignment (16 broadcast centroid dots per row), nprobe=2 probe join touches only the probed cells' members.",
    "rel_top_orders" ->
      "Orders semi-reduced by the broadcast BUILDING-customer filter BEFORE the wide lineitem join; filter pushed to the customer scan.",
    "events_sessionize" ->
      "One shuffle on user_id; lag and running-sum windows share the partitioning; final aggregate reuses it.",
    "rel_range_join" ->
      "Time-banded self equi-join on (user, bucket): no nested-loop, exact predicate only on in-bucket candidates.",
    "dedup_decontaminate" ->
      "Eval-set shingle keys BROADCAST into a semi-join (the corpus never shuffles for the membership test); the small contaminated-id set then feeds a broadcast anti-join. Both joins degrade gracefully to shuffle joins if either side outgrows the broadcast threshold.",
    "dedup_decontaminate_bloom" ->
      "Same result as dedup_decontaminate behind a ~10 bits/key bloom sketch: the eval keys collapse into one binary literal (BloomFilterAggregate, collected at build), might_contain discards the clean corpus postings inside the codegen'd scan stage, and only the ~1% survivors reach the exact broadcast semi-join that removes false positives — the scale path for when the eval key set outgrows a comfortable broadcast hash set.",
    "rel_top_supplier" ->
      "Max-over-aggregate with ties: the per-supplier revenue exchange is planned ONCE — an explicit suppkey null-filter makes the aggregate subtree identical under both consumers, so the 1-row max branch reads a ReusedExchange instead of re-scanning the fact table; the argmax equality then joins against the broadcast max in exact DECIMAL.",
    "rel_big_orders" ->
      "HAVING-sum membership: lineitem collapses map-side to per-order quantity sums before its only exchange; the threshold filter cuts to ~1-2% of orders; TakeOrderedAndProject takes the top-100 BEFORE the customer attach, so the name join broadcasts exactly 100 rows rather than the full qualified set.",
    "rel_dominant_supplier" ->
      "Nested half-sum quantifier as a pure two-level aggregate: (part, year, supplier) collapses line volume map-side, (part, year) collapses cells — a window formulation would re-shuffle and re-sort the cell stream with no partial collapse, since a 2-key window partition is not satisfied by the 3-key aggregate partitioning. The dominant supplier is necessarily the cell argmax (x > sum-x), so max(struct) carries it through the second aggregate.",
    "events_attribution" ->
      "Horizon-banded view-purchase equi-join on (user, bucket): purchases probe two buckets, views carry one, so each qualifying pair matches exactly once — no post-join distinct, no theta-join.",
    "events_funnel" ->
      "Three chained conditional window-mins stack on ONE user_id exchange (same partitioning, no re-shuffle between stages); the stage histogram is a bounded final aggregate.",
    "events_retention" ->
      "Cohort day attaches via a window over the single user_id exchange — no self-join back to a first-seen aggregate; the (cohort, offset) matrix aggregate is bounded by days², independent of event volume.",
    "text_tfidf" ->
      "Linear chain, ONE corpus scan: tf is one (doc, term) shuffle; df attaches via a count window over term (a tf-join-df formulation planned the scan+tokenize+tf subtree twice - HOF lambdas defeat exchange reuse); N broadcasts (1-row cross); WindowGroupLimit bounds the per-doc top-k.",
    "sim_centroid_outliers" ->
      "Exact decimal-sum centroids (labels x Dim rows) broadcast into ONE narrow corpus pass; the per-label top-k is WindowGroupLimit-bounded. The decimal partial sums are mergeable map-side, so the centroid aggregate survives any cluster size.",
    "events_top_sessions" ->
      "The shared sessionize chain (one user_id exchange, stacked windows) feeds TakeOrderedAndProject: per-partition top-k heaps, k rows to the driver — no global sort.",
    "text_repetition" ->
      "ZERO shuffles, zero gram materialization: per-doc multiplicity stats computed by the codegen'd graft_gram_stats kernel straight off the token array (window-offset sort + token-wise compare — no concat_ws gram strings, whose HOF transform was the dominant cost once the shuffles were gone). The prior explode + (doc,n,gram) count + doc-keyed aggregates shuffled every gram occurrence twice — kept as repetitionByGroup, spec-pinned equal. 1.81 s → 0.84 s at sf0.1.",
    "text_pack" ->
      "Shard-local running sum: one exchange on source, integer `div` bin arithmetic, bounded (source, bin) final aggregate — never a global single-partition window.",
    "events_anomaly" ->
      "Dense type×hour grid (bounded: types × hours, independent of event volume) left-joins the one-shuffle hourly aggregate; per-type moments attach as WINDOW aggregates over event_type on the dense frame — a stats-groupBy joined back planned the whole grid+hourly subtree twice (explain-verified before the rewrite).",
    "dedup_minhash_est" ->
      "The per-doc feature table (sorted shingle-key set + 16 signature minima, both native kernels off the token array — one narrow map, no explode) is a LAZY localCheckpoint since r17: its three consumers (bucket chain + both verify join-back sides) read the one persisted copy, where the r16 repartition barrier was defeated by column pruning (different pruned exchange children → no exchange reuse → scan+kernels ran twice; plan went 6 scans/16 Exchanges → 0 re-scans/10). Candidate pairs still come from the shared in-bucket expansion; exact verification attaches both docs' sets by joining the checkpointed features, and the two-pointer sorted-intersect kernel replaces array_intersect.",
    "sim_semdedup" ->
      "Zero-shuffle cell assignment (16 literal centroid dots per row, same narrow map as IVF); ONE cell_id exchange carries both the count-window size guard and the per-cell collect_list, and pairs expand IN-ARRAY inside cap-admitted cells (the a×b self-join planned the assignment subtree four times — 1.75 → 0.92 s at sf0.1); the drop set re-attaches via a left join keyed on vec_id. At scale NumCells is the lever that keeps cells pair-expandable and the cell_id shuffle healthy.",
    "text_unigram_logprob" ->
      "ORDER-FREE fixed-point form (r16): vocab counts come from a vocabulary-sized aggregate, each term's log2 weight quantizes ONCE to q = floor(log2(cnt)·2^38 + 0.5), and the per-doc score is the exact integer Σ tf·q — commutative, so bit-identical under any partitioning/merge order with NO corpus sort and NO per-doc list materialization (the r15 window+array_sort(collect_list) canonical fold, the sf100 in-suite spill pair, is gone; UnigramPlanSpec asserts zero SortExec). tf attaches q via a hinted shuffled-hash join; the grand total stays a narrow scan-sum on a 1-row broadcast; the portable log2 is the native graft_log2 kernel, evaluated once per VOCAB TERM.",
    "text_filter_funnel" ->
      "One corpus scan computes the shared quality features map-side; the first-failing-stage CASE collapses into a 4-group aggregate; the dense stage grid left-joins it (broadcast, 4 rows) and the share window runs over the grid, never the corpus.",
    "rel_small_qty_revenue" ->
      "Correlated subquery (qty < 0.2x the part's avg) decorrelated into sum/count windows over ONE l_partkey exchange - lineitem is scanned once where the textbook aggregate+join-back scans and shuffles it twice (RelationalSpec pins the one-scan shape); the predicate stays in exact integer-valued DECIMAL (5*qty*cnt < sum), and the part join is unhinted so AQE broadcasts at fixture scale / shuffles on the already-partitioned key at full scale.")

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .withExtensions(new graft.functions.GraftExtensions)
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")

    val sb = new StringBuilder
    sb ++= "# Physical plans of the headline queries\n\n"
    sb ++= s"Generated by `graft.PlanDump` against `$dir`.\n"
    sb ++= "Regenerate with `sbt \"runMain graft.PlanDump\"` after plan-affecting changes.\n"
    sb ++=
      """
        |## Eager-at-build registry entries
        |
        |The registry contract is lazy-at-build: constructing a query's
        |DataFrame (what `explain` does) schedules no Spark job beyond the
        |parquet footer read every `spark.read.parquet` performs. The
        |entries below are deliberate exceptions — each runs a BOUNDED
        |collect at build time, so `explain`/`queries(name)(...)` on them
        |executes Spark work. Three of them (`dedup_near_apply`,
        |`dedup_cluster_sizes`, `chi2_streaming_replay`) are MEMOIZED per
        |fixture dir: eager on the first build, zero jobs on every later
        |build of the same fixture. RegistrySpec listener-counts
        |build-time jobs and fails if this table drifts in either
        |direction.
        |
        || Entry | What it collects at build | Bound |
        ||---|---|---|
        || `dedup_bucket_stats` | the 3-row cap-audit summary (result re-entered as a local frame so no state survives the return) | 3 rows |
        || `chi2_streaming_replay` | nothing collected — the maintainer replay (NumReplayBatches mergeBatch rounds) WRITES the versioned count store (vocabulary-sized, KBs) ONCE per fixture dir behind a completion marker; later builds read the existing store | ≤ 2 vocabulary-sized snapshots |
        || `dedup_near_apply` | NOTHING to the driver — the FIXPOINT label-propagation rounds run as Spark jobs on first build per fixture (`nearDupLabels`: edges + each round's node-bounded label table materialized via `localCheckpoint`/reliable `checkpoint`, convergence decided by a changed-flag probe over the fresh blocks); the final labels enter one corpus left-join lazily, and the label table is cached per (app, dir) | O(log diameter)+1 distributed jobs on first build; labels ≤ 2·pairs nodes |
        || `dedup_cluster_sizes` | the SAME cached label pass (zero extra chain work after near_apply, or vice versa); the histogram is two bounded aggregates on executors | same |
        || `dedup_source_overlap` | the (src_a, src_b) presence/co-presence counts off ONE corpus scan (shk-keyed collect_set + in-array pair expansion — a distinct+self-join formulation planned the corpus subtree four times); the dense grid + Jaccard assemble on the driver | ≤ sources² rows |
        || `dedup_decontaminate_bloom` | the bloom sketch over the eval side's distinct shingle keys, re-entered as a foldable literal predicate on the corpus scan (false positives removed by the exact semi-join, so the result is hash-identical to `dedup_decontaminate`) | DecontamBloomKeys·10 bits ≈ 1.3 MB |
        || `sim_ann_recall` | the exact top-k side input both ANN variants are scored against | NumQueries·TopK = 50 rows |
        || `sim_cosine_ann_ivf` | the `vec_id < TrainN` training sample for driver-side Lloyd (centroids re-enter the plan as literals) | ≤256 rows × 64 doubles |
        || `sim_cosine_ann_pq` | the same IVF training sample, feeding BOTH the coarse quantizer and the 8 per-subspace PQ codebooks (all re-enter as literals) | ≤256 rows × 64 doubles |
        || `sim_semdedup` | the same IVF training sample (cell assignment embeds the trained centroids as literals) | ≤256 rows × 64 doubles |
        || `sim_bucket_stats` | the same IVF training sample, for the `ivf_cell` cap-audit row's cell assignment | ≤256 rows × 64 doubles |
        || `rel_salted_join` | the key-skew audit frame (one row per candidate join column) whose hottest flagged column becomes the salted join key | 2 rows |
|| `dedup_substring` | NOTHING to the driver — the df-capped candidate-pair table and the semi-join-pruned positional postings are lazy-localCheckpointed (r16: three resp. two consumers each re-planned the gram-seq corpus subtree — 38 Exchanges → the documented two corpus scans), and under AQE wrapping a plan in a checkpoint RDD materializes its stages at build | pairs ≤ Σ df²/2 per capped anchor bucket; postings = candidate docs only |
        |
        |(`sim_ann_recall` composes `ivfTopK`, so it also performs the IVF
        |sample collect; its own bound is the 50-row exact result.)
        |
        |Through r9, `dedup_near_apply` / `dedup_cluster_sizes` COLLECTED
        |the verified pair stream and propagated labels on the driver —
        |a driver bottleneck growing with corpus size. Since r10 the
        |propagation is distributed; since r11 it iterates to FIXPOINT
        |(exact components on any graph — the r10 fixed 4-round budget
        |silently split components deeper than 4) with a pointer-doubling
        |hop keeping rounds at O(log diameter), and the two queries share
        |ONE label pass per fixture. They still use the pre-distinct pair
        |stream — label propagation is duplicate-insensitive (a repeated
        |edge never moves a min), so the distinct exchange stays skipped.
        |
        |## Rows-only registry entries
        |
        |None (as of r10). Every registered query is fully oracle-hashed.
        |Through r9 `text_vocab_sketch` was the one exception (its raw
        |HLL++ estimate is engine-specific); its registered projection
        |now emits `approx_ok = rel_err <= 5·rsd` instead, which DuckDB
        |predicts as TRUE from the exact counts — an out-of-tolerance
        |estimate hash-mismatches the row. The full-detail frame (raw
        |estimate + realized rel_err) remains as `Analysis.vocabSketch`,
        |bound-checked in AnalysisSpec. RegistrySpec's allowlist is empty.
        |""".stripMargin
    for ((name, note) <- Headliners) {
      val df = SparkEntry.queries(name)(spark, dir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      sb ++= s"\n## $name\n\n$note\n\n```\n$plan```\n"
    }
    Files.createDirectories(Paths.get("docs"))
    Files.writeString(Paths.get("docs/PLANS.md"), sb.toString)
    println(s"wrote docs/PLANS.md (${Headliners.size} plans)")
    spark.stop()
  }
}
