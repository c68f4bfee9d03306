package graft.stats

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Grouped top-k (SURVEY §2.7 T1): the reference heap-selects the 75
  * highest-χ² terms per category (/root/reference/chi_square.py:88–91,
  * nlargest; run_chi:158–159, sort+slice).
  *
  * Spark-first form: `row_number` over (partition by group, order by keys)
  * filtered to ≤ k. On Spark ≥ 3.5 the `InferWindowGroupLimit` rule
  * rewrites this into `WindowGroupLimitExec` — a per-partition top-k heap
  * inserted BEFORE the window shuffle (map-side) and again after, i.e.
  * exactly the reference's heap semantics but distributed: each input
  * partition forwards at most k rows per group into the shuffle, so at
  * 100 TB the window shuffle carries O(groups·k) rows, not the full
  * vocabulary. A spec asserts the rewrite actually fires on this plan
  * shape (TopKSpec).
  *
  * Tie-break canon (SURVEY D5): the reference's is nondeterministic; ours
  * is the full ordering (score desc, term asc) — mirrored in the oracle's
  * ROW_NUMBER so Spark and DuckDB always agree on rank.
  */
object TopK {

  /** Keep the top `k` rows per `group`, ranked by `order`. Adds `rank`. */
  def perGroup(df: DataFrame, group: Seq[Column], order: Seq[Column], k: Int): DataFrame = {
    val w = Window.partitionBy(group: _*).orderBy(order: _*)
    df.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }
}
