package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pins the two properties `sim_cosine_ann_ivf` is built on (cited from
  * Similarity.scala's scaladocs):
  *
  *  1. **Training parity**: the driver-side Lloyd refinement
  *     ([[Similarity.lloydDriver]]) over the one collected ≤TrainN
  *     sample is BIT-identical to the independent Spark training chain
  *     ([[Similarity.trainedCentroids]]) — the executable documentation
  *     of what the DuckDB oracle's Lloyd CTEs compute. A drift here
  *     would silently change cell assignments while the plan still
  *     "looks right".
  *  2. **Plan shape**: full-corpus cell assignment is a narrow
  *     projection — the executed plan contains exactly ONE Window (the
  *     final per-query top-k), no extra shuffle, one corpus scan plus
  *     one pushdown-filtered query-batch scan, and a broadcast (never
  *     sort-merge) probe join. r4's regression — a per-vector
  *     row_number window over the whole corpus, with the subtree
  *     executed twice — would re-appear as a second Window/Exchange and
  *     fail here.
  */
class IvfPlanSpec extends graft.SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** Same prepared view ivfTopK builds internally: element-wise double
    * cast + self dot-product norm.
    */
  private def prepared: DataFrame =
    spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
      .withColumn("nrm", Similarity.dot(col("v"), col("v")))

  private def bits(d: Double): Long = java.lang.Double.doubleToRawLongBits(d)

  test("driver Lloyd ≡ Spark training chain, bit-for-bit") {
    val c = prepared
    val driver = Similarity.lloydDriver(Similarity.collectSample(c))
    val chain = Similarity.trainedCentroids(c).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1), r.getDouble(2)))
      .sortBy(_._1).toSeq
    assert(chain.map(_._1) == driver.map(_._1), "cell ids differ")
    chain.zip(driver).foreach { case ((id, cv, cn), (_, dcv, dcn)) =>
      assert(cv.map(bits) == dcv.map(bits), s"centroid $id vector differs")
      assert(bits(cn) == bits(dcn), s"centroid $id norm differs")
    }
  }

  test("ivf executed plan: one window, one probe broadcast join, no corpus shuffle") {
    val df = graft.SparkEntry.queries("sim_cosine_ann_ivf")(spark, dir)
    df.collect()
    // AQE toString prints "== Final Plan ==" then "== Initial Plan ==";
    // assert on the final section only (ReusedExchange etc. differ).
    val fin = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    def cnt(re: String): Int = re.r.findAllIn(fin).size
    // exactly one Window: the per-query top-k. Cell ASSIGNMENT must not
    // contribute one (it is element_at(array_sort(...), 1) per row).
    assert(cnt("Window \\[") == 1, s"expected 1 Window node:\n$fin")
    // the only shuffles are the top-k window's hash partitioning and
    // the final ORDER BY's range partitioning — assignment is shuffle-free
    assert(cnt("Exchange hashpartitioning") == 1, s"corpus-side shuffle appeared:\n$fin")
    assert(cnt("Exchange rangepartitioning") == 1, s"unexpected range shuffle count:\n$fin")
    // one corpus scan (assign side) + one pushdown-filtered query scan
    assert(cnt("Scan parquet") == 2, s"expected exactly 2 parquet scans:\n$fin")
    // probe join broadcasts the exploded query cells; a sort-merge or
    // nested-loop here would be a scale regression
    assert(cnt("BroadcastHashJoin") == 1 && cnt("SortMergeJoin") == 0 &&
      cnt("BroadcastNestedLoopJoin") == 0, s"probe join shape changed:\n$fin")
    // and the pushdown actually reaches the query-side scan
    assert(fin.contains("PushedFilters: [IsNotNull(vec_id), LessThan(vec_id,"),
      s"query-batch filter not pushed to scan:\n$fin")
  }

  test("pq codes: native kernel ≡ unrolled Column twin ≡ driver argmin") {
    val c = prepared
    val cb = Similarity.pqTrainDriver(Similarity.collectSample(c))
    val got = c
      .withColumn("codes", Similarity.pqCodesCol(cb, col("v")))
      .withColumn("codes2", Similarity.pqCodesColUnrolled(cb, col("v")))
      .filter(col("vec_id") < 50)
      .select("vec_id", "v", "codes", "codes2").collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val v = r.getSeq[Double](1).toArray
      val codes = r.getSeq[Int](2)
      // kernel and unrolled Column form must agree code-for-code
      assert(codes == r.getSeq[Int](3), s"vec ${r.getLong(0)}: kernel != unrolled")
      for (m <- 0 until Similarity.PqM) {
        val d = Similarity.PqSubDim
        val sub = v.slice(m * d, (m + 1) * d)
        def dotD(a: Array[Double], b: Array[Double]) =
          a.zip(b).map { case (x, y) => x * y }.sum
        val exp = cb(m).zipWithIndex.minBy { case ((id, cv, cn), _) =>
          (cn - 2.0 * dotD(sub, cv.toArray), id)
        }._2 + 1
        assert(codes(m) == exp,
          s"vec ${r.getLong(0)} subspace $m: got ${codes(m)}, want $exp")
      }
    }
    // dimension-mismatch vectors yield NULL codes, never truncation
    val bad = spark.sql("SELECT array(CAST(1.0 AS DOUBLE), 2.0) AS v")
      .withColumn("codes", Similarity.pqCodesCol(cb, col("v")))
      .select("codes").collect().head
    assert(bad.isNullAt(0))
  }

  test("pq executed plan: same narrow shape as ivf — one window, broadcast probe, no corpus shuffle") {
    val df = graft.SparkEntry.queries("sim_cosine_ann_pq")(spark, dir)
    df.collect()
    val fin = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    def cnt(re: String): Int = re.r.findAllIn(fin).size
    assert(cnt("Window \\[") == 1, s"expected 1 Window node:\n$fin")
    assert(cnt("Exchange hashpartitioning") == 1, s"corpus-side shuffle appeared:\n$fin")
    assert(cnt("Scan parquet") == 2, s"expected exactly 2 parquet scans:\n$fin")
    assert(cnt("BroadcastHashJoin") == 1 && cnt("SortMergeJoin") == 0 &&
      cnt("BroadcastNestedLoopJoin") == 0, s"probe join shape changed:\n$fin")
  }
}
