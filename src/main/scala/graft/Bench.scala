package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Driver-run benchmark: times every SparkEntry query at SPARK_GRAFT_SF_DIR.
  *
  * Handshake hardening (round-1 recorded "parsed": null because the metric
  * line was emitted inside sbt's [info]-prefixed stream):
  *  - the JSON line goes to stdout via the raw Console.out AND to a file
  *    (SPARK_GRAFT_BENCH_OUT, default /tmp/graft_bench.json) so the driver
  *    can read it even if stdout is log-prefixed;
  *  - a warmup pass (smallest fixture) runs first so the headline numbers
  *    measure the queries, not first-query JVM/codegen warmup;
  *  - per-query failures are NOT swallowed into fast wall-times: a failed
  *    query records -1 and lands in an "errors" map;
  *  - each query is timed SPARK_GRAFT_BENCH_ITERS times (default 3) and
  *    the MEDIAN is reported — round 2's single-shot timing turned one
  *    GC/JIT pause into a phantom 10× "regression" (chi2_scores 7.07 s vs
  *    its strict-subset sibling at 0.72 s); medians make a one-off pause
  *    cost at most rank, never the headline number;
  *  - ALL raw samples are emitted under "samples" (round 3's sustained
  *    4–6× window on three consecutive queries was undiagnosable from
  *    medians alone), and cross-query state is isolated: the cache is
  *    cleared and a GC is requested between queries, so one query's
  *    persisted/cached data or heap pressure can't tax its neighbors'
  *    samples.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "/tmp/graft_bench.json")
    val spark = SparkSession.builder()
      .withExtensions(new graft.functions.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Bench knob for the production-hash variant (default: oracle md5).
    sys.env.get("SPARK_GRAFT_PRODUCTION_HASH")
      .foreach(spark.conf.set(graft.functions.PortableHash.ConfKey, _))

    // Warmup: run everything once at the smallest scale so codegen,
    // classloading, and shuffle machinery are hot before timing.
    val warmDir = "/root/testdata/sf0.001"
    if (Files.exists(Paths.get(warmDir)))
      SparkEntry.queries.foreach { case (_, fn) =>
        try fn(spark, warmDir).count() catch { case _: Throwable => () }
      }

    val iters = sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "3").toInt.max(1)
    var errors = Vector.empty[(String, String)]
    val results = SparkEntry.queries.toSeq.map { case (name, fn) =>
      // Isolation barrier: drop anything a previous query cached/persisted
      // and invite a GC so residual heap pressure from a heavy neighbor
      // is paid here, between timers, not inside the next sample window.
      spark.catalog.clearCache()
      System.gc()
      val times =
        try {
          (1 to iters).map { _ =>
            val t0 = System.nanoTime()
            fn(spark, sfDir).count()
            (System.nanoTime() - t0) / 1e9
          }
        } catch { case e: Throwable =>
          errors :+= (name -> String.valueOf(e.getMessage).take(200))
          Vector.empty[Double]
        }
      (name, times)
    }
    def q(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"")
      .map(c => if (c < ' ') ' ' else c) + "\""
    def median(ts: Seq[Double]): Double =
      if (ts.isEmpty) -1.0 else ts.sorted.apply(ts.size / 2)
    val qs = results.map { case (k, ts) => s"${q(k)}:${median(ts)}" }
      .mkString("{", ",", "}")
    val samples = results.map { case (k, ts) =>
      s"${q(k)}:${ts.map(t => f"$t%.4f").mkString("[", ",", "]")}"
    }.mkString("{", ",", "}")
    val errJson = errors.map { case (k, v) => s"${q(k)}:${q(v)}" }.mkString("{", ",", "}")
    val total = results.collect { case (_, ts) if ts.nonEmpty => median(ts) }.sum
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"samples":$samples,"errors":$errJson,"sf":"$sfDir"}"""
    Files.writeString(Paths.get(outPath), line + "\n")
    Console.out.println(line)
    Console.out.flush()
    spark.stop()
  }
}
