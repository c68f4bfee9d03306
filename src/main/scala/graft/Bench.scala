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
  *    cost at most rank, never the headline number.
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
      val times =
        try {
          (1 to iters).map { _ =>
            val t0 = System.nanoTime()
            fn(spark, sfDir).count()
            (System.nanoTime() - t0) / 1e9
          }.sorted
        } catch { case e: Throwable =>
          errors :+= (name -> String.valueOf(e.getMessage).take(200))
          Vector.empty[Double]
        }
      name -> (if (times.isEmpty) -1.0 else times(times.size / 2))
    }
    def q(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"")
      .map(c => if (c < ' ') ' ' else c) + "\""
    val qs = results.map { case (k, v) => s"${q(k)}:$v" }.mkString("{", ",", "}")
    val errJson = errors.map { case (k, v) => s"${q(k)}:${q(v)}" }.mkString("{", ",", "}")
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errJson,"sf":"$sfDir"}"""
    Files.writeString(Paths.get(outPath), line + "\n")
    Console.out.println(line)
    Console.out.flush()
    spark.stop()
  }
}
