package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // args: sfDir outDir [only] — `only` is an optional comma-list of
    // query names, used by the sf≥10 oracle runs where dumping all 121
    // queries (and oracling them in DuckDB) is wall-clock-prohibitive;
    // the driver's own gate passes no third arg and runs everything.
    val sfDir = args(0)
    val outDir = args(1)
    val only = args.lift(2)
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .withExtensions(new graft.functions.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Production-hash dump mode (r13, verdict ask #4): the xxhash64
    // mode a real cluster would run. The DuckDB oracle mirrors md5
    // only, so dumps made in this mode are compared Spark-vs-Spark
    // against an md5-mode dump (tools/prod_hash_check.py): the
    // hash-independent majority must be bit-identical, the documented
    // hash-dependent set is invariant-checked instead.
    sys.env.get("SPARK_GRAFT_PRODUCTION_HASH").foreach(v =>
      spark.conf.set(graft.functions.PortableHash.ConfKey,
        (v.trim.toLowerCase(java.util.Locale.ROOT) match {
          case "1" | "true" | "yes" | "on" => true
          case "0" | "false" | "no" | "off" => false
          case other => throw new IllegalArgumentException(
            s"SPARK_GRAFT_PRODUCTION_HASH must be a boolean, got: '$other'")
        }).toString))
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries.filter { case (n, _) => only.forall(_(n)) }
      .foreach { case (name, fn) =>
        // Scoped conf overrides (wide-agg reduce partitions ∝ data):
        // a no-op at gate SFs (the floor binds), load-bearing for the
        // sf≥10 scale-correctness runs. Exact-typed queries only, so
        // results are partition-count-invariant (spec-pinned).
        val overrides = SparkEntry.queryConfs(name, sfDir, cpus.toInt)
        val saved = overrides.keys.map(k => k -> spark.conf.getOption(k)).toMap
        overrides.foreach { case (k, v) => spark.conf.set(k, v) }
        try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        catch { case e: Throwable =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
        } finally saved.foreach {
          case (k, Some(v)) => spark.conf.set(k, v)
          case (k, None) => spark.conf.unset(k)
        }
      }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => only.forall(_(k)) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
