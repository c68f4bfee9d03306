package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway measurement harness for r16 sub-chain timing. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .withExtensions(new graft.functions.GraftExtensions)
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(name: String)(f: => Unit): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        f
        println(f"SCRATCH $name iter=$i ${(System.nanoTime() - t0) / 1e9}%7.3f s")
      }
    }
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("text").isNotNull && length(col("text")) > 0)
    def toks = filter(split(lower(col("text")), "\\s+"), x => length(x) > 0)
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    t("scan_only") { noop(d.select("doc_id")) }
    t("tokenize") { noop(d.select(col("doc_id"), toks.as("toks"))) }
    t("explode") { noop(d.select(col("lang"), explode(toks).as("t"))) }
    t("grp_count") {
      noop(d.select(col("lang"), explode(toks).as("t"))
        .groupBy("lang").agg(count(lit(1))))
    }
    t("grp_cd") {
      noop(d.select(col("lang"), explode(toks).as("t"))
        .groupBy("lang").agg(count(lit(1)), count_distinct(col("t"))))
    }
    t("grp_cd_hll") {
      noop(d.select(col("lang"), explode(toks).as("t"))
        .groupBy("lang").agg(count(lit(1)), count_distinct(col("t")),
          approx_count_distinct(col("t"), 0.02)))
    }
    spark.stop()
  }
}
