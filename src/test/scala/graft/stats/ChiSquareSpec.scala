package graft.stats

import graft.SparkSpec
import graft.pipeline.ChiSquarePipeline
import org.apache.spark.sql.functions._

/** Golden micro-corpus from FIXTURES.md §2 (hand-computed χ²) + the
  * contingency invariants SURVEY §5.2 calls for.
  */
class ChiSquareSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    ("apple banana", "X"),
    ("apple", "X"),
    ("banana", "Y"),
    ("cherry", "Y")).toDF("text", "cat")

  private lazy val table = ChiSquarePipeline
    .chi2Table(corpus, "text", "cat", stopwords = Seq.empty)
    .select("term", "category", "a", "b", "c", "d", "chi2")
    .as[(String, String, Long, Long, Long, Long, Double)]
    .collect()
    .map(r => (r._1, r._2) -> r).toMap

  test("golden contingency + χ² (FIXTURES.md §2 corpus, hand-recomputed)") {
    // NB: FIXTURES.md's hand table miscomputes cherry/Y (uses B+D=1; actually
    // B+D=2 ⇒ χ² = 4·(2−0)²/(1·2·2·3) = 4/3) and lists apple/Y although A=0
    // pairs are never emitted (chi_square.py:67). Values below are verified
    // by the in-memory oracle test and the DuckDB oracle at sf0.01.
    assert(table(("apple", "X"))  === ("apple", "X", 2L, 0L, 0L, 2L, 4.0))
    assert(table(("banana", "X")) === ("banana", "X", 1L, 1L, 1L, 1L, 0.0))
    assert(table(("banana", "Y")) === ("banana", "Y", 1L, 1L, 1L, 1L, 0.0))
    val cherryY = table(("cherry", "Y"))
    assert(cherryY._3 === 1L && cherryY._4 === 0L && cherryY._5 === 1L && cherryY._6 === 2L)
    assert(math.abs(cherryY._7 - 4.0 / 3.0) < 1e-12)
  }

  test("A=0 pairs are never emitted (chi_square.py:67 parity)") {
    assert(!table.contains(("cherry", "X")))
    assert(!table.contains(("apple", "Y")))
  }

  test("zero-denominator guard → χ² = 0 (chi_square.py:74–77)") {
    // single category: C = 0 and D = 0 ⇒ (B+D)(C+D) may be 0
    val one = Seq(("solo", "onlycat")).toDF("text", "cat")
    val got = ChiSquarePipeline.chi2Table(one, "text", "cat", stopwords = Seq.empty)
      .select("chi2").as[Double].collect()
    assert(got === Array(0.0))
  }

  test("invariants: A+B+C+D == N, all non-negative, 0 ≤ χ² ≤ N") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val t = ChiSquarePipeline.chi2Table(docs, "text", "lang")
    val bad = t.filter(
      col("a") + col("b") + col("c") + col("d") =!= col("n") ||
      col("a") < 0 || col("b") < 0 || col("c") < 0 || col("d") < 0 ||
      col("chi2") < 0 || col("chi2") > col("n").cast("double") ||
      col("a") > col("c_total") || col("a") > col("t_total"))
    assert(bad.count() === 0)
  }

  test("matches an in-memory oracle on the fixture corpus (SURVEY §5.2)") {
    // 20-line sequential re-implementation of multi_jobs_hdfs.py:101–140
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("text", "lang").as[(String, String)].collect()
      .filter { case (t, l) => t != null && t.nonEmpty && l != null && l.nonEmpty }
    val delim = graft.text.Tokenize.DelimRegex
    val stop = graft.text.Tokenize.DefaultStopwords.toSet
    val tokenized = docs.map { case (t, l) =>
      (l, t.toLowerCase.split(delim).filter(w =>
        w.length > 1 && w.length < 50 && !stop.contains(w)).toSet)
    }
    val n = tokenized.length.toDouble
    val catCount = tokenized.groupBy(_._1).map { case (k, v) => k -> v.length.toDouble }
    val termCat = tokenized.flatMap { case (c, ts) => ts.map(t => (t, c)) }
      .groupBy(identity).map { case (k, v) => k -> v.length.toDouble }
    val termTotal = termCat.groupBy(_._1._1).map { case (k, v) => k -> v.values.sum }
    val expected = termCat.map { case ((t, c), a) =>
      val b = termTotal(t) - a; val cc = catCount(c) - a; val d = n - a - b - cc
      val denom = (a + b) * (a + cc) * (b + d) * (cc + d)
      (t, c) -> (if (denom == 0) 0.0 else n * (a * d - b * cc) * (a * d - b * cc) / denom)
    }
    val got = ChiSquarePipeline
      .chi2Table(spark.read.parquet("/root/testdata/sf0.001/documents.parquet"), "text", "lang")
      .select("term", "category", "chi2").as[(String, String, Double)]
      .collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(got.keySet === expected.keySet)
    got.foreach { case (k, v) => assert(math.abs(v - expected(k)) < 1e-9, s"$k") }
  }
}
