package graft.stats

import graft.SparkSpec
import graft.pipeline.ChiSquarePipeline
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based invariants over generated corpora (SURVEY §5.2):
  * ∀ corpus — contingency identities hold, χ² is bounded, and the
  * result is invariant under input-row permutation. Uses raw ScalaCheck
  * generators with a fixed seed (the scalatestplus bridge is not on the
  * offline classpath; deterministic seeds are preferable here anyway).
  */
class ChiSquarePropertySpec extends SparkSpec {

  private val word = Gen.oneOf("apple", "banana", "cherry", "durian", "elder", "fig")
  private val docGen = for {
    n <- Gen.choose(1, 6)
    ws <- Gen.listOfN(n, word)
    cat <- Gen.oneOf("A", "B", "C")
  } yield (ws.mkString(" "), cat)
  private val corpusGen = Gen.choose(4, 24).flatMap(n => Gen.listOfN(n, docGen))

  private def corpora(count: Int): Seq[List[(String, String)]] = {
    val params = Gen.Parameters.default
    Iterator.iterate(Seed(42L))(_.next)
      .map(s => corpusGen.pureApply(params, s))
      .take(count).toSeq
  }

  test("contingency identities and chi2 bounds hold for any corpus") {
    val s = spark; import s.implicits._
    for (corpus <- corpora(12)) {
      val df = corpus.toDF("text", "cat")
      val rows = ChiSquarePipeline.chi2Table(df, "text", "cat",
        stopwords = Seq.empty).collect()
      assert(rows.nonEmpty)
      val n = rows.head.getAs[Long]("n")
      for (r <- rows) {
        val (a, b, c, d) = (r.getAs[Long]("a"), r.getAs[Long]("b"),
          r.getAs[Long]("c"), r.getAs[Long]("d"))
        val chi2 = r.getAs[Double]("chi2")
        assert(a >= 1 && b >= 0 && c >= 0 && d >= 0, r.toString)
        assert(a + b + c + d === n, r.toString)
        assert(a <= r.getAs[Long]("c_total"), r.toString)
        assert(a + b === r.getAs[Long]("t_total"), r.toString)
        assert(chi2 >= 0.0 && chi2 <= n.toDouble, r.toString)
      }
    }
  }

  test("result is invariant under input permutation") {
    val s = spark; import s.implicits._
    def run(cs: Seq[(String, String)]) =
      ChiSquarePipeline.chi2Table(cs.toDF("text", "cat"), "text", "cat",
        stopwords = Seq.empty)
        .select("category", "term", "chi2").collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    for (corpus <- corpora(6))
      assert(run(corpus) === run(corpus.reverse))
  }
}
