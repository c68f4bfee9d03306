package graft.dedup

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property pin for [[Dedup.sourceOverlap]]: on random multi-source
  * corpora with planted cross-source copies, the one-scan collect_set +
  * in-array pair-expansion formulation must equal a brute-force
  * reference computed on the driver from per-source hashed 5-gram SETS
  * (the same md5-prefix key construction — `Md5Prefix64.hash64 >>> 4`,
  * the key64 identity Md5Prefix64Spec pins). What this spec adds over
  * the fixture gate: dense grids with zero-overlap pairs, sources whose
  * docs are all-short (no 5-grams), and full-copy sources.
  */
class OverlapPropertySpec extends graft.SparkSpec {

  private val vocab = Vector("alpha", "beta", "gamma", "delta", "eps",
    "zeta", "eta", "theta", "iota", "kappa")

  /** (doc_id, text, source): 2–4 sources, each doc 3–12 tokens; some
    * docs copied into another source (planted overlap), some too short
    * to shingle at n=5.
    */
  private val corpusGen: Gen[Seq[(Long, String, String)]] = for {
    nSrc <- Gen.choose(2, 4)
    nDoc <- Gen.choose(4, 10)
    docs <- Gen.listOfN(nDoc, for {
      len <- Gen.choose(3, 12)
      toks <- Gen.listOfN(len, Gen.oneOf(vocab))
      src <- Gen.choose(0, nSrc - 1)
      copyTo <- Gen.option(Gen.choose(0, nSrc - 1))
    } yield (toks.mkString(" "), src, copyTo))
  } yield {
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, Int)]
    docs.foreach { case (t, src, copyTo) =>
      out += ((t, src)); copyTo.foreach(c => out += ((t, c)))
    }
    out.toSeq.zipWithIndex.map { case ((t, src), i) =>
      (i.toLong, t, s"s$src")
    }
  }

  private def corpora(count: Int): Seq[Seq[(Long, String, String)]] = {
    val params = Gen.Parameters.default
    Iterator.iterate(Seed(37L))(_.next)
      .flatMap(s => corpusGen.apply(params, s))
      .take(count).toSeq
  }

  private def key64(s: String): Long =
    graft.functions.Md5Prefix64.hash64(
      org.apache.spark.unsafe.types.UTF8String.fromString(s)) >>> 4

  test("sourceOverlap equals the brute-force per-source set reference") {
    val s = spark; import s.implicits._
    var sawOverlap = false; var sawZero = false
    for (corpus <- corpora(6)) {
      val df = corpus.toDF("doc_id", "text", "source")
      val got = Dedup.sourceOverlap(df).collect()
        .map(r => (r.getString(0), r.getString(1)) ->
          ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))))
        .toMap
      // reference: per-source distinct hashed 5-gram sets, driver-side
      val sets = corpus.groupBy(_._3).view.mapValues { ds =>
        ds.flatMap { case (_, t, _) =>
          val toks = t.toLowerCase.split("\\s+").filter(_.nonEmpty)
          if (toks.length < Dedup.DecontamShingle) Seq.empty
          else toks.sliding(Dedup.DecontamShingle).map(_.mkString(" ")).toSeq
        }.map(key64).toSet
      }.toMap
      val srcs = sets.keys.toSeq.sorted
      val want = (for {
        i <- srcs.indices; j <- i + 1 until srcs.length
        a = srcs(i); b = srcs(j)
        ka = sets(a).size.toLong; kb = sets(b).size.toLong
        sh = (sets(a) intersect sets(b)).size.toLong
      } yield (a, b) ->
        ((ka, kb, sh, sh.toDouble / (ka + kb - sh).toDouble))).toMap
      // the operator's grid is built from sources OBSERVED in the count
      // rows — a source with zero shingle-able docs has no presence row,
      // so drop empty-set sources from the reference too
      val wantNonEmpty = want.filter { case ((a, b), _) =>
        sets(a).nonEmpty && sets(b).nonEmpty }
      assert(got === wantNonEmpty,
        s"diverged on corpus:\n${corpus.mkString("\n")}")
      sawOverlap ||= wantNonEmpty.values.exists(_._3 > 0)
      sawZero ||= wantNonEmpty.values.exists(_._3 == 0L)
    }
    assert(sawOverlap, "generator must plant at least one overlapping pair")
    assert(sawZero, "generator must produce at least one zero-overlap pair")
  }
}
