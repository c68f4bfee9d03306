package graft.dedup

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property pin for the PPJoin prefix-filtered n-gram Jaccard: on random
  * corpora with planted near-dups, [[Dedup.ngramJaccard]] must equal an
  * independent brute-force all-pairs reference computed on the driver
  * from the same hashed shingle sets. The hash itself is oracle-pinned
  * by the CORRECTNESS gate; what this spec pins is that prefix
  * filtering LOSES NOTHING (the lossless claim in the scaladoc) and
  * that ix/(na+nb−ix) matches the reference pair-for-pair,
  * bit-for-bit — on corpora the fixture never explores.
  */
class NgramPropertySpec extends graft.SparkSpec {

  private val vocab = Vector("alpha", "beta", "gamma", "delta", "eps",
    "zeta", "eta", "theta")

  /** Corpus of fresh docs, exact copies, and last-token mutations (a
    * 12+-token doc with its last token changed scores 9/11 ≈ 0.82 — above
    * the 0.8 threshold — so planted near-dup pairs actually occur).
    */
  private val corpusGen: Gen[Seq[(Long, String)]] = for {
    nBase <- Gen.choose(3, 6)
    bases <- Gen.listOfN(nBase, for {
      len <- Gen.choose(12, 20)
      toks <- Gen.listOfN(len, Gen.oneOf(vocab))
    } yield toks)
    variants <- Gen.listOfN(nBase, Gen.choose(0, 2))
  } yield {
    val docs = scala.collection.mutable.ArrayBuffer.empty[List[String]]
    bases.zip(variants).foreach { case (toks, v) =>
      docs += toks
      if (v >= 1) docs += toks // exact copy
      if (v >= 2) docs += toks.init :+ "omega" // last-token mutation
    }
    docs.toSeq.zipWithIndex.map { case (t, i) => (i.toLong, t.mkString(" ")) }
  }

  private def corpora(count: Int): Seq[Seq[(Long, String)]] = {
    val params = Gen.Parameters.default
    Iterator.iterate(Seed(11L))(_.next)
      .flatMap(s => corpusGen.apply(params, s))
      .take(count).toSeq
  }

  test("prefix-filtered pairs equal the brute-force all-pairs reference") {
    val s = spark; import s.implicits._
    import org.apache.spark.sql.functions._
    var sawPairs = false
    for (corpus <- corpora(6)) {
      val df = corpus.toDF("doc_id", "text")
      // per-doc kept hash sets, derived exactly as the operator defines
      // them (distinct AFTER hashing, df-capped) but aggregated on the
      // driver — the reference shares the hash, not the pair chain
      val posts = Dedup.shingles(df)
        .select(col("doc_id"),
          graft.functions.PortableHash.key64(col("s"), production = false).as("k"))
        .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
      val dfCount = posts.groupBy(_._2).view.mapValues(_.map(_._1).toSet.size)
      val kept = posts.filter { case (_, k) => dfCount(k) <= Dedup.MaxShingleDf }
      val sets = kept.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val ids = sets.keys.toSeq.sorted
      val want = (for {
        i <- ids.indices; j <- i + 1 until ids.length
        a = ids(i); b = ids(j)
        ix = (sets(a) intersect sets(b)).size
        jac = ix.toDouble / (sets(a).size + sets(b).size - ix).toDouble
        if jac >= Dedup.JaccardThreshold
      } yield (a, b, jac)).toSet
      val got = Dedup.ngramJaccard(df)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got === want,
        s"prefix filtering diverged from brute force on corpus:\n" +
          corpus.map { case (i, t) => s"  $i: $t" }.mkString("\n"))
      sawPairs ||= want.nonEmpty
    }
    assert(sawPairs, "generator must plant at least one above-threshold pair")
  }
}
