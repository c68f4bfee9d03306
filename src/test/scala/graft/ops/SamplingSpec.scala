package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("split membership is stable across runs and partitionings") {
    val d = spark.read.parquet(s"$dir/documents.parquet")
    val a = Sampling.split(d, "doc_id")
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = Sampling.split(d.repartition(13), "doc_id")
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a === b)
  }

  test("mixing keeps exactly the sub-rate buckets, stable under repartition") {
    val d = spark.read.parquet(s"$dir/documents.parquet")
    val rates = Sampling.MixPct.toMap
    val rows = Sampling.mixAssign(d, "doc_id")
      .select("doc_id", "lang", "bucket", "rate", "kept").collect()
    assert(rows.forall { r =>
      r.getLong(3) == rates.getOrElse(r.getString(1), Sampling.DefaultMixPct).toLong
    }, "rate column must follow the configured per-lang table")
    assert(rows.forall(r => r.getBoolean(4) == (r.getLong(2) < r.getLong(3))),
      "kept iff bucket < rate — no other criterion")
    val again = Sampling.mixAssign(d.repartition(7), "doc_id")
      .filter(col("kept")).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(again === rows.filter(_.getBoolean(4)).map(_.getLong(0)).toSet,
      "mix membership must be partitioning-independent")
    // unlisted langs keep everything
    val unlisted = rows.filter(r => !rates.contains(r.getString(1)))
    assert(unlisted.nonEmpty && unlisted.forall(_.getBoolean(4)))
  }

  test("mix fate is independent of split fate (salted key)") {
    // an unsalted mix bucket would make kept (bucket < rate) a strict
    // subset of train (bucket < 90), emptying val/test for downsampled
    // langs; with the salt, ~10 % of the ~160 kept en/es docs at sf0.01
    // land outside train (P[none] ≈ 0.9^160 ≈ 5e-8 — not flaky)
    val d = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val mixed = Sampling.MixPct.map(_._1)
    val kept = Sampling.mixAssign(d, "doc_id")
      .filter(col("kept") && col("lang").isin(mixed: _*))
      .select("doc_id")
    val splits = Sampling.split(d, "doc_id")
      .select(col("doc_id"), col("split"))
    val outsideTrain = kept.join(splits, "doc_id")
      .filter(col("split") =!= "train").count()
    assert(outsideTrain > 0,
      "downsampling must not silently empty the val/test splits")
  }

  test("split proportions are near 90/5/5 and partition the corpus") {
    val d = spark.read.parquet(s"$dir/documents.parquet")
    val n = d.count().toDouble
    val sizes = Sampling.split(d, "doc_id")
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sizes.values.sum.toDouble === n)
    assert(math.abs(sizes("train") / n - 0.90) < 0.05, sizes.toString)
    assert(sizes.contains("val") && sizes.contains("test"), sizes.toString)
  }

  test("stratified carve: exactly k per stratum, stable under repartitioning") {
    val d = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val got = Sampling.stratified(d, "doc_id", "lang", k = 7)
      .select("lang", "doc_id", "rank").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    val perLang = got.groupBy(_._1).view.mapValues(_.length).toMap
    assert(perLang.values.forall(_ === 7), perLang.toString)
    // membership is a pure function of the key — any partitioning of
    // the same input must carve the identical sample
    val again = Sampling.stratified(d.repartition(7), "doc_id", "lang", k = 7)
      .select("lang", "doc_id", "rank").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    assert(got.toSet === again.toSet)
    // carve fate is salted — the sample must not be the first k doc_ids
    val firstIds = d.select("lang", "doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.take(7).toSet).toMap
    assert(got.groupBy(_._1).exists { case (l, rows) =>
      rows.map(_._2).toSet != firstIds(l)
    }, "salted hash ranking degenerated to doc_id order")
    // the rank shuffle is WindowGroupLimit-bounded (top-k, not a full sort)
    val plan = Sampling.stratified(d, "doc_id", "lang")
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan.take(1500))
  }

  test("budget plan: integer targets, epoch cap binds on a skewed corpus") {
    val s = spark; import s.implicits._
    // 'big': 10 docs × 90 tokens = 900; 'tiny': 1 doc × 10 tokens
    // total 910 → budget 455 → target 227 per lang
    // tiny: planned = min(227, 10·4) = 40, deficit 187, repeat 4.0
    // big:  planned = 227, deficit 0, repeat 227/900
    val docs =
      (1 to 10).map(i =>
        (i.toLong, (1 to 90).map(j => s"b${i}w$j").mkString(" "), "big")) :+
        (99L, (1 to 10).map(j => s"t$j").mkString(" "), "tiny")
    val plan = Sampling.budgetPlan(docs.toDF("doc_id", "text", "lang"))
      .collect().map(r => r.getString(0) -> r).toMap
    val big = plan("big"); val tiny = plan("tiny")
    assert((big.getLong(1), big.getLong(2), big.getLong(3), big.getLong(4))
      === ((900L, 227L, 227L, 0L)))
    assert(big.getDouble(5) === 227.0 / 900.0)
    assert((tiny.getLong(1), tiny.getLong(2), tiny.getLong(3), tiny.getLong(4))
      === ((10L, 227L, 40L, 187L)))
    assert(tiny.getDouble(5) === Sampling.MaxEpochs.toDouble,
      "the epoch cap must bound the repeat factor")
  }

  test("kfold: stable, in-range, and independent of the split fate") {
    val d = spark.read.parquet(s"$dir/documents.parquet")
    val a = Sampling.kfold(d, "doc_id").select("doc_id", "fold").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a.values.forall(f => f >= 0 && f < Sampling.KFolds))
    assert(a.values.toSet.size > 1, "folds must actually spread")
    val b = Sampling.kfold(d.repartition(9), "doc_id")
      .select("doc_id", "fold").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a === b, "fold membership must be partitioning-independent")
    // salted: fold must not be a function of the split bucket
    val buckets = Sampling.split(d, "doc_id").select("doc_id", "bucket")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val byBucket = a.groupBy { case (id, _) => buckets(id) % 5 }
    assert(byBucket.exists { case (bm, folds) =>
      folds.values.toSet.size > 1
    }, "fold degenerated to a function of the split bucket")
  }

  test("budget plan: a zero-token lang reports 0.0 repeat, full deficit — not NaN") {
    val s = spark; import s.implicits._
    // "   " passes the length(text) > 0 admission but tokenizes empty
    val docs = Seq(
      (1L, (1 to 40).map(j => s"w$j").mkString(" "), "real"),
      (2L, "   ", "ghost"))
    val plan = Sampling.budgetPlan(docs.toDF("doc_id", "text", "lang"))
      .collect().map(r => r.getString(0) -> r).toMap
    val g = plan("ghost")
    assert(g.getLong(1) === 0L, "avail")
    assert(g.getLong(3) === 0L, "planned")
    assert(g.getLong(4) === g.getLong(2), "deficit = full target")
    assert(g.getDouble(5) === 0.0, "repeat_factor must be 0.0, not NaN")
    assert(!plan.values.exists(r => r.getDouble(5).isNaN))
  }

  test("budget plan on the fixture: per-lang rows, caps respected") {
    val d = spark.read.parquet(s"$dir/documents.parquet")
    val rows = Sampling.budgetPlan(d).collect()
    val nLangs = d.filter(col("text").isNotNull)
      .select("lang").distinct().count()
    assert(rows.length.toLong === nLangs)
    for (r <- rows) {
      assert(r.getDouble(5) <= Sampling.MaxEpochs.toDouble + 1e-12)
      assert(r.getLong(4) === r.getLong(2) - r.getLong(3), "deficit identity")
      assert(r.getLong(3) <= r.getLong(2), "planned never exceeds target")
    }
  }

  test("temperature plan: smallest source keeps all, targets are geometric means") {
    val s = spark; import s.implicits._
    // sources of size 4, 16, 64: targets 4, 8, 16 (√(n·4)); rates 1, .5, .25
    val d = ((1 to 4).map(i => (i.toLong, "s_small")) ++
      (1 to 16).map(i => (100L + i, "s_mid")) ++
      (1 to 64).map(i => (1000L + i, "s_big"))).toDF("doc_id", "source")
    val plan = Sampling.temperaturePlan(d)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(3), r.getDouble(4)))).toMap
    assert(plan("s_small") === ((4L, 4.0, 1.0)))
    assert(plan("s_mid") === ((16L, 8.0, 0.5)))
    assert(plan("s_big") === ((64L, 16.0, 0.25)))
    // apply: every smallest-source doc is kept; keep decisions are a
    // pure function of the salted key, so two runs agree exactly
    val a1 = Sampling.temperatureApply(d, "doc_id").collect()
      .map(r => r.getLong(0) -> r.getBoolean(4)).toMap
    val a2 = Sampling.temperatureApply(d, "doc_id").collect()
      .map(r => r.getLong(0) -> r.getBoolean(4)).toMap
    assert(a1 === a2)
    assert((1 to 4).forall(i => a1(i.toLong)), "smallest source keeps 100%")
    // flattening direction: the big source keeps FEWER than the mid
    // source in expectation; with these sizes the hash realization must
    // land well under 64 and above 0
    val keptBig = (1 to 64).count(i => a1(1000L + i))
    assert(keptBig > 0 && keptBig < 40, s"keptBig=$keptBig")
  }

  test("packing is a contiguous token stream per shard") {
    val d = spark.read.parquet(s"$dir/documents.parquet")
    val rows = Sampling.packPlan(d)
      .select("doc_id", "shard", "n_tokens", "pack_id", "pack_offset", "n_spans")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    val B = Sampling.PackBudget
    rows.groupBy(_._2).foreach { case (shard, docs) =>
      val ordered = docs.sortBy(_._1)
      // replay the stream: each doc starts where the previous ended
      var cum = 0L
      ordered.foreach { case (id, _, n, packId, off, spans) =>
        assert(packId === cum / B, s"doc $id in shard $shard: pack_id")
        assert(off === cum % B, s"doc $id: pack_offset")
        assert(off >= 0 && off < B)
        assert(spans === (off + math.max(n, 1L) - 1) / B + 1, s"doc $id: n_spans")
        cum += n
      }
    }
    // spans semantics: a doc fits its pack iff it spans exactly one
    rows.filter(_._3 > 0).foreach { case (id, _, n, _, off, spans) =>
      assert((spans == 1L) === (off + n <= B), s"doc $id")
    }
  }

  test("pack assignment is stable under repartition and matches stats") {
    val d = spark.read.parquet(s"$dir/documents.parquet")
    val a = Sampling.packPlan(d).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(3), r.getLong(4)))).toMap
    val b = Sampling.packPlan(d.repartition(13)).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(3), r.getLong(4)))).toMap
    assert(a === b, "packing must be partitioning-independent")
    // stats agree with a recount over the plan rows
    val plan = Sampling.packPlan(d).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(5)))
    val stats = Sampling.packStats(d).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap
    plan.groupBy(_._1).foreach { case (shard, docs) =>
      // n_packs counts every touched window: max over (pack_id + n_spans)
      val (nDocs, tok, nPacks, straddlers) =
        (docs.length.toLong, docs.map(_._2).sum, docs.map(d => d._3 + d._4).max,
          docs.count(_._4 > 1).toLong)
      val s = stats(shard)
      assert(s === ((nDocs, tok, nPacks, straddlers,
        tok - (nPacks - 1) * Sampling.PackBudget)), s"shard $shard")
      assert(tok - (nPacks - 1) * Sampling.PackBudget >= 0 &&
        tok - (nPacks - 1) * Sampling.PackBudget <= Sampling.PackBudget,
        s"shard $shard: last pack fill outside [0, budget]")
    }
  }

  test("packStats counts the trailing packs a straddling last doc spans") {
    // one shard's stream: 100 + 5000 tokens; the 5000-token doc starts
    // in pack 0 (offset 100) and spills through packs 1 and 2, so the
    // stream touches ceil(5100/2048) = 3 packs even though max(pack_id)
    // is 0 — the max(pack_id)+1 formula would claim 1 pack and a
    // 3052-token "last pack"
    val docs = spark.createDataFrame(Seq(
      (1L, ("x " * 100).trim), (2L, ("y " * 5000).trim)))
      .toDF("doc_id", "text")
    val stats = Sampling.packStats(docs, shards = 1L).collect()
    assert(stats.length === 1)
    val r = stats.head
    assert(r.getLong(1) === 2L, "n_docs")
    assert(r.getLong(2) === 5100L, "shard_tokens")
    assert(r.getLong(3) === 3L, s"n_packs: got ${r.getLong(3)}")
    assert(r.getLong(4) === 1L, "n_straddlers")
    assert(r.getLong(5) === 5100L - 2L * Sampling.PackBudget,
      "last_pack_tokens")
    assert(r.getLong(5) >= 0 && r.getLong(5) <= Sampling.PackBudget)
  }

  test("shard count is an epoch constant: changing it reassigns docs") {
    val d = spark.read.parquet(s"$dir/documents.parquet")
    val at64 = Sampling.packPlan(d, shards = 64L).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(3), r.getLong(4)))).toMap
    val at8 = Sampling.packPlan(d, shards = 8L).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(3), r.getLong(4)))).toMap
    assert(at64.keySet === at8.keySet)
    // the hash fans out over a different modulus: most docs move shard,
    // and the per-stream contract still holds at EVERY shard count —
    // replay the 8-shard streams
    val moved = at64.count { case (id, a) => at8(id) != a }
    assert(moved > at64.size / 2,
      s"expected a shard-count change to reassign most docs, moved=$moved/${at64.size}")
    val B = Sampling.PackBudget
    val rows8 = Sampling.packPlan(d, shards = 8L)
      .select("doc_id", "shard", "n_tokens", "pack_id", "pack_offset")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows8.map(_._2).distinct.forall(s => s >= 0 && s < 8))
    rows8.groupBy(_._2).foreach { case (shard, docs) =>
      var cum = 0L
      docs.sortBy(_._1).foreach { case (id, _, n, packId, off) =>
        assert(packId === cum / B, s"doc $id in shard $shard")
        assert(off === cum % B, s"doc $id")
        cum += n
      }
    }
  }

  test("packStats adds no exchange beyond the window's shard partitioning") {
    val d = spark.read.parquet(s"$dir/documents.parquet")
    val plan = Sampling.packStats(d).queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges === 1,
      s"expected the single shard window exchange, got $exchanges:\n$plan")
    // the scan must be pruned to the two columns the contract reads
    val read = "ReadSchema: struct<([^>]*)>".r.findFirstMatchIn(plan)
      .map(_.group(1)).getOrElse(sys.error(s"no ReadSchema in:\n$plan"))
    assert(read.contains("doc_id") && read.contains("text") &&
      !read.contains("lang") && !read.contains("source"),
      s"scan not pruned to (doc_id, text): $read")
  }
}
