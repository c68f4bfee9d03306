package graft.dedup

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property-based invariants for the near-dup clustering: on ANY random
  * pair graph — no diameter restriction since the r11 fixpoint loop —
  * [[Dedup.propagateDriver]] labels every node with its component's
  * minimum, verified against an independent brute-force BFS reference.
  * Pure driver-side (no Spark session): the Spark/driver/oracle parity
  * is pinned separately in DedupSpec and the CORRECTNESS gate; this
  * spec pins that the shared fixpoint semantics actually compute
  * connected components on arbitrary graphs.
  */
class ClusterPropertySpec extends AnyFunSuite {

  /** Random edge list over a small node universe. Sparse edge counts
    * relative to nodes produce long chains (diameter up to n-1), so the
    * generator covers well beyond the old 4-round budget — no graph is
    * skipped.
    */
  private val graphGen: Gen[List[(Long, Long)]] = for {
    n <- Gen.choose(2, 24)
    m <- Gen.choose(1, 26)
    edges <- Gen.listOfN(m, for {
      a <- Gen.choose(0L, n.toLong - 1)
      b <- Gen.choose(0L, n.toLong - 1) if a != b
    } yield (math.min(a, b), math.max(a, b)))
  } yield edges.distinct

  private def graphs(count: Int): Seq[List[(Long, Long)]] = {
    val params = Gen.Parameters.default
    Iterator.iterate(Seed(7L))(_.next)
      .flatMap(s => graphGen.apply(params, s))
      .take(count).toSeq
  }

  /** Reference components + eccentricity bound by plain BFS. */
  private def bfsComponents(
      edges: Seq[(Long, Long)]): (Map[Long, Long], Int) = {
    val adj = edges.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSet }
    val nodes = adj.keySet
    var comp = Map.empty[Long, Long]
    var maxDiameter = 0
    for (start <- nodes.toSeq.sorted if !comp.contains(start)) {
      // BFS collecting the whole component and its radius from `start`
      var frontier = Set(start)
      var seen = Set(start)
      var depth = 0
      while (frontier.nonEmpty) {
        val next = frontier.flatMap(adj).diff(seen)
        if (next.nonEmpty) depth += 1
        seen ++= next
        frontier = next
      }
      val m = seen.min
      comp ++= seen.map(_ -> m)
      // eccentricity from one node bounds diameter within factor 2; for
      // the skip-filter we need an upper bound, so use 2×radius
      maxDiameter = math.max(maxDiameter, 2 * depth)
    }
    (comp, maxDiameter)
  }

  test("propagateDriver labels every node with its component minimum") {
    var checked = 0
    var deepChecked = 0
    for (edges <- graphs(200) if edges.nonEmpty) {
      val (want, diamBound) = bfsComponents(edges)
      val got = Dedup.propagateDriver(edges).toMap
      assert(got == want, s"edges=$edges\ngot=$got\nwant=$want")
      checked += 1
      // diamBound is 2×radius, so > 8 guarantees true diameter can
      // exceed the old 4-round budget — count that the generator
      // actually reaches the territory r10's spec skipped
      if (diamBound > 8) deepChecked += 1
    }
    assert(checked > 150, s"only $checked graphs checked")
    assert(deepChecked > 5,
      s"only $deepChecked graphs beyond the old round budget — widen the generator")
  }

  test("deep chains and cycles converge to exact components (r11 fixpoint)") {
    // diameter-19 path: the old fixed 4-round propagation split this
    // into ceil(20/5) fragments; fixpoint must label all to 0
    val path = (0L until 20L).sliding(2).map(w => (w(0), w(1))).toList
    assert(Dedup.propagateDriver(path).toMap ===
      (0L until 20L).map(_ -> 0L).toMap)
    // 17-cycle (odd, diameter 8)
    val cycle = path.take(16) :+ ((16L, 0L))
    assert(Dedup.propagateDriver(cycle).toMap ===
      (0L until 17L).map(_ -> 0L).toMap)
    // two deep components must not merge: shifted copy of the path
    val two = path ++ path.map { case (a, b) => (a + 100L, b + 100L) }
    val got = Dedup.propagateDriver(two).toMap
    assert((0L until 20L).forall(got(_) == 0L))
    assert((100L until 120L).forall(got(_) == 100L))
  }
}
