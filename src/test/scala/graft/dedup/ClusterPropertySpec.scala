package graft.dedup

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property-based invariants for the near-dup clustering: on ANY random
  * pair graph whose components have diameter ≤ ClusterRounds,
  * [[Dedup.propagateDriver]] labels every node with its component's
  * minimum — verified against an independent brute-force BFS reference.
  * Pure driver-side (no Spark session): the Spark/driver/oracle parity
  * is pinned separately in DedupSpec and the CORRECTNESS gate; this
  * spec pins that the shared round semantics actually compute connected
  * components on the graphs they claim to.
  */
class ClusterPropertySpec extends AnyFunSuite {

  /** Random edge list over a small node universe. Node count ≤ 10 keeps
    * random-graph diameters within ClusterRounds (= 4) once we filter;
    * graphs whose true diameter exceeds the round budget are SKIPPED —
    * the operator's documented convergence domain.
    */
  private val graphGen: Gen[List[(Long, Long)]] = for {
    n <- Gen.choose(2, 10)
    m <- Gen.choose(1, 12)
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
    for (edges <- graphs(200) if edges.nonEmpty) {
      val (want, diamBound) = bfsComponents(edges)
      if (diamBound <= Dedup.ClusterRounds) {
        val got = Dedup.propagateDriver(edges).toMap
        assert(got == want,
          s"edges=$edges\ngot=$got\nwant=$want")
        checked += 1
      }
    }
    assert(checked > 50, s"only $checked graphs within the round budget")
  }
}
