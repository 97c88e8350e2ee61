package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.LinkPrediction

/** LinkPrediction.scores: hand-computed scores on a 4-cycle, and the hub
  * cap actually excluding high-degree through-nodes (the Σ deg² bound
  * that makes the operator viable at scale is part of the checked
  * semantics).
  */
class LinkPredictionSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("4-cycle: both diagonals scored, integer-exact RA/AA terms") {
    // Square 1-2-3-4-1: diagonals (1,3) and (2,4) each have cn=2 via
    // degree-2 through-nodes: ra = 2·(10^6 div 2), aa = 2·round(10^6/ln 2).
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L)).toDF("u", "v")
    val out = LinkPrediction.scores(edges)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).sortBy(t => (t._1, t._2)).toSeq
    val aaTerm = math.round(1000000.0 / math.log(2.0))
    assert(out == Seq(
      (1L, 3L, 2L, 1000000L, 2 * aaTerm),
      (2L, 4L, 2L, 1000000L, 2 * aaTerm)))
  }

  test("hub cap: wedges through an over-cap node are not enumerated") {
    // Star hub 100 with 5 leaves (deg 5) plus the 4-cycle (deg 2).
    // At hubCap=2 the hub is excluded as a through-node: its wedges are
    // never generated and only the cycle diagonals remain; at hubCap=5
    // the hub's wedges exist but die on the cn>=2 filter — capping
    // changed WORK, not results, on this graph.
    val star = (10L to 14L).map(l => (l, 100L))
    val edges = (Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L)) ++ star)
      .toDF("u", "v")
    val capped = LinkPrediction.scores(edges, hubCap = 2)
      .select("node_a", "node_b").collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(identity).toSeq
    assert(capped == Seq((1L, 3L), (2L, 4L)))
    val admitted = LinkPrediction.scores(edges, hubCap = 5)
      .select("node_a", "node_b").collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(identity).toSeq
    assert(admitted == capped)
  }

  test("random graphs: scores equal the brute-force definition (seeded, 8 graphs)") {
    // Guards the wedge/anti-join relational encoding against the direct
    // set definition: for every non-adjacent pair, common neighbors are
    // intersected explicitly and the three scores recomputed in plain
    // Scala with the same scaled-integer arithmetic.
    val rnd = new scala.util.Random(1013)
    for (trial <- 1 to 8) {
      val n = 6 + rnd.nextInt(9)
      val edges = (for {
        a <- 1L to n; b <- (a + 1) to n if rnd.nextDouble() < 0.35
      } yield (a, b)).toSeq
      if (edges.nonEmpty) {
        val hubCap = if (trial % 2 == 0) 3 else 64
        val minCommon = 1L + trial % 2
        val adj = scala.collection.mutable.Map.empty[Long, Set[Long]]
          .withDefaultValue(Set.empty)
        edges.foreach { case (a, b) =>
          adj(a) = adj(a) + b; adj(b) = adj(b) + a
        }
        val deg = adj.map { case (k, v) => k -> v.size.toLong }
        val want = (for {
          a <- adj.keys; b <- adj.keys if a < b && !adj(a).contains(b)
          common = (adj(a) intersect adj(b)).filter(z => deg(z) <= hubCap)
          if common.size >= minCommon
        } yield {
          val ra = common.toSeq.map(z => 1000000L / deg(z)).sum
          val aa = common.toSeq.map(z => math.round(1000000.0 / math.log(deg(z).toDouble))).sum
          (a, b) -> (common.size.toLong, ra, aa)
        }).toMap
        val got = LinkPrediction.scores(edges.toDF("u", "v"), hubCap, minCommon)
          .collect()
          .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3), r.getLong(4)))
          .toMap
        assert(got == want,
          s"trial $trial (n=$n cap=$hubCap min=$minCommon): $got != $want")
      }
    }
  }

  test("minCommon=1 admits single-wedge pairs; adjacency is never predicted") {
    // Path 1-2-3: one wedge (1,3) through 2; the edge (1,2) itself must
    // never appear as a prediction.
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("u", "v")
    val one = LinkPrediction.scores(edges, minCommon = 1L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(one == Seq((1L, 3L, 1L)))
    assert(LinkPrediction.scores(edges).count() == 0L)
  }
}
