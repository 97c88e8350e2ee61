package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.PageRank

/** Fixed-point PageRank: structural ordering, symmetry, mass
  * conservation (up to floor loss), and partition-count determinism.
  */
class PageRankSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private val Scale = 1000000000000L

  test("star graph: the hub out-ranks the leaves; leaves tie exactly") {
    val edges = (1L to 6L).map(i => (0L, i)).toDF("doc_a", "doc_b")
    val r = PageRank.ranks(edges, iterations = 10, scale = Scale)
      .as[(Long, Long)].collect().toMap
    assert(r.keySet == (0L to 6L).toSet)
    val leaves = (1L to 6L).map(r)
    assert(leaves.distinct.size == 1, s"leaves diverge: $leaves")
    assert(r(0L) > leaves.head * 3, s"hub ${r(0L)} not dominant over ${leaves.head}")
    val mass = r.values.sum
    assert(mass <= Scale && mass > (Scale * 9) / 10, s"mass $mass out of range")
  }

  test("identical result for any input partitioning (integer ops are order-free)") {
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L), (5L, 6L))
    val a = PageRank.ranks(pairs.toDF("doc_a", "doc_b").repartition(1), 10, Scale)
      .as[(Long, Long)].collect().toMap
    val b = PageRank.ranks(pairs.toDF("doc_a", "doc_b").repartition(13), 10, Scale)
      .as[(Long, Long)].collect().toMap
    assert(a == b)
    // Driver endgame ≡ distributed fixpoint, bit-for-bit: every step is
    // order-free integer floor arithmetic, so the sub-threshold local
    // power iteration (default route for this graph) must equal the
    // pinned distributed loop exactly — the contract that lets the
    // endgame sit silently under every catalog consumer.
    val dist = PageRank.ranks(pairs.toDF("doc_a", "doc_b"), 10, Scale,
        localFinishEdges = 0L)
      .as[(Long, Long)].collect().toMap
    assert(a == dist, "driver endgame diverged from the distributed fixpoint")
    // Within the 4-node component, degree-3 nodes (1, 3) out-rank
    // degree-2 (2, 4); the isolated 2-cycle holds its symmetric fixed
    // point (≈ scale/6 each — an isolated component keeps its mass).
    assert(a(1L) == a(3L) && a(2L) == a(4L) && a(5L) == a(6L))
    assert(a(1L) > a(2L))
  }

  test("no resident cache leaks after the iteration loop") {
    // Shared-session discipline (same as ConnectedComponentsSpec): start
    // from a clean cache so leftovers from other suites cannot be
    // misattributed to PageRank.
    spark.sharedState.cacheManager.clearCache()
    val edges = (1L to 20L).map(i => (i, i % 10 + 21L)).toDF("doc_a", "doc_b")
    // Pin the DISTRIBUTED loop — the driver endgame (default route for a
    // graph this small) allocates nothing cacheable, so it would pass
    // vacuously.
    PageRank.ranks(edges, iterations = 7, scale = Scale, localFinishEdges = 0L)
      .collect()
    assert(spark.sharedState.cacheManager.isEmpty,
      "PageRank left frames cached after returning")
  }
}
