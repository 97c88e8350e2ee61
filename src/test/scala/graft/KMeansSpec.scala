package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.KMeans

/** Deterministic Lloyd's trainer over the embeddings table. */
class KMeansSpec extends AnyFunSuite {
  import TestSpark.{sf0001, spark}

  private lazy val emb = Tables.embeddings(spark, sf0001)

  test("inertia decreases monotonically over Lloyd iterations") {
    val inertias = (0 to 3).map(i =>
      KMeans.fit(emb, "embedding", "vec_id", k = 8, iters = i, dim = 64).inertia)
    // iters=0 leaves init centroids (inertia MaxValue placeholder skipped).
    val trained = inertias.drop(1)
    assert(trained.zip(trained.tail).forall { case (a, b) => b <= a + 1e-9 },
      s"inertia not monotone: $trained")
  }

  test("training is deterministic and assignments cover all rows") {
    val m1 = KMeans.fit(emb, "embedding", "vec_id", k = 8, iters = 3, dim = 64)
    val m2 = KMeans.fit(emb, "embedding", "vec_id", k = 8, iters = 3, dim = 64)
    assert(m1.inertia == m2.inertia)
    m1.centroids.zip(m2.centroids).foreach { case ((i1, c1), (i2, c2)) =>
      assert(i1 == i2 && c1.sameElements(c2))
    }
    val assigned = KMeans.transform(emb, "embedding", m1)
    assert(assigned.filter(col("cell").isNull).count() == 0)
    assert(assigned.count() == emb.count())
    val cells = assigned.select("cell").distinct().count()
    assert(cells > 1 && cells <= 8)
  }

  test("frozen IvfCentroids.kmeans16 matches a fresh sf0.01 fit to its 4-decimal rounding") {
    assertFrozenMatchesFresh(16, graft.queries.IvfCentroids.kmeans16)
  }

  test("frozen elbow models (k = 2, 4, 8) each match a fresh sf0.01 fit") {
    assertFrozenMatchesFresh(2, graft.queries.IvfCentroids.kmeans2)
    assertFrozenMatchesFresh(4, graft.queries.IvfCentroids.kmeans4)
    assertFrozenMatchesFresh(8, graft.queries.IvfCentroids.kmeans8)
  }

  private def assertFrozenMatchesFresh(k: Int, frozen: Seq[(Int, Array[Double])]): Unit = {
    val fresh = KMeans.fit(Tables.embeddings(spark, "/root/testdata/sf0.01"),
      "embedding", "vec_id", k = k, iters = 5, dim = 64)
    assert(fresh.centroids.size == frozen.size)
    fresh.centroids.zip(frozen).foreach { case ((i1, c1), (i2, c2)) =>
      assert(i1 == i2)
      c1.zip(c2).foreach { case (a, b) =>
        // frozen values are round(a, 4); allow for the rounding plus
        // float-sum jitter across partition merge orders.
        assert(math.abs(a - b) <= 5.1e-5, s"k=$k cid $i1: $a vs frozen $b")
      }
    }
  }

  test("every frozen model reproduces through TrainIvf's committed freeze (drift test)") {
    // r16 verdict #6: four frozen quantizers now exist as literals; a
    // future regeneration must not silently diverge from the lattice the
    // oracles were built against. Two checks per model, via the ONE
    // freeze definition the trainer itself prints literals through
    // (TrainIvf.freeze — shared, so a rounding-convention change in the
    // trainer trips here):
    // (1) idempotence — every committed literal is already ON the
    //     4-decimal freeze lattice (freeze(frozen) == frozen exactly);
    //     a regenerated file produced under a different scale or
    //     rounding mode cannot silently satisfy this;
    // (2) regeneration — freeze(fresh fit) lands on the committed value
    //     or its immediate lattice neighbour at every element (fresh
    //     coordinates carry up to ~1e-4 of rounding + partition-merge
    //     jitter, which spans at most one 1e-4 lattice step — a real
    //     trainer/seed/corpus drift moves coordinates by much more).
    import graft.tools.TrainIvf.freeze
    val models = Seq(
      2 -> graft.queries.IvfCentroids.kmeans2,
      4 -> graft.queries.IvfCentroids.kmeans4,
      8 -> graft.queries.IvfCentroids.kmeans8,
      16 -> graft.queries.IvfCentroids.kmeans16)
    for ((k, frozen) <- models) {
      frozen.foreach { case (cid, c) =>
        assert(freeze(c).sameElements(c),
          s"k=$k cid $cid: committed literal is off the freeze lattice")
      }
      val fresh = KMeans.fit(Tables.embeddings(spark, "/root/testdata/sf0.01"),
        "embedding", "vec_id", k = k, iters = 5, dim = 64)
      fresh.centroids.zip(frozen).foreach { case ((i1, a), (i2, b)) =>
        assert(i1 == i2)
        freeze(a).zip(b).foreach { case (fa, fb) =>
          assert(math.abs(fa - fb) <= 1.0000001e-4,
            s"k=$k cid $i1: regenerated literal $fa is not the committed " +
              s"$fb or its lattice neighbour")
        }
      }
    }
  }
}
