package graft

import org.scalacheck.{Gen, Prop, Properties}

import graft.combine.Aggregations._
import graft.combine.PreAggregateFunction

/** The algebraic invariant AdCom relies on (SURVEY §5, BASELINE.md streaming
  * parity): combine at ANY flush cadence, followed by the final aggregate,
  * equals the direct aggregate. Modeled exactly: inputs are split into
  * random bundles (≙ arbitrary combiner flush boundaries / partitions),
  * each bundle folds with addInput, bundles merge in a random-shaped tree —
  * result must equal folding everything directly.
  *
  * Double-valued aggregates use whole-number values so IEEE addition is
  * exact (the law is about the operator algebra, not float reassociation).
  */
object CombineLawsProps extends Properties("CombineLaws") {

  /** Direct: one bundle folds every input. */
  private def direct[K, V, IN, OUT](fn: PreAggregateFunction[K, V, IN, OUT], xs: List[IN]): Map[K, V] =
    xs.foldLeft(Map.empty[K, V]) { (m, in) =>
      val k = fn.key(in)
      m.updated(k, fn.addInput(m.get(k), in))
    }

  /** Bundled: split at random boundaries, fold each, merge pairwise. */
  private def bundled[K, V, IN, OUT](
      fn: PreAggregateFunction[K, V, IN, OUT], xs: List[IN], cuts: List[Int]): Map[K, V] = {
    val bundles = cuts.sorted.distinct.foldRight(List(xs)) { (c, acc) =>
      val (l, r) = acc.head.splitAt(math.min(c, acc.head.size))
      l :: r :: acc.tail
    }
    bundles.map(direct(fn, _)).foldLeft(Map.empty[K, V]) { (a, b) =>
      b.foldLeft(a) { case (m, (k, v)) =>
        m.updated(k, m.get(k).map(fn.merge(_, v)).getOrElse(v))
      }
    }
  }

  private def law[K, V, IN, OUT](
      fn: PreAggregateFunction[K, V, IN, OUT], gen: Gen[IN]): Prop =
    Prop.forAll(Gen.listOf(gen), Gen.listOf(Gen.choose(0, 200))) { (xs, cuts) =>
      val d = direct(fn, xs)
      val b = bundled(fn, xs, cuts)
      val out = d.map { case (k, v) => fn.collect(k, v) }.toSet
      val outB = b.map { case (k, v) => fn.collect(k, v) }.toSet
      d == b && out == outB
    }

  private val keyGen = Gen.choose(0L, 9L)
  private val cntGen = for (k <- keyGen; c <- Gen.choose(1L, 100L)) yield (k, c)
  private val dGen = for (k <- keyGen; v <- Gen.choose(0L, 1000000L)) yield (k, v.toDouble)
  private val d3Gen = for {
    k <- keyGen
    a <- Gen.choose(0L, 100000L); b <- Gen.choose(0L, 100000L); c <- Gen.choose(0L, 100000L)
  } yield (k, a.toDouble, b.toDouble, c.toDouble)
  private val topGen = for (k <- keyGen; v <- Gen.choose(0L, 500L); id <- Gen.choose(0L, 50L)) yield (k, v.toDouble, id)

  property("count: combine∘final ≡ direct") = law(new CountPreAgg[Long], cntGen)
  property("max: combine∘final ≡ direct") = law(new MaxPreAgg[Long], cntGen)
  property("avg: combine∘final ≡ direct") = law(new AvgPreAgg[Long], dGen)
  property("avg3: combine∘final ≡ direct") = law(new Avg3PreAgg[Long], d3Gen)
  property("topN: combine∘final ≡ direct") = law(new TopNPreAgg[Long](5), topGen)

  property("topN bundle is bounded and equals global sort.take(n)") =
    Prop.forAll(Gen.listOf(topGen), Gen.listOf(Gen.choose(0, 200))) { (xs, cuts) =>
      val fn = new TopNPreAgg[Long](5)
      val b = bundled(fn, xs, cuts)
      b.forall { case (k, top) =>
        val want = xs.collect { case (`k`, v, id) => (v, id) }
          .sortBy { case (v, id) => (-v, id) }.take(5)
        top.size <= 5 && top == want
      }
    }
}
