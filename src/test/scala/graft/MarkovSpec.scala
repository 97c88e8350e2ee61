package graft

import org.scalatest.funsuite.AnyFunSuite

/** events_markov_stationary: the integer-lattice power iteration must
  * (a) emit a probability vector, (b) sit near the TRUE stationary
  * distribution of the empirical chain (computed here as a converged
  * double-precision iteration — the lattice's 12 truncating-division
  * steps at scale 10⁶ cost well under a percent), and (c) expose row
  * totals that recount the transition matrix.
  */
class MarkovSpec extends AnyFunSuite {
  import TestSpark.{sf0001, spark}

  test("stationary lattice tracks the converged double-precision chain") {
    val got = SparkEntry.queries("events_markov_stationary")(spark, sf0001)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.nonEmpty, "vacuous: no event types at sf0.001")
    val piSum = got.map(_._4).sum
    assert(math.abs(piSum - 1.0) < 1e-4, s"pi sums to $piSum")
    got.foreach { case (t, _, v, pi) =>
      assert(pi >= 0.0 && pi <= 1.0, s"$t: pi $pi out of range")
      assert(v >= 0L, s"$t: negative lattice value")
    }

    // Independent recount: transition matrix straight off the table,
    // converged double iteration (500 steps, no lattice).
    val trans = SparkEntry.queries("events_type_transitions")(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val types = trans.flatMap(c => Seq(c._1, c._2)).distinct.sorted
    assert(types.toSeq == got.map(_._1).toSeq, "type universe diverges")
    val idx = types.zipWithIndex.toMap
    val k = types.length
    val n = Array.ofDim[Double](k, k)
    trans.foreach { case (a, b, c) => n(idx(a))(idx(b)) = c.toDouble }
    val rowTot = n.map(_.sum)
    // n_out must recount the matrix row sums exactly.
    got.foreach { case (t, out, _, _) =>
      assert(out.toDouble == rowTot(idx(t)), s"$t: n_out $out != row sum")
    }
    var v = Array.fill(k)(1.0 / k)
    (1 to 500).foreach { _ =>
      val w = Array.tabulate(k)(j =>
        (0 until k).map(i =>
          if (rowTot(i) > 0) v(i) * n(i)(j) / rowTot(i) else 0.0).sum)
      val tot = w.sum
      if (tot > 0) v = w.map(_ / tot)
    }
    got.foreach { case (t, _, _, pi) =>
      assert(math.abs(pi - v(idx(t))) < 0.02,
        s"$t: lattice pi $pi vs converged ${v(idx(t))}")
    }
  }
}
