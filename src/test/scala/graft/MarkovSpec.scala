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

  test("generative: the lattice trajectory tracks the double trajectory on random chains") {
    // Property of the SHARED stationaryLattice (no mixing assumption):
    // at the SAME step count, lattice truncation is the only error
    // source — bounded by ~k/MarkovScale per step, so the normalized
    // vectors agree to ~1e-4 for ANY matrix, including zero rows
    // (substochastic states) and disconnected blocks.
    val rnd = new scala.util.Random(181818L)
    (1 to 25).foreach { trial =>
      val k = 2 + rnd.nextInt(5)
      val nMat = Array.fill(k, k)(
        if (rnd.nextInt(4) == 0) 0L else rnd.nextInt(1000).toLong)
      if (rnd.nextBoolean()) nMat(rnd.nextInt(k)) = Array.fill(k)(0L) // a dead row
      val v = graft.queries.OlapCatalog.stationaryLattice(nMat)
      val vTot = v.map(BigDecimal(_)).sum
      assert(vTot > 0, s"trial $trial: lattice collapsed to zero")
      val rowTot = nMat.map(_.sum)
      var d = Array.fill(k)(1.0)
      (1 to graft.queries.OlapCatalog.MarkovIters).foreach { _ =>
        val w = Array.tabulate(k)(j =>
          (0 until k).map(i =>
            if (rowTot(i) > 0) d(i) * nMat(i)(j) / rowTot(i) else 0.0).sum)
        val tot = w.sum
        if (tot > 0) d = w.map(_ / tot)
      }
      val dTot = d.sum
      (0 until k).foreach { i =>
        val lat = (BigDecimal(v(i)) / vTot).toDouble
        val dbl = if (dTot > 0) d(i) / dTot else 1.0 / k
        assert(math.abs(lat - dbl) < 1e-4,
          s"trial $trial dim $i: lattice $lat vs double $dbl (k=$k)")
      }
    }
  }
}
