package graft

import org.scalatest.funsuite.AnyFunSuite

/** The DSIR weight arithmetic (PipelineCatalog.dsirWeights/dsirScore):
  * hand-computed integer weights on a two-bucket histogram, the sign
  * convention (target-enriched positive, target-depleted negative), and
  * monotonicity in the target count at fixed totals — the properties
  * that make the TV-style surrogate an order-preserving stand-in for
  * the log-ratio it replaces.
  */
class DsirSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._
  import graft.queries.PipelineCatalog

  private def weightsOf(rows: Seq[(Long, Long, Long)]): Map[Long, Long] =
    PipelineCatalog.dsirWeights(rows.toDF("b", "cr", "ct"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("hand-computed weights on a two-bucket histogram") {
    // r_tot=8, t_tot=4; B=1024 smoothing: T'=1028, R'=1032.
    // b0 (cr=3, ct=3): num = 4*1032 - 4*1028 = 16,   den = 8240 -> w = 19
    // b1 (cr=5, ct=1): num = 2*1032 - 6*1028 = -4104, den = 8232 -> w = -4985
    val w = weightsOf(Seq((0L, 3L, 3L), (1L, 5L, 1L)))
    assert(w == Map(0L -> 19L, 1L -> -4985L))
  }

  test("weights are monotone in the target count at fixed totals") {
    // Bucket 0 varies ct from 0..6 of its cr=6; bucket 1 compensates so
    // r_tot=20, t_tot=6 stay fixed. The surrogate must preserve the
    // log-ratio's ordering: more target mass in a bucket, higher weight.
    val ws = (0L to 6L).map { ct =>
      weightsOf(Seq((0L, 6L, ct), (1L, 14L, 6L - ct)))(0L)
    }
    assert(ws == ws.sorted, s"not monotone: $ws")
    assert(ws.head < 0 && ws.last > 0,
      s"sign convention broken at the extremes: $ws")
  }

  private val B = BigInt(1024)
  /** BigInt reference arithmetic + the max den the fixture produced. */
  private def bigWeights(rows: Seq[(Long, Long, Long)]): (Map[Long, BigInt], BigInt) = {
    val rtot = BigInt(rows.map(_._2).sum); val ttot = BigInt(rows.map(_._3).sum)
    var maxDen = BigInt(0)
    val ws = rows.map { case (b, cr, ct) =>
      val num = (BigInt(ct) + 1) * (rtot + B) - (BigInt(cr) + 1) * (ttot + B)
      val den = (BigInt(ct) + 1) * (rtot + B) + (BigInt(cr) + 1) * (ttot + B)
      maxDen = maxDen.max(den)
      b -> (num.signum * ((BigInt(10000) * num.abs) / den))
    }.toMap
    (ws, maxDen)
  }

  test("long path is BigInt-exact at the 2^63 envelope; past it the wide path takes over exactly") {
    // The r14 verdict's prose-only caveat turned into code, upgraded in
    // r16 from fail-loudly to degrade-exactly: right up to the long
    // boundary (den <= DsirLongSafeDen = 2^63/10^4, the largest den for
    // which 10^4*|num| fits a long) the codegen-primitive long path
    // must match BigInt arithmetic, and just PAST it the auto-selected
    // DECIMAL(38,0) wide path must produce the same BigInt-exact
    // weights — the over-boundary corpus that used to raise now
    // organically exercises the wide branch.
    val bound = PipelineCatalog.DsirLongSafeDen
    // Drive den to within 1e-6 of the envelope: cr = 37194469 with
    // ct = cr/3 gives den ~ (2/3)*cr^2 = 0.9999994*bound for the hot
    // bucket (asserted below so the fixture can't drift off the
    // boundary).
    val cr = 37194469L
    val near = Seq((0L, cr, cr / 3L), (1L, 7L, 2L))
    val (want, maxDen) = bigWeights(near)
    assert(maxDen <= BigInt(bound) && maxDen > BigInt(bound) * 99 / 100,
      s"fixture drifted off the envelope: den=$maxDen vs bound=$bound")
    assert(want.values.forall(w => w.isValidLong),
      "expected weights must themselves fit longs")
    assert(weightsOf(near) == want.map { case (k, v) => k -> v.toLong },
      "long path diverges from BigInt-exact arithmetic at the envelope")
    // Just past the boundary: the wide branch, same BigInt-exact result.
    val over = Seq((0L, cr + 300000L, (cr + 300000L) / 3L), (1L, 7L, 2L))
    val (wantOver, denOver) = bigWeights(over)
    assert(denOver > BigInt(bound) && denOver < PipelineCatalog.DsirDecSafeDen,
      s"wide fixture must sit between the boundaries: den=$denOver")
    assert(weightsOf(over) == wantOver.map { case (k, v) => k -> v.toLong },
      "wide path diverges from BigInt-exact arithmetic past the long envelope")
  }

  test("wide path spans petabyte-scale histograms and trips loudly past 10^33") {
    // Deep inside the wide region (den ~ 10^32, a ~10^16-gram corpus —
    // far past any long): still BigInt-exact.
    val crHuge = 12000000000000000L // 1.2e16 grams in one bucket -> den ~ 9.6e31
    val deep = Seq((0L, crHuge, crHuge / 3L), (1L, 7L, 2L))
    val (wantDeep, denDeep) = bigWeights(deep)
    assert(denDeep > BigInt(PipelineCatalog.DsirLongSafeDen) * 1000000L &&
      denDeep < PipelineCatalog.DsirDecSafeDen,
      s"fixture must sit deep in the wide region: den=$denDeep")
    assert(weightsOf(deep) == wantDeep.map { case (k, v) => k -> v.toLong },
      "wide path diverges from BigInt-exact arithmetic at petabyte scale")
    // Past DsirDecSafeDen = 10^33 (10^4*|num| would overflow
    // DECIMAL(38,0)): the final guard must name itself, never return a
    // rounded or overflowed quotient.
    val crOver = 1800000000000000000L // den ~ (2/3)*cr^2 ~ 2.2e36 > 10^33
    val past = Seq((0L, crOver, crOver / 3L), (1L, 7L, 2L))
    assert(bigWeights(past)._2 > PipelineCatalog.DsirDecSafeDen,
      "overflow fixture not past the decimal boundary")
    val ex = intercept[Throwable] { weightsOf(past) }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(ex).exists(_.contains("decimal-safe boundary")),
      s"guard did not trip with the documented message: ${messages(ex).mkString(" | ")}")
  }

  test("per-doc scoring composes cells with the weight table") {
    val w = weightsOf(Seq((0L, 3L, 3L), (1L, 5L, 1L)))
    val grams = Seq(("x", 0L), ("x", 0L), ("x", 1L))
      .toDF("doc_id", "b").withColumn("lang", org.apache.spark.sql.functions.lit("en"))
    val out = PipelineCatalog.dsirScore(grams,
        w.toSeq.toDF("b", "w"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // score = 2*19 + 1*(-4985) = -4947; per-gram = -4947/30000 -> -0.1649
    assert(out.toSeq == Seq(("x", 3L, -4947L, -0.1649)))
  }
}
