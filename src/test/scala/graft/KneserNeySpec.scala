package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The Kneser–Ney probability arithmetic (TrainPrepCatalog.knP/knFrom):
  * both dispatch branches held against BigInt reference arithmetic —
  * the DsirSpec recipe applied to the KN ratio
  * p = (max(4·c_ab−3, 0)·ndd + 3·n1a·n1b) / (4·c_a·ndd), whose long
  * form would silently wrap past 2⁶³ in Spark while DuckDB raises
  * (the r16 advice asymmetry the DECIMAL(38,0) wide path removes).
  */
class KneserNeySpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._
  import graft.queries.TrainPrepCatalog

  /** Rows are (c_ab, c_a, n1a, n1b, ndd) — the five exact counts. */
  private def sparkP(rows: Seq[(Long, Long, Long, Long, Long)]): Seq[Double] =
    rows.toDF("c_ab", "c_a", "n1a", "n1b", "ndd")
      .select(TrainPrepCatalog.knP(col("c_ab"), col("c_a"), col("n1a"),
        col("n1b"), col("ndd")).as("p"))
      .collect().map(_.getDouble(0)).toSeq

  /** BigInt envelope: exact integer num/den, round-to-nearest doubles,
    * one IEEE division — the value EITHER branch must produce. */
  private def bigP(cab: Long, ca: Long, n1a: Long, n1b: Long, ndd: Long): Double = {
    val num = (BigInt(cab) * 4 - 3).max(BigInt(0)) * ndd + BigInt(3) * n1a * n1b
    val den = BigInt(4) * ca * ndd
    num.toDouble / den.toDouble
  }

  private def ulps(a: Double, b: Double): Long =
    math.abs(java.lang.Double.doubleToLongBits(a) -
      java.lang.Double.doubleToLongBits(b))

  test("long path is BigInt-exact up to the 2^63 envelope") {
    // Domain-valid grids (c_ab <= c_a, n1a <= min(c_a, ndd),
    // n1b <= ndd) from hand scale up to h = c_a*ndd hugging
    // KnLongSafeHalf — every row must match the BigInt envelope to the
    // BIT (same exact integers, same two casts, same one division).
    val bound = TrainPrepCatalog.KnLongSafeHalf
    val rows = Seq[(Long, Long, Long, Long, Long)](
      (1L, 1L, 1L, 1L, 1L),
      (5L, 12L, 3L, 2L, 40L),
      (999L, 5000L, 17L, 9L, 120000L),
      // h = (bound/3)*3 within 3 of the boundary, still fast
      (bound / 6L, bound / 3L, 3L, 2L, 3L),
      // ndd = 1 pins h = c_a right at the boundary value
      (bound / 2L, bound, 1L, 1L, 1L))
    rows.foreach { case r @ (cab, ca, n1a, n1b, ndd) =>
      assert(BigInt(ca) * BigInt(ndd) <= BigInt(bound),
        s"fixture $r drifted past the long envelope")
      val Seq(got) = sparkP(Seq(r))
      assert(got == bigP(cab, ca, n1a, n1b, ndd),
        s"long path diverges from BigInt arithmetic at $r")
    }
  }

  test("wide path is BigInt-exact past 2^63 and deep into fleet scale") {
    val longBound = TrainPrepCatalog.KnLongSafeHalf
    val rows = Seq[(Long, Long, Long, Long, Long)](
      // Just past the long boundary: h = c_a*ndd = 2*(bound/2+1) steps over
      (longBound / 3L, longBound / 2L + 1L, 2L, 2L, 2L),
      // A true past-2^63 denominator: den = 4*3e18*2 = 2.4e19 > Long.Max
      (2000000000000000000L, 3000000000000000000L, 2L, 1L, 2L),
      // Deep wide: h = 9e18 * 1e17 = 9e35, within 2.5e36
      (4000000000000000000L, 9000000000000000000L, 7L, 5L, 100000000000000000L))
    rows.foreach { case r @ (cab, ca, n1a, n1b, ndd) =>
      val h = BigInt(ca) * BigInt(ndd)
      assert(h > BigInt(longBound) && h <= TrainPrepCatalog.KnDecSafeHalf,
        s"fixture $r must sit in the wide window: h=$h")
      val Seq(got) = sparkP(Seq(r))
      val want = bigP(cab, ca, n1a, n1b, ndd)
      // The wide path reaches the division through Decimal->Double casts
      // (BigDecimal.doubleValue); the envelope through BigInteger
      // .doubleValue. Both are round-to-nearest of the same exact
      // integers, so the results must agree bit-for-bit — a 0-ulp
      // assert with the ulp distance in the failure message.
      assert(ulps(got, want) == 0L,
        s"wide path diverges from BigInt arithmetic at $r: $got vs $want " +
          s"(${ulps(got, want)} ulps)")
    }
  }

  test("past the decimal-safe boundary the guard trips loudly") {
    // h = 9e18 * 9e17 = 8.1e36 > KnDecSafeHalf = 2.5e36: a DECIMAL(38,0)
    // numerator intermediate could overflow, so the result expression
    // must raise with the documented message — never return a rounded
    // or overflowed quotient.
    val past = Seq((1000000000000000000L, 9000000000000000000L, 5L, 5L,
      900000000000000000L))
    assert(BigInt(past.head._2) * BigInt(past.head._5) >
      TrainPrepCatalog.KnDecSafeHalf, "fixture not past the decimal boundary")
    val ex = intercept[Throwable] { sparkP(past) }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(ex).exists(_.contains("decimal-safe boundary")),
      s"guard did not trip with the documented message: ${messages(ex).mkString(" | ")}")
  }

  test("a past-2^63 bigram table exercises the wide branch organically through knFrom") {
    // Two bigrams sharing the context "a" with near-Long counts:
    // c_a = 3e18, ndd = 2 -> den = 4*c_a*ndd = 2.4e19 > Long.MaxValue,
    // so the REAL report path (knFrom: stats joins + ranking + ROUND 6)
    // runs entirely on the wide branch. Expected values from the BigInt
    // envelope, rounded exactly as the entry rounds.
    val bg = Seq(("a", "b", 2000000000000000000L), ("a", "c", 1000000000000000000L))
      .toDF("x", "y", "c_ab")
    val got = TrainPrepCatalog.knFrom(bg)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSeq
    def r6(p: Double): Double =
      BigDecimal(p).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val want = Seq(
      ("a", "b", 2000000000000000000L,
        r6(bigP(2000000000000000000L, 3000000000000000000L, 2L, 1L, 2L))),
      ("a", "c", 1000000000000000000L,
        r6(bigP(1000000000000000000L, 3000000000000000000L, 2L, 1L, 2L))))
    assert(got == want, s"organic wide-branch report diverges: $got vs $want")
  }
}
