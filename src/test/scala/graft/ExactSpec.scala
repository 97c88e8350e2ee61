package graft

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Exact

/** Exact (decimal-routed) float aggregation: partition-order independence —
  * the property the whole oracle-hash strategy rests on.
  */
class ExactSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  // Values chosen so naive double summation is order-sensitive.
  private val xs: Seq[Double] = (1 to 2000).map(i => (i % 7) * 1e10 + 0.0001 * (i % 13))

  test("dsum is identical under different partitionings") {
    val sums = Seq(1, 3, 7, 16).map { p =>
      xs.toDF("x").repartition(p).agg(Exact.dsum(col("x")).as("s")).as[Double].head()
    }
    assert(sums.distinct.size == 1, s"dsum varied across partitionings: $sums")
    // And equals the BigDecimal ground truth.
    val want = xs.map(x => BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble
    assert(sums.head == want)
  }

  test("davg equals exact-sum / count") {
    val got = xs.toDF("x").repartition(5).agg(Exact.davg(col("x")).as("a")).as[Double].head()
    val want = xs.map(x => BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble / xs.size
    assert(got == want)
  }
}
