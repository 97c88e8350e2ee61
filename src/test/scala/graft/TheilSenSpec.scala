package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.PipelineCatalog

/** theilSenFrom: exact median on a hand-built series, and the breakdown
  * property that justifies the operator's existence — one wild day must
  * not move the slope (where OLS follows the outlier).
  */
class TheilSenSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("clean linear series: slope recovered exactly") {
    // v = 3 + 2*day over 10 days: every pairwise slope is exactly 2.
    val daily = (0L until 10L).map(d => ("t", d, 3.0 + 2.0 * d))
      .toDF("event_type", "day", "v")
    val out = PipelineCatalog.theilSenFrom(daily).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getLong(1) == 10L && r.getLong(2) == 45L)
    assert(r.getDouble(3) == 2.0)
  }

  test("one wild day: Theil-Sen holds the trend, OLS would not") {
    // Same v = 3 + 2*day, but day 5 spikes to 1000. Of the 45 pairwise
    // slopes only the 9 involving day 5 are corrupted; the median sits
    // in the clean mass and stays exactly 2. (The OLS slope over the
    // same series is ~8.5 — computed here to keep the comparison
    // honest, not assumed.)
    val daily = (0L until 10L)
      .map(d => ("t", d, if (d == 5) 1000.0 else 3.0 + 2.0 * d))
      .toDF("event_type", "day", "v")
    val out = PipelineCatalog.theilSenFrom(daily).collect().head
    assert(out.getDouble(3) == 2.0,
      s"Theil-Sen moved off the clean trend: ${out.getDouble(3)}")
    val pts = (0L until 10L)
      .map(d => (d.toDouble, if (d == 5) 1000.0 else 3.0 + 2.0 * d))
    val n = pts.size.toDouble
    val sx = pts.map(_._1).sum; val sy = pts.map(_._2).sum
    val sxy = pts.map(p => p._1 * p._2).sum; val sxx = pts.map(p => p._1 * p._1).sum
    val ols = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert(math.abs(ols - 2.0) > 5.0,
      s"test vacuous: OLS not materially corrupted by the outlier ($ols)")
  }

  test("even pair count: median is the middle-two average") {
    // 4 days -> 6 pairwise slopes; values chosen so the middle two
    // differ: days 0,1,2,3 with v = 0, 1, 3, 6 give slopes
    // {1,1.5,2,2,2.5,3} -> median (2+2)/2 = 2.
    val daily = Seq(("t", 0L, 0.0), ("t", 1L, 1.0), ("t", 2L, 3.0), ("t", 3L, 6.0))
      .toDF("event_type", "day", "v")
    val out = PipelineCatalog.theilSenFrom(daily).collect().head
    assert(out.getLong(2) == 6L && out.getDouble(3) == 2.0)
  }
}
