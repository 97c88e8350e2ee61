package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** user_kmv_sliding: both estimator branches organic across the gate
  * sfs, the merge property that makes daily sketches reusable, and the
  * estimator's accuracy on the truncated branch.
  */
class KmvSlidingSpec extends AnyFunSuite {
  import TestSpark.{sf0001, sf001, spark}
  import graft.queries.ScaleCatalog

  test("sf0.001 takes the under-K exact branch: estimate equals exact") {
    // 15 users < K = 64: every daily sketch and every merged window is
    // exact by definition, and the entry must say so bit-for-bit.
    val rows = ScaleCatalog.kmvSlidingFrom(Tables.events(spark, sf0001))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getDouble(2) == r.getLong(1).toDouble,
        s"under-K window must degenerate to exact: $r")
    }
  }

  test("sf0.01 exercises the truncated-sketch estimator within its error bound") {
    // ~134 distinct users/day > K = 64: daily sketches truncate, the
    // (K-1)*SPACE/v_K estimator fires, and at RSE ~ 1/sqrt(K-2) = 12.7%
    // a 5-sigma band is 64%. The corpus must actually take the
    // estimator branch (non-vacuous), and every estimate must land in
    // band - KMV's guarantee, not a tuned tolerance.
    val rows = ScaleCatalog.kmvSlidingFrom(Tables.events(spark, sf001))
      .collect()
    val est = rows.filter(r => r.getDouble(2) != r.getLong(1).toDouble)
    assert(est.nonEmpty, "vacuous: estimator branch never fired at sf0.01")
    rows.foreach { r =>
      val exact = r.getLong(1).toDouble
      assert(math.abs(r.getDouble(2) - exact) <= 0.64 * exact,
        s"estimate out of 5-sigma band: $r")
    }
  }

  test("K smallest of unioned daily sketches equals the K-min sketch of the union") {
    // The merge property the whole design rests on (Beyer et al. 2007):
    // computed from FULL daily hash sets vs from truncated daily
    // sketches, the per-window K-th smallest (and hence the estimate)
    // must be identical.
    val du = Tables.events(spark, sf001)
      .select(expr("unix_timestamp(ts) div 86400").as("day"), col("user_id"))
      .distinct()
    val hv = du.select(col("day"),
      conv(substring(md5(concat(lit("kmv|"), col("user_id").cast("string"))), 1, 13),
        16, 10).cast("long").as("h"))
    def kthPerWindow(daily: org.apache.spark.sql.DataFrame): Map[Long, Long] = {
      import org.apache.spark.sql.expressions.Window
      daily
        .select(explode(sequence(col("day"), col("day") + 6)).as("wday"), col("h"))
        .distinct()
        .select(col("wday"), col("h"),
          row_number().over(Window.partitionBy("wday").orderBy("h")).as("rk"))
        .filter(col("rk") <= ScaleCatalog.SlidingK)
        .groupBy("wday").agg(max("h").as("vk"), count(lit(1)).as("m"))
        .filter(col("m") === ScaleCatalog.SlidingK)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    val fromFull = kthPerWindow(hv)
    val fromSketches = kthPerWindow(
      ScaleCatalog.kmvSketchBy(hv, "day", ScaleCatalog.SlidingK))
    assert(fromFull.nonEmpty, "vacuous: no full-K window at sf0.01")
    assert(fromSketches == fromFull,
      "merged daily sketches lost the K-min-of-union property")
  }
}
