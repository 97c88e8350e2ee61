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
