package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.RangeJoin

/** Bucketed range join: exact-once semantics vs the naive quadratic
  * join, multi-bucket spans, and the equi-join plan shape.
  */
class RangeJoinSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  // Intervals chosen to cross bucket boundaries (width 10): spans of
  // 1–35 units, touching endpoints, disjoint ranges, duplicates.
  private val lefts = Seq(
    (1L, 0L, 35L), (2L, 5L, 9L), (3L, 28L, 30L), (4L, 100L, 120L), (5L, 50L, 50L))
    .toDF("lid", "ls", "le")
  private val rights = Seq(
    (10L, 3L, 12L), (11L, 9L, 9L), (12L, 30L, 41L), (13L, 119L, 140L), (14L, 60L, 70L))
    .toDF("rid", "rs", "re")

  private def overlap = col("ls") <= col("re") && col("rs") <= col("le")

  test("bucketed overlap join equals the naive quadratic join, exactly once per pair") {
    val got = RangeJoin.intervalOverlap(lefts, rights, "ls", "le", "rs", "re",
        width = 10L, residual = overlap)
      .select("lid", "rid").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val want = lefts.crossJoin(rights).filter(overlap)
      .select("lid", "rid").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // Seq (not Set) comparison: a pair sharing several buckets must
    // appear ONCE — the assign-once rule replaces distinct.
    assert(got.sorted == want.sorted && got.length == got.toSet.size, s"got $got")
    assert(got.toSet == Set((1L, 10L), (1L, 11L), (1L, 12L), (2L, 10L), (2L, 11L),
      (3L, 12L), (4L, 13L)))
  }

  test("the range join plans as a hash equi-join on buckets, never a nested loop") {
    val df = RangeJoin.intervalOverlap(lefts, rights, "ls", "le", "rs", "re",
      width = 10L, residual = overlap)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"range join fell back to a pair-comparing plan:\n$plan")
    assert(plan.contains("Join") && plan.contains("graft_range_bucket"),
      s"no bucket equi-join:\n$plan")
  }

  test("events_range_join entry: bucketed result equals the naive form on real data") {
    val ev = Tables.events(spark, TestSpark.sf0001)
    val a = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("ts").as("c_ts"))
    val b = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("ts").as("p_ts"))
    val naive = a.crossJoin(b)
      .filter(col("p_ts") >= col("c_ts") - expr("INTERVAL 5 MINUTES") &&
        col("p_ts") <= col("c_ts") + expr("INTERVAL 5 MINUTES"))
      .select("click_id", "purchase_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = SparkEntry.queries("events_range_join")(spark, TestSpark.sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == naive && got.nonEmpty)
  }
}
