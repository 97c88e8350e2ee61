package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.AsOf

/** The custom as-of join operator: semantics against a declarative
  * range-join + rank equivalent, edge cases, and plan shape.
  */
class AsOfJoinSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private val clicks = Seq(
    // user 1: two clicks, the second also tied on ts with a third
    (10L, 1L, ts("2024-01-01 10:00:00")),
    (11L, 1L, ts("2024-01-01 11:00:00")),
    (12L, 1L, ts("2024-01-01 11:00:00")), // same ts as 11 -> greatest id wins
    // user 2: click strictly after every purchase
    (20L, 2L, ts("2024-01-01 23:00:00")))
    .toDF("click_id", "c_user", "c_ts")

  private val purchases = Seq(
    (100L, 1L, ts("2024-01-01 10:30:00")), // -> click 10
    (101L, 1L, ts("2024-01-01 11:00:00")), // ts-equal allowed -> 12 (tie-break)
    (102L, 1L, ts("2024-01-01 12:00:00")), // -> 12
    (200L, 2L, ts("2024-01-01 09:00:00")), // no prior click -> null
    (300L, 3L, ts("2024-01-01 09:00:00"))) // user has no clicks -> null
    .toDF("purchase_id", "p_user", "p_ts")

  private def run() =
    AsOf.join(purchases, clicks, "p_user", "p_ts", "c_user", "c_ts", "click_id")
      .select(col("purchase_id"), col("click_id"))
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap

  test("as-of semantics: latest same-key row at or before, ties by greatest id, outer nulls") {
    assert(run() == Map(
      100L -> Some(10L), 101L -> Some(12L), 102L -> Some(12L),
      200L -> None, 300L -> None))
  }

  test("forward as-of: earliest same-key row at or after, ties by smallest id") {
    // Reverse roles: each click finds its NEXT purchase.
    val got = AsOf.joinForward(clicks, purchases,
        "c_user", "c_ts", "p_user", "p_ts", "purchase_id")
      .select(col("click_id"), col("purchase_id"))
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap
    assert(got == Map(
      10L -> Some(100L), // 10:00 -> purchase 10:30
      11L -> Some(101L), // 11:00 -> ts-equal purchase allowed
      12L -> Some(101L), // ts tie on the left is irrelevant; smallest pe at 11:00
      20L -> None))      // 23:00 click, no later purchase
    // The reversal must not leak helper columns.
    val cols = AsOf.joinForward(clicks, purchases,
      "c_user", "c_ts", "p_user", "p_ts", "purchase_id").columns
    assert(!cols.exists(_.startsWith("__fwd")), cols.mkString(","))
  }

  test("matches the declarative range-join + rank formulation on real events") {
    val ev = Tables.events(spark, TestSpark.sf0001)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        col("ts").as("p_ts"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
        col("ts").as("c_ts"))
    val got = AsOf.join(p, c, "p_user", "p_ts", "c_user", "c_ts", "click_id")
      .select(col("purchase_id"), col("click_id"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("purchase_id").orderBy(desc("c_ts"), desc("click_id"))
    val want = p.join(c, col("p_user") === col("c_user") && col("c_ts") <= col("p_ts"), "left")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("purchase_id"), col("click_id"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(got.nonEmpty && got == want)
  }

  test("plans as one AsOfJoinExec merge - no range-join pair blow-up, no window") {
    val df = AsOf.join(purchases, clicks, "p_user", "p_ts", "c_user", "c_ts", "click_id")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), s"custom operator not planned:\n$plan")
    assert(!plan.contains("Window") && !plan.contains("SortMergeJoin"),
      s"fell back to the materialize-then-discard shape:\n$plan")
  }

  test("null keys/timestamps: null-key right rows never match, null-key left rows get null right") {
    // Option[Long] columns make nullable LONG key/ts frames; the nulls sort
    // first, so this also exercises the skip-at-start path of the merge.
    val c = Seq(
      (Some(50L), None: Option[Long], Some(ts("2024-01-01 08:00:00"))), // null key: skipped
      (Some(51L), Some(1L), None: Option[Timestamp]),                   // null ts: skipped
      (Some(52L), Some(1L), Some(ts("2024-01-01 09:00:00"))))           // the only real click
      .toDF("click_id", "c_user", "c_ts")
    val p = Seq(
      (400L, None: Option[Long], Some(ts("2024-01-01 10:00:00"))), // null key -> null right
      (401L, Some(1L), None: Option[Timestamp]),                   // null ts -> null right
      (402L, Some(1L), Some(ts("2024-01-01 10:00:00"))))           // -> click 52
      .toDF("purchase_id", "p_user", "p_ts")
    val got = AsOf.join(p, c, "p_user", "p_ts", "c_user", "c_ts", "click_id")
      .select(col("purchase_id"), col("click_id"))
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap
    assert(got == Map(400L -> None, 401L -> None, 402L -> Some(52L)))
  }

  test("unknown column names fail loudly") {
    val err = intercept[IllegalArgumentException] {
      AsOf.join(purchases, clicks, "nope", "p_ts", "c_user", "c_ts", "click_id")
    }
    assert(err.getMessage.contains("no column 'nope'"))
  }
}
