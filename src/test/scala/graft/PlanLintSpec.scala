package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.PlanLint

/** PlanLint: each rule fires on a deliberately bad plan, stays silent on
  * the legitimate look-alikes, and the WARN tier stays advisory.
  */
class PlanLintSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private val df = (1 to 100).map(i => (i.toLong, i % 7, s"s$i")).toDF("id", "k", "s")

  test("cartesian join flagged; scalar-aggregate cross join allowed") {
    val bad = df.crossJoin(df.select(col("id").as("id2"), col("k").as("k2"), col("s").as("s2")))
    assert(PlanLint.errors(bad).exists(_.rule == "cartesian-join"))
    val ok = df.crossJoin(broadcast(df.agg(count(lit(1)).as("total"))))
    assert(!PlanLint.errors(ok).exists(_.rule == "cartesian-join"),
      PlanLint.errors(ok).mkString(","))
    // Explicit broadcast() of a non-scalar side = declared bounded intent
    // (the IVF centroid pattern) — allowed.
    val hinted = df.crossJoin(broadcast(
      df.filter(col("id") < 16).select(col("id").as("cid"))))
    assert(!PlanLint.errors(hinted).exists(_.rule == "cartesian-join"),
      PlanLint.errors(hinted).mkString(","))
  }

  test("global window flagged; partitioned window clean") {
    val bad = df.withColumn("rn", row_number().over(Window.orderBy("id")))
    assert(PlanLint.errors(bad).exists(_.rule == "global-window"))
    val ok = df.withColumn("rn", row_number().over(Window.partitionBy("k").orderBy("id")))
    assert(PlanLint.errors(ok).isEmpty, PlanLint.errors(ok).mkString(","))
  }

  test("repartition(1) flagged; normal repartition clean") {
    assert(PlanLint.errors(df.repartition(1)).exists(_.rule == "repartition-1"))
    assert(PlanLint.errors(df.repartition(8)).isEmpty)
    // The expression forms land on RepartitionByExpression, not
    // Repartition — the same single-partition funnel must not escape.
    assert(PlanLint.errors(df.repartition(1, col("k"))).exists(_.rule == "repartition-1"))
    assert(PlanLint.errors(df.repartitionByRange(1, col("id"))).exists(_.rule == "repartition-1"))
    assert(PlanLint.errors(df.repartition(8, col("k"))).isEmpty)
    assert(PlanLint.errors(df.repartitionByRange(8, col("id"))).isEmpty)
  }

  test("global sort warns unless it feeds a limit") {
    val warnRules = PlanLint.lint(df.orderBy("id")).map(_.rule)
    assert(warnRules.contains("global-sort"))
    assert(PlanLint.errors(df.orderBy("id")).isEmpty, "global-sort must stay advisory")
    val limited = PlanLint.lint(df.orderBy("id").limit(5)).map(_.rule)
    assert(!limited.contains("global-sort"), limited.mkString(","))
  }
}
