package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.DistinctAggSplitRule

/** DistinctAggSplitRule: exactness and plan shape of the distinct-agg
  * split (injected here via the public experimental-optimizations hook;
  * production sessions use GraftExtensions / spark.sql.extensions).
  */
class DistinctSplitSpec extends AnyFunSuite {
  import TestSpark.{sf0001, spark}
  import spark.implicits._

  private def withRule[T](f: => T): T = {
    spark.experimental.extraOptimizations = Seq(DistinctAggSplitRule)
    try f finally spark.experimental.extraOptimizations = Nil
  }

  test("count-distinct rewrites to dedup + count with identical results") {
    val events = Tables.events(spark, sf0001)
    val q = events.groupBy(dayofyear(col("ts")).as("day"))
      .agg(count_distinct(col("user_id")).as("n"))
    val expected = q.as[(Int, Long)].collect().toMap

    withRule {
      val q2 = events.groupBy(dayofyear(col("ts")).as("day"))
        .agg(count_distinct(col("user_id")).as("n"))
      val optimized = q2.queryExecution.optimizedPlan.toString
      // The rewrite leaves no distinct aggregate: two stacked Aggregates.
      assert(!optimized.contains("distinct"), s"rule did not fire:\n$optimized")
      assert("Aggregate".r.findAllIn(optimized).size >= 2, optimized)
      // And no Expand in the physical plan (the built-in distinct path).
      assert(!q2.queryExecution.executedPlan.toString.contains("Expand"))
      assert(q2.as[(Int, Long)].collect().toMap == expected)
    }
  }

  test("rule leaves multi-aggregate and non-distinct queries untouched") {
    val events = Tables.events(spark, sf0001)
    withRule {
      val multi = events.groupBy("event_type")
        .agg(count_distinct(col("user_id")).as("n"), sum("value").as("s"))
      // Multi-agg: rule must not fire; results still correct via builtin.
      assert(multi.count() > 0)
      val plain = events.groupBy("event_type").agg(count(lit(1)).as("n"))
      assert(plain.queryExecution.optimizedPlan.toString.split("Aggregate").length <= 2)
      assert(plain.count() > 0)
    }
  }
}
