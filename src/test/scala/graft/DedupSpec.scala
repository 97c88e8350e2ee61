package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/** Dataset-level dedup facade. */
class DedupSpec extends AnyFunSuite {
  import TestSpark.{sf0001, spark}
  import spark.implicits._

  test("exactByContent keeps the min-id survivor per content") {
    val df = Seq(
      (3L, "Alpha  Beta"), (1L, " alpha beta "), (2L, "gamma"), (5L, "alpha beta"))
      .toDF("doc_id", "text")
    val kept = Dedup.exactByContent(df, col("text"), col("doc_id"))
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 2L))
  }

  test("doc_decontaminate: flags exactly the docs sharing an 8-gram with the benchmark slice") {
    // Brute-force ground truth: explode 8-shingles of every doc, flag any
    // corpus doc whose shingle set intersects the benchmark (%50) docs'.
    val docs = Tables.documents(spark, sf0001)
    val sh = docs.select(col("doc_id"),
      explode(graft.functions.Text.shingles(col("text"), 8)).as("g"))
    val benchG = sh.filter(col("doc_id") % 50 === 0).select("g").distinct()
      .as[String].collect().toSet
    val truth = sh.filter(col("doc_id") % 50 =!= 0)
      .as[(Long, String)].collect()
      .groupBy(_._1).map { case (id, gs) => id -> gs.exists(g => benchG(g._2)) }
    val got = SparkEntry.queries("doc_decontaminate")(spark, sf0001)
      .as[(Long, Boolean)].collect().toMap
    assert(got == truth)
    // The flag must carry signal on this corpus (near-dups of benchmark
    // docs exist by construction) without flagging everything.
    val nTrue = got.values.count(identity)
    assert(nTrue > 0 && nTrue < got.size, s"vacuous flag: $nTrue of ${got.size}")
    // 100 TB shape: the membership probe broadcasts the benchmark grams —
    // the corpus-side explode is never shuffled into the semi join.
    val plan = SparkEntry.queries("doc_decontaminate")(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftSemi"),
      s"benchmark gram probe is not a broadcast semi join:\n$plan")
  }

  test("dropNearDuplicates removes pair losers from the corpus") {
    val docs = Tables.documents(spark, sf0001)
    val pairs = SparkEntry.queries("doc_near_dup_lsh")(spark, sf0001)
    val cleaned = Dedup.dropNearDuplicates(docs, col("doc_id"), pairs)
    val losers = pairs.select("doc_b").distinct().count()
    assert(cleaned.count() == docs.count() - losers)
    // No surviving doc appears as a pair loser.
    assert(cleaned.join(pairs, col("doc_id") === col("doc_b")).count() == 0)
  }
}
