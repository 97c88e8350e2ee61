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
