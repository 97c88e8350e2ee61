package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Training-set preparation operators: structural invariants beyond the
  * DuckDB oracle (which pins exact values).
  */
class TrainPrepSpec extends AnyFunSuite {
  import TestSpark.{sf0001, spark}

  private def run(name: String) = SparkEntry.queries(name)(spark, sf0001)

  test("doc_split_assign: every doc assigned once, train dominates, assignment is stable") {
    val got = run("doc_split_assign").cache()
    val n = Tables.documents(spark, sf0001).count()
    assert(got.count() == n)
    val byceil = got.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byceil.keySet.subsetOf(Set("train", "val", "test")))
    // 230/256 expected train share; 500 docs leave room for variance.
    assert(byceil("train") > n * 7 / 10, s"train share too low: $byceil")
    // Determinism: a second run assigns identically.
    assert(run("doc_split_assign").except(got).count() == 0)
    got.unpersist()
  }

  test("doc_repetition: fractions in [0,1], flag consistent with threshold") {
    val got = run("doc_repetition")
    assert(got.filter(col("dup_frac") < 0 || col("dup_frac") > 1).count() == 0)
    assert(got.filter(col("repetitive") =!= (col("dup_frac") > 0.2)).count() == 0)
    assert(got.filter(col("n_distinct") > col("n_bigrams")).count() == 0)
  }

  test("source_mix_weights: shares sum to ~1, uniform target inverts shares") {
    val rows = run("source_mix_weights").collect()
    val shareSum = rows.map(_.getAs[Double]("token_share")).sum
    assert(math.abs(shareSum - 1.0) < 1e-4, s"shares sum to $shareSum")
    // weight * share ≈ 1 / n_sources for every source.
    val n = rows.length
    rows.foreach { r =>
      val prod = r.getAs[Double]("token_share") * r.getAs[Double]("mix_weight")
      assert(math.abs(prod - 1.0 / n) < 1e-4, s"share*weight = $prod for ${r.getString(0)}")
    }
  }

  test("token_df: 20 rows, df bounded by corpus size, descending") {
    val got = run("token_df").collect()
    assert(got.length == 20)
    val n = Tables.documents(spark, sf0001).count()
    assert(got.forall(r => r.getLong(1) >= 1 && r.getLong(1) <= n))
    val dfs = got.map(_.getLong(1)).toSeq
    assert(dfs == dfs.sortBy(-_), "df not descending")
  }
}
