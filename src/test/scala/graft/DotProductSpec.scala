package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.expressions.GraftExtensions
import graft.functions.Vectors

/** Native DotProduct expression: equivalence with the declarative fold,
  * codegen participation, SQL registration.
  */
class DotProductSpec extends AnyFunSuite {
  import TestSpark.{sf0001, spark}
  import spark.implicits._

  private lazy val emb = Tables.embeddings(spark, sf0001).limit(50)

  test("native dot equals the declarative aggregate/zip_with fold bit-exactly") {
    val declarative = expr(
      """aggregate(zip_with(embedding, embedding, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
         CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)""")
    val rows = emb.select(
      Vectors.dot(col("embedding"), col("embedding")).as("native"),
      declarative.as("fold")).as[(Double, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (n, f) => assert(n == f, "bit mismatch") }
  }

  test("dot product participates in whole-stage codegen") {
    val plan = emb.select(Vectors.dot(col("embedding"), col("embedding")).as("d"))
      .queryExecution.executedPlan.toString
    // The `*(n)` prefix marks operators fused into a WholeStageCodegen span.
    assert(plan.contains("*(1) Project [dot_product"), s"no codegen span:\n$plan")
  }

  test("dot_product is callable from SQL after registration") {
    GraftExtensions.register(spark)
    emb.createOrReplaceTempView("emb_dp")
    val viaSql = spark.sql(
      "SELECT vec_id, dot_product(embedding, embedding) AS d FROM emb_dp")
      .as[(Long, Double)].collect().toMap
    val viaApi = emb.select(col("vec_id"), Vectors.dot(col("embedding"), col("embedding")))
      .as[(Long, Double)].collect().toMap
    assert(viaSql == viaApi)
  }

  test("type checking rejects mismatched arguments") {
    val err = intercept[Exception] {
      emb.select(Vectors.dot(col("embedding"), col("vec_id"))).collect()
    }
    assert(err.getMessage.toLowerCase.contains("dot_product") ||
      err.getMessage.toLowerCase.contains("data type"))
  }
}
