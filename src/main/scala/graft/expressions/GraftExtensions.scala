package graft.expressions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions hook registering graft's custom expressions as
  * SQL functions — enable with
  * `spark.sql.extensions=graft.expressions.GraftExtensions` (session
  * build time), or call [[GraftExtensions.register]] on an existing
  * session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.dotProductFunction)
    ext.injectFunction(GraftExtensions.minhashSignatureFunction)
    ext.injectFunction(GraftExtensions.wordNgramsFunction)
    ext.injectFunction(GraftExtensions.simhash32Function)
    ext.injectOptimizerRule(_ => graft.plans.DistinctAggSplitRule)
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
  }
}

object GraftExtensions {

  private def build(children: Seq[Expression]): Expression = {
    require(children.length == 2, "dot_product(arrayA, arrayB) takes two arguments")
    DotProduct(children.head, children(1))
  }

  private def intLiteral(fn: String, arg: String)(e: Expression): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int,
        org.apache.spark.sql.types.IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$fn: $arg must be an INT literal, got $other")
  }

  private def buildMinhash(children: Seq[Expression]): Expression = {
    require(children.length == 2, "minhash_signature(shingles, k) takes two arguments")
    MinhashSignature(children.head, intLiteral("minhash_signature", "k")(children(1)))
  }

  private def buildNgrams(children: Seq[Expression]): Expression = {
    require(children.length == 2, "word_ngrams(tokens, n) takes two arguments")
    WordNgrams(children.head, intLiteral("word_ngrams", "n")(children(1)))
  }

  private def buildSimhash(children: Seq[Expression]): Expression = {
    require(children.length == 1, "simhash32(tokens) takes one argument")
    Simhash32(children.head)
  }

  val dotProductFunction: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("dot_product"),
    new ExpressionInfo(classOf[DotProduct].getCanonicalName, "dot_product"),
    build _)

  val minhashSignatureFunction:
      (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("minhash_signature"),
    new ExpressionInfo(classOf[MinhashSignature].getCanonicalName, "minhash_signature"),
    buildMinhash _)

  val wordNgramsFunction:
      (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("word_ngrams"),
    new ExpressionInfo(classOf[WordNgrams].getCanonicalName, "word_ngrams"),
    buildNgrams _)

  val simhash32Function:
      (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("simhash32"),
    new ExpressionInfo(classOf[Simhash32].getCanonicalName, "simhash32"),
    buildSimhash _)

  /** Runtime registration on an existing session (driver-supplied). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    org.apache.spark.sql.GraftSqlBridge.registerExpressionFunction(spark, "dot_product", build)
    org.apache.spark.sql.GraftSqlBridge.registerExpressionFunction(
      spark, "minhash_signature", buildMinhash)
    org.apache.spark.sql.GraftSqlBridge.registerExpressionFunction(
      spark, "word_ngrams", buildNgrams)
    org.apache.spark.sql.GraftSqlBridge.registerExpressionFunction(
      spark, "simhash32", buildSimhash)
  }
}
