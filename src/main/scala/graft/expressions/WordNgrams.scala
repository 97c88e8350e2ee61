package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Word n-grams of a token array, space-joined — value-identical to the
  * composed higher-order-function form in graft.functions.Text:
  *
  *   when(size(t) < n, array(array_join(t, " ")))
  *     .otherwise(transform(sequence(0, size(t)-n), i =>
  *       concat_ws(" ", element_at(t, i+1) … element_at(t, i+n))))
  *
  * including concat_ws/array_join's skip-null semantics. Why custom: the
  * HOF form is interpreted per row AND re-evaluates element_at per gram
  * element; profiled at sf0.1 the bigram index build took ~1 s of the
  * n-gram Jaccard queries — one tight loop building each gram from the
  * array once compiles trivially and runs inside whole-stage codegen.
  */
case class WordNgrams(child: Expression, n: Int) extends UnaryExpression {
  require(n > 0, s"ngram size must be positive, got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"word_ngrams expects array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_ngrams"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null else WordNgrams.compute(v.asInstanceOf[ArrayData], n)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.expressions.WordNgrams.compute($a, $n);")

  override protected def withNewChildInternal(newChild: Expression): WordNgrams =
    copy(child = newChild)
}

object WordNgrams {
  private val space = UTF8String.fromString(" ")

  /** Join tokens [from, from+len) with single spaces, skipping nulls
    * (concat_ws semantics).
    */
  private def joinRange(arr: ArrayData, from: Int, len: Int): UTF8String = {
    val parts = new Array[UTF8String](2 * len - 1)
    var out = 0
    var i = 0
    while (i < len) {
      if (!arr.isNullAt(from + i)) {
        if (out > 0) { parts(out) = space; out += 1 }
        parts(out) = arr.getUTF8String(from + i)
        out += 1
      }
      i += 1
    }
    UTF8String.concat(java.util.Arrays.copyOf(parts, out): _*)
  }

  /** All n-grams of the token array (callable from generated code). */
  def compute(arr: ArrayData, n: Int): ArrayData = {
    val m = arr.numElements()
    if (m < n) return new GenericArrayData(Array[AnyRef](joinRange(arr, 0, m)))
    val out = new Array[AnyRef](m - n + 1)
    var i = 0
    while (i <= m - n) {
      out(i) = joinRange(arr, i, n)
      i += 1
    }
    new GenericArrayData(out)
  }
}
