package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native dot product over two numeric arrays — a custom Catalyst
  * expression with real codegen.
  *
  * Why custom (the measured justification, see tools/TimeStages and the
  * bench history): the declarative form
  * `aggregate(zip_with(a, b, (x,y) -> x*y), 0d, (acc,v) -> acc+v)` runs
  * through Spark's INTERPRETED higher-order-function path (lambda
  * functions are not codegen'd), which dominates the bucketed similarity
  * joins (~50M element multiplications per run at sf0.1). This
  * expression emits a tight Java loop inside whole-stage codegen.
  *
  * Semantics are IDENTICAL to the declarative fold (and to the DuckDB
  * oracle's list_reduce): left-to-right accumulation of per-element
  * double products — bit-identical results.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  // Element types are restricted to FLOAT/DOUBLE: the codegen path below
  // reads elements with a fixed-width getter, and a wider NumericType match
  // would silently read wrong bytes for int/long/decimal arrays under
  // whole-stage codegen. Integer arrays must be CAST to double first.
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(a, _), ArrayType(b, _))
        if a == b && (a == FloatType || a == DoubleType) =>
      TypeCheckResult.TypeCheckSuccess
    case _ =>
      TypeCheckResult.TypeCheckFailure(
        s"dot_product expects two arrays of the same floating-point type " +
          s"(array<float> or array<double>), got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  private def elementType: DataType = left.dataType match {
    case ArrayType(et, _) => et
    case _ => DoubleType
  }

  /** A NULL element yields a NULL result (matching the declarative
    * zip_with/aggregate fold, where null * x poisons the accumulator).
    */
  private def elementsNullable: Boolean = (left.dataType, right.dataType) match {
    case (ArrayType(_, n1), ArrayType(_, n2)) => n1 || n2
    case _ => true
  }

  override def nullable: Boolean = left.nullable || right.nullable || elementsNullable

  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val a = left.eval(input)
    if (a == null) return null
    val b = right.eval(input)
    if (b == null) return null
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    if (elementType == FloatType) {
      while (i < n) {
        if (x.isNullAt(i) || y.isNullAt(i)) return null
        acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble; i += 1
      }
    } else {
      while (i < n) {
        if (x.isNullAt(i) || y.isNullAt(i)) return null
        acc += x.getDouble(i) * y.getDouble(i); i += 1
      }
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val getter = if (elementType == FloatType) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; $acc = 0.0; break; }
         |  $acc += (double) $a.$getter($i) * (double) $b.$getter($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}
