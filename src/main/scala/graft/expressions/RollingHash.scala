package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Order-sensitive polynomial rolling hash over a string's code points,
  * mod 1e9+7 — a native Catalyst expression with real codegen.
  *
  * Why custom (the DotProduct justification, measured on the winnowing
  * entry): the declarative form
  * `aggregate(filter(split(s, ''), c -> c <> ''), 0L, (acc, c) -> (acc*31 + ascii(c)) % p)`
  * runs on Spark's INTERPRETED higher-order-function path and allocates a
  * per-character string array per row; the winnowing fingerprint entry
  * evaluates it once per positional n-gram (~millions of grams × ~20
  * chars at sf0.1). This expression walks the string's code points in a
  * tight loop inside whole-stage codegen.
  *
  * Semantics are IDENTICAL to the declarative fold on BMP text (and to
  * the DuckDB mirror `list_reduce(string_split(s, ''), …)`): Java's
  * `split("")` and DuckDB's `string_split(s, '')` both yield code
  * points, and `ascii()` of a 1-char string is its code point — so the
  * left fold here visits the same values in the same order. The
  * accumulator stays in [0, 1e9+7), so `acc*31 + cp` cannot overflow a
  * long.
  */
case class RollingHash(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"rolling_hash expects a string column, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_hash"

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    var acc = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      acc = (acc * 31L + cp) % 1000000007L
      i += Character.charCount(cp)
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("rhStr")
      val i = ctx.freshName("rhI")
      val cp = ctx.freshName("rhCp")
      val acc = ctx.freshName("rhAcc")
      s"""
         |java.lang.String $s = $c.toString();
         |long $acc = 0L;
         |int $i = 0;
         |while ($i < $s.length()) {
         |  int $cp = $s.codePointAt($i);
         |  $acc = ($acc * 31L + $cp) % 1000000007L;
         |  $i += java.lang.Character.charCount($cp);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}
