package graft.expressions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** 32-bit SimHash of a token array in one per-row pass — value-identical
  * to the exploded formulation in NearDupCatalog (distinct tokens; bit j
  * votes +1 when hex digit j of md5(token) is odd, −1 otherwise; bit set
  * when the vote sum is positive):
  *
  *   explode(array_distinct(toks)) → md5 → groupBy(doc) 32×sum(CASE)
  *
  * Why custom: the exploded form shuffles every token row and its
  * 32-aggregate groupBy is a wide codegen unit; the signature is a pure
  * function of one doc's tokens, so computing it per row removes the
  * shuffle entirely (zero-exchange signature stage) and needs no
  * aggregation buffers. "Odd hex digit" ≡ lowest bit of the nibble, so
  * votes read the digest bytes directly — no hex string materializes.
  *
  * Null-token semantics mirror the composed form: md5(NULL) is NULL, the
  * CASE's IN test is NULL, the ELSE branch fires → every bit votes −1
  * for that token (it still occupies one distinct slot).
  */
case class Simhash32(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash32 expects array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash32"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null else Simhash32.compute(v.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.expressions.Simhash32.compute($a)")

  override protected def withNewChildInternal(newChild: Expression): Simhash32 =
    copy(child = newChild)
}

object Simhash32 {
  private val digests = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** SimHash over the DISTINCT tokens of the array (callable from
    * generated code).
    */
  def compute(arr: ArrayData): Long = {
    val md = digests.get()
    val seen = new java.util.HashSet[Any]()
    val votes = new Array[Int](32)
    var sawNull = false
    var j = 0
    val n = arr.numElements()
    while (j < n) {
      if (arr.isNullAt(j)) {
        if (!sawNull) { // one distinct null token: every bit votes −1
          sawNull = true
          var b = 0
          while (b < 32) { votes(b) -= 1; b += 1 }
        }
      } else {
        val tok = arr.getUTF8String(j)
        if (seen.add(tok)) {
          val d = md.digest(tok.getBytes)
          var b = 0
          while (b < 32) {
            // hex digit b = high nibble of byte b/2 when b is even, low
            // nibble when odd; odd digit ⇔ lowest nibble bit set.
            val nib = if ((b & 1) == 0) (d(b >> 1) >> 4) & 0xf else d(b >> 1) & 0xf
            votes(b) += ((nib & 1) << 1) - 1 // +1 odd, −1 even
            b += 1
          }
        }
      }
      j += 1
    }
    var sig = 0L
    var b = 0
    while (b < 32) {
      if (votes(b) > 0) sig |= 1L << b
      b += 1
    }
    sig
  }
}
