package graft.expressions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The whole K-hash MinHash signature of a shingle set in one expression:
  * entry i is the lexicographic minimum over shingles of
  * `md5hex(i || '|' || shingle)` — exactly the value of the composed form
  * `array_min(transform(shs, s -> md5(concat(i, '|', s))))` and of the
  * DuckDB oracle's `MIN(md5(concat(i, '|', sh)))`, for every i in [0, K).
  *
  * Why custom (measured, TimeStages at sf0.1): the composed form emits K
  * separate HOF+md5 codegen segments whose Janino compilation costs
  * ~2.4 s per PLAN SHAPE at K = 12 — and the LSH query builds several
  * shapes (cached signature relation, band explode, verification), so a
  * cold run paid ~4 s of compiler time for ~0.1 s of data work. This
  * expression generates a one-line call into [[MinhashSignature.compute]]
  * — compilation is trivial and the md5 work itself (K digests per
  * shingle over a reused MessageDigest, no per-hash UTF8String churn) is
  * faster than the HOF path evaluates.
  *
  * Ordering contract: digests are compared as UNSIGNED bytes, which for
  * fixed-length lowercase hex encodings is precisely lexicographic order
  * of the hex strings — the oracle's varchar MIN (binary collation).
  * A NULL shingle element yields a NULL signature (the composed
  * `array_min(transform(...))` propagates the same way).
  */
case class MinhashSignature(child: Expression, k: Int) extends UnaryExpression {
  require(k > 0, s"minhash k must be positive, got $k")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_signature expects array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "minhash_signature"
  // Empty or null-holding shingle arrays produce NULL signatures.
  override def nullable: Boolean = true

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null else MinhashSignature.compute(v.asInstanceOf[ArrayData], k)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    nullSafeCodeGen(ctx, ev, a => {
      s"""
         |${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData)
         |  graft.expressions.MinhashSignature.compute($a, $k);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinhashSignature =
    copy(child = newChild)
}

object MinhashSignature {
  private val digests = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  private val hexChars = "0123456789abcdef".toCharArray

  private def hex(d: Array[Byte]): UTF8String = {
    val out = new Array[Byte](d.length * 2)
    var i = 0
    while (i < d.length) {
      out(2 * i) = hexChars((d(i) >> 4) & 0xf).toByte
      out(2 * i + 1) = hexChars(d(i) & 0xf).toByte
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  /** True when candidate precedes incumbent in unsigned-byte order. */
  private def less(cand: Array[Byte], inc: Array[Byte]): Boolean = {
    var i = 0
    while (i < cand.length) {
      val a = cand(i) & 0xff
      val b = inc(i) & 0xff
      if (a != b) return a < b
      i += 1
    }
    false
  }

  /** All K minimum digests over the shingle array; null on empty input or
    * any null element (callable from generated code).
    */
  def compute(arr: ArrayData, k: Int): ArrayData = {
    val n = arr.numElements()
    if (n == 0) return null
    val md = digests.get()
    val prefixes = new Array[Array[Byte]](k)
    var i = 0
    while (i < k) {
      prefixes(i) = (i.toString + "|").getBytes("UTF-8")
      i += 1
    }
    val mins = new Array[Array[Byte]](k)
    var j = 0
    while (j < n) {
      if (arr.isNullAt(j)) return null
      val sh = arr.getUTF8String(j).getBytes
      i = 0
      while (i < k) {
        md.reset()
        md.update(prefixes(i))
        md.update(sh)
        val d = md.digest()
        if (mins(i) == null || less(d, mins(i))) mins(i) = d
        i += 1
      }
      j += 1
    }
    val out = new Array[AnyRef](k)
    i = 0
    while (i < k) {
      out(i) = hex(mins(i))
      i += 1
    }
    new GenericArrayData(out)
  }
}
