package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** All random-hyperplane LSH bucket ids of a vector in one expression:
  * for each table t, bit p of bucket t is set when the signed projection
  * of the vector onto plane (t, p) is positive. Returns `array<int>` of
  * length `signs.size` (one bucket per table).
  *
  * Why custom (the measured justification): composing the same
  * computation from per-plane DotProduct expressions is semantically
  * identical but emits tables × planes inlined codegen segments, each
  * carrying its own 64-literal array — at 4 tables × 8 planes Janino
  * compilation of the two join-side copies took ~2.5 s of a 3 s query
  * (the data work is milliseconds). This expression compiles to ONE
  * small loop nest over a referenced sign matrix: same bits, ~50 lines
  * of generated code regardless of table/plane count.
  *
  * Arithmetic contract (shared with the DuckDB oracles): per plane, a
  * left-to-right fold `acc += sign_i * (double) v_i` from acc = 0.0 —
  * bit-identical to the oracle's unrolled `± CAST(v[i] AS DOUBLE)` chain
  * (`s*x` with s = ±1.0 is an exact sign flip; `a + (-b)` ≡ `a - b` in
  * IEEE; zero-sign differences cannot flip the `> 0` test). A NULL
  * element yields NULL, matching DotProduct.
  */
case class HyperplaneBuckets(child: Expression, signs: Seq[Seq[Seq[Int]]])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hyperplane_buckets expects array<float> or array<double>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "hyperplane_buckets"

  private def elementsNullable: Boolean = child.dataType match {
    case ArrayType(_, n) => n
    case _ => true
  }
  override def nullable: Boolean = child.nullable || elementsNullable

  @transient private lazy val matrix: Array[Array[Array[Double]]] =
    signs.map(_.map(_.map(_.toDouble).toArray).toArray).toArray

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return null
    val arr = v.asInstanceOf[ArrayData]
    val out = new Array[Int](matrix.length)
    var t = 0
    while (t < matrix.length) {
      var bucket = 0
      var p = 0
      while (p < matrix(t).length) {
        val plane = matrix(t)(p)
        val n = math.min(plane.length, arr.numElements())
        var acc = 0.0
        var i = 0
        while (i < n) {
          if (arr.isNullAt(i)) return null
          acc += plane(i) * (if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i))
          i += 1
        }
        if (acc > 0) bucket |= 1 << p
        p += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val getter = if (isFloat) "getFloat" else "getDouble"
    val mat = ctx.addReferenceObj("signs", matrix, "double[][][]")
    nullSafeCodeGen(ctx, ev, a => {
      val out = ctx.freshName("out")
      val t = ctx.freshName("t")
      val p = ctx.freshName("p")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val bucket = ctx.freshName("bucket")
      val plane = ctx.freshName("plane")
      val done = ctx.freshName("done")
      s"""
         |int[] $out = new int[$mat.length];
         |boolean $done = false;
         |for (int $t = 0; $t < $mat.length && !$done; $t++) {
         |  int $bucket = 0;
         |  for (int $p = 0; $p < $mat[$t].length && !$done; $p++) {
         |    double[] $plane = $mat[$t][$p];
         |    int $n = java.lang.Math.min($plane.length, $a.numElements());
         |    double $acc = 0.0;
         |    for (int $i = 0; $i < $n; $i++) {
         |      if ($a.isNullAt($i)) { ${ev.isNull} = true; $done = true; break; }
         |      $acc += $plane[$i] * (double) $a.$getter($i);
         |    }
         |    if ($acc > 0) $bucket |= 1 << $p;
         |  }
         |  $out[$t] = $bucket;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBuckets =
    copy(child = newChild)
}
