package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Public vector functions over `array<float|double>` embedding columns.
  * Dot products are explicit LEFT folds (deterministic summation order —
  * the engine-portability contract shared with the DuckDB oracles); all
  * composition is built-in functions, no UDFs.
  */
object Vectors {

  /** Left-fold dot product with per-element double widening — a native
    * codegen'd expression (graft.expressions.DotProduct); bit-identical
    * to the declarative `aggregate(zip_with(...))` fold it replaced,
    * which ran on the interpreted higher-order-function path.
    */
  def dot(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftSqlBridge
    GraftSqlBridge.column(
      graft.expressions.DotProduct(GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))
  }

  /** Euclidean norm. */
  def norm(v: Column): Column = sqrt(dot(v, v))

  /** Cosine similarity; pass precomputed norms when scoring many pairs
    * (compute each side's norm once per row, not once per pair).
    */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  def cosineWithNorms(a: Column, b: Column, normA: Column, normB: Column): Column =
    dot(a, b) / (normA * normB)

  /** Signed projection of `v` onto a ±1 hyperplane (sign vector), as a
    * codegen'd dot product against the literal sign array. Bit-identical
    * to the unrolled `±element` sum the oracle SQL uses: `s*x` with
    * s = ±1.0 is exact sign flip, and `a + (-b)` ≡ `a - b` in IEEE; the
    * unrolled form previously blew whole-stage codegen's method-size
    * limit at 8 planes × 4 tables (interpreted fallback for the whole
    * projection stage).
    */
  def project(v: Column, signs: Seq[Int]): Column =
    dot(v.cast("array<double>"), array(signs.map(s => lit(s.toDouble)): _*))

  /** All LSH bucket ids for a family of hyperplane tables, as one
    * `array<int>` column — a single codegen'd loop nest
    * (graft.expressions.HyperplaneBuckets) instead of tables × planes
    * inlined projection expressions, whose Janino compilation dominated
    * the banded near-dup query (~2.5 s of 3 s at 4×8 planes).
    */
  def hyperplaneBuckets(v: Column, tables: Seq[Seq[Seq[Int]]]): Column = {
    import org.apache.spark.sql.GraftSqlBridge
    GraftSqlBridge.column(
      graft.expressions.HyperplaneBuckets(GraftSqlBridge.expression(v), tables))
  }

  /** Random-hyperplane LSH bucket id: bit p set when the projection onto
    * plane p is positive.
    */
  def hyperplaneBucket(v: Column, planes: Seq[Seq[Int]]): Column =
    hyperplaneBuckets(v, Seq(planes)).getItem(0)
}
