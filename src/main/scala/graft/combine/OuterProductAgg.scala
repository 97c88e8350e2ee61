package graft.combine

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Upper-triangular Gram accumulator buffer: `cells(idx)` holds the
  * scaled-integer sum of `v[i]*v[j]` over all input vectors, for the
  * triangle index `idx = Σ_{r<i}(dim−r) + (j−i)`, i ≤ j.
  */
final case class GramBuf(cells: Array[Long])

/** One-pass dim×dim Gram-matrix aggregate over an `array<float>` embedding
  * column — the covariance/PCA building block (X'X) computed the way a
  * 100 TB corpus demands: a single scan with map-side partial outer
  * products and a dim(dim+1)/2-cell merge, never an explode/self-join that
  * multiplies the corpus by dim² before aggregating.
  *
  * Determinism across engines: per-row products are IEEE doubles (both
  * engines multiply the same two widened floats → identical bits), then
  * snapped to an integer lattice — `floor(x·scale + 0.5)` — and summed as
  * Longs: integer addition is associative, so partition order, merge shape,
  * and engine cannot change the result. With |x·y| ≤ 1 and scale = 1e9 the
  * per-row term is ≤ 1e9, leaving headroom for ~9e9 rows in a signed 64-bit
  * sum; beyond that, widen the accumulator to a two-long 128-bit lattice —
  * the lattice idea is the contract, the width is a knob.
  */
final class OuterProductAgg(dim: Int, scale: Double)
    extends Aggregator[Seq[Float], GramBuf, GramBuf] {

  private val len = dim * (dim + 1) / 2

  override def zero: GramBuf = GramBuf(new Array[Long](len))

  override def reduce(b: GramBuf, v: Seq[Float]): GramBuf = {
    // NULL rows are SKIPPED, matching SQL aggregate semantics (sum/avg
    // ignore NULL; typed Aggregators get no such treatment from Spark) —
    // a corpus at scale carries missing vectors, and a missing vector
    // contributes nothing to X'X. A PRESENT vector of the wrong length
    // is a different thing: malformed data, failed loudly below.
    if (v == null) return b
    // Fail at the row, not deep in codegen: a short embedding would
    // otherwise surface as a bare IndexOutOfBoundsException, and a long
    // one would be silently truncated to the first `dim` components.
    require(v.length == dim,
      s"OuterProductAgg(dim=$dim) fed an embedding of length ${v.length}")
    val cells = b.cells
    var idx = 0
    var i = 0
    while (i < dim) {
      val xi = v(i).toDouble
      var j = i
      while (j < dim) {
        cells(idx) += math.floor(xi * v(j).toDouble * scale + 0.5).toLong
        idx += 1
        j += 1
      }
      i += 1
    }
    b
  }

  override def merge(a: GramBuf, b: GramBuf): GramBuf = {
    var k = 0
    while (k < len) { a.cells(k) += b.cells(k); k += 1 }
    a
  }

  override def finish(b: GramBuf): GramBuf = b
  override def bufferEncoder: Encoder[GramBuf] = Encoders.product[GramBuf]
  override def outputEncoder: Encoder[GramBuf] = Encoders.product[GramBuf]
}
