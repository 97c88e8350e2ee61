package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The md5-seeded Count-Min hash family for JOIN-SIZE inner products
  * (Cormode & Muthukrishnan 2005 §4.2) — shared by the batch catalog
  * entry (`lineitem_join_size_sketch`, ScaleCatalog), its generated
  * DuckDB oracle, the streaming cell-state form
  * (StreamingQueries.streamingJoinSizeCells), and the test-side probe:
  * one definition so the four can never drift.
  *
  * Deliberately NOT the affine family of [[CountMinSketch]]: at width
  * 2¹⁶ the affine rows are injective on a compact key domain and the
  * estimator degenerates to exact (the negative result recorded in the
  * batch entry's scaladoc). bucket_r(k) = first 8 hex digits of
  * md5("r|k") mod [[Width]] — a genuinely mixed hash, identical across
  * Spark SQL, DuckDB, and plain JVM arithmetic (8 hex digits ≤ 2³² fit
  * a long exactly; md5 of the decimal text is bytewise-defined).
  */
object JoinSizeSketch {
  val Width: Int = 65536 // 2^16 — join-size accuracy needs width
  val Depth: Int = 4

  def bucketCol(r: Int, k: Column): Column =
    pmod(conv(substring(md5(concat(lit(s"$r|"), k.cast("string"))), 1, 8),
      16, 10).cast("long"), lit(Width.toLong))

  /** JVM mirror of [[bucketCol]]: first 4 md5 bytes of "r|k" are
    * exactly the first 8 hex digits Spark's substring takes. The key is
    * its STRING form — the same decimal-text contract as `bucketCol`'s
    * cast("string"), so any atomic key type buckets identically here,
    * in the Column form, and in the generated oracle. */
  def bucket(r: Int, k: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val b4 = md.digest(s"$r|$k".getBytes("UTF-8")).take(4)
    val v = b4.foldLeft(0L)((acc, b) => (acc << 8) | (b & 0xffL))
    v % Width
  }

  /** Long-key convenience: s"$k" IS the decimal text `bucketCol` hashes. */
  def bucket(r: Int, k: Long): Long = bucket(r, k.toString)

  /** Inner-product estimate from two materialized cell maps
    * ((row, bucket) → sum): min over rows of Σ_bucket cellA·cellB —
    * the batch entry's broadcast-probe arithmetic in plain longs. */
  def estimate(cellsA: Map[(Int, Long), Long], cellsB: Map[(Int, Long), Long]): Long =
    (0 until Depth).map { r =>
      cellsA.iterator.collect {
        case ((rr, b), ca) if rr == r => ca * cellsB.getOrElse((r, b), 0L)
      }.sum
    }.min
}
