package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The Count-Min hash family shared by every CM surface: the batch catalog
  * entry (`events_count_min`, ScaleCatalog), its DuckDB oracle (the SQL is
  * generated from [[Hashes]]), the streaming cell-state form
  * (StreamingQueries.streamingCountMin), and the test-side probe — one
  * definition so the four can never drift.
  *
  * bucket_r(k) = ((k·a_r + b_r) mod P) mod [[Width]], P = 1e9+7 (the house
  * polynomial modulus). All arithmetic stays in nonnegative int64 (k·a ≤
  * ~2^63 for any realistic key space), so Spark, DuckDB, and plain Scala
  * compute identical buckets.
  */
object CountMinSketch {
  val P: Long = 1000000007L
  val Width: Int = 32
  /** One (a, b) affine pair per sketch row; depth = Hashes.size. */
  val Hashes: Seq[(Long, Long)] =
    Seq((31L, 7L), (131L, 101L), (1009L, 9973L), (9176L, 12345L))

  def bucket(r: Int, k: Long): Int = {
    val (a, b) = Hashes(r)
    (((k * a + b) % P) % Width).toInt
  }

  def bucketCol(r: Int, k: Column): Column = {
    val (a, b) = Hashes(r)
    pmod(pmod(k * a + b, lit(P)), lit(Width))
  }


  /** Point estimate from a materialized cell map ((r, bucket) → sum). */
  def estimate(cells: Map[(Int, Int), Long], k: Long): Long =
    Hashes.indices.map(r => cells.getOrElse((r, bucket(r, k)), 0L)).min
}
