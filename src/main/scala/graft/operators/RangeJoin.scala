package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval-overlap (range) joins by fixed-width bucketing — the scale
  * answer to the one join shape Catalyst plans as a nested loop: a join
  * whose ONLY condition is a range predicate has no equi-key, so Spark
  * falls back to BroadcastNestedLoopJoin (or a cartesian) and compares
  * every pair. Decomposing the number line into width-`width` buckets
  * turns it into an EQUI-join on the bucket id: each side replicates an
  * interval into the buckets it touches (intervals spanning b buckets
  * emit b rows — bounded by interval_length/width + 2), the join matches
  * per bucket, and the exact range predicate runs as the join residual.
  *
  * Duplicate elimination is ARITHMETIC, not a distinct: an overlapping
  * pair co-occurs in every bucket both touch, but only ONE bucket equals
  * `max(floor(lStart/W), floor(rStart/W))` (the first bucket where both
  * are active) — the assign-once filter keeps exactly that copy, so no
  * post-join shuffle is spent deduplicating.
  *
  * At 100 TB: shuffle volume is rows × avg-buckets-per-interval, tuned
  * by `width` (wide buckets → fewer replicas, denser buckets; narrow →
  * the reverse); the join itself is an ordinary hash equi-join on a
  * uniform numeric key. Caller contract: start/end are inclusive LONG
  * columns in any consistent unit, and the bucket range must COVER the
  * residual predicate (pad the interval by the unit-floor slack — e.g.
  * +1 s when bucketing floor-second epochs against exact timestamps).
  */
object RangeJoin {

  private val B = "graft_range_bucket"

  /** Overlap join of left intervals [lStart, lEnd] with right intervals
    * [rStart, rEnd] (column names on their own frames), keeping pairs
    * that satisfy `residual` (evaluated on the joined row; pass the
    * EXACT overlap/range predicate here).
    */
  def intervalOverlap(
      left: DataFrame, right: DataFrame,
      lStart: String, lEnd: String,
      rStart: String, rEnd: String,
      width: Long,
      residual: Column): DataFrame = {
    require(width > 0, s"bucket width must be positive, got $width")
    val l = left.withColumn(B,
      explode(sequence(floor(col(lStart) / width), floor(col(lEnd) / width))))
    val r = right.withColumn(B + "_r",
      explode(sequence(floor(col(rStart) / width), floor(col(rEnd) / width))))
    l.join(r,
        col(B) === col(B + "_r") &&
          col(B) === greatest(floor(col(lStart) / width), floor(col(rStart) / width)) &&
          residual)
      .drop(B, B + "_r")
  }
}
