package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Key-salting for skewed aggregations: when one key carries a large
  * fraction of all rows (the GUTENBERG scenario the reference's skew
  * simulator builds, WordCountPreAggregate.java:285-298), a single
  * reducer partition becomes the straggler. Salting splits each key into
  * `saltBuckets` sub-keys for a first partial aggregation, then merges
  * the partials in a second, tiny aggregation — two shuffles, but the
  * first is uniform by construction.
  *
  * Only worth it for algebraic aggregates (sum/count/min/max) whose
  * partials merge losslessly — exactly the PreAggregateFunction algebra
  * (see graft.combine). For Spark ≥3.0, AQE skew-join handles the JOIN
  * case at runtime; salting remains the tool for skewed AGGREGATIONS
  * with high-cardinality accumulators.
  */
object Salting {

  /** Salted count-per-key: deterministic row-derived salt (hash of a
    * discriminator column, NOT rand() — keeps the operator re-runnable
    * and oracle-friendly).
    */
  def saltedCount(df: DataFrame, key: Column, discriminator: Column, saltBuckets: Int = 16): DataFrame =
    df.select(key.as("k"), pmod(hash(discriminator), lit(saltBuckets)).as("salt"))
      .groupBy("k", "salt")
      .agg(count(lit(1)).as("partial_cnt"))
      .groupBy("k")
      .agg(sum("partial_cnt").as("cnt"))

  /** Salted sum of `value` per key (same two-phase shape). */
  def saltedSum(df: DataFrame, key: Column, value: Column, discriminator: Column,
      saltBuckets: Int = 16): DataFrame =
    df.select(key.as("k"), value.as("v"), pmod(hash(discriminator), lit(saltBuckets)).as("salt"))
      .groupBy("k", "salt")
      .agg(sum("v").as("partial_sum"))
      .groupBy("k")
      .agg(sum("partial_sum").as("total"))
}
