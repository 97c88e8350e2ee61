package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.LongType

/** Distributed global ranking — `ROW_NUMBER() OVER (ORDER BY …)` without
  * the single-partition WindowExec a global (unpartitioned) window forces.
  *
  * Shape: one range shuffle (`repartitionByRange` on the order keys) puts
  * every row of partition i strictly before every row of partition i+1 in
  * the total order; a within-partition sort orders rows inside each; then
  * `zipWithIndex` assigns the global contiguous index in two narrow jobs
  * (a per-partition count that re-reads the already-materialized shuffle
  * files, then the indexed emit). Total cost: ONE wide shuffle read twice
  * — versus the window formulation's range shuffle PLUS a second full
  * hash shuffle, or the naive global window's all-rows-on-one-task plan
  * that dies at any real scale. The skew ceiling is the largest range
  * bucket (the sampler targets uniform buckets), not the whole dataset.
  *
  * The order columns MUST form a total order — include a unique tiebreak
  * key (e.g. the row id): ranks of tied rows would otherwise depend on
  * physical placement. Range-boundary sampling only moves partition
  * borders; given a total order the emitted ranks are identical for any
  * boundary choice, so the output is deterministic across runs and
  * cluster sizes.
  *
  * Reference analogue: flink-adcom funnels whole streams through
  * parallelism-1 sorted formatters
  * (src/main/java/org/apache/flink/streaming/examples/aggregate/udfs/
  * TaxiRideCountSortedValuesFormatterMap.java); this is the scale-correct
  * batch counterpart of that global ordering.
  */
object GlobalRank {

  /** Returns `df` with an added BIGINT `rankCol` = 1-based position in the
    * total order given by `order`.
    */
  def withRank(
      df: DataFrame,
      order: Seq[Column],
      numPartitions: Int,
      rankCol: String = "rank"): DataFrame = {
    val sorted = df
      .repartitionByRange(numPartitions, order: _*)
      .sortWithinPartitions(order: _*)
    val schema = sorted.schema.add(rankCol, LongType, nullable = false)
    val ranked = sorted.rdd
      .zipWithIndex()
      .map { case (row, idx) => Row.fromSeq(row.toSeq :+ (idx + 1L)) }
    df.sparkSession.createDataFrame(ranked, schema)
  }
}
