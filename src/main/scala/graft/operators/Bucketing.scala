package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table helpers: pre-shuffle both sides of a recurring join
  * onto the same bucket layout so the join itself needs NO exchange —
  * the bucketing strategy the 100 TB plan depends on for repeated
  * fact ⋈ fact joins where broadcasting is impossible (SURVEY §2.7's
  * partitioning knobs, taken to Spark's persistent form).
  */
object Bucketing {

  /** Write `df` as a bucketed managed table (sorted within buckets). */
  def writeBucketed(
      df: DataFrame,
      table: String,
      bucketCol: String,
      numBuckets: Int = 16): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)

  /** Join two same-bucketed tables on their bucket key: with matching
    * layouts Catalyst plans a SortMergeJoin with ZERO Exchange operators
    * — verify with `coLocatedJoinIsExchangeFree`.
    */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
      leftKey: String, rightKey: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable),
      org.apache.spark.sql.functions.col(leftKey) ===
        org.apache.spark.sql.functions.col(rightKey))

  /** True iff the executed plan contains no shuffle exchange. */
  def isExchangeFree(df: DataFrame): Boolean =
    !df.queryExecution.executedPlan.toString.contains("Exchange hashpartitioning")

  /** Write `df` as directory-partitioned parquet (one directory per
    * value of `partitionCol`) — the lakehouse layout knob: a reader's
    * partition-column predicate prunes whole directories at PLANNING
    * time, before any file is opened. Bucketing kills the join shuffle;
    * partitioning kills the scan. Keep partition columns low-cardinality
    * (source, date, language) or the layout degenerates into the
    * small-files problem.
    */
  def writePartitioned(df: DataFrame, path: String, partitionCol: String): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .partitionBy(partitionCol)
      .parquet(path)
}
