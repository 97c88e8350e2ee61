package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Text

/** User-facing deduplication operators — the dataset-in, dataset-out
  * facade over the pipeline catalog's oracle-checked building blocks.
  */
object Dedup {

  /** Exact dedup by normalized content: keeps the row with the smallest
    * `idCol` per distinct content (deterministic survivor — unlike
    * `dropDuplicates`, whose survivor depends on partition order). The
    * ranking window partitions on the 128-bit content hash: maximal
    * cardinality, no skew, scale-safe.
    */
  def exactByContent(df: DataFrame, textCol: Column, idCol: Column): DataFrame = {
    val w = Window.partitionBy(Text.contentHash(textCol)).orderBy(idCol)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Remove near-duplicates given a pair list (e.g. the output of the
    * MinHash-LSH entry): drops the higher id of every pair, transitively
    * (a chain a~b~c keeps only its minimum id when pairs close the
    * chain). One broadcast-friendly anti-join.
    */
  def dropNearDuplicates(df: DataFrame, idCol: Column, pairs: DataFrame,
      pairA: String = "doc_a", pairB: String = "doc_b"): DataFrame = {
    val losers = pairs.select(col(pairB).as("__loser")).distinct()
    df.join(broadcast(losers), idCol === col("__loser"), "left_anti")
  }
}
