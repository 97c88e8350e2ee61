package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Batch corpus writer — the training-shard layout step: a cleaned
  * documents frame lands as parquet partitioned by `source`, each file
  * internally sorted by `doc_id`, with a bounded row count per file.
  *
  * The partitioning is the load-bearing choice. A naive
  * `write.partitionBy(source)` after an arbitrary shuffle has EVERY task
  * holding rows of every source, so the job emits #tasks × #sources
  * files — at 1000 executors over 100 TB that is millions of small files
  * and a dead metastore. Range-partitioning on (source, doc_id) first
  * means each task holds one contiguous slice of one or two sources:
  * file count collapses to ~max(#tasks, #sources) while hot sources
  * still spread over many tasks (a plain `repartition(source)` would
  * bottleneck each source into ONE task — the skew ceiling would be the
  * largest domain). `maxRecordsPerFile` bounds shard size for loaders
  * that stream fixed-size shards.
  *
  * Reference analogue: flink-adcom writes results via a single-parallelism
  * text sink (util/SinkOutputs.java); this is the batch layout a
  * distributed training loader actually consumes.
  */
object CorpusWriter {

  def write(
      docs: DataFrame,
      path: String,
      numShards: Int,
      maxRecordsPerFile: Long = 1L << 20): Unit =
    docs
      .repartitionByRange(numShards, col("source"), col("doc_id"))
      .sortWithinPartitions("source", "doc_id")
      .write
      .partitionBy("source")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .mode("overwrite")
      .parquet(path)
}
