package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-line streaming source over a socket — the engine's analogue of the
  * reference's `MqttDataSource` (udfs/MqttDataSource.java: subscribe a
  * broker topic, optionally stamp ingestion time, honor a "SHUTDOWN"
  * poison pill). Spark's `socket` source is the broker stand-in this
  * environment can integration-test; the production broker path is
  * [[BrokerSource]] with a [[KafkaTransport]] — same normalized frame,
  * same downstream pipeline.
  */
object SocketLineSource {

  val PoisonPill = "SHUTDOWN"

  /** Raw lines from host:port, poison pills included (a `foreachBatch`
    * harness checks [[sawPoison]] and stops the query — the reference
    * stops its source loop the same way).
    *
    * @param ingestionTime when true, stamp each line with processing time
    *                      (`MqttDataSource`'s optional ingestion timestamping)
    */
  def lines(spark: SparkSession, host: String, port: Int, ingestionTime: Boolean = true): DataFrame =
    BrokerSource.lines(spark, SocketTransport(host, port), ingestionTime)

  /** The data path: poison pills removed. */
  def dataLines(spark: SparkSession, host: String, port: Int, ingestionTime: Boolean = true): DataFrame =
    lines(spark, host, port, ingestionTime).filter(col("line") =!= PoisonPill)

  /** True if the batch contains the poison pill — for use inside
    * `foreachBatch` harnesses that mirror the reference's shutdown
    * semantics (`if (seenPoison) query.stop()`).
    */
  def sawPoison(batch: DataFrame, lineCol: String = "line"): Boolean =
    batch.filter(col(lineCol) === PoisonPill).limit(1).count() > 0
}
