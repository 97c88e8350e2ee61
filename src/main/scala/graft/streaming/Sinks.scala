package graft.streaming

import java.util.concurrent.ConcurrentHashMap

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{ForeachWriter, Row}

/** Foreach sinks — the engine's analogue of the reference's
  * `MqttDataSink` (udfs/MqttDataSink.java: a RichSinkFunction publishing
  * each record to an external topic) and `print()` console sink
  * (TaxiRideCountPreAggregate.java:78). Structured Streaming's foreach
  * sink gives at-least-once per epoch — same contract as the reference's
  * MQTT AT_LEAST_ONCE delivery (SURVEY §2.9); an idempotent upsert target
  * makes it effectively exactly-once.
  */
object Sinks {

  /** Shared registry so executor-side writer clones and the driver-side
    * test observe the same state in local mode.
    */
  private[streaming] val registries =
    new ConcurrentHashMap[String, ConcurrentHashMap[String, Row]]()

  def registry(id: String): ConcurrentHashMap[String, Row] =
    registries.computeIfAbsent(id, _ => new ConcurrentHashMap[String, Row]())

  def clear(id: String): Unit = registries.remove(id)
}

/** Upserting foreach sink: row → (key from first `keyCols` columns) →
  * last-write-wins map. With update output mode the map converges to the
  * final rolling-aggregate state — the idempotent stand-in for the
  * reference's MQTT topic consumer.
  *
  * NOTE: state lives in the [[Sinks]] JVM-local registry — correct in
  * local[*] (driver and executors share the JVM); on a real cluster this
  * sink would publish to an external store instead, exactly like
  * MqttDataSink publishes to a broker.
  */
final class UpsertSink(id: String, keyCols: Int = 1) extends ForeachWriter[Row] {
  override def open(partitionId: Long, epochId: Long): Boolean = true
  override def process(row: Row): Unit = {
    val key = (0 until keyCols).map(i => String.valueOf(row.get(i))).mkString("|")
    Sinks.registry(id).put(key, row)
  }
  override def close(errorOrNull: Throwable): Unit = ()
}

/** Console sink analogue of the reference `print()` — bounded, for
  * diagnostics; not used by tests.
  */
final class ConsoleRowSink extends ForeachWriter[Row] {
  override def open(partitionId: Long, epochId: Long): Boolean = true
  override def process(row: Row): Unit = println(row.mkString("[", ", ", "]"))
  override def close(errorOrNull: Throwable): Unit = ()
}

/** Text-file sinks — the `writeAsText` surface (WordCountPreAggregate
  * .java:195): one formatted line per record (compose with
  * graft.queries.Formatters for the reference wire formats).
  */
object TextSink {
  /** Batch text write of a single string column named `line`. */
  def writeLines(df: org.apache.spark.sql.DataFrame, path: String): Unit =
    df.write.mode("overwrite").text(path)

  /** Streaming text write (append mode; exactly-once per file epoch). */
  def streamLines(df: org.apache.spark.sql.DataFrame, path: String,
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    df.writeStream.format("text")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .start()
}
