package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamReader

/** Transport configuration for the reference's broker-backed streaming
  * sources (`udfs/MqttDataSource.java` subscribes an MQTT topic and emits
  * its messages as lines). One seam, two transports:
  *
  *  - [[SocketTransport]] — the in-repo integration path: Spark's
  *    `socket` source, exercised end-to-end by SocketAndWindowSpec
  *    against a real local server socket.
  *  - [[KafkaTransport]] — the production path: Spark's `kafka` source
  *    with the house line projection (`CAST(value AS STRING)`). This
  *    environment has no broker and no spark-sql-kafka connector jar
  *    (zero egress), so `load()` cannot run here; what IS testable — and
  *    tested, BrokerSourceSpec — is the full config wiring (format +
  *    option map) and the normalization projection over the connector's
  *    documented output schema. On a real cluster the same
  *    `BrokerSource.lines` call is the working source; nothing else in
  *    the pipeline changes, which is the point of the seam.
  *
  * Everything downstream (poison-pill shutdown, windowing, the adaptive
  * trigger controller) consumes the normalized `line` frame and is
  * transport-agnostic.
  */
sealed trait BrokerTransport {
  /** The Spark source format name. */
  def format: String
  /** The reader options this transport needs. */
  def options: Map[String, String]
}

/** Spark `socket` source transport (the broker stand-in testable here). */
final case class SocketTransport(host: String, port: Int) extends BrokerTransport {
  def format: String = "socket"
  def options: Map[String, String] = Map("host" -> host, "port" -> port.toString)
}

/** Spark `kafka` source transport.
  *
  * @param bootstrapServers `kafka.bootstrap.servers` (host:port list)
  * @param topic            topic to subscribe (maps to `subscribe`)
  * @param startingOffsets  `latest` (the MQTT-like live tail, default) or
  *                         `earliest` / a JSON offset spec for replay
  * @param extra            passthrough options (e.g. `maxOffsetsPerTrigger`
  *                         for rate control, `kafka.security.protocol`)
  */
final case class KafkaTransport(
    bootstrapServers: String,
    topic: String,
    startingOffsets: String = "latest",
    extra: Map[String, String] = Map.empty) extends BrokerTransport {
  def format: String = "kafka"
  def options: Map[String, String] = Map(
    "kafka.bootstrap.servers" -> bootstrapServers,
    "subscribe" -> topic,
    "startingOffsets" -> startingOffsets) ++ extra
}

object BrokerSource {

  /** The configured (not yet loaded) stream reader for a transport —
    * format and options applied, `load()` left to the caller so config
    * wiring is constructible and testable without the transport's
    * runtime dependencies. */
  def reader(spark: SparkSession, t: BrokerTransport): DataStreamReader =
    t.options.foldLeft(spark.readStream.format(t.format)) {
      case (r, (k, v)) => r.option(k, v)
    }

  /** Normalize a transport's raw output to the house line schema
    * (`line` string, plus `ingest_ts` when ingestion-time stamping is
    * on — `MqttDataSource`'s optional timestamping). Kafka emits
    * `value: binary` (among key/topic/partition/offset/timestamp
    * columns); socket emits `value: string`. Factored out of the load
    * path so the projection is unit-testable over a static frame with
    * the connector's documented schema. */
  def normalize(raw: DataFrame, t: BrokerTransport, ingestionTime: Boolean = true): DataFrame = {
    val line = (t match {
      case _: KafkaTransport => col("value").cast("string")
      case _: SocketTransport => col("value")
    }).as("line")
    if (ingestionTime) raw.select(line, current_timestamp().as("ingest_ts"))
    else raw.select(line)
  }

  /** The normalized streaming line frame for a transport — the single
    * entry point the rest of the engine consumes. */
  def lines(spark: SparkSession, t: BrokerTransport, ingestionTime: Boolean = true): DataFrame =
    normalize(reader(spark, t).load(), t, ingestionTime)
}
