package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{BrokerSource, KafkaTransport, SocketTransport}

/** The broker seam: socket is integration-tested live in
  * SocketAndWindowSpec; the kafka transport has no broker and no
  * connector jar in this environment, so these tests pin what IS
  * checkable without one — the exact reader configuration the transport
  * produces, and the normalization projection over the kafka connector's
  * documented output schema. A typo in an option key, a lost passthrough
  * option, or a broken binary→string cast all fail here.
  */
class BrokerSourceSpec extends AnyFunSuite {
  import TestSpark.spark

  test("KafkaTransport wires the documented reader config, passthroughs included") {
    val t = KafkaTransport("broker1:9092,broker2:9092", "adcom-events",
      startingOffsets = "earliest",
      extra = Map("maxOffsetsPerTrigger" -> "10000"))
    assert(t.format == "kafka")
    assert(t.options == Map(
      "kafka.bootstrap.servers" -> "broker1:9092,broker2:9092",
      "subscribe" -> "adcom-events",
      "startingOffsets" -> "earliest",
      "maxOffsetsPerTrigger" -> "10000"))
    // The reader is constructible from the config alone (load() is what
    // needs the connector jar, and is deliberately not called).
    BrokerSource.reader(spark, t)
  }

  test("KafkaTransport defaults to the live tail (latest), matching the MQTT-subscribe semantics") {
    assert(KafkaTransport("b:9092", "t").options("startingOffsets") == "latest")
  }

  test("kafka normalization casts the binary value to the house line schema") {
    // The kafka source's documented output schema (connector docs):
    // key/value binary + topic/partition/offset/timestamp/timestampType.
    val kafkaSchema = StructType(Seq(
      StructField("key", BinaryType), StructField("value", BinaryType),
      StructField("topic", StringType), StructField("partition", IntegerType),
      StructField("offset", LongType), StructField("timestamp", TimestampType),
      StructField("timestampType", IntegerType)))
    val rows = java.util.Arrays.asList(
      org.apache.spark.sql.Row(null, "hello world".getBytes("UTF-8"),
        "adcom-events", 0, 42L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 0))
    val raw = spark.createDataFrame(rows, kafkaSchema)
    val t = KafkaTransport("b:9092", "adcom-events")

    val stamped = BrokerSource.normalize(raw, t)
    assert(stamped.schema.fieldNames.toSeq == Seq("line", "ingest_ts"))
    assert(stamped.schema("line").dataType == StringType)
    assert(stamped.select("line").head().getString(0) == "hello world")

    val bare = BrokerSource.normalize(raw, t, ingestionTime = false)
    assert(bare.schema.fieldNames.toSeq == Seq("line"))
  }

  test("socket normalization passes the already-string value through") {
    val raw = spark.createDataFrame(
      java.util.Arrays.asList(org.apache.spark.sql.Row("a line")),
      StructType(Seq(StructField("value", StringType))))
    val out = BrokerSource.normalize(raw, SocketTransport("h", 1), ingestionTime = false)
    assert(out.schema.fieldNames.toSeq == Seq("line"))
    assert(out.head().getString(0) == "a line")
  }
}
