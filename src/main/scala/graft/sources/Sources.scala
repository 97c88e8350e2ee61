package graft.sources

import java.nio.file.{Files, Path, Paths}
import java.util.concurrent.atomic.{AtomicBoolean, AtomicLong}

import scala.util.Try

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming sources mirroring the reference's source zoo (SURVEY §2.1):
  * rate-controlled file replay with a runtime-adjustable rec/s knob
  * (TaxiRideSource + DataRateListener), fixed word-list emitters
  * (DataRateSource), and the drifting-skew rotation
  * (DataRateVariationSource). Built on MemoryStream + Spark's `rate`
  * source — the idiomatic Structured Streaming stand-ins (the reference's
  * per-record busy-sleep loop has no Spark equivalent; pacing happens at
  * the feeder).
  */
object Sources {

  /** DataRateListener analogue (util/DataRateListener.java:1-120): a
    * rec/s control re-read from a file periodically, so the rate is
    * hot-swappable at runtime exactly like `/tmp/datarate.txt`. The file
    * holds the per-record delay in NANOSECONDS (reference semantics:
    * 1000 ns → 1M rec/s).
    */
  final class DataRateControl(ratePath: Path, defaultDelayNs: Long = 1000000L) {
    private val delayNs = new AtomicLong(defaultDelayNs)
    def currentDelayNs: Long = delayNs.get()
    def recordsPerSec: Long = 1000000000L / math.max(1L, delayNs.get())
    /** Re-read the control file (call from the feeder loop; the reference
      * polls every 60 s).
      */
    def refresh(): Unit =
      if (Files.exists(ratePath)) {
        Try(Files.readString(ratePath).trim.toLong).foreach { v =>
          if (v > 0) delayNs.set(v)
        }
      }
  }

  /** Rate-controlled replay of a finite dataset into a MemoryStream
    * (TaxiRideSource.java:33-163: timestamp-ordered replay, rate-limited,
    * looping optional). The feeder thread paces batches to honor the
    * control's rec/s; `stop()` ends the feed.
    */
  final class RateLimitedReplay[T](
      spark: SparkSession,
      data: IndexedSeq[T],
      control: DataRateControl,
      batchRecords: Int = 100,
      loop: Boolean = false)(implicit enc: Encoder[T]) {

    val stream: MemoryStream[T] = MemoryStream[T](spark)
    private val running = new AtomicBoolean(false)
    private val fed = new AtomicLong(0L)
    def recordsFed: Long = fed.get()

    def toDF: DataFrame = stream.toDF()

    def start(): Thread = {
      running.set(true)
      val t = new Thread(() => {
        var i = 0
        while (running.get() && (loop || i < data.length)) {
          control.refresh()
          val end = math.min(data.length, i + batchRecords)
          val chunk = data.slice(i, end)
          if (chunk.nonEmpty) {
            stream.addData(chunk)
            fed.addAndGet(chunk.length.toLong)
          }
          i = if (end >= data.length && loop) 0 else end
          // Pace: batchRecords * delayNs per batch (the reference busy-sleeps
          // per record; sleeping per batch gives the same average rate).
          val ns = chunk.length.toLong * control.currentDelayNs
          val ms = ns / 1000000L
          if (ms > 0) Thread.sleep(ms) else Thread.onSpinWait()
        }
      }, "rate-limited-replay-feeder")
      t.setDaemon(true)
      t.start()
      t
    }

    def stop(): Unit = running.set(false)
  }

  /** DataRateSource analogue (udfs/DataRateSource.java): Spark's `rate`
    * source mapped onto a fixed word list — emits `rowsPerSecond` words/s
    * continuously.
    */
  def wordRateSource(spark: SparkSession, words: Seq[String], rowsPerSecond: Long): DataFrame = {
    val arr = array(words.map(lit): _*)
    spark.readStream.format("rate").option("rowsPerSecond", rowsPerSecond).load()
      .select(element_at(arr, (pmod(col("value"), lit(words.size)) + 1).cast("int")).as("word"),
        col("timestamp").as("ts"))
  }

  /** DataRateVariationSource analogue (udfs/DataRateVariationSource.java):
    * rotates between skewed word arrays every `rotateEverySec` seconds of
    * stream time, creating the drifting key distribution the adaptive
    * combiner is built for.
    */
  def driftingWordSource(
      spark: SparkSession,
      wordArrays: Seq[Seq[String]],
      rowsPerSecond: Long,
      rotateEverySec: Long = 300L): DataFrame = {
    val arrays = array(wordArrays.map(ws => array(ws.map(lit): _*)): _*)
    spark.readStream.format("rate").option("rowsPerSecond", rowsPerSecond).load()
      .withColumn("phase",
        (pmod(unix_timestamp(col("timestamp")) / rotateEverySec, lit(wordArrays.size))).cast("int"))
      .select(element_at(
        element_at(arrays, col("phase") + 1),
        (pmod(col("value"), lit(wordArrays.head.size)) + 1).cast("int")).as("word"),
        col("timestamp").as("ts"))
  }

  /** Skewed word-frequency generator (WordCountPreAggregateData.SKEW_WORDS
    * analogue, :70-723): `skewFraction` of emissions are the hot key.
    */
  def skewedWords(hotKey: String, others: Seq[String], n: Int, skewFraction: Double): IndexedSeq[String] =
    (0 until n).map { i =>
      if ((i % 100) < (skewFraction * 100).toInt) hotKey
      else others(i % others.size)
    }

  def defaultRatePath: Path = Paths.get(
    sys.props.getOrElse("graft.datarate.path", "/tmp/graft-datarate.txt"))

  /** File-replay streaming source: the driver parquet tables replayed as a
    * micro-batched stream (`maxFilesPerTrigger` caps ingest per trigger) —
    * the production-shaped counterpart of [[RateLimitedReplay]] for data
    * already on storage (TaxiRideSource replays a file the same way;
    * SURVEY §2.1 maps it to exactly this).
    */
  def fileReplay(
      spark: SparkSession,
      sfDir: String,
      table: String,
      maxFilesPerTrigger: Int = 1): DataFrame = {
    graft.Tables.ensureSessionConfs(spark)
    val path = s"$sfDir/$table.parquet"
    // Physical file schema (events.ts is INT64 nanos on disk; the batch
    // loader's converted schema would not match the files).
    // FileStreamSource needs a directory/glob, not a literal file path —
    // glob the table file so the sf dir becomes the base.
    val raw = spark.readStream
      .schema(spark.read.parquet(path).schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(s"$sfDir/{$table}.parquet")
    // events.ts normalization must match Tables.events exactly (both disk
    // encodings — INT64 raw nanos or TIMESTAMP_NTZ micros — land on
    // TimestampType; see Tables.events for the two-generation history).
    if (table == "events") raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts",
          org.apache.spark.sql.functions.expr("timestamp_micros(ts DIV 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts",
          org.apache.spark.sql.functions.col("ts").cast("timestamp"))
      case _ => raw
    } else raw
  }

  /** Test-data producer (util/MqttDataProducer.java analogue): pushes
    * lines to a socket client with a controllable inter-line delay, then
    * the poison pill. Serves the SocketLineSource tests/harness the way
    * MqttDataProducer feeds the reference's MQTT topics.
    */
  final class SocketLineProducer(
      server: java.net.ServerSocket,
      lines: Seq[String],
      delayMs: Long = 0L,
      sendPoison: Boolean = true) {
    def start(): Thread = {
      val t = new Thread(() => {
        val sock = server.accept()
        val out = new java.io.PrintWriter(sock.getOutputStream, true)
        lines.foreach { l => out.println(l); if (delayMs > 0) Thread.sleep(delayMs) }
        if (sendPoison) out.println(graft.sources.SocketLineSource.PoisonPill)
        out.flush()
        Thread.sleep(3000) // let the socket source drain before close
        sock.close(); server.close()
      }, "socket-line-producer")
      t.setDaemon(true)
      t.start()
      t
    }
  }
}
