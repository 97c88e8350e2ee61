package graft

import java.io.PrintWriter
import java.net.ServerSocket
import java.sql.Timestamp

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Formatters
import graft.sources.SocketLineSource
import graft.streaming.{Sinks, StreamingQueries, UpsertSink}

/** Socket source (broker-source analogue), streaming windows, formatters. */
class SocketAndWindowSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("socket source streams lines from a live server; poison pill separable") {
    val server = new ServerSocket(0)
    val port = server.getLocalPort
    new graft.sources.Sources.SocketLineProducer(
      server, Seq("alpha", "beta", "gamma", "delta"), sendPoison = true).start()

    val sinkId = s"socket-${System.nanoTime()}"
    val q = SocketLineSource.lines(spark, "localhost", port, ingestionTime = false)
      .writeStream.outputMode("append")
      .foreach(new UpsertSink(sinkId)).start()
    try {
      val deadline = System.currentTimeMillis() + 15000
      while (Sinks.registry(sinkId).size() < 5 && System.currentTimeMillis() < deadline)
        Thread.sleep(100)
    } finally q.stop()
    val lines = Sinks.registry(sinkId).asScala.keySet
    Sinks.clear(sinkId)
    assert(lines == Set("alpha", "beta", "gamma", "delta", SocketLineSource.PoisonPill))
    // The data path drops the pill; raw retains it for the shutdown harness.
    assert(!lines.filter(_ != SocketLineSource.PoisonPill).contains(SocketLineSource.PoisonPill))
  }

  private type Ev = (Long, Timestamp, Long, String, Double, String)
  private val cols = Seq("event_id", "ts", "user_id", "event_type", "value", "props")

  private def ts(s: String) = Timestamp.valueOf(s)
  private lazy val windowEvs: Seq[Ev] = (1L to 60L).map(i =>
    (i, ts(f"2024-03-01 ${i % 6}%02d:15:00"), i % 4, s"t${i % 3}", i.toDouble, ""))

  private def runWindowed(watermark: String): Map[String, Seq[Any]] = {
    val input = MemoryStream[Ev](spark)
    val sinkId = s"win-${System.nanoTime()}"
    val q = StreamingQueries.windowedCountByType(
        input.toDF().toDF(cols: _*), watermarkDelay = watermark)
      .writeStream.outputMode("update")
      .foreach(new UpsertSink(sinkId, keyCols = 2)).start()
    try {
      input.addData(windowEvs.take(30): _*)
      q.processAllAvailable()
      input.addData(windowEvs.drop(30): _*)
      q.processAllAvailable()
    } finally q.stop()
    val got = Sinks.registry(sinkId).asScala.toMap.map { case (k, r) => k -> r.toSeq.toList }
    Sinks.clear(sinkId)
    got
  }

  test("streaming windowed count (wide watermark) converges to the batch answer") {
    val got = runWindowed("12 hours")
    val want = StreamingQueries.windowedCountByType(windowEvs.toDF(cols: _*))
      .collect().map(r => s"${r.get(0)}|${r.get(1)}" -> r.toSeq.toList).toMap
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("tight watermark drops late rows (bounded state, late-data semantics)") {
    val got = runWindowed("2 hours")
    // Burst 2's rows for hours 00-02 arrive > 2h behind the max event time
    // of burst 1 (05:15) and must be dropped: those windows keep burst-1
    // counts (5) while in-watermark windows reach the full count (10).
    assert(got.values.map(_.last).toSet == Set(5L, 10L))
  }

  test("streaming session windows close at the watermark and match batch sessionization") {
    // Two users: u1 has two sessions (40-min gap), u2 one session.
    val evs: Seq[Ev] = Seq(
      (1L, ts("2024-03-01 10:00:00"), 1L, "t", 1.0, ""),
      (2L, ts("2024-03-01 10:10:00"), 1L, "t", 1.0, ""),
      (3L, ts("2024-03-01 10:50:01"), 1L, "t", 1.0, ""), // >30min after #2 -> new session
      (4L, ts("2024-03-01 10:05:00"), 2L, "t", 1.0, ""),
      (5L, ts("2024-03-01 10:20:00"), 2L, "t", 1.0, ""))
    // Sentinel far in the future advances the watermark so all real
    // sessions close and append-mode emits them.
    val sentinel: Ev = (99L, ts("2024-03-05 00:00:00"), 999L, "t", 0.0, "")

    val input = MemoryStream[Ev](spark)
    val sinkId = s"sess-${System.nanoTime()}"
    val q = StreamingQueries.sessionsByUser(input.toDF().toDF(cols: _*))
      .writeStream.outputMode("append")
      .foreach(new UpsertSink(sinkId, keyCols = 2)).start()
    try {
      input.addData(evs: _*)
      q.processAllAvailable()
      input.addData(sentinel)
      q.processAllAvailable()
    } finally q.stop()
    val got = Sinks.registry(sinkId).asScala.values
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .filter(_._1 != 999L).toSet
    Sinks.clear(sinkId)
    val want = Set(
      (1L, Timestamp.valueOf("2024-03-01 10:00:00").getTime / 1000, 2L),
      (1L, Timestamp.valueOf("2024-03-01 10:50:01").getTime / 1000, 1L),
      (2L, Timestamp.valueOf("2024-03-01 10:05:00").getTime / 1000, 2L))
    assert(got == want, s"got $got")
  }

  test("text sink writes formatted lines (batch writeAsText surface)") {
    import graft.streaming.TextSink
    val dir = java.nio.file.Files.createTempDirectory("textsink").toString + "/out"
    val lines = Formatters.lines(Seq((7L, 42L), (8L, 1L)).toDF("k", "v"), Formatters.flat2)
    TextSink.writeLines(lines, dir)
    val back = spark.read.text(dir).as[String].collect().toSet
    assert(back == Set("7 - 42", "8 - 1"))
  }

  test("formatters emit the reference wire formats") {
    val df = Seq((7L, 42L)).toDF("driver_id", "cnt")
    assert(Formatters.lines(df, Formatters.flat2).as[String].head() == "7 - 42")
    assert(Formatters.lines(df, Formatters.retract2).as[String].head() == "(true) 7 - 42")
    val f3 = Seq((1L, 2L, 3L)).toDF("a", "b", "c")
      .select(Formatters.flat3(col("a"), col("b"), col("c"))).as[String].head()
    assert(f3 == "1 - 2 - 3")
    val li = Formatters.lineItemResult(Seq(("A", "F", 100L)).toDF("f", "s", "q")).as[String].head()
    assert(li == "A|F|100")
  }
}
