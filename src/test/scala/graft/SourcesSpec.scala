package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SkewedKeyPartitioner
import graft.sources.Sources

/** Rate-controlled replay, rate/drift sources, skew partitioner. */
class SourcesSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("DataRateControl hot-swaps the delay from its control file") {
    val f = Files.createTempFile("datarate", ".txt")
    val ctl = new Sources.DataRateControl(f, defaultDelayNs = 1000000L)
    assert(ctl.recordsPerSec == 1000L)
    Files.writeString(f, "1000\n") // 1000 ns/record = 1M rec/s (reference table)
    ctl.refresh()
    assert(ctl.currentDelayNs == 1000L && ctl.recordsPerSec == 1000000L)
    Files.writeString(f, "garbage")
    ctl.refresh() // unparsable input keeps the previous rate
    assert(ctl.currentDelayNs == 1000L)
  }

  test("RateLimitedReplay feeds a streaming query to batch-equivalent state") {
    val data = (1L to 500L).map(i => (i % 7, 1L))
    val ctl = new Sources.DataRateControl(
      Files.createTempFile("datarate2", ".txt"), defaultDelayNs = 1000L) // 1M rec/s
    val replay = new Sources.RateLimitedReplay[(Long, Long)](spark, data, ctl, batchRecords = 128)
    val feeder = replay.start()
    val q = replay.toDF.toDF("k", "one")
      .groupBy("k").count()
      .writeStream.outputMode("complete").format("memory").queryName("replay_counts").start()
    try {
      feeder.join(10000)
      q.processAllAvailable()
    } finally { replay.stop(); q.stop() }
    assert(replay.recordsFed == 500L)
    val got = spark.table("replay_counts").as[(Long, Long)].collect().toMap
    val want = data.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    assert(got == want)
  }

  test("fileReplay streams the events parquet to the batch rolling-aggregate state") {
    import scala.jdk.CollectionConverters._
    import graft.streaming.{Sinks, StreamingQueries, UpsertSink}
    val stream = Sources.fileReplay(spark, TestSpark.sf0001, "events")
    assert(stream.isStreaming)
    val sinkId = s"filereplay-${System.nanoTime()}"
    val q = StreamingQueries.updating("taxi_ride_count")(stream)
      .writeStream.outputMode("update").foreach(new UpsertSink(sinkId)).start()
    try q.processAllAvailable() finally q.stop()
    val got = Sinks.registry(sinkId).asScala.toMap.map { case (k, r) => k.toLong -> r.getLong(1) }
    Sinks.clear(sinkId)
    val want = graft.queries.Transforms.countByDriver(Tables.events(spark, TestSpark.sf0001))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)
  }

  test("word rate sources are streaming DataFrames with the word schema") {
    val w = Sources.wordRateSource(spark, Seq("a", "b", "c"), rowsPerSecond = 10)
    assert(w.isStreaming && w.columns.toSeq == Seq("word", "ts"))
    val d = Sources.driftingWordSource(spark,
      Seq(Seq("a", "b"), Seq("c", "d")), rowsPerSecond = 10, rotateEverySec = 60)
    assert(d.isStreaming && d.columns.toSeq == Seq("word", "ts"))
  }

  test("skewed words generator produces the requested hot-key fraction") {
    val ws = Sources.skewedWords("GUTENBERG", Seq("x", "y", "z"), n = 1000, skewFraction = 0.4)
    assert(ws.count(_ == "GUTENBERG") == 400)
  }

  test("SkewedKeyPartitioner routes the hot key to partition 0, spreads the rest") {
    val words = Sources.skewedWords("GUTENBERG", (1 to 20).map(i => s"w$i"), 2000, 0.3)
    val rdd = spark.sparkContext.parallelize(words.map(_ -> 1L), 8)
    val parted = SkewedKeyPartitioner.partition(rdd, numPartitions = 4, hotKey = "GUTENBERG")
    val sizes = parted.glom().map(_.length).collect()
    assert(sizes.length == 4)
    val p0Keys = parted.mapPartitionsWithIndex {
      case (0, it) => it.map(_._1); case (_, _) => Iterator.empty
    }.distinct().collect()
    assert(p0Keys.toSet == Set("GUTENBERG"), s"partition 0 held ${p0Keys.mkString(",")}")
    assert(sizes(0) == 600) // 30% of 2000
    // Non-hot keys never land in 0 and cover the other partitions.
    assert(sizes.drop(1).sum == 1400 && sizes.drop(1).forall(_ > 0))
  }
}
