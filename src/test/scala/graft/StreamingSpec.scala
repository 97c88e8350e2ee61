package graft

import java.sql.Timestamp

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming._

/** Streaming update-mode parity + the AdCom adaptive controller. */
class StreamingSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  /** (event_id, ts, user_id, event_type, value, props) — the events schema. */
  private type Ev = (Long, Timestamp, Long, String, Double, String)
  private val eventCols = Seq("event_id", "ts", "user_id", "event_type", "value", "props")

  private val burst1: Seq[Ev] = (1L to 40L).map(i =>
    (i, ts(s"2024-03-0${1 + (i % 3).toInt} 1${i % 10}:00:00"), i % 5, s"t${i % 2}", (i % 7).toDouble, s"p$i"))
  private val burst2: Seq[Ev] = (41L to 90L).map(i =>
    (i, ts(s"2024-03-0${1 + (i % 5).toInt} 0${i % 10}:30:00"), i % 8, s"t${i % 3}", (i % 11).toDouble, s"pp$i"))

  private def runStreaming(name: String, keyCols: Int = 1): Map[String, Seq[Any]] = {
    val sinkId = s"test-$name-${System.nanoTime()}"
    val sink = new UpsertSink(sinkId, keyCols)
    val input = MemoryStream[Ev](spark)
    val q = StreamingQueries.runUpdating(name, input.toDF().toDF(eventCols: _*), sink, intervalMs = 50L)
    try {
      input.addData(burst1: _*)
      q.processAllAvailable()
      input.addData(burst2: _*)
      q.processAllAvailable()
    } finally q.stop()
    val out = Sinks.registry(sinkId).asScala.toMap.map { case (k, row) =>
      k -> row.toSeq.toList
    }
    Sinks.clear(sinkId)
    out
  }

  private def batchAnswer(name: String): Map[String, Seq[Any]] = {
    val df = (burst1 ++ burst2).toDF(eventCols: _*)
    StreamingQueries.updating(name)(df).collect()
      .map(r => String.valueOf(r.get(0)) -> r.toSeq.toList).toMap
  }

  test("streaming taxi_ride_count converges to the batch answer") {
    assert(runStreaming("taxi_ride_count") == batchAnswer("taxi_ride_count"))
  }

  test("streaming taxi_ride_max converges to the batch answer") {
    assert(runStreaming("taxi_ride_max") == batchAnswer("taxi_ride_max"))
  }

  test("streaming taxi_ride_avg (non-monotonic upserts) converges to the batch answer") {
    assert(runStreaming("taxi_ride_avg") == batchAnswer("taxi_ride_avg"))
  }

  test("streaming taxi_ride_avg3 converges to the batch answer") {
    assert(runStreaming("taxi_ride_avg3") == batchAnswer("taxi_ride_avg3"))
  }

  test("streaming taxi_ride_count_day converges to the batch answer") {
    assert(runStreaming("taxi_ride_count_day") == batchAnswer("taxi_ride_count_day"))
  }

  test("mapGroupsWithState rolling count converges to the batch answer (custom keyed state)") {
    val input = MemoryStream[Ev](spark)
    val sinkId = s"mgws-${System.nanoTime()}"
    val q = StreamingQueries.rollingCountCustomState(input.toDF().toDF(eventCols: _*))
      .toDF("driver_id", "cnt")
      .writeStream.outputMode("update").foreach(new UpsertSink(sinkId)).start()
    try {
      input.addData(burst1: _*)
      q.processAllAvailable()
      input.addData(burst2: _*)
      q.processAllAvailable()
    } finally q.stop()
    val got = Sinks.registry(sinkId).asScala.toMap.map { case (k, r) => k.toLong -> r.getLong(1) }
    Sinks.clear(sinkId)
    val want = (burst1 ++ burst2).groupBy(_._3).view.mapValues(_.size.toLong).toMap
    assert(got == want)
  }

  test("streaming funnel stage state converges to the batch funnel") {
    import graft.queries.Transforms
    val stages = Seq("signup", "view", "purchase", "error", "click")
    val fb1: Seq[Ev] = (1L to 60L).map(i =>
      (i, ts(s"2024-04-0${1 + (i % 9).toInt} 0${i % 10}:15:00"), i % 7,
        stages((i % 5).toInt), 1.0, ""))
    val fb2: Seq[Ev] = (61L to 120L).map(i =>
      (i, ts(s"2024-04-1${(i % 9).toInt} 1${i % 10}:45:00"), i % 11,
        stages((i % 3).toInt), 1.0, ""))
    val sinkId = s"funnel-${System.nanoTime()}"
    val sink = new UpsertSink(sinkId)
    val input = MemoryStream[Ev](spark)
    val q = StreamingQueries.runUpdating(
      "events_funnel_stages", input.toDF().toDF(eventCols: _*), sink, intervalMs = 50L)
    try {
      input.addData(fb1: _*)
      q.processAllAvailable()
      input.addData(fb2: _*)
      q.processAllAvailable()
    } finally q.stop()
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), Option(r.getTimestamp(1)), Option(r.getTimestamp(2)),
        Option(r.getTimestamp(3)))
    val got = Sinks.registry(sinkId).asScala.values.map(key).toSet
    Sinks.clear(sinkId)
    val all = (fb1 ++ fb2).toDF(eventCols: _*)
    val want = Transforms.funnelStages(all).collect().map(key).toSet
    assert(got == want, "streamed stage state diverges from the batch stage table")
    // The scalar fold over the streamed state equals the batch funnel.
    val streamed = got.toSeq.map { case (u, a, b, c) => (u, a.orNull, b.orNull, c.orNull) }
      .toDF("user_id", "t_signup", "t_view", "t_purchase")
    assert(Transforms.funnelFold(streamed).collect().head ==
      Transforms.funnelFold(Transforms.funnelStages(all)).collect().head)
  }

  test("streaming retention state folds to the batch retention triangle") {
    import graft.queries.Transforms
    val fb1: Seq[Ev] = (1L to 60L).map(i =>
      (i, ts(s"2024-05-0${1 + (i % 9).toInt} 0${i % 10}:15:00"), i % 7, "view", 1.0, ""))
    val fb2: Seq[Ev] = (61L to 120L).map(i =>
      (i, ts(s"2024-05-1${(i % 9).toInt} 1${i % 10}:45:00"), i % 11, "view", 1.0, ""))
    val sinkId = s"retention-${System.nanoTime()}"
    val sink = new UpsertSink(sinkId)
    val input = MemoryStream[Ev](spark)
    val q = StreamingQueries.runUpdating(
      "events_retention_state", input.toDF().toDF(eventCols: _*), sink, intervalMs = 50L)
    try {
      input.addData(fb1: _*)
      q.processAllAvailable()
      input.addData(fb2: _*)
      q.processAllAvailable()
    } finally q.stop()
    val state = Sinks.registry(sinkId).asScala.values.toSeq.map { r =>
      (r.getLong(0), r.getDate(1), r.getSeq[java.sql.Date](2))
    }
    Sinks.clear(sinkId)
    val streamed = Transforms.retentionFold(
      state.toDF("user_id", "cohort_day", "days"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val batch = Transforms.retention((fb1 ++ fb2).toDF(eventCols: _*))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed == batch,
      "streamed retention state diverges from the batch triangle")
  }

  test("streaming z-score moment state flags the same outliers as the batch pass") {
    import graft.queries.Transforms
    // Two spikes far outside the 0..19 base range guarantee flags exist.
    def value(i: Long) = if (i == 17 || i == 83) 400.0 else (i % 20).toDouble
    val fb1: Seq[Ev] = (1L to 60L).map(i =>
      (i, ts(s"2024-06-0${1 + (i % 9).toInt} 0${i % 10}:15:00"), i % 7,
        if (i % 2 == 0) "view" else "click", value(i), ""))
    val fb2: Seq[Ev] = (61L to 120L).map(i =>
      (i, ts(s"2024-06-1${(i % 9).toInt} 1${i % 10}:45:00"), i % 11,
        if (i % 2 == 0) "view" else "click", value(i), ""))
    val sinkId = s"zscore-${System.nanoTime()}"
    val sink = new UpsertSink(sinkId)
    val input = MemoryStream[Ev](spark)
    val q = StreamingQueries.runUpdating(
      "events_zscore_stats", input.toDF().toDF(eventCols: _*), sink, intervalMs = 50L)
    try {
      input.addData(fb1: _*)
      q.processAllAvailable()
      input.addData(fb2: _*)
      q.processAllAvailable()
    } finally q.stop()
    val stats = Sinks.registry(sinkId).asScala.values.toSeq
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2), r.getLong(3)))
    Sinks.clear(sinkId)
    val all = (fb1 ++ fb2).toDF(eventCols: _*)
    def flagged(st: org.apache.spark.sql.DataFrame) =
      Transforms.zscoreFlag(all, st).collect()
        .map(r => (r.getLong(0), r.getDouble(3))).toSet
    val streamed = flagged(stats.toDF("event_type", "sx", "sx2", "n"))
    val batch = flagged(Transforms.zscoreStats(all))
    assert(streamed.nonEmpty, "spiked bursts produced no outliers")
    assert(streamed == batch,
      "streamed moment state diverges from the batch stats pass")
  }

  test("streaming trend-moment state derives the batch slope/intercept/corr") {
    import graft.queries.Transforms
    val value = (i: Long) => (i % 13).toDouble + i.toDouble / 7.0
    val fb1: Seq[Ev] = (1L to 60L).map(i =>
      (i, ts(s"2024-06-0${1 + (i % 9).toInt} 0${i % 10}:15:00"), i % 7,
        if (i % 2 == 0) "view" else "click", value(i), ""))
    val fb2: Seq[Ev] = (61L to 120L).map(i =>
      (i, ts(s"2024-06-1${(i % 9).toInt} 1${i % 10}:45:00"), i % 11,
        if (i % 2 == 0) "view" else "click", value(i), ""))
    val sinkId = s"trend-${System.nanoTime()}"
    val sink = new UpsertSink(sinkId)
    val input = MemoryStream[Ev](spark)
    val q = StreamingQueries.runUpdating(
      "events_trend_moments", input.toDF().toDF(eventCols: _*), sink, intervalMs = 50L)
    try {
      input.addData(fb1: _*)
      q.processAllAvailable()
      input.addData(fb2: _*)
      q.processAllAvailable()
    } finally q.stop()
    val moments = Sinks.registry(sinkId).asScala.values.toSeq
    Sinks.clear(sinkId)
    val all = (fb1 ++ fb2).toDF(eventCols: _*)
    val momentSchema = Transforms.trendMoments(all).schema
    val streamedState = spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](moments.asJava), momentSchema)
    def derived(m: org.apache.spark.sql.DataFrame) =
      Transforms.trendDerive(m).collect()
        .map(r => r.getString(0) -> r.toSeq.toList).toMap
    val streamed = derived(streamedState)
    val batch = derived(Transforms.trendMoments(all))
    assert(streamed.nonEmpty)
    assert(streamed == batch,
      "streamed trend moments diverge from the batch moment pass")
  }

  test("streaming CUSUM breach replays the batch breach set bit-for-bit") {
    import org.apache.spark.sql.functions.{col, count, lit, sum}
    import org.apache.spark.sql.types.DecimalType
    // Three users with persistently different levels: user 1 sits far
    // above the global mean (breach at k=1), users 0/2 drift below it
    // (breach a few events in) — varied breach indices, not a trivial
    // all-at-k=1 set. Timestamps strictly increase so the two-burst
    // replay is in order per user (the streaming contract).
    def ev(i: Long, u: Long, v: Double): Ev =
      (i, ts(s"2024-07-01 0${i / 10}:0${i % 10}:00"), u, "m", v, "")
    val fb1: Seq[Ev] = (1L to 30L).map(i => ev(i, i % 3, if (i % 3 == 1) 1000.0 else (i % 5).toDouble))
    val fb2: Seq[Ev] = (31L to 60L).map(i => ev(i, i % 3, if (i % 3 == 1) 900.0 else (i % 7).toDouble))
    val all = (fb1 ++ fb2).toDF(eventCols: _*)
    // Calibration moment = the full replay's global moment, exactly what
    // the batch entry derives internally — so the two sides see one μ.
    val g = all.agg(sum(col("value").cast(DecimalType(18, 4))).as("sy"),
      count(lit(1)).as("n")).head()
    val input = MemoryStream[Ev](spark)
    val name = s"cusum${System.nanoTime()}"
    val q = StreamingQueries.streamingCusumBreach(
        input.toDF().toDF(eventCols: _*), g.getDecimal(0), g.getLong(1))
      .writeStream.outputMode("append").format("memory").queryName(name).start()
    try {
      input.addData(fb1: _*)
      q.processAllAvailable()
      input.addData(fb2: _*)
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table(name).collect().map(_.toSeq.toList).toSet
    val want = graft.queries.PipelineCatalog.cusumBreachOver(all)
      .collect().map(_.toSeq.toList).toSet
    assert(want.nonEmpty, "fixture produced no batch breaches — test is vacuous")
    assert(got == want,
      s"streamed CUSUM breaches diverge from batch:\n got $got\nwant $want")
    // Exactly-once: a breached user never re-emits across later batches.
    assert(got.size == got.map(_.head).size, "a user emitted more than one breach")
  }

  test("streaming CUSUM matches batch on NaN/Infinity/overflow values") {
    import org.apache.spark.sql.functions.{col, count, expr, lit, sum}
    // Hostile values: the batch side's non-ANSI cast(value AS
    // DECIMAL(18,4)) turns NaN, ±Infinity and >14-integer-digit doubles
    // into NULL (the row keeps its row_number; the running sum skips it).
    // The stream must not crash on them and must reproduce the same
    // breach set.
    def ev(i: Long, u: Long, v: Double): Ev =
      (i, ts(s"2024-07-01 0${i / 10}:0${i % 10}:00"), u, "m", v, "")
    val hostile: Seq[Ev] = Seq(
      ev(1, 0, 5.0), ev(2, 0, Double.NaN), ev(3, 0, 900.0),
      ev(4, 1, Double.PositiveInfinity), ev(5, 1, 1.0e15), ev(6, 1, 2.0),
      ev(7, 2, -3.0), ev(8, 2, Double.NegativeInfinity), ev(9, 2, 1.0))
    val all = hostile.toDF(eventCols: _*)
    val g = all.agg(sum(expr("try_cast(value AS DECIMAL(18,4))")).as("sy"),
      count(lit(1)).as("n")).head()
    val input = MemoryStream[Ev](spark)
    val name = s"cusumh${System.nanoTime()}"
    val q = StreamingQueries.streamingCusumBreach(
        input.toDF().toDF(eventCols: _*), g.getDecimal(0), g.getLong(1), h = 50L)
      .writeStream.outputMode("append").format("memory").queryName(name).start()
    try {
      input.addData(hostile.take(5): _*)
      q.processAllAvailable()
      input.addData(hostile.drop(5): _*)
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table(name).collect().map(_.toSeq.toList).toSet
    val want = graft.queries.PipelineCatalog.cusumBreachOver(all, h = 50L)
      .collect().map(_.toSeq.toList).toSet
    assert(want.nonEmpty, "hostile fixture produced no batch breaches — vacuous")
    assert(got == want,
      s"streamed CUSUM diverges from batch on hostile values:\n got $got\nwant $want")
  }

  test("streaming BM25 term state folds to the batch top-k entry bit-for-bit") {
    import graft.queries.Transforms
    val docs = Tables.documents(spark, TestSpark.sf0001)
    val entry = SparkEntry.queries("doc_bm25_topk")(spark, TestSpark.sf0001)
      .collect().map(_.toSeq.toList).toSet
    // The state fold and the entry's direct pipeline are two routes to
    // the same ranking — batch state first.
    val batchState = Transforms.bm25TermState(docs)
    val fromBatch = Transforms.bm25Fold(batchState).collect().map(_.toSeq.toList).toSet
    assert(fromBatch == entry,
      "folding the batch term state diverges from the doc_bm25_topk entry")
    // Then the streamed state: replay the corpus in two bursts through
    // the update-mode aggregate and fold the upserted rows.
    val rows = docs.select("doc_id", "text").as[(Long, String)]
      .collect().sortBy(_._1).toSeq
    val (b1, b2) = rows.splitAt(rows.size / 2)
    val sinkId = s"bm25-${System.nanoTime()}"
    val sink = new UpsertSink(sinkId, 2) // key = (doc_id, tok)
    val input = MemoryStream[(Long, String)](spark)
    val q = Transforms.bm25TermState(input.toDF().toDF("doc_id", "text"))
      .writeStream.outputMode("update").foreach(sink).start()
    try {
      input.addData(b1: _*)
      q.processAllAvailable()
      input.addData(b2: _*)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = Sinks.registry(sinkId).asScala.values.toSeq
    Sinks.clear(sinkId)
    val streamedState = spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](streamed.asJava),
      batchState.schema)
    val fromStream = Transforms.bm25Fold(streamedState).collect().map(_.toSeq.toList).toSet
    assert(fromStream == entry,
      "folding the STREAMED term state diverges from the doc_bm25_topk entry")
  }

  test("streaming EWMA replays the batch entry bit-for-bit") {
    import org.apache.spark.sql.functions.{col, lit}
    // The 16-tap truncation makes the streamed fold EXACT, not merely
    // convergent: state is the same window the batch entry reads.
    val ev = Tables.events(spark, TestSpark.sf0001)
    val want = SparkEntry.queries("events_ewma")(spark, TestSpark.sf0001)
      .collect().map(_.toSeq.toList).toSet
    val rows = ev.select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"), lit("").as("props"))
      .as[Ev].collect().sortBy(r => (r._2.getTime, r._1)).toSeq // replay in event-time order
    val (b1, b2) = rows.splitAt(rows.size / 2)
    val sinkId = s"ewma-${System.nanoTime()}"
    val sink = new UpsertSink(sinkId)
    val input = MemoryStream[Ev](spark)
    val q = StreamingQueries.streamingEwma(input.toDF().toDF(eventCols: _*))
      .toDF("event_id", "event_type", "tss", "value", "ewma")
      .writeStream.outputMode("append").foreach(sink).start()
    try {
      input.addData(b1: _*)
      q.processAllAvailable()
      input.addData(b2: _*)
      q.processAllAvailable()
    } finally q.stop()
    val got = Sinks.registry(sinkId).asScala.values
      .map(_.toSeq.toList).toSet
    Sinks.clear(sinkId)
    assert(got == want, "streamed EWMA diverges from the batch entry")
  }

  test("streaming DAU/WAU converges to the batch active-users triangle") {
    import org.apache.spark.sql.functions.{col, lit}
    // Replayed fully inside the watermark, the per-day user grids fold
    // to the batch contribution-explosion answer exactly — set size is
    // arrival-order-free and stickiness replays the batch division.
    val want = SparkEntry.queries("events_active_users")(spark, TestSpark.sf0001)
      .collect().map(_.toSeq.toList).toSet
    val rows = Tables.events(spark, TestSpark.sf0001)
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"), lit("").as("props"))
      .as[Ev].collect().sortBy(r => (r._2.getTime, r._1)).toSeq
    val (b1, b2) = rows.splitAt(rows.size / 2)
    val sinkId = s"dauwau-${System.nanoTime()}"
    val sink = new UpsertSink(sinkId)
    val input = MemoryStream[Ev](spark)
    val q = StreamingQueries.streamingActiveUsers(input.toDF().toDF(eventCols: _*))
      .toDF("day", "dau", "wau", "stickiness")
      .writeStream.outputMode("update").foreach(sink).start()
    try {
      input.addData(b1: _*)
      q.processAllAvailable()
      input.addData(b2: _*)
      q.processAllAvailable()
    } finally q.stop()
    val got = Sinks.registry(sinkId).asScala.values.map(_.toSeq.toList).toSet
    Sinks.clear(sinkId)
    assert(got == want, "streamed DAU/WAU diverges from the batch entry")
  }

  test("streaming sequence trigrams replay to the batch top-10 exactly") {
    import org.apache.spark.sql.functions.{col, lit}
    // Each (user, trigram) emits exactly once (per-user seen-set state),
    // so counting increments per trigram IS the distinct-user support;
    // ranked with the batch tie rule the replay must equal the entry.
    val want = SparkEntry.queries("events_seq_trigrams")(spark, TestSpark.sf0001)
      .collect().map(_.toSeq.toList).toList
    // The global pre-sort here is PART OF THE GUARANTEE, not test
    // convenience: streamingSeqTrigrams sorts by (ts, event_id) only
    // within each micro-batch and relies on per-key in-order cross-batch
    // delivery — the house contract shared by every rolling-state query
    // in StreamingQueries. An event delivered in a later micro-batch
    // than a logically later event may produce trigrams the batch entry
    // would not; exact batch replay is claimed only under this contract.
    val rows = Tables.events(spark, TestSpark.sf0001)
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"), lit("").as("props"))
      .as[Ev].collect().sortBy(r => (r._2.getTime, r._1)).toSeq
    val (b1, b2) = rows.splitAt(rows.size / 2)
    val sinkId = s"seqtri-${System.nanoTime()}"
    val sink = new UpsertSink(sinkId, 4) // key = the whole increment
    val input = MemoryStream[Ev](spark)
    val q = StreamingQueries.streamingSeqTrigrams(input.toDF().toDF(eventCols: _*))
      .toDF("user_id", "t1", "t2", "t3")
      .writeStream.outputMode("append").foreach(sink).start()
    try {
      input.addData(b1: _*)
      q.processAllAvailable()
      input.addData(b2: _*)
      q.processAllAvailable()
    } finally q.stop()
    val incs = Sinks.registry(sinkId).asScala.values
      .map(r => (r.getAs[String]("t1"), r.getAs[String]("t2"), r.getAs[String]("t3")))
      .toSeq
    Sinks.clear(sinkId)
    val got = incs.groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .sortBy { case ((a, b, c), s) => (-s, a, b, c) }.take(10)
      .map { case ((a, b, c), s) => List(a, b, c, s) }
    assert(got == want, "streamed trigram supports diverge from the batch entry")
  }

  test("streaming dow seasonality replays the batch entry bit-for-bit") {
    import org.apache.spark.sql.functions.{col, lit}
    // Decimal sums are associative, so any micro-batch split folds to the
    // batch aggregate exactly; the emission replays the batch divisions.
    val want = SparkEntry.queries("events_dow_seasonality")(spark, TestSpark.sf0001)
      .collect().map(_.toSeq.toList).toSet
    val rows = Tables.events(spark, TestSpark.sf0001)
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"), lit("").as("props"))
      .as[Ev].collect().sortBy(r => (r._2.getTime, r._1)).toSeq
    val (b1, b2) = rows.splitAt(rows.size / 2)
    val sinkId = s"dowseason-${System.nanoTime()}"
    val sink = new UpsertSink(sinkId, 2) // key = (event_type, dow)
    val input = MemoryStream[Ev](spark)
    val q = StreamingQueries.streamingDowSeasonality(input.toDF().toDF(eventCols: _*))
      .toDF("event_type", "dow", "n", "dow_mean", "seasonality")
      .writeStream.outputMode("update").foreach(sink).start()
    try {
      input.addData(b1: _*)
      q.processAllAvailable()
      input.addData(b2: _*)
      q.processAllAvailable()
    } finally q.stop()
    val got = Sinks.registry(sinkId).asScala.values.map(_.toSeq.toList).toSet
    Sinks.clear(sinkId)
    assert(got == want, "streamed seasonality diverges from the batch entry")
  }

  test("streaming Count-Min cells replay the batch entry's estimates bit-for-bit") {
    import org.apache.spark.sql.functions.{col, lit}
    import graft.operators.CountMinSketch
    // CM is linear: per-batch cell increments commute with any replay
    // split, so the final streamed cells must probe to EXACTLY the batch
    // entry's (exact_cnt, cm_est, overcount) rows — not approximately.
    val want = SparkEntry.queries("events_count_min")(spark, TestSpark.sf0001)
      .collect().map(_.toSeq.toList).toSet
    val rows = Tables.events(spark, TestSpark.sf0001)
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"), lit("").as("props"))
      .as[Ev].collect().sortBy(r => (r._2.getTime, r._1)).toSeq
    val (b1, b2) = rows.splitAt(rows.size / 2)
    val sinkId = s"cm-${System.nanoTime()}"
    val sink = new UpsertSink(sinkId, 2) // key = (r, bucket)
    val input = MemoryStream[Ev](spark)
    val q = StreamingQueries.streamingCountMin(input.toDF().toDF(eventCols: _*))
      .toDF("r", "bucket", "cell_sum")
      .writeStream.outputMode("update").foreach(sink).start()
    try {
      input.addData(b1: _*)
      q.processAllAvailable()
      input.addData(b2: _*)
      q.processAllAvailable()
    } finally q.stop()
    val cells = Sinks.registry(sinkId).asScala.values
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    Sinks.clear(sinkId)
    val exact = rows.groupBy(_._3).view.mapValues(_.size.toLong).toMap
    val got = exact.map { case (k, cnt) =>
      val est = CountMinSketch.estimate(cells, k)
      List[Any](k, cnt, est, est - cnt)
    }.toSet
    assert(got == want, "streamed CM cells diverge from the batch entry")
  }

  test("streaming join-size cells replay the batch entry's cm_est bit-for-bit") {
    import org.apache.spark.sql.functions.col
    import graft.operators.JoinSizeSketch
    // The planner statistic maintained live: both sides' d×w cell
    // matrices as keyed state. CM cells are linear, so after any
    // batch split the streamed cells probe to EXACTLY the batch
    // entry's inner-product estimate (same md5 hash family via
    // JoinSizeSketch — the one-definition contract).
    val want = graft.queries.ScaleCatalog.joinSizeSketch
      .build(spark, TestSpark.sf0001).select("cm_est").head().getLong(0)
    // One input row per (record, side-membership): side a = every row,
    // side b = the returned slice — the batch entry's fa/fb split.
    val li = Tables.lineitem(spark, TestSpark.sf0001)
      .select(col("l_partkey").cast("long"), col("l_returnflag"))
      .as[(Long, String)].collect()
    val rows: Seq[(String, Long)] = li.toSeq.flatMap { case (k, flag) =>
      if (flag == "R") Seq(("a", k), ("b", k)) else Seq(("a", k))
    }
    val (b1, b2) = rows.splitAt(rows.size / 3)
    val sinkId = s"jss-${System.nanoTime()}"
    val sink = new UpsertSink(sinkId, 3) // key = (side, r, bucket)
    val input = MemoryStream[(String, Long)](spark)
    val q = StreamingQueries.streamingJoinSizeCells(input.toDF().toDF("side", "k"))
      .toDF("side", "r", "bucket", "cell")
      .writeStream.outputMode("update").foreach(sink).start()
    try {
      input.addData(b1: _*)
      q.processAllAvailable()
      input.addData(b2: _*)
      q.processAllAvailable()
    } finally q.stop()
    val cells = Sinks.registry(sinkId).asScala.values
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2)) -> r.getLong(3)).toMap
    Sinks.clear(sinkId)
    val ca = cells.collect { case ((s, r, b), c) if s == "a" => (r, b) -> c }.toMap
    val cb = cells.collect { case ((s, r, b), c) if s == "b" => (r, b) -> c }.toMap
    assert(JoinSizeSketch.estimate(ca, cb) == want,
      "streamed join-size cells diverge from the batch estimator")
  }

  test("streamed route cells reproduce the batch router's stats and route per corpus") {
    import org.apache.spark.sql.functions.col
    import graft.operators.RoutedJoin
    // The loop closed: r12 streamed the sketch, r13 routed from the
    // sketch — here the STREAM routes. The live cell state's Stats and
    // the route chosen from them must equal the batch router's on the
    // same corpus, for each of the three organic corpora (CM cells are
    // linear, so any replay split drains to the batch sampled aggregate
    // bit-for-bit).
    val dim = Tables.load(spark, TestSpark.sf0001, "customer")
      .select(col("c_custkey"), col("c_mktsegment"))
    // The dim-side measurement is not part of the streamed cell state —
    // both sides read the SAME one-pass rows+bytes estimate, so Stats
    // equality below pins exactly the sketch-derived fields.
    val (dimRows, dimBytes) = RoutedJoin.dimStats(dim)
    val corpora = Seq(
      ("broadcast-organic", col("user_id") + 1, RoutedJoin.BroadcastRowLimit),
      ("hot-organic", graft.queries.ScaleCatalog.hotKeyCol, 100L),
      ("uniform-organic", col("user_id") + 1, 100L))
    val routes = corpora.map { case (tag, key, limit) =>
      val fact = Tables.events(spark, TestSpark.sf0001)
        .select(key.as("k"), col("event_id"))
      val batchStats = RoutedJoin.stats(fact, "k", col("event_id"), dim)
      val batchRoute = RoutedJoin.choose(batchStats, broadcastRowLimit = limit)
      val rows = fact.select(col("k").cast("long"), col("event_id").cast("long"))
        .as[(Long, Long)].collect().toSeq
      val (b1, b2) = rows.splitAt(rows.size / 3)
      val sinkId = s"route-$tag-${System.nanoTime()}"
      val sink = new UpsertSink(sinkId, 2) // key = (r, bucket)
      val input = MemoryStream[(Long, Long)](spark)
      val q = StreamingQueries.streamingRouteCells(input.toDF().toDF("k", "disc"))
        .toDF("r", "bucket", "cell")
        .writeStream.outputMode("update").foreach(sink).start()
      try {
        input.addData(b1: _*)
        q.processAllAvailable()
        input.addData(b2: _*)
        q.processAllAvailable()
      } finally q.stop()
      val cells = Sinks.registry(sinkId).asScala.values
        .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
      Sinks.clear(sinkId)
      val streamedStats = RoutedJoin.statsFromCells(cells, dimRows, dimBytes)
      assert(streamedStats == batchStats,
        s"$tag: streamed Stats diverge from the batch router's")
      val streamedRoute = RoutedJoin.choose(streamedStats, broadcastRowLimit = limit)
      assert(streamedRoute == batchRoute, s"$tag: route diverges")
      streamedRoute
    }
    // Not vacuous: the three corpora must not all collapse onto one
    // route at this sf (the broadcast corpus at least differs).
    assert(routes.distinct.size >= 2, s"route parity test degenerate: $routes")

    // STRING-keyed corpus: the batch router never casts the key (bucketCol
    // hashes its string form), so the streaming sibling must accept the
    // same atomic key types — a long cast here would null string keys and
    // collapse the sketch onto one bucket (the r14 advice finding).
    val sFact = Tables.events(spark, TestSpark.sf0001)
      .select(col("event_type").as("k"), col("event_id"))
    val sBatch = RoutedJoin.stats(sFact, "k", col("event_id"), dim)
    assert(sBatch.hotEst > 0L, "vacuous: string-key sample hit no rows")
    val sRows = sFact.select(col("k"), col("event_id").cast("long"))
      .as[(String, Long)].collect().toSeq
    val (s1, s2) = sRows.splitAt(sRows.size / 3)
    val sSinkId = s"route-str-${System.nanoTime()}"
    val sSink = new UpsertSink(sSinkId, 2)
    val sInput = MemoryStream[(String, Long)](spark)
    val sq = StreamingQueries.streamingRouteCells(sInput.toDF().toDF("k", "disc"))
      .toDF("r", "bucket", "cell")
      .writeStream.outputMode("update").foreach(sSink).start()
    try {
      sInput.addData(s1: _*)
      sq.processAllAvailable()
      sInput.addData(s2: _*)
      sq.processAllAvailable()
    } finally sq.stop()
    val sCells = Sinks.registry(sSinkId).asScala.values
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    Sinks.clear(sSinkId)
    assert(RoutedJoin.statsFromCells(sCells, dimRows, dimBytes) == sBatch,
      "string-keyed streamed Stats diverge from the batch router's")
  }

  test("streamed DSIR histogram cells replay the batch weight table bit-for-bit") {
    import org.apache.spark.sql.functions.col
    import graft.queries.PipelineCatalog
    // The DSIR model is two ≤1024-bin histograms — linear, mergeable —
    // so the drained cell state must reproduce the batch per-bucket
    // counts exactly, and the shared pure-integer weight arithmetic
    // then yields the identical weight table.
    val grams = PipelineCatalog.dsirGrams(Tables.documents(spark, TestSpark.sf0001))
    val wantCells = PipelineCatalog.dsirPerBucket(grams)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val wantW = PipelineCatalog.dsirWeights(PipelineCatalog.dsirPerBucket(grams))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(wantW.nonEmpty, "vacuous: no DSIR buckets at sf0.001")
    val rows = grams.select(col("b"), col("lang")).as[(Long, String)].collect().toSeq
    val (b1, b2) = rows.splitAt(rows.size / 3)
    val sinkId = s"dsir-${System.nanoTime()}"
    val sink = new UpsertSink(sinkId, 1) // key = bucket
    val input = MemoryStream[(Long, String)](spark)
    val q = StreamingQueries.streamingDsirCells(input.toDF().toDF("b", "lang"))
      .toDF("b", "cr", "ct")
      .writeStream.outputMode("update").foreach(sink).start()
    try {
      input.addData(b1: _*)
      q.processAllAvailable()
      input.addData(b2: _*)
      q.processAllAvailable()
    } finally q.stop()
    val cellRows = Sinks.registry(sinkId).asScala.values.toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    Sinks.clear(sinkId)
    assert(cellRows.toSet == wantCells,
      "streamed DSIR cells diverge from the batch histograms")
    val gotW = PipelineCatalog.dsirWeights(cellRows.toDF("b", "cr", "ct"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(gotW == wantW, "streamed DSIR weight table diverges from batch")
  }

  test("streamed IVFADC coarse assignment replays the batch entry bit-for-bit") {
    import org.apache.spark.sql.functions.col
    import graft.queries.EmbeddingCatalog
    // The IVFADC entry's only corpus-touching aggregate is the coarse
    // assignment (argmax rounded cosine over broadcast frozen
    // centroids) — linear/mergeable keyed state. Stream the corpus in
    // two bursts, drain the live (vec_id, cell) state, then replay
    // residual-PQ codes + ADC + rerank on the drained frame: the final
    // top-K must equal the batch entry bit-for-bit (scores included).
    val emb = Tables.embeddings(spark, TestSpark.sf0001)
    val want = SparkEntry.queries("emb_knn_ivfpq")(spark, TestSpark.sf0001)
      .collect().map(_.toSeq.toList).toSet
    assert(want.nonEmpty, "vacuous: no ivfpq rows at sf0.001")
    val wantAssign = EmbeddingCatalog
      .ivfCoarseAssign(emb, EmbeddingCatalog.ivfCentroidFrame(emb))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val rows = emb.select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])].collect().toSeq
    val (b1, b2) = rows.splitAt(rows.size / 3)
    val sinkId = s"ivf-${System.nanoTime()}"
    val sink = new UpsertSink(sinkId, 1) // key = vec_id
    val input = MemoryStream[(Long, Seq[Float])](spark)
    val q = StreamingQueries.streamingIvfCells(
        input.toDF().toDF("vec_id", "embedding"),
        EmbeddingCatalog.ivfCentroidFrame(emb))
      .writeStream.outputMode("update").foreach(sink).start()
    try {
      input.addData(b1: _*)
      q.processAllAvailable()
      input.addData(b2: _*)
      q.processAllAvailable()
    } finally q.stop()
    val drained = Sinks.registry(sinkId).asScala.values.toSeq
      .map(r => (r.getLong(0), r.getLong(1)))
    Sinks.clear(sinkId)
    assert(drained.toSet == wantAssign,
      "drained IVF cell assignments diverge from the batch argmax")
    val got = EmbeddingCatalog
      .ivfPqFrom(emb, drained.toDF("vec_id", "cell"))
      .collect().map(_.toSeq.toList).toSet
    assert(got == want,
      "IVFADC replay on drained assignments diverges from the batch entry")
  }

  test("streamed PQ encode cells replay the distortion report bit-for-bit") {
    import org.apache.spark.sql.functions.col
    import graft.queries.EmbeddingCatalog
    // emb_pq_distortion's corpus-touching stage is the encode (keyed
    // argmin over the broadcast codebook). Stream the corpus in two
    // bursts, drain the live (vec_id, j, code, d2s) cells, replay the
    // per-subspace report on the drained frame: bit-for-bit equal to
    // the batch entry, exact-integer sums included.
    val emb = Tables.embeddings(spark, TestSpark.sf0001)
    val want = SparkEntry.queries("emb_pq_distortion")(spark, TestSpark.sf0001)
      .collect().map(_.toSeq.toList).toSet
    assert(want.nonEmpty, "vacuous: no distortion rows at sf0.001")
    val cent = emb.filter(col("vec_id").between(100L, 115L))
      .select(col("vec_id").as("cid"), col("embedding").as("cemb"))
    val wantCells = EmbeddingCatalog.pqEncodeCells(emb, cent)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val rows = emb.select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])].collect().toSeq
    val (b1, b2) = rows.splitAt(rows.size / 3)
    val sinkId = s"pq-${System.nanoTime()}"
    val sink = new UpsertSink(sinkId, 2) // key = (vec_id, j)
    val input = MemoryStream[(Long, Seq[Float])](spark)
    val q = StreamingQueries.streamingPqCells(
        input.toDF().toDF("vec_id", "embedding"), cent)
      .writeStream.outputMode("update").foreach(sink).start()
    try {
      input.addData(b1: _*)
      q.processAllAvailable()
      input.addData(b2: _*)
      q.processAllAvailable()
    } finally q.stop()
    val drained = Sinks.registry(sinkId).asScala.values.toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    Sinks.clear(sinkId)
    assert(drained.toSet == wantCells,
      "drained PQ encode cells diverge from the batch encode")
    val got = EmbeddingCatalog
      .pqDistortionFrom(drained.toDF("vec_id", "j", "code", "d2s"))
      .collect().map(_.toSeq.toList).toSet
    assert(got == want,
      "distortion replay on drained cells diverges from the batch entry")
  }

  test("streamed k-anonymity classes replay the audit report bit-for-bit") {
    import org.apache.spark.sql.functions.col
    // events_k_anonymity's ONLY corpus-touching stage is the QI
    // equivalence-class count. Stream the events in two bursts, drain
    // the class sizes, replay the per-type report on the drained frame.
    val want = SparkEntry.queries("events_k_anonymity")(spark, TestSpark.sf0001)
      .collect().map(_.toSeq.toList).toSet
    assert(want.nonEmpty, "vacuous: no k-anonymity rows at sf0.001")
    val rows = Tables.events(spark, TestSpark.sf0001)
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"), org.apache.spark.sql.functions.lit("").as("props"))
      .as[Ev].collect().sortBy(r => (r._2.getTime, r._1)).toSeq
    val (b1, b2) = rows.splitAt(rows.size / 2)
    val sinkId = s"ka-${System.nanoTime()}"
    val sink = new UpsertSink(sinkId, 3) // key = (event_type, day, vbucket)
    val input = MemoryStream[Ev](spark)
    val q = StreamingQueries.streamingKAnonCounts(input.toDF().toDF(eventCols: _*))
      .writeStream.outputMode("update").foreach(sink).start()
    try {
      input.addData(b1: _*)
      q.processAllAvailable()
      input.addData(b2: _*)
      q.processAllAvailable()
    } finally q.stop()
    val cnt = Sinks.registry(sinkId).asScala.values.toSeq
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toDF("event_type", "day", "vbucket", "k")
    Sinks.clear(sinkId)
    val got = graft.queries.PipelineCatalog.kAnonFrom(cnt)
      .collect().map(_.toSeq.toList).toSet
    assert(got == want, "streamed k-anonymity report diverges from the batch entry")
  }

  test("streamed OPQ moments replay the permutation and distortion report bit-for-bit") {
    import org.apache.spark.sql.functions.col
    import graft.queries.EmbeddingCatalog
    // emb_opq_permute's corpus-touching stage is the per-dim moments
    // aggregate (count + decimal-exact sums). Stream the corpus in two
    // bursts, drain the 64-row state, replay BOTH downstream artifacts
    // on the drained frame: the snake permutation and the full permuted
    // distortion report — each equal to the batch path.
    val emb = Tables.embeddings(spark, TestSpark.sf0001)
    val want = SparkEntry.queries("emb_opq_permute")(spark, TestSpark.sf0001)
      .collect().map(_.toSeq.toList).toSet
    assert(want.nonEmpty, "vacuous: no OPQ report rows at sf0.001")
    val wantPerm = EmbeddingCatalog.opqPermOf(EmbeddingCatalog.opqMoments(emb))
    val rows = emb.select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])].collect().toSeq
    val (b1, b2) = rows.splitAt(rows.size / 3)
    val sinkId = s"opq-${System.nanoTime()}"
    val sink = new UpsertSink(sinkId, 1) // key = d
    val input = MemoryStream[(Long, Seq[Float])](spark)
    val q = StreamingQueries.streamingOpqMoments(
        input.toDF().toDF("vec_id", "embedding"))
      .writeStream.outputMode("update").foreach(sink).start()
    try {
      input.addData(b1: _*)
      q.processAllAvailable()
      input.addData(b2: _*)
      q.processAllAvailable()
    } finally q.stop()
    val drained = Sinks.registry(sinkId).asScala.values.toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getDecimal(2), r.getDecimal(3)))
      .toDF("d", "n", "s1", "s2")
    Sinks.clear(sinkId)
    val gotPerm = EmbeddingCatalog.opqPermOf(drained)
    assert(gotPerm == wantPerm,
      "permutation from drained moments diverges from the batch permutation")
    val pemb = EmbeddingCatalog.opqApply(
      emb.select(col("vec_id"), col("embedding")), gotPerm)
    val pcent = pemb.filter(col("vec_id").between(100L, 115L))
      .select(col("vec_id").as("cid"), col("embedding").as("cemb"))
    val got = EmbeddingCatalog
      .pqDistortionFrom(EmbeddingCatalog.pqEncodeCells(pemb, pcent))
      .collect().map(_.toSeq.toList).toSet
    assert(got == want,
      "distortion replay via drained moments diverges from the batch entry")
  }

  test("streamed Theil-Sen daily state replays the batch slope bit-for-bit") {
    import org.apache.spark.sql.functions.col
    // The daily-mean aggregate is events_theil_sen's ONLY
    // corpus-touching stage: stream it as live keyed state (decimal
    // sums — exact, associative — over exact counts), then run the
    // factored #days-bounded pairwise-median machinery over the drained
    // frame. Same rows, same bits, as the batch entry.
    val want = SparkEntry.queries("events_theil_sen")(spark, TestSpark.sf0001)
      .collect().map(_.toSeq.toList).toSet
    assert(want.nonEmpty, "vacuous: no Theil-Sen rows at sf0.001")
    val rows = Tables.events(spark, TestSpark.sf0001)
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"), org.apache.spark.sql.functions.lit("").as("props"))
      .as[Ev].collect().sortBy(r => (r._2.getTime, r._1)).toSeq
    val (b1, b2) = rows.splitAt(rows.size / 2)
    val sinkId = s"ts-${System.nanoTime()}"
    val sink = new UpsertSink(sinkId, 2) // key = (event_type, day)
    val input = MemoryStream[Ev](spark)
    val q = StreamingQueries.streamingDailyMeans(input.toDF().toDF(eventCols: _*))
      .toDF("event_type", "day", "v")
      .writeStream.outputMode("update").foreach(sink).start()
    try {
      input.addData(b1: _*)
      q.processAllAvailable()
      input.addData(b2: _*)
      q.processAllAvailable()
    } finally q.stop()
    val daily = Sinks.registry(sinkId).asScala.values.toSeq
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .toDF("event_type", "day", "v")
    Sinks.clear(sinkId)
    val got = graft.queries.PipelineCatalog.theilSenFrom(daily)
      .collect().map(_.toSeq.toList).toSet
    assert(got == want, "streamed Theil-Sen diverges from the batch entry")
  }

  test("streamed Benford digit counts replay the profile bit-for-bit") {
    import org.apache.spark.sql.functions.col
    // events_benford_profile's ONLY corpus-touching stage is the
    // (event_type, digit) count — a plain keyed COUNT maintained live in
    // update mode. Stream the events in two bursts, drain the counts,
    // replay the grid-sized Benford report on the drained frame: equal
    // to the batch entry, absent-digit grid rows included.
    val want = SparkEntry.queries("events_benford_profile")(spark, TestSpark.sf0001)
      .collect().map(_.toSeq.toList).toSet
    assert(want.nonEmpty, "vacuous: no Benford rows at sf0.001")
    val rows = Tables.events(spark, TestSpark.sf0001)
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"), org.apache.spark.sql.functions.lit("").as("props"))
      .as[Ev].collect().sortBy(r => (r._2.getTime, r._1)).toSeq
    val (b1, b2) = rows.splitAt(rows.size / 2)
    val sinkId = s"bf-${System.nanoTime()}"
    val sink = new UpsertSink(sinkId, 2) // key = (event_type, digit)
    val input = MemoryStream[Ev](spark)
    val q = StreamingQueries.streamingBenfordCounts(input.toDF().toDF(eventCols: _*))
      .writeStream.outputMode("update").foreach(sink).start()
    try {
      input.addData(b1: _*)
      q.processAllAvailable()
      input.addData(b2: _*)
      q.processAllAvailable()
    } finally q.stop()
    val cnt = Sinks.registry(sinkId).asScala.values.toSeq
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toDF("event_type", "digit", "n")
    Sinks.clear(sinkId)
    val got = graft.queries.PipelineCatalog.benfordFrom(spark, cnt)
      .collect().map(_.toSeq.toList).toSet
    assert(got == want, "streamed Benford profile diverges from the batch entry")
  }

  test("streaming heavy-hitter sketch covers the batch-exact heavy set, never over-counts") {
    import graft.functions.Text
    import org.apache.spark.sql.functions.{col, explode, size => fsize}
    // The corpus as a bigram item stream, replayed in two bursts.
    val bigrams = Tables.documents(spark, TestSpark.sf0001)
      .select(Text.normTokens(col("text")).as("t"))
      .filter(fsize(col("t")) >= 2)
      .select(explode(Text.wordNgrams(col("t"), 2)).as("item"))
      .as[String].collect().toSeq
    val exact = bigrams.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = bigrams.size
    // The batch entry's threshold (count·1025 > N) — what streaming
    // candidates must cover.
    val heavy = exact.filter { case (_, c) => c * 1025 > n }.keySet
    assert(heavy.nonEmpty, "vacuous: no heavy bigrams at sf0.001")
    val (b1, b2) = bigrams.splitAt(bigrams.size / 2)
    val sinkId = s"hh-${System.nanoTime()}"
    val sink = new UpsertSink(sinkId, 2) // key = (shard, item)
    val input = MemoryStream[String](spark)
    // The survival guarantee is PER SHARD: count_s(x) > n_s/(cap+1) keeps
    // a counter. Shard loads are uneven (hash mass, not item count), so
    // covering the batch threshold N/1025 ≈ 27 needs the WORST shard's
    // n_s/(cap+1) below it: with ~27k items the hottest of 16 shards
    // carries ≲ 3.4k, and capacity 128 puts its threshold at ≈ 26.
    val capacity = 128
    val shards = 16
    val q = StreamingQueries.heavyHitterSketch(
        input.toDF().toDF("item"), capacity = capacity, shards = shards)
      .writeStream.outputMode("update").foreach(sink).start()
    try {
      input.addData(b1: _*)
      q.processAllAvailable()
      input.addData(b2: _*)
      q.processAllAvailable()
    } finally q.stop()
    val emitted = Sinks.registry(sinkId).asScala.values
      .map(r => r.getString(1) -> r.getLong(2)).toSeq
    Sinks.clear(sinkId)
    val candidates = emitted.map(_._1).toSet
    assert(heavy.subsetOf(candidates),
      s"sketch lost heavy items: ${(heavy -- candidates).mkString(",")}")
    // The exact per-shard MG guarantee, independent of the sizing above:
    // every item whose count within its shard exceeds n_s/(cap+1) must
    // have survived into the emitted union.
    val byShard = bigrams.groupBy(it => math.floorMod(it.hashCode, shards))
    byShard.foreach { case (_, items) =>
      val ns = items.size
      items.groupBy(identity).view.mapValues(_.size).foreach { case (it, c) =>
        if (c.toLong * (capacity + 1) > ns)
          assert(candidates.contains(it), s"per-shard guarantee violated for $it")
      }
    }
    // MG never over-counts — holds for every emission, stale or final.
    emitted.foreach { case (it, est) =>
      assert(est <= exact.getOrElse(it, 0L), s"over-count for $it")
    }
  }

  test("streaming key-count state folds to the batch skew report") {
    import graft.queries.Transforms
    val fb1: Seq[Ev] = (1L to 60L).map(i =>
      (i, ts(s"2024-06-0${1 + (i % 9).toInt} 0${i % 10}:15:00"), i % 5,
        "view", 1.0, ""))
    // Burst 2 hammers one hot key so the skew statistics are non-trivial.
    val fb2: Seq[Ev] = (61L to 120L).map(i =>
      (i, ts(s"2024-06-1${(i % 9).toInt} 1${i % 10}:45:00"), if (i % 4 == 0) 3L else i % 11,
        "click", 1.0, ""))
    val sinkId = s"skew-${System.nanoTime()}"
    val sink = new UpsertSink(sinkId)
    val input = MemoryStream[Ev](spark)
    val q = StreamingQueries.runUpdating(
      "events_key_counts", input.toDF().toDF(eventCols: _*), sink, intervalMs = 50L)
    try {
      input.addData(fb1: _*)
      q.processAllAvailable()
      input.addData(fb2: _*)
      q.processAllAvailable()
    } finally q.stop()
    val counts = Sinks.registry(sinkId).asScala.values.toSeq
      .map(r => (r.getLong(0), r.getLong(1)))
    Sinks.clear(sinkId)
    val streamed = Transforms.keySkewFold(counts.toDF("user_id", "c"))
      .collect().map(_.toSeq).head
    val batch = Transforms.keySkewFold(Transforms.keyCounts(
      (fb1 ++ fb2).toDF(eventCols: _*))).collect().map(_.toSeq).head
    assert(streamed == batch, s"live skew state diverges: $streamed vs $batch")
    assert(batch(3).asInstanceOf[Double] > 1.5, s"hot key not visible in skew_ratio: $batch")
  }

  test("streaming latest-state view converges to the batch compaction") {
    import graft.queries.Transforms
    val fb1: Seq[Ev] = (1L to 60L).map(i =>
      (i, ts(s"2024-06-0${1 + (i % 9).toInt} 0${i % 10}:15:00"), i % 7,
        if (i % 2 == 0) "view" else "click", (i % 20).toDouble, ""))
    val fb2: Seq[Ev] = (61L to 120L).map(i =>
      (i, ts(s"2024-06-1${(i % 9).toInt} 1${i % 10}:45:00"), i % 11,
        if (i % 3 == 0) "purchase" else "view", (i % 13).toDouble, ""))
    val sinkId = s"latest-${System.nanoTime()}"
    val sink = new UpsertSink(sinkId)
    val input = MemoryStream[Ev](spark)
    val q = StreamingQueries.runUpdating(
      "events_latest_state", input.toDF().toDF(eventCols: _*), sink, intervalMs = 50L)
    try {
      input.addData(fb1: _*)
      q.processAllAvailable()
      input.addData(fb2: _*)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = Sinks.registry(sinkId).asScala.values.toSeq
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getString(3),
        r.getDouble(4))).toSet
    Sinks.clear(sinkId)
    val batch = Transforms.latestState((fb1 ++ fb2).toDF(eventCols: _*))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2),
        r.getString(3), r.getDouble(4))).toSet
    assert(streamed == batch, "live latest-state view diverges from batch compaction")
    // The second burst's users (i % 11) overlap the first's (i % 7):
    // overlapping keys must show burst-2 state (the upsert happened).
    assert(batch.exists { case (_, t, _, _, _) => t.after(ts("2024-06-09 00:00:00")) })
  }

  test("streaming transition state reproduces the batch lead-window matrix") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.{col, lead}
    val types = Seq("signup", "view", "click", "purchase", "error")
    // Globally increasing timestamps: per-user in-order across batches.
    def ev(i: Long): Ev =
      (i, new Timestamp(ts("2024-07-01 00:00:00").getTime + i * 60000L), i % 7,
        types((i % 5).toInt), 1.0, "")
    val fb1 = (1L to 60L).map(ev)
    val fb2 = (61L to 120L).map(ev)
    val tbl = s"transitions_${System.nanoTime()}"
    val input = MemoryStream[Ev](spark)
    val q = StreamingQueries.streamingTransitionPairs(input.toDF().toDF(eventCols: _*))
      .toDF("user_id", "from_type", "to_type")
      .writeStream.outputMode("append").format("memory").queryName(tbl).start()
    try {
      input.addData(fb1: _*)
      q.processAllAvailable()
      input.addData(fb2: _*)
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table(tbl).groupBy("from_type", "to_type").count()
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val want = (fb1 ++ fb2).toDF(eventCols: _*)
      .withColumn("next_type", lead("event_type", 1).over(w))
      .filter(col("next_type").isNotNull)
      .groupBy("event_type", "next_type").count()
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == want, "streamed transition matrix diverges from the batch window")
    assert(got.values.sum == 120 - 7, "pair total != events - one per user")
  }

  private type Doc = (Long, Timestamp, String)

  test("checkpointed query restarts with state intact (fault-tolerance semantics)") {
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    val sinkId = s"ckpt-${System.nanoTime()}"
    val input = MemoryStream[Ev](spark)
    def startQuery() =
      StreamingQueries.updating("taxi_ride_count")(input.toDF().toDF(eventCols: _*))
        .writeStream.outputMode("update")
        .option("checkpointLocation", ckpt)
        .foreach(new UpsertSink(sinkId)).start()

    val q1 = startQuery()
    try {
      input.addData(burst1: _*)
      q1.processAllAvailable()
    } finally q1.stop()
    // Restart from the checkpoint: keyed state must survive, burst2
    // counts must ACCUMULATE onto burst1's, not restart from zero.
    val q2 = startQuery()
    try {
      input.addData(burst2: _*)
      q2.processAllAvailable()
    } finally q2.stop()
    val got = Sinks.registry(sinkId).asScala.toMap.map { case (k, r) => k -> r.toSeq.toList }
    Sinks.clear(sinkId)
    assert(got == batchAnswer("taxi_ride_count"))
  }

  test("keyed state runs on the RocksDB state store (large-state scale path)") {
    // At 100 TB keyed state outgrows executor heaps; RocksDB keeps it
    // off-heap on local disk with incremental checkpointing. The engine's
    // queries must be provider-agnostic: same results, and the progress
    // metrics must prove RocksDB actually held the state.
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val sinkId = s"rocksdb-${System.nanoTime()}"
    val input = MemoryStream[Ev](spark)
    val sink = new UpsertSink(sinkId)
    val q = StreamingQueries.runUpdating("taxi_ride_count",
      input.toDF().toDF(eventCols: _*), sink, intervalMs = 50L)
    try {
      input.addData(burst1: _*)
      q.processAllAvailable()
      input.addData(burst2: _*)
      q.processAllAvailable()
      val metrics = q.lastProgress.stateOperators.head.customMetrics
      assert(metrics.keySet.asScala.exists(_.startsWith("rocksdb")),
        s"state operator reports no rocksdb metrics: ${metrics.keySet}")
    } finally {
      q.stop()
      prev match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
    val got = Sinks.registry(sinkId).asScala.toMap.map { case (k, r) => k -> r.toSeq.toList }
    Sinks.clear(sinkId)
    assert(got == batchAnswer("taxi_ride_count"))
  }

  test("streaming dedup drops in-watermark duplicates, keeps distinct content") {
    val t0 = ts("2024-03-01 10:00:00")
    val docs: Seq[Doc] = Seq(
      (1L, t0, "alpha beta"),
      (2L, t0, "ALPHA   beta"), // normalizes to the same content -> dup
      (3L, t0, "gamma delta"),
      (4L, t0, "alpha beta"), // dup again
      (5L, t0, "epsilon"))
    val input = MemoryStream[Doc](spark)
    val sinkId = s"dedup-${System.nanoTime()}"
    val q = StreamingQueries.streamingDedup(
        input.toDF().toDF("doc_id", "ts", "text"), tsCol = "ts")
      .select("content_hash", "doc_id")
      .writeStream.outputMode("append").foreach(new UpsertSink(sinkId)).start()
    try {
      input.addData(docs.take(3): _*)
      q.processAllAvailable()
      input.addData(docs.drop(3): _*)
      q.processAllAvailable()
      // In-watermark dedup: first of each content wins, 2 and 4 dropped.
      val kept = Sinks.registry(sinkId).asScala.values.map(_.getLong(1)).toSet
      assert(kept == Set(1L, 3L, 5L), s"kept $kept")
      // State EVICTION (the bounded-state contract): an event 3 h ahead
      // advances the watermark past t0 + 1 h delay, expiring the "alpha
      // beta" hash entry at the end of its micro-batch; the same content
      // arriving in a LATER batch is then re-admitted — exactly the
      // dropDuplicatesWithinWatermark trade-off the scaladoc documents
      // (plain dropDuplicates keyed on the hash would keep the entry and
      // drop doc 7 forever, i.e. unbounded state). The re-admitted row
      // upserts its hash key in the sink, so doc 1's slot now shows 7.
      val t3 = ts("2024-03-01 13:00:00")
      input.addData((6L, t3, "watermark pusher"))
      q.processAllAvailable()
      input.addData((7L, t3, "alpha beta"))
      q.processAllAvailable()
    } finally q.stop()
    val finalKept = Sinks.registry(sinkId).asScala.values.map(_.getLong(1)).toSet
    Sinks.clear(sinkId)
    assert(finalKept == Set(3L, 5L, 6L, 7L),
      s"kept $finalKept — 7 must be re-admitted after its hash state expired")
  }

  test("streaming near-dup flags cross-batch LSH collisions via signature estimate") {
    val t0 = ts("2024-03-01 10:00:00")
    val textA = "alpha beta gamma delta epsilon zeta eta theta"
    val textB = "one two three four five six seven eight nine"
    val textC = "red green blue cyan magenta yellow black white"
    val input = MemoryStream[Doc](spark)
    val sinkId = s"neardup-${System.nanoTime()}"
    // No stateTtl here: pending processing-time timers keep the default
    // ASAP trigger running empty micro-batches (that is how timers
    // fire), so processAllAvailable never quiesces — the TTL knob is
    // for paced production triggers (see streamingNearDup scaladoc).
    val q = StreamingQueries.streamingNearDup(
        input.toDF().toDF("doc_id", "ts", "text"), simThreshold = 0.6)
      .toDF()
      .writeStream.outputMode("append").foreach(new UpsertSink(sinkId, 2)).start()
    try {
      input.addData((1L, t0, textA), (2L, t0, textB))
      q.processAllAvailable()
      // Batch 2: 3 repeats textA (cross-batch dup of 1); 4 is a one-word
      // append to textA (near-dup); 5 is fresh. 3 must NOT be stored as a
      // senior copy — 4's verdict must still point at 1.
      input.addData((3L, t0, textA), (4L, t0, textA + " iota"), (5L, t0, textC))
      q.processAllAvailable()
    } finally q.stop()
    val verdicts = Sinks.registry(sinkId).asScala.values
      .map(r => (r.getLong(0), r.getLong(2))).toSet // (doc_id, dup_of)
    Sinks.clear(sinkId)
    assert(verdicts.map(_._1) == Set(3L, 4L), s"flagged: $verdicts")
    assert(verdicts.forall(_._2 == 1L), s"seniority broken: $verdicts")
  }

  test("stream-stream attribution join matches the batch join across micro-batches") {
    type Click = (Long, Long, Timestamp) // user_id, event_id, ts
    val clicks = Seq(
      (1L, 10L, ts("2024-03-01 10:00:00")),
      (1L, 11L, ts("2024-03-01 12:00:00")),
      (2L, 20L, ts("2024-03-01 10:30:00")))
    val purchases = Seq(
      (1L, 100L, ts("2024-03-01 10:30:00")), // joins click 10 (within 1h)
      (1L, 101L, ts("2024-03-01 12:59:00")), // joins click 11, NOT 10 (>1h)
      (2L, 200L, ts("2024-03-01 13:00:00")), // outside any click horizon
      (3L, 300L, ts("2024-03-01 10:40:00"))) // no click at all
    val cIn = MemoryStream[(Long, Long, Timestamp)](spark)
    val pIn = MemoryStream[(Long, Long, Timestamp)](spark)
    val joined = StreamingQueries.streamAttributionJoin(
      cIn.toDF().toDF("user_id", "event_id", "ts"),
      pIn.toDF().toDF("user_id", "event_id", "ts"))
    val sinkId = s"attr-${System.nanoTime()}"
    val q = joined.select("click_id", "purchase_id")
      .writeStream.outputMode("append").foreach(new UpsertSink(sinkId, 2)).start()
    try {
      cIn.addData(clicks: _*) // clicks arrive first...
      q.processAllAvailable()
      pIn.addData(purchases: _*) // ...purchases in a LATER micro-batch (state join)
      q.processAllAvailable()
    } finally q.stop()
    val got = Sinks.registry(sinkId).asScala.values
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    Sinks.clear(sinkId)
    val batch = {
      import spark.implicits._
      val c = clicks.toDF("user_id", "event_id", "ts")
      val p = purchases.toDF("user_id", "event_id", "ts")
      StreamingQueries.streamAttributionJoin(c, p)
        .select("click_id", "purchase_id").as[(Long, Long)].collect().toSet
    }
    assert(got == batch && got == Set((10L, 100L), (11L, 101L)), s"got $got, batch $batch")
  }

  test("streaming cleaning pipeline converges to the batch quality->dedup->stats composition") {
    import org.apache.spark.sql.functions._
    val sf0001 = TestSpark.sf0001
    // Ordered replay (ascending doc_id) so streaming first-seen dedup picks
    // the same survivor as the batch min-id rule; per-source stats are
    // survivor-invariant anyway (no duplicate group spans sources here).
    val rows: Seq[(Long, Timestamp, String, String)] = Tables.documents(spark, sf0001)
      .select("doc_id", "source", "text").collect().sortBy(_.getLong(0)).toSeq
      .map(r => (r.getLong(0), new Timestamp(1700000000000L + r.getLong(0) * 1000L),
        r.getString(1), r.getString(2)))
    val input = MemoryStream[(Long, Timestamp, String, String)](spark)
    val table = s"clean_stream_${System.nanoTime()}"
    val q = StreamingQueries.streamingCleanCorpus(
        input.toDF().toDF("doc_id", "ts", "source", "text"), tsCol = "ts")
      .writeStream.outputMode("complete").format("memory").queryName(table).start()
    def snapshot() = spark.table(table).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    try {
      val (h, t) = rows.splitAt(rows.size / 2)
      input.addData(h: _*)
      q.processAllAvailable()
      input.addData(t: _*)
      q.processAllAvailable()
      val batch = graft.queries.PipelineCatalog
        .qualityDedup(Tables.documents(spark, sf0001))
        .groupBy("source")
        .agg(count(lit(1)).as("docs_kept"), sum("n_tokens").as("tokens_kept"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      assert(snapshot() == batch)
    } finally q.stop()
  }

  test("AdaptivePolicy walks the band exactly like the reference controller") {
    import AdaptivePolicy.next
    // Overloaded (≥100 %): +200 regardless of band position.
    assert(next(500, 120.0, overloaded = true) == Some(700L))
    // Above hard band (≥85): +200; above soft band (>65): +100.
    assert(next(500, 90.0, overloaded = false) == Some(700L))
    assert(next(500, 70.0, overloaded = false) == Some(600L))
    // Below soft band (<40): −100; below hard band (≤30): −200.
    assert(next(500, 35.0, overloaded = false) == Some(400L))
    assert(next(500, 20.0, overloaded = false) == Some(300L))
    // Floor at 50 ms (MIN_INTERVAL_MS).
    assert(next(100, 5.0, overloaded = false) == Some(50L))
    assert(next(60, 35.0, overloaded = false) == Some(50L))
    // Inside band: no correction.
    assert(next(500, 50.0, overloaded = false).isEmpty)
  }

  test("controller walks the interval through a bursty utilization profile") {
    val c = new AdaptiveTriggerController("synthetic", initialIntervalMs = 500L)
    // Quiet stream: utilization far below band → interval decays to floor.
    var batch = 0L
    def feed(durMs: Long, n: Int): Unit = (1 to n).foreach { _ =>
      batch += 1; c.observe(batch, durMs, 1000.0, 1000.0)
    }
    feed(durMs = 20, n = 5) // util ≤30% of current → −200 steps to the floor
    assert(c.currentIntervalMs == 50L)
    // Burst: 200ms batches → 400% of 50ms (overload, +200) → 80% of 250ms
    // (soft backpressure, +100) → 57% of 350ms (in band, hold).
    feed(durMs = 200, n = 3)
    assert(c.currentIntervalMs == 350L)
    // Inside the band (150/350 ≈ 43%): no correction.
    feed(durMs = 150, n = 2)
    assert(c.currentIntervalMs == 350L)
    // Load drops: 60/350 ≈ 17% (≤30, −200) → 60/150 = 40% (in band, hold).
    feed(durMs = 60, n = 2)
    assert(c.currentIntervalMs == 150L)
    val log = c.decisions
    assert(log.size == batch.toInt)
    assert(log.exists(_.utilizationPct >= 100.0) && log.exists(_.utilizationPct < 40.0))
    // Signal wire format: 12 |-delimited fields (monitor analogue).
    assert(log.head.asSignalString.split("\\|").length == 12)
  }

  test("adCombine closed loop: controller decisions re-arm the RUNNING query's trigger") {
    import org.apache.spark.sql.streaming.Trigger
    import graft.sources.Sources
    val ckpt = java.nio.file.Files.createTempDirectory("graft-adcombine").toString
    val sinkId = s"adc-${System.nanoTime()}"
    // Continuous bursty feed: the finite event set replayed in a loop at
    // ~1k rec/s (control file absent -> fixed default delay).
    val control = new Sources.DataRateControl(
      java.nio.file.Paths.get("/tmp/graft-no-such-rate-file"), defaultDelayNs = 1000000L)
    val replay = new Sources.RateLimitedReplay[Ev](
      spark, (burst1 ++ burst2).toIndexedSeq, control, batchRecords = 30, loop = true)
    def writer(intervalMs: Long) =
      StreamingQueries.updating("taxi_ride_count")(replay.toDF.toDF(eventCols: _*))
        .writeStream.queryName("adcombine_q").outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.ProcessingTime(intervalMs))
        .foreach(new UpsertSink(sinkId))
    val runner = new AdaptiveRunner(spark, "adcombine_q", writer, initialIntervalMs = 600L)
    replay.start()
    runner.start()
    try {
      // Tiny batches under a 600 ms trigger run below the band, so the
      // policy steps the interval down; wait for at least one downward
      // step applied to the RUNNING query, then observe the adapted
      // cadence. (How FAR the walk descends depends on real batch
      // durations — on a loaded host they inflate into the band and the
      // policy correctly holds — so the landing interval is not asserted,
      // only that re-arming happened.)
      // On a loaded host real batch durations inflate into (or above)
      // the band and the policy legitimately steps UP instead — the
      // CLAIM under test is that decisions re-arm the RUNNING query,
      // not the walk's direction, so wait for any re-arm.
      val deadline = System.currentTimeMillis() + 60000
      while (runner.rearms.isEmpty &&
        System.currentTimeMillis() < deadline) Thread.sleep(100)
      // Then wait for steady-state evidence: at least one progress
      // decision recorded AFTER the latest re-arm (a fixed sleep is not
      // enough — the graceful stop/restart plus a slow host can exceed
      // any constant tail).
      val deadline2 = System.currentTimeMillis() + 30000
      def steadyObserved = {
        val evs = runner.rearmEvents
        evs.nonEmpty && runner.controller.decisions.exists(_.wallMs > evs.last._2)
      }
      while (!steadyObserved && System.currentTimeMillis() < deadline2)
        Thread.sleep(100)
    } finally {
      runner.stop()
      replay.stop()
      Sinks.clear(sinkId)
    }
    val rearms = runner.rearms
    assert(rearms.nonEmpty, "controller decisions never re-armed the running query")
    assert(rearms.exists(_ != 600L), s"re-arms never moved off the initial 600ms: $rearms")
    assert(rearms.forall(_ >= AdaptivePolicy.MinIntervalMs), s"floor violated: $rearms")
    // Closed loop: every armed interval traces back to a recorded decision.
    val decided = runner.controller.decisions.map(_.intervalMsAfter).toSet
    assert(rearms.forall(decided.contains), s"re-arm not from a decision: $rearms")
    // The RUNNING pipeline kept producing batches after a re-arm. (The
    // steady set is keyed to the LAST re-arm; if yet another re-arm
    // slipped in between the wait loop and stop(), steady can be
    // legitimately empty — the closed-loop claim is already proven by
    // the decision-traceability assertions above, so the cadence checks
    // below only run when a steady window exists.)
    val ds = runner.controller.decisions
    val (lastArmed, lastRearmWall) = runner.rearmEvents.last
    val steady = ds.filter(_.wallMs > lastRearmWall)
    // When the final armed interval is below the initial 600 ms, its
    // observed cadence beat what the original trigger could deliver.
    if (lastArmed < 600L && steady.size >= 3) {
      val gaps = steady.map(_.wallMs).sliding(2).collect { case Seq(a, b) => b - a }.toSeq
      val median = gaps.sorted.apply(gaps.size / 2)
      assert(median < 600L,
        s"observed cadence ${median}ms did not beat the initial 600ms (armed=$lastArmed)")
    }
  }

  test("controller receives live StreamingQueryProgress signals (adCombine wiring)") {
    val sinkId = s"test-ctl-${System.nanoTime()}"
    val input = MemoryStream[Ev](spark)
    val ctl = StreamingQueries.withController(spark, "ctl_query", initialIntervalMs = 500L)
    val q = StreamingQueries.updating("taxi_ride_count")(input.toDF().toDF(eventCols: _*))
      .writeStream.queryName("ctl_query").outputMode("update")
      .foreach(new UpsertSink(sinkId)).start()
    try {
      input.addData(burst1: _*)
      q.processAllAvailable()
      input.addData(burst2: _*)
      q.processAllAvailable()
      // Listener delivery is async; give the bus a moment.
      val deadline = System.currentTimeMillis() + 10000
      while (ctl.decisions.isEmpty && System.currentTimeMillis() < deadline) Thread.sleep(100)
    } finally {
      q.stop()
      spark.streams.removeListener(ctl)
      Sinks.clear(sinkId)
    }
    assert(ctl.decisions.nonEmpty, "controller never saw a progress event")
    assert(ctl.decisions.forall(_.batchDurationMs >= 0))
  }

  test("streaming novelty replays the batch doc_novelty entry bit-for-bit") {
    // First-seen gram ownership is monotone over arrival order, so
    // replaying the corpus in doc_id order (= arrival order, the batch
    // entry's premise) through the gram-keyed state op + doc-keyed agg
    // must reproduce the batch frame exactly — including ownership
    // decided ACROSS batch boundaries (3 micro-batches here).
    val docs = Tables.documents(spark, TestSpark.sf0001)
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("text"))
    val want = SparkEntry.queries("doc_novelty")(spark, TestSpark.sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    val rows = docs.as[(Long, String)].collect().toSeq.sortBy(_._1)
    val thirds = rows.grouped(math.max(1, rows.size / 3 + 1)).toSeq
    val input = MemoryStream[(Long, String)](spark)
    val qn = s"novelty_${System.nanoTime()}"
    val q = graft.streaming.StreamingQueries
      .streamingNovelty(input.toDF().toDF("doc_id", "text"))
      .writeStream.queryName(qn).outputMode("complete").format("memory").start()
    try {
      thirds.foreach { b => input.addData(b: _*); q.processAllAvailable() }
      val got = spark.table(qn).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
      assert(got == want, "streamed novelty diverges from the batch entry")
    } finally q.stop()
  }

  test("streaming pack stats replay the batch doc_pack_sequences entry bit-for-bit") {
    // The packing order is (source, doc_id); replaying docs in doc_id
    // order (micro-batch groups re-sort per source) must reproduce the
    // batch per-source packing frame exactly, including sequences cut
    // ACROSS micro-batch boundaries (the running sum is keyed state).
    val docs = Tables.documents(spark, TestSpark.sf0001)
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("source"),
        org.apache.spark.sql.functions.col("text"))
    val want = SparkEntry.queries("doc_pack_sequences")(spark, TestSpark.sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(6))).toSet
    val rows = docs.as[(Long, String, String)].collect().toSeq.sortBy(_._1)
    val thirds = rows.grouped(math.max(1, rows.size / 3 + 1)).toSeq
    val input = MemoryStream[(Long, String, String)](spark)
    val qn = s"pack_${System.nanoTime()}"
    val q = graft.streaming.StreamingQueries
      .streamingPackStats(input.toDF().toDF("doc_id", "source", "text"))
      .writeStream.queryName(qn).outputMode("complete").format("memory").start()
    try {
      thirds.foreach { b => input.addData(b: _*); q.processAllAvailable() }
      val got = spark.table(qn).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5), r.getDouble(6))).toSet
      assert(got == want, "streamed pack stats diverge from the batch entry")
    } finally q.stop()
  }

  test("KMV sketch streams: the SAME bounded-heap aggregate replays the batch sketch") {
    // Mergeability is what makes KMV streaming-compatible: the TopNAgg
    // Aggregator that builds source_kmv_overlap's sketches runs
    // UNCHANGED as a streaming complete-mode aggregate — Spark keeps the
    // K-min buffer as state and merges each micro-batch into it, so
    // after the stream drains the emitted sketch must equal the batch
    // kmvSketch over the same rows bit-for-bit. State is bounded at K
    // values per source by the aggregate itself, regardless of stream
    // length.
    import org.apache.spark.sql.functions.{col, explode}
    val docs = Tables.documents(spark, TestSpark.sf0001)
    val hv = docs.select(col("source"),
        explode(graft.functions.Text.shingles(col("text"), 2)).as("sh"))
      .select(col("source"),
        org.apache.spark.sql.functions.conv(
          org.apache.spark.sql.functions.substring(
            org.apache.spark.sql.functions.md5(col("sh")), 1, 13), 16, 10)
          .cast("long").as("h"))
      .distinct()
    val want = graft.queries.ScaleCatalog.kmvSketch(hv)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val rows = hv.as[(String, Long)].collect().toSeq
    val (b1, b2) = rows.splitAt(rows.size / 2)
    val input = MemoryStream[(String, Long)](spark)
    val qn = s"kmv_${System.nanoTime()}"
    val q = graft.queries.ScaleCatalog.kmvSketch(input.toDF().toDF("source", "h"))
      .writeStream.queryName(qn).outputMode("complete").format("memory").start()
    try {
      input.addData(b1: _*)
      q.processAllAvailable()
      input.addData(b2: _*)
      q.processAllAvailable()
      val got = spark.table(qn).collect()
        .map(r => (r.getString(0), r.getLong(1))).toSet
      assert(got == want, "streamed KMV sketch diverges from the batch sketch")
    } finally q.stop()
  }

  test("daily KMV sketch streams: drained day-keyed state replays user_kmv_sliding") {
    // user_kmv_sliding's ONLY corpus-touching stage is the per-day
    // bounded-heap sketch (kmvSketchBy keyed by day). Run that SAME
    // aggregate as a complete-mode streaming query over the (day, h)
    // hash stream, drain the ≤K-per-day state, and replay the factored
    // merge/estimator (kmvSlidingFromSketch) on it: the result — the
    // kmv_est column included, since the merged estimate is a
    // deterministic function of the sketch rows — must equal the batch
    // entry bit-for-bit on sf0.001 (the under-K exact branch at this sf).
    import org.apache.spark.sql.functions.col
    import graft.queries.ScaleCatalog
    val want = SparkEntry.queries("user_kmv_sliding")(spark, TestSpark.sf0001)
      .collect().map(_.toSeq.toList).toSet
    assert(want.nonEmpty, "vacuous: no sliding-window rows at sf0.001")
    val du = ScaleCatalog.kmvDayUsers(Tables.events(spark, TestSpark.sf0001)).cache()
    val hv = ScaleCatalog.kmvDailyHashes(du)
      .select(col("day"), col("h")).as[(Long, Long)].collect().toSeq
    val (b1, b2) = hv.splitAt(hv.size / 2)
    val input = MemoryStream[(Long, Long)](spark)
    val qn = s"kmvday_${System.nanoTime()}"
    val q = ScaleCatalog.kmvSketchBy(
        input.toDF().toDF("day", "h"), "day", ScaleCatalog.SlidingK)
      .writeStream.queryName(qn).outputMode("complete").format("memory").start()
    try {
      input.addData(b1: _*)
      q.processAllAvailable()
      input.addData(b2: _*)
      q.processAllAvailable()
      val dsk = spark.table(qn).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq.toDF("day", "h")
      val got = ScaleCatalog.kmvSlidingFromSketch(dsk, du)
        .collect().map(_.toSeq.toList).toSet
      assert(got == want, "streamed daily KMV sketch diverges from the batch entry")
    } finally {
      q.stop()
      du.unpersist(blocking = false)
    }
  }

  test("streamed daily-cents series replays the batch correlation table bit-for-bit") {
    // events_series_correlation's ONLY corpus-touching stage is the
    // (type, day) exact-BIGINT cents aggregate — linear/mergeable, so it
    // runs unchanged as a complete-mode streaming query; the pairwise
    // Pearson stage (seriesCorrFrom) is corpus-independent and must
    // replay the batch entry bit-for-bit from the drained series.
    import org.apache.spark.sql.functions.col
    import graft.queries.PipelineCatalog
    val want = SparkEntry.queries("events_series_correlation")(spark, TestSpark.sf0001)
      .collect().map(_.toSeq.toList).toSet
    assert(want.nonEmpty, "vacuous: no correlation pairs at sf0.001")
    val rows = Tables.events(spark, TestSpark.sf0001)
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"), org.apache.spark.sql.functions.lit("").as("props"))
      .as[Ev].collect().sortBy(r => (r._2.getTime, r._1)).toSeq
    val (b1, b2) = rows.splitAt(rows.size / 2)
    val input = MemoryStream[Ev](spark)
    val qn = s"scorr_${System.nanoTime()}"
    val q = PipelineCatalog.dailyCents(input.toDF().toDF(eventCols: _*))
      .writeStream.queryName(qn).outputMode("complete").format("memory").start()
    try {
      input.addData(b1: _*)
      q.processAllAvailable()
      input.addData(b2: _*)
      q.processAllAvailable()
      val daily = spark.table(qn).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        .toSeq.toDF("event_type", "day", "c")
      val got = PipelineCatalog.seriesCorrFrom(daily)
        .collect().map(_.toSeq.toList).toSet
      assert(got == want, "streamed series correlation diverges from the batch entry")
    } finally q.stop()
  }

  test("streamed daily-cents state replays the batch Holt trend table bit-for-bit") {
    // events_holt_trend's only corpus-touching stage is the same
    // (type, day) exact-BIGINT cents aggregate events_series_correlation
    // streams (linear, mergeable — complete-mode keyed state); the Holt
    // recursion (holtFrom) is series-sized, so the live form drains the
    // state and must replay the batch entry bit-for-bit.
    import org.apache.spark.sql.functions.col
    import graft.queries.PipelineCatalog
    val want = SparkEntry.queries("events_holt_trend")(spark, TestSpark.sf0001)
      .collect().map(_.toSeq.toList).toSet
    assert(want.nonEmpty, "vacuous: no Holt rows at sf0.001")
    val rows = Tables.events(spark, TestSpark.sf0001)
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"), org.apache.spark.sql.functions.lit("").as("props"))
      .as[Ev].collect().sortBy(r => (r._2.getTime, r._1)).toSeq
    val (b1, b2) = rows.splitAt(rows.size / 2)
    val input = MemoryStream[Ev](spark)
    val qn = s"holt_${System.nanoTime()}"
    val q = PipelineCatalog.dailyCents(input.toDF().toDF(eventCols: _*))
      .writeStream.queryName(qn).outputMode("complete").format("memory").start()
    try {
      input.addData(b1: _*)
      q.processAllAvailable()
      input.addData(b2: _*)
      q.processAllAvailable()
      val daily = spark.table(qn).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        .toSeq.toDF("event_type", "day", "c")
      val got = PipelineCatalog.holtFrom(daily)
        .collect().map(_.toSeq.toList).toSet
      assert(got == want, "streamed Holt trend diverges from the batch entry")
    } finally q.stop()
  }

  test("streamed boilerplate DF counts replay the batch profile bit-for-bit") {
    // doc_boilerplate_ngrams' only corpus-touching stage is the
    // (source, shingle) document-frequency count — per-doc distinct
    // shingles make it a plain mergeable keyed count, so it maintains
    // live in complete mode (with the docs-per-source companion state);
    // the threshold/rollup profile is counts-sized and must replay the
    // batch entry bit-for-bit from the drained frames.
    import org.apache.spark.sql.functions.col
    import graft.queries.PipelineCatalog
    val want = SparkEntry.queries("doc_boilerplate_ngrams")(spark, TestSpark.sf0001)
      .collect().map(_.toSeq.toList).toSet
    assert(want.nonEmpty, "vacuous: no sources at sf0.001")
    val rows: Seq[(Long, String, String)] = Tables.documents(spark, TestSpark.sf0001)
      .select("doc_id", "source", "text").collect().toSeq
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val input = MemoryStream[(Long, String, String)](spark)
    val docsDF = input.toDF().toDF("doc_id", "source", "text")
    val qn1 = s"boiler_df_${System.nanoTime()}"
    val qn2 = s"boiler_docs_${System.nanoTime()}"
    val q1 = PipelineCatalog.boilerplateCounts(docsDF)
      .writeStream.queryName(qn1).outputMode("complete").format("memory").start()
    val q2 = PipelineCatalog.boilerplateSrcDocs(docsDF)
      .writeStream.queryName(qn2).outputMode("complete").format("memory").start()
    try {
      val (b1, b2) = rows.splitAt(rows.size / 2)
      input.addData(b1: _*)
      q1.processAllAvailable(); q2.processAllAvailable()
      input.addData(b2: _*)
      q1.processAllAvailable(); q2.processAllAvailable()
      val df = spark.table(qn1).collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
        .toSeq.toDF("source", "sh", "df")
      val perSrc = spark.table(qn2).collect()
        .map(r => (r.getString(0), r.getLong(1)))
        .toSeq.toDF("source", "docs")
      val got = PipelineCatalog.boilerplateProfile(df, perSrc)
        .collect().map(_.toSeq.toList).toSet
      assert(got == want, "streamed boilerplate profile diverges from the batch entry")
    } finally { q1.stop(); q2.stop() }
  }

  test("DSIR resampling streams: the selection reservoir replays the batch entry") {
    // doc_dsir_resample's selection stage is a global bounded-heap A-ES
    // reservoir; stream the (doc_id, k) keyed frame through the SAME
    // dsirTopK aggregate in complete mode — state is one <= K buffer —
    // and the drained sample (ranks included) must equal the batch
    // entry bit-for-bit. (The model half already streams:
    // streamingDsirCells pins the weight table.)
    import org.apache.spark.sql.functions.col
    import graft.queries.PipelineCatalog
    val grams = PipelineCatalog.dsirGrams(Tables.documents(spark, TestSpark.sf0001))
    val keyed = PipelineCatalog.dsirSampleKeyed(PipelineCatalog.dsirScoreRaw(
      grams, PipelineCatalog.dsirWeights(PipelineCatalog.dsirPerBucket(grams))))
    val want = SparkEntry.queries("doc_dsir_resample")(spark, TestSpark.sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(want.nonEmpty, "vacuous: empty resample at sf0.001")
    val rows = keyed.select(col("doc_id"), col("k")).as[(Long, Double)].collect().toSeq
    val (b1, b2) = rows.splitAt(rows.size / 2)
    val input = MemoryStream[(Long, Double)](spark)
    val qn = s"dsirs_${System.nanoTime()}"
    val q = PipelineCatalog.dsirTopK(input.toDF().toDF("doc_id", "k"))
      .writeStream.queryName(qn).outputMode("complete").format("memory").start()
    try {
      input.addData(b1: _*)
      q.processAllAvailable()
      input.addData(b2: _*)
      q.processAllAvailable()
      val got = spark.table(qn).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == want, "streamed DSIR resample diverges from the batch entry")
    } finally q.stop()
  }

  test("A-ES weighted sample streams: the reservoir IS the aggregation buffer") {
    // Efraimidis–Spirakis is a reservoir algorithm by construction, and
    // TopNAgg's merge is exactly its reservoir update — so the SAME
    // bounded-heap aggregate that builds doc_weighted_sample runs
    // unchanged as a streaming complete-mode query: state is the ≤K
    // (key, doc) buffer per source regardless of stream length, and
    // after the stream drains the emitted sample (ranks included) must
    // equal the batch entry bit-for-bit.
    import org.apache.spark.sql.functions.col
    import graft.queries.TrainPrepCatalog
    val docs = Tables.documents(spark, TestSpark.sf0001)
    val keyed = docs.select(col("source"), col("doc_id"),
      TrainPrepCatalog.wsampleKeyCol.as("k"))
    val want = SparkEntry.queries("doc_weighted_sample")(spark, TestSpark.sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val rows = keyed.as[(String, Long, Double)].collect().toSeq
    val (b1, b2) = rows.splitAt(rows.size / 2)
    val input = MemoryStream[(String, Long, Double)](spark)
    val qn = s"wsample_${System.nanoTime()}"
    val q = TrainPrepCatalog.weightedTopK(input.toDF().toDF("source", "doc_id", "k"))
      .writeStream.queryName(qn).outputMode("complete").format("memory").start()
    try {
      input.addData(b1: _*)
      q.processAllAvailable()
      input.addData(b2: _*)
      q.processAllAvailable()
      val got = spark.table(qn).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == want, "streamed weighted sample diverges from the batch entry")
    } finally q.stop()
  }

  test("streamed KN bigram counts replay the smoothed top-20 bit-for-bit") {
    import org.apache.spark.sql.functions.col
    // token_kneser_ney's ONLY corpus-touching stage is the (x, y)
    // bigram count — a plain keyed COUNT maintained live in update
    // mode. Stream the corpus in two bursts, drain the count table,
    // replay the vocab-sized smoothing + ranking stage (knFrom) on the
    // drained frame: equal to the batch entry, ties and ROUND 6
    // included.
    val want = SparkEntry.queries("token_kneser_ney")(spark, TestSpark.sf0001)
      .collect().map(_.toSeq.toList).toSeq
    assert(want.nonEmpty, "vacuous: no KN rows at sf0.001")
    val rows = Tables.documents(spark, TestSpark.sf0001)
      .select("doc_id", "text").as[(Long, String)].collect().sortBy(_._1).toSeq
    val (b1, b2) = rows.splitAt(rows.size / 2)
    val sinkId = s"kn-${System.nanoTime()}"
    val sink = new UpsertSink(sinkId, 2) // key = (x, y)
    val input = MemoryStream[(Long, String)](spark)
    val q = StreamingQueries.streamingKnBigramCounts(
        input.toDF().toDF("doc_id", "text"))
      .writeStream.outputMode("update").foreach(sink).start()
    try {
      input.addData(b1: _*)
      q.processAllAvailable()
      input.addData(b2: _*)
      q.processAllAvailable()
    } finally q.stop()
    val cnt = Sinks.registry(sinkId).asScala.values.toSeq
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .toDF("x", "y", "c_ab")
    Sinks.clear(sinkId)
    val got = graft.queries.TrainPrepCatalog.knFrom(cnt)
      .collect().map(_.toSeq.toList).toSeq
    assert(got == want, "streamed KN report diverges from the batch entry")
  }

  test("streamed gap buckets replay the hazard curve bit-for-bit") {
    import org.apache.spark.sql.functions.col
    // user_gap_hazard's ONLY corpus-touching stage is the per-user lag
    // (gapDeltas) — per-user last-timestamp state live — feeding the
    // ceil-log2 bucket COUNT in the same query. Stream the events in two
    // bursts (global (ts, event_id) pre-sort = the per-key in-order
    // delivery contract every rolling-state query here shares), drain
    // the <= ~40 bucket rows, replay hazardFrom: equal to the batch
    // entry.
    val want = SparkEntry.queries("user_gap_hazard")(spark, TestSpark.sf0001)
      .collect().map(_.toSeq.toList).toSet
    assert(want.nonEmpty, "vacuous: no gap buckets at sf0.001")
    val rows = Tables.events(spark, TestSpark.sf0001)
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"), org.apache.spark.sql.functions.lit("").as("props"))
      .as[Ev].collect().sortBy(r => (r._2.getTime, r._1)).toSeq
    val (b1, b2) = rows.splitAt(rows.size / 2)
    val sinkId = s"gapb-${System.nanoTime()}"
    val sink = new UpsertSink(sinkId, 1) // key = b
    val input = MemoryStream[Ev](spark)
    val q = StreamingQueries.streamingGapBuckets(input.toDF().toDF(eventCols: _*))
      .writeStream.outputMode("update").foreach(sink).start()
    try {
      input.addData(b1: _*)
      q.processAllAvailable()
      input.addData(b2: _*)
      q.processAllAvailable()
    } finally q.stop()
    val buckets = Sinks.registry(sinkId).asScala.values.toSeq
      .map(r => (r.getLong(0), r.getLong(1))).toDF("b", "n_gaps")
    Sinks.clear(sinkId)
    val got = graft.queries.PipelineCatalog.hazardFrom(buckets)
      .collect().map(_.toSeq.toList).toSet
    assert(got == want, "streamed hazard curve diverges from the batch entry")
  }

  test("streamed gap deltas replay the burstiness report bit-for-bit") {
    import org.apache.spark.sql.functions.col
    // user_burstiness rides the same gapDeltas stage; here the drained
    // APPEND-mode gap stream (one row per closed gap) must aggregate to
    // the batch entry exactly — cross-batch gaps (a user's last event of
    // burst 1 against their first of burst 2) exercise the state path.
    val want = SparkEntry.queries("user_burstiness")(spark, TestSpark.sf0001)
      .collect().map(_.toSeq.toList).toSet
    assert(want.nonEmpty, "vacuous: no users with gaps at sf0.001")
    val rows = Tables.events(spark, TestSpark.sf0001)
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"), org.apache.spark.sql.functions.lit("").as("props"))
      .as[Ev].collect().sortBy(r => (r._2.getTime, r._1)).toSeq
    val (b1, b2) = rows.splitAt(rows.size / 2)
    val tbl = s"gapd_${System.nanoTime()}"
    val input = MemoryStream[Ev](spark)
    val q = StreamingQueries.streamingGapDeltas(input.toDF().toDF(eventCols: _*))
      .toDF("user_id", "delta")
      .writeStream.outputMode("append").format("memory").queryName(tbl).start()
    try {
      input.addData(b1: _*)
      q.processAllAvailable()
      input.addData(b2: _*)
      q.processAllAvailable()
    } finally q.stop()
    val got = graft.queries.PipelineCatalog
      .burstinessFromDeltas(spark.table(tbl))
      .collect().map(_.toSeq.toList).toSet
    assert(got == want, "streamed burstiness diverges from the batch entry")
  }

  test("streamed bootstrap replica sums replay the interval bit-for-bit") {
    import org.apache.spark.sql.functions.col
    // doc_bootstrap_ci's ONLY corpus-touching stage is the per-replica
    // (r, Σw·x, Σw) weighted-sum frame (point estimate riding the
    // r = -1 sentinel row) — plain keyed SUMs of exact integers
    // maintained live in update mode. Stream the corpus in two bursts,
    // drain the ≤ R+1 rows, replay the order-statistic interval
    // (bootCiFrom) on the drained frame: equal to the batch entry.
    val want = SparkEntry.queries("doc_bootstrap_ci")(spark, TestSpark.sf0001)
      .collect().map(_.toSeq.toList).toSet
    assert(want.nonEmpty, "vacuous: no bootstrap row at sf0.001")
    val rows = Tables.documents(spark, TestSpark.sf0001)
      .select("doc_id", "text").as[(Long, String)].collect().sortBy(_._1).toSeq
    val (b1, b2) = rows.splitAt(rows.size / 2)
    val sinkId = s"boot-${System.nanoTime()}"
    val sink = new UpsertSink(sinkId, 1) // key = r
    val input = MemoryStream[(Long, String)](spark)
    val q = StreamingQueries.streamingBootReplicaSums(
        input.toDF().toDF("doc_id", "text"))
      .writeStream.outputMode("update").foreach(sink).start()
    try {
      input.addData(b1: _*)
      q.processAllAvailable()
      input.addData(b2: _*)
      q.processAllAvailable()
    } finally q.stop()
    val sums = Sinks.registry(sinkId).asScala.values.toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toDF("r", "swx", "sw")
    Sinks.clear(sinkId)
    assert(sums.count() == graft.queries.TrainPrepCatalog.BootR + 1,
      "drained replica frame must hold R replicas plus the sentinel row")
    val got = graft.queries.TrainPrepCatalog.bootCiFrom(sums)
      .collect().map(_.toSeq.toList).toSet
    assert(got == want, "streamed bootstrap CI diverges from the batch entry")
  }

  test("streamed order baskets replay the association rules bit-for-bit") {
    import org.apache.spark.sql.functions.col
    // The basket family's ONLY corpus-touching stage is the per-order
    // collect_set (set union: linear, mergeable; sort_array makes the
    // drained value arrival-order-free). Stream the lineitems in two
    // bursts split MID-ORDER, drain the baskets, replay the pair
    // statistics + directional rules on the drained frame: equal to
    // the batch lineitem_assoc_rules entry.
    val want = SparkEntry.queries("lineitem_assoc_rules")(spark, TestSpark.sf0001)
      .collect().map(_.toSeq.toList).toSet
    assert(want.nonEmpty, "vacuous: no association rules at sf0.001")
    val rows = Tables.lineitem(spark, TestSpark.sf0001)
      .select(col("l_orderkey"), col("l_partkey"))
      .as[(Long, Long)].collect().sortBy(identity).toSeq
    // Split at an odd offset so at least one order's basket is built
    // across the two bursts (the merge path, not just the insert path).
    val (b1, b2) = rows.splitAt(rows.size / 2 + 1)
    val sinkId = s"bask-${System.nanoTime()}"
    val sink = new UpsertSink(sinkId, 1) // key = ok
    val input = MemoryStream[(Long, Long)](spark)
    val q = StreamingQueries.streamingOrderBaskets(
        input.toDF().toDF("l_orderkey", "l_partkey"))
      .writeStream.outputMode("update").foreach(sink).start()
    try {
      input.addData(b1: _*)
      q.processAllAvailable()
      input.addData(b2: _*)
      q.processAllAvailable()
    } finally q.stop()
    val baskets = Sinks.registry(sinkId).asScala.values.toSeq
      .map(r => (r.getLong(0), r.getSeq[Long](1)))
      .toDF("ok", "pks")
    Sinks.clear(sinkId)
    val got = graft.queries.JoinCatalog.assocRulesFrom(
        graft.queries.JoinCatalog.basketStatsFrom(baskets))
      .collect().map(_.toSeq.toList).toSet
    assert(got == want, "streamed basket rules diverge from the batch entry")
  }

  test("streamed unigram counts replay the Good-Turing table bit-for-bit") {
    // token_good_turing's ONLY corpus-touching stage is the unigram
    // count table — a plain keyed COUNT maintained live in update mode;
    // the count-of-counts report (goodTuringFrom) is tiny batch work
    // over the drained state.
    val want = SparkEntry.queries("token_good_turing")(spark, TestSpark.sf0001)
      .collect().map(_.toSeq.toList).toSeq
    assert(want.nonEmpty, "vacuous: no Good-Turing rows at sf0.001")
    val rows = Tables.documents(spark, TestSpark.sf0001)
      .select("doc_id", "text").as[(Long, String)].collect().sortBy(_._1).toSeq
    val (b1, b2) = rows.splitAt(rows.size / 2)
    val sinkId = s"gt-${System.nanoTime()}"
    val sink = new UpsertSink(sinkId, 1) // key = token
    val input = MemoryStream[(Long, String)](spark)
    val q = StreamingQueries.streamingUnigramCounts(
        input.toDF().toDF("doc_id", "text"))
      .writeStream.outputMode("update").foreach(sink).start()
    try {
      input.addData(b1: _*)
      q.processAllAvailable()
      input.addData(b2: _*)
      q.processAllAvailable()
    } finally q.stop()
    val cnt = Sinks.registry(sinkId).asScala.values.toSeq
      .map(r => (r.getString(0), r.getLong(1))).toDF("token", "c")
    Sinks.clear(sinkId)
    val got = graft.queries.TrainPrepCatalog.goodTuringFrom(cnt)
      .collect().map(_.toSeq.toList).toSeq
    assert(got == want, "streamed Good-Turing table diverges from the batch entry")
  }

  test("streamed (source, token) grid replays the Chao1 richness report bit-for-bit") {
    val want = SparkEntry.queries("source_chao1_richness")(spark, TestSpark.sf0001)
      .collect().map(_.toSeq.toList).toSet
    assert(want.nonEmpty, "vacuous: no Chao1 rows at sf0.001")
    val rows = Tables.documents(spark, TestSpark.sf0001)
      .select("source", "text").as[(String, String)].collect().sortBy(_._2).toSeq
    val (b1, b2) = rows.splitAt(rows.size / 2)
    val sinkId = s"ch-${System.nanoTime()}"
    val sink = new UpsertSink(sinkId, 2) // key = (source, token)
    val input = MemoryStream[(String, String)](spark)
    val q = StreamingQueries.streamingSourceTokenCounts(
        input.toDF().toDF("source", "text"))
      .writeStream.outputMode("update").foreach(sink).start()
    try {
      input.addData(b1: _*)
      q.processAllAvailable()
      input.addData(b2: _*)
      q.processAllAvailable()
    } finally q.stop()
    val grid = Sinks.registry(sinkId).asScala.values.toSeq
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .toDF("source", "token", "c")
    Sinks.clear(sinkId)
    val got = graft.queries.TrainPrepCatalog.chao1From(grid)
      .collect().map(_.toSeq.toList).toSet
    assert(got == want, "streamed Chao1 report diverges from the batch entry")
  }

  test("streamed readability sums replay the Flesch report bit-for-bit") {
    val want = SparkEntry.queries("source_readability")(spark, TestSpark.sf0001)
      .collect().map(_.toSeq.toList).toSet
    assert(want.nonEmpty, "vacuous: no readability rows at sf0.001")
    val rows = Tables.documents(spark, TestSpark.sf0001)
      .select("source", "text").as[(String, String)].collect().sortBy(_._2).toSeq
    val (b1, b2) = rows.splitAt(rows.size / 2)
    val sinkId = s"read-${System.nanoTime()}"
    val sink = new UpsertSink(sinkId, 1) // key = source
    val input = MemoryStream[(String, String)](spark)
    val q = StreamingQueries.streamingReadabilitySums(
        input.toDF().toDF("source", "text"))
      .writeStream.outputMode("update").foreach(sink).start()
    try {
      input.addData(b1: _*)
      q.processAllAvailable()
      input.addData(b2: _*)
      q.processAllAvailable()
    } finally q.stop()
    val sums = Sinks.registry(sinkId).asScala.values.toSeq
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toDF("source", "n_docs", "n_words", "n_sentences", "n_syllables")
    Sinks.clear(sinkId)
    val got = graft.queries.TrainPrepCatalog.readabilityFrom(sums)
      .collect().map(_.toSeq.toList).toSet
    assert(got == want, "streamed Flesch report diverges from the batch entry")
  }

  test("streamed (source, length) grid replays the quartile report bit-for-bit") {
    val want = SparkEntry.queries("source_length_quartiles")(spark, TestSpark.sf0001)
      .collect().map(_.toSeq.toList).toSet
    assert(want.nonEmpty, "vacuous: no quartile rows at sf0.001")
    val rows = Tables.documents(spark, TestSpark.sf0001)
      .select("source", "text").as[(String, String)].collect().sortBy(_._2).toSeq
    val (b1, b2) = rows.splitAt(rows.size / 2)
    val sinkId = s"slq-${System.nanoTime()}"
    val sink = new UpsertSink(sinkId, 2) // key = (source, x)
    val input = MemoryStream[(String, String)](spark)
    val q = StreamingQueries.streamingSourceLengthCounts(
        input.toDF().toDF("source", "text"))
      .writeStream.outputMode("update").foreach(sink).start()
    try {
      input.addData(b1: _*)
      q.processAllAvailable()
      input.addData(b2: _*)
      q.processAllAvailable()
    } finally q.stop()
    val grid = Sinks.registry(sinkId).asScala.values.toSeq
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toDF("source", "x", "c")
    Sinks.clear(sinkId)
    val got = graft.queries.TrainPrepCatalog.quartilesFromLengthGrid(grid)
      .collect().map(_.toSeq.toList).toSet
    assert(got == want, "streamed quartile report diverges from the batch entry")
  }

  test("streamed first-occurrence state replays the Heaps curve bit-for-bit") {
    // token_heaps_curve has TWO corpus-touching aggregates, both
    // streaming-safe keyed state: the (token -> min doc_id)
    // first-occurrence frame (keyed MIN) and the document-id set the
    // rank stage orders (keyed dedup). Stream both over the same bursts
    // (split MID-DOCUMENT set so min-merge across batches is exercised),
    // then replay the GlobalRank + grid stage on the drained frames.
    val want = SparkEntry.queries("token_heaps_curve")(spark, TestSpark.sf0001)
      .collect().map(_.toSeq.toList).toSeq
    assert(want.nonEmpty, "vacuous: no Heaps points at sf0.001")
    val rows = Tables.documents(spark, TestSpark.sf0001)
      .select("doc_id", "text").as[(Long, String)].collect()
      // Reverse doc order across bursts: high doc_ids arrive FIRST, so
      // the keyed MIN state must be overwritten by later burst arrivals
      // (the merge path, not just inserts).
      .sortBy(-_._1).toSeq
    val (b1, b2) = rows.splitAt(rows.size / 2)
    val sinkId = s"hp-${System.nanoTime()}"
    val sink = new UpsertSink(sinkId, 1) // key = token
    val input = MemoryStream[(Long, String)](spark)
    val q = StreamingQueries.streamingFirstOccurrence(
        input.toDF().toDF("doc_id", "text"))
      .writeStream.outputMode("update").foreach(sink).start()
    try {
      input.addData(b1: _*)
      q.processAllAvailable()
      input.addData(b2: _*)
      q.processAllAvailable()
    } finally q.stop()
    val fo = Sinks.registry(sinkId).asScala.values.toSeq
      .map(r => (r.getString(0), r.getLong(1))).toDF("token", "first_doc")
    Sinks.clear(sinkId)
    val docIds = rows.map(_._1).toDF("doc_id")
    val got = graft.queries.TrainPrepCatalog.heapsFrom(docIds, fo)
      .collect().map(_.toSeq.toList).toSeq
    assert(got == want, "streamed Heaps curve diverges from the batch entry")
  }

  test("streamed (doc, token) grid replays the burstiness report bit-for-bit") {
    val want = SparkEntry.queries("token_burstiness")(spark, TestSpark.sf0001)
      .collect().map(_.toSeq.toList).toSeq
    assert(want.nonEmpty, "vacuous: no burstiness rows at sf0.001")
    val rows = Tables.documents(spark, TestSpark.sf0001)
      .select("doc_id", "text").as[(Long, String)].collect().sortBy(_._1).toSeq
    val (b1, b2) = rows.splitAt(rows.size / 2)
    val sinkId = s"bu-${System.nanoTime()}"
    val sink = new UpsertSink(sinkId, 2) // key = (doc_id, token)
    val input = MemoryStream[(Long, String)](spark)
    val q = StreamingQueries.streamingDocTokenCounts(
        input.toDF().toDF("doc_id", "text"))
      .writeStream.outputMode("update").foreach(sink).start()
    try {
      input.addData(b1: _*)
      q.processAllAvailable()
      input.addData(b2: _*)
      q.processAllAvailable()
    } finally q.stop()
    val grid = Sinks.registry(sinkId).asScala.values.toSeq
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toDF("doc_id", "token", "c")
    Sinks.clear(sinkId)
    val got = graft.queries.TrainPrepCatalog.burstinessFrom(grid)
      .collect().map(_.toSeq.toList).toSeq
    assert(got == want, "streamed burstiness report diverges from the batch entry")
  }

  test("streamed daily-cents state replays the Page-Hinkley fold bit-for-bit") {
    // events_page_hinkley's only corpus-touching stage is the SAME
    // (type, day) cents lattice the Holt/peaks/correlation siblings
    // stream; the PH fold (pageHinkleyFrom) is series-sized batch work
    // over the drained state.
    import org.apache.spark.sql.functions.col
    import graft.queries.PipelineCatalog
    val want = SparkEntry.queries("events_page_hinkley")(spark, TestSpark.sf0001)
      .collect().map(_.toSeq.toList).toSet
    assert(want.nonEmpty, "vacuous: no Page-Hinkley rows at sf0.001")
    val rows = Tables.events(spark, TestSpark.sf0001)
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"), org.apache.spark.sql.functions.lit("").as("props"))
      .as[Ev].collect().sortBy(r => (r._2.getTime, r._1)).toSeq
    val (b1, b2) = rows.splitAt(rows.size / 2)
    val input = MemoryStream[Ev](spark)
    val qn = s"ph_${System.nanoTime()}"
    val q = PipelineCatalog.dailyCents(input.toDF().toDF(eventCols: _*))
      .writeStream.queryName(qn).outputMode("complete").format("memory").start()
    try {
      input.addData(b1: _*)
      q.processAllAvailable()
      input.addData(b2: _*)
      q.processAllAvailable()
      val daily = spark.table(qn).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        .toSeq.toDF("event_type", "day", "c")
      val got = PipelineCatalog.pageHinkleyFrom(daily)
        .collect().map(_.toSeq.toList).toSet
      assert(got == want, "streamed Page-Hinkley diverges from the batch entry")
    } finally q.stop()
  }
}
