package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}

import graft.queries.Transforms

/** Streaming (update-mode) forms of the reference's rolling keyed
  * aggregations (SURVEY §2.5/§2.9): the same declarative transforms as the
  * batch catalog, run over a streaming events DataFrame. `outputMode
  * ("update")` is the retract-stream bridge (`toRetractStream`,
  * TaxiRideCountTablePreAggregate.java:79-81 — Spark emits upserts instead
  * of Boolean add/retract pairs, SURVEY §1.2); the processing-time trigger
  * is the combiner flush interval (`combine(fn, intervalMs)`,
  * DataStream.java:1403-1436).
  */
object StreamingQueries {

  /** The five core rolling aggregations, keyed by catalog name. */
  val updating: Map[String, DataFrame => DataFrame] = Map(
    "taxi_ride_count" -> Transforms.countByDriver,
    "taxi_ride_max" -> Transforms.maxByDriver,
    "taxi_ride_avg" -> Transforms.avgByDriver,
    "taxi_ride_avg3" -> Transforms.avg3ByDriver,
    "taxi_ride_count_day" -> Transforms.countByDay)

  /** Start an update-mode query with a processing-time trigger (≙ the
    * reference's `combine(fn, intervalMs)` flush cadence) into a foreach
    * upsert sink; returns the running query.
    */
  def runUpdating(
      name: String,
      events: DataFrame,
      sink: UpsertSink,
      intervalMs: Long = 500L): StreamingQuery =
    writer(name, events, sink, intervalMs).start()

  def writer(
      name: String,
      events: DataFrame,
      sink: UpsertSink,
      intervalMs: Long): DataStreamWriter[Row] =
    updating(name)(events)
      .writeStream
      .queryName(name)
      .outputMode("update")
      .trigger(Trigger.ProcessingTime(intervalMs))
      .foreach(sink)

  /** Streaming tumbling-window count per event_type with an event-time
    * watermark (the WordCountPreAggregate windowed variant,
    * WordCountPreAggregate.java:178-185, on event time; SURVEY §2.9
    * streaming windows + late-data bound). Update mode emits window
    * upserts; state for windows older than the watermark is dropped.
    */
  def windowedCountByType(
      events: DataFrame,
      windowLength: String = "1 hour",
      watermarkDelay: String = "2 hours"): DataFrame = {
    import org.apache.spark.sql.functions._
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), windowLength), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(
        unix_timestamp(col("window.start")).as("win_start_s"),
        col("event_type"), col("cnt"))
  }

  /** Rolling per-key count via EXPLICIT keyed state
    * (`mapGroupsWithState`) — the closest Spark analogue of the
    * reference's rolling `KeyedStream.reduce` emission model (emit the
    * updated aggregate for every key touched in the micro-batch;
    * unbounded keyed state, SURVEY §2.9). The declarative
    * `groupBy().count()` form is preferred (Catalyst plans partial
    * aggregation); this path exists for custom state logic the built-in
    * aggregates can't express.
    */
  def rollingCountCustomState(events: DataFrame): org.apache.spark.sql.Dataset[(Long, Long)] = {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
    import events.sparkSession.implicits._
    events.select(col("user_id")).as[Long]
      .groupByKey((k: Long) => k)
      .mapGroupsWithState[Long, (Long, Long)](GroupStateTimeout.NoTimeout()) {
        (key: Long, rows: Iterator[Long], state: GroupState[Long]) =>
          val next = state.getOption.getOrElse(0L) + rows.size
          state.update(next)
          (key, next)
      }
  }

  /** Streaming sessionization via `session_window`: per-user sessions
    * that close after `gap` idle time (the streaming counterpart of the
    * batch gaps-and-islands `user_sessions` entry). Append mode emits a
    * session only once the watermark passes its close — exactly-once
    * session records downstream.
    */
  def sessionsByUser(
      events: DataFrame,
      gap: String = "30 minutes",
      watermarkDelay: String = "1 hour"): DataFrame = {
    import org.apache.spark.sql.functions._
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(
        col("user_id"),
        unix_timestamp(col("session_window.start")).as("sess_start_s"),
        col("n_events"))
  }

  /** Streaming exact deduplication: the streaming counterpart of the
    * batch `doc_exact_dedup` operator — drop records whose normalized-
    * content hash was already seen, with a watermark bounding the dedup
    * state (old keys are evicted once the watermark passes; a duplicate
    * arriving later than the watermark would be re-admitted — the
    * standard bounded-state trade-off at 100 TB).
    */
  def streamingDedup(
      docs: DataFrame,
      tsCol: String,
      textCol: String = "text",
      watermarkDelay: String = "1 hour"): DataFrame = {
    import org.apache.spark.sql.functions._
    docs
      .withColumn("content_hash",
        md5(regexp_replace(lower(trim(col(textCol))), "\\s+", " ")))
      .withWatermark(tsCol, watermarkDelay)
      .dropDuplicates("content_hash")
  }

  /** Streaming form of the corpus-cleaning pipeline
    * (PipelineCatalog.cleanCorpus stages 1–2 + stats): quality filter
    * (≥ `minTokens` whitespace tokens) → watermark-bounded exact dedup on
    * the normalized-content hash → per-source running corpus stats
    * (docs kept, tokens kept). Every stage is the micro-batch counterpart
    * of an oracle-checked batch operator; with an ordered replay the
    * final state converges to the batch composition (StreamingSpec).
    *
    * MinHash near-dup SIGNATURES stream identically (pure per-row
    * projections — graft.functions.Text.minhashSignature applies to a
    * streaming frame unchanged); the pair JOIN stage is inherently
    * cross-batch and belongs in a periodic batch compaction, the
    * standard lambda split for dedup at 100 TB.
    */
  def streamingCleanCorpus(
      docs: DataFrame,
      tsCol: String,
      minTokens: Int = 25,
      watermarkDelay: String = "1 hour"): DataFrame = {
    import org.apache.spark.sql.functions._
    val quality = docs
      .withColumn("n_tokens",
        size(graft.functions.Text.wsTokens(col("text"))).cast("long"))
      .filter(col("n_tokens") >= minTokens)
    streamingDedup(quality, tsCol)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("docs_kept"), sum("n_tokens").as("tokens_kept"))
  }

  /** Register an AdaptiveTriggerController for `queryName` on this session;
    * caller owns removal. This is `adCombine` (DataStream.java:1424-1436):
    * same pipeline, controller-driven interval.
    */
  def withController(
      spark: SparkSession,
      queryName: String,
      initialIntervalMs: Long = 500L): AdaptiveTriggerController = {
    val c = new AdaptiveTriggerController(queryName, initialIntervalMs)
    spark.streams.addListener(c)
    c
  }
}
