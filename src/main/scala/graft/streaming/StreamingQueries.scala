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
