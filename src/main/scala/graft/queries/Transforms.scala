package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The core aggregation transforms, factored out of the catalog so the SAME
  * declarative plan runs in batch (CatalogEntry, oracle-checked) and in
  * Structured Streaming update mode (graft.streaming — the reference's
  * rolling keyed reduce, SURVEY §2.5/§2.9). Input: the `events` schema
  * (event_id, ts, user_id, event_type, value, props).
  */
object Transforms {
  import Exact._

  /** TaxiRideCountPreAggregate.java:53-70 — per-driver count. */
  def countByDriver(events: DataFrame): DataFrame = events
    .groupBy(col("user_id").as("driver_id"))
    .agg(count(lit(1)).as("cnt"))

  /** TaxiRideMaxPassengerPreAggregate.java:52-66 — per-driver rolling max. */
  def maxByDriver(events: DataFrame): DataFrame = events
    .groupBy(col("user_id").as("driver_id"))
    .agg(max(col("value")).as("max_value"))

  /** TaxiRideAvgPassengerPreAggregate.java:64-82 — per-driver true average
    * (reference count-reset bug not reproduced, SURVEY §2.5).
    */
  def avgByDriver(events: DataFrame): DataFrame = events
    .groupBy(col("user_id").as("driver_id"))
    .agg(davg(col("value")).as("avg_value"))

  /** TaxiRideAveragePreAggregate.java:46-64 — 3-metric per-driver average. */
  def avg3ByDriver(events: DataFrame): DataFrame = events
    .groupBy(col("user_id").as("driver_id"))
    .agg(
      davg(col("value")).as("avg_value"),
      avg(length(col("props")).cast("long")).as("avg_props_len"),
      avg(hour(col("ts")).cast("long")).as("avg_hour"))

  /** TaxiRideCountDistinctPreAggregate.java:53-70 — COUNT(*) per day
    * (bug-compatible, SURVEY §2.5).
    */
  def countByDay(events: DataFrame): DataFrame = events
    .groupBy(dayofyear(col("ts")).cast("long").as("day"))
    .agg(count(lit(1)).as("cnt"))
}
