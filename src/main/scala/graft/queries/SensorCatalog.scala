package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** The sensor pipeline (TopNPreAggregate.java:143-211) and the output
  * formatters (§2.3): sensor lines in the reference wire format
  * `"id;value|id;value"` are synthesized deterministically from `events`,
  * then parsed by the SensorTokenizer analogue and aggregated.
  */
object SensorCatalog {
  import Exact._

  private def events(s: SparkSession, d: String) = Tables.events(s, d)

  /** The wire line: two readings per event — `uid%50;value|uid+7%50;value2`
    * with value2 = value*2 so parsing is exercised on multi-reading lines
    * (SensorTokenizer splits '|' then ';', TopNPreAggregate.java:191-211).
    * value*2 is binary-exact (exponent bump) — a rounded variant like
    * round(value*1.5, 2) would sit on .xx5 half-boundaries where Spark
    * (exact-decimal HALF_UP) and DuckDB (FP-scaled rounding) disagree.
    */
  private val sensorLineExpr =
    """concat(CAST(user_id % 50 AS STRING), ';', CAST(value AS STRING), '|',
              CAST((user_id + 7) % 50 AS STRING), ';', CAST(value * 2 AS STRING))"""
  private val sensorLineSql =
    """concat(CAST(user_id % 50 AS VARCHAR), ';', CAST(value AS VARCHAR), '|',
              CAST((user_id + 7) % 50 AS VARCHAR), ';', CAST(value * 2 AS VARCHAR))"""

  /** SensorTokenizer → per-sensor exact average. The tokenizer is the real
    * operator under test: explode on '|', split on ';', cast — all
    * codegen'd builtins. Values rounded to 2 decimals pre-aggregation for
    * cross-engine float text-parse parity.
    */
  val sensorAvg: CatalogEntry = CatalogEntry(
    "sensor_avg",
    (s, d) => events(s, d)
      .select(explode(split(expr(sensorLineExpr), "\\|")).as("reading"))
      .select(
        split(col("reading"), ";").getItem(0).cast("long").as("sensor_id"),
        split(col("reading"), ";").getItem(1).cast("double").as("value"))
      .groupBy("sensor_id")
      .agg(round(davg(col("value"), 18, 4), 4).as("avg_value"), count(lit(1)).as("n")),
    Some(s"""SELECT CAST(string_split(reading, ';')[1] AS BIGINT) AS sensor_id,
             ROUND(${sqlAvg("CAST(string_split(reading, ';')[2] AS DOUBLE)", 18, 4)}, 4) AS avg_value,
             COUNT(*) AS n
             FROM (SELECT unnest(string_split($sensorLineSql, '|')) AS reading FROM events)
             GROUP BY 1"""))

  /** Top-5 sensors by exact total value — agg + TakeOrdered (per-partition
    * top-5, driver merge), the scale-safe global top-N plan.
    */
  val sensorTopN: CatalogEntry = CatalogEntry(
    "sensor_topn",
    (s, d) => events(s, d)
      .select(explode(split(expr(sensorLineExpr), "\\|")).as("reading"))
      .select(
        split(col("reading"), ";").getItem(0).cast("long").as("sensor_id"),
        split(col("reading"), ";").getItem(1).cast("double").as("value"))
      .groupBy("sensor_id")
      .agg(dsum(col("value"), 18, 4).as("total"))
      .orderBy(desc("total"), asc("sensor_id"))
      .limit(5),
    Some(s"""SELECT CAST(string_split(reading, ';')[1] AS BIGINT) AS sensor_id,
             ${sqlSum("CAST(string_split(reading, ';')[2] AS DOUBLE)", 18, 4)} AS total
             FROM (SELECT unnest(string_split($sensorLineSql, '|')) AS reading FROM events)
             GROUP BY 1 ORDER BY total DESC, sensor_id LIMIT 5"""))

  /** Output-formatter surface (TaxiRideFlatOutputMap.java and the 7
    * sibling formatters — `"f0 - f1"` display maps): the per-driver count
    * formatted to the reference wire format. Integer-only so the string
    * form is byte-identical across engines.
    */
  val formattedCount: CatalogEntry = CatalogEntry(
    "formatted_count",
    (s, d) => Transforms.countByDriver(events(s, d))
      .select(concat(col("driver_id").cast("string"), lit(" - "), col("cnt").cast("string")).as("line")),
    Some("""SELECT concat(CAST(user_id AS VARCHAR), ' - ', CAST(COUNT(*) AS VARCHAR)) AS line
            FROM events GROUP BY user_id"""))

  val all: Seq[CatalogEntry] = Seq(sensorAvg, sensorTopN, formattedCount)
}
