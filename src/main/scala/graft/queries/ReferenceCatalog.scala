package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables
import graft.functions.Geo

/** One catalog entry: a Spark-side builder plus (when SQL-expressible) an
  * equivalent DuckDB oracle query. Column names MUST match between the two —
  * the driver sorts columns by name before hashing values.
  */
final case class CatalogEntry(
    name: String,
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String])

/** Cross-engine float determinism helpers.
  *
  * A double sum over shuffled partitions is not bit-stable (summation order),
  * and DuckDB sums in yet another order — so raw SUM(double) would
  * hash-mismatch the oracle. Fix: sum in DECIMAL (exact, associative), then
  * cast the exact result to double. Both engines then produce the identical
  * IEEE value. Averages divide that exact double by the exact count.
  */
object Exact {
  /** Exact sum of a double column: decimal-widen, sum, back to double. */
  def dsum(c: Column, precision: Int = 18, scale: Int = 4): Column =
    sum(c.cast(DecimalType(precision, scale))).cast("double")

  /** Exact average built from dsum / count. */
  def davg(c: Column, precision: Int = 18, scale: Int = 4): Column =
    dsum(c, precision, scale) / count(lit(1))

  /** DuckDB text for the same exact sum. The decimal→double cast is routed
    * through VARCHAR: DuckDB's direct decimal→double divides two doubles
    * (double rounding, off by ulps from Spark's correctly-rounded
    * BigDecimal.doubleValue), while string→double is correctly rounded in
    * both engines → bit-identical.
    */
  def sqlToDouble(expr: String): String = s"CAST(CAST($expr AS VARCHAR) AS DOUBLE)"

  def sqlSum(expr: String, precision: Int = 18, scale: Int = 4): String =
    sqlToDouble(s"SUM(CAST($expr AS DECIMAL($precision,$scale)))")

  def sqlAvg(expr: String, precision: Int = 18, scale: Int = 4): String =
    s"(${sqlSum(expr, precision, scale)} / COUNT(*))"
}

/** The reference engine's query surface (SURVEY.md §2.5–§2.6), re-keyed onto
  * the driver testdata: `events` plays the TaxiRide stream (user_id ≙
  * driverId, value ≙ passengerCnt-like measure, ts ≙ ride time), `lineitem`
  * is TPC-H, `documents.text` is the WordCount corpus.
  *
  * Every query is a plain declarative groupBy/agg so Catalyst plans the
  * two-phase (partial → shuffle → final) aggregation that the reference's
  * AdCom combiner hand-builds (SURVEY §2.4, §4): partial aggregation IS the
  * combine step, the shuffle IS keyBy, the final aggregate IS the rolling
  * reducer. At 100 TB these stay one-shuffle queries with map-side combine.
  */
object ReferenceCatalog {
  import Exact._

  private def events(s: SparkSession, d: String) = Tables.events(s, d)
  private def lineitem(s: SparkSession, d: String) = Tables.lineitem(s, d)
  private def documents(s: SparkSession, d: String) = Tables.documents(s, d)

  /** TaxiRideCountPreAggregate (ref TaxiRideCountPreAggregate.java:53-70):
    * per-driver ride count. combine(sum) → keyBy → reduce(sum) ≡ count.
    * Transform shared with the streaming update-mode form (Transforms).
    */
  val taxiRideCount: CatalogEntry = CatalogEntry(
    "taxi_ride_count",
    (s, d) => Transforms.countByDriver(events(s, d)),
    Some("SELECT user_id AS driver_id, COUNT(*) AS cnt FROM events GROUP BY user_id"))

  /** TaxiRideMaxPassengerPreAggregate (ref :52-66): rolling max per driver. */
  val taxiRideMax: CatalogEntry = CatalogEntry(
    "taxi_ride_max",
    (s, d) => Transforms.maxByDriver(events(s, d)),
    Some("SELECT user_id AS driver_id, MAX(value) AS max_value FROM events GROUP BY user_id"))

  /** TaxiRideAvgPassengerPreAggregate (ref :64-82): per-driver average.
    * The reference reducer's count-reset bug (SURVEY §2.5) is deliberately
    * NOT reproduced — we compute the true average.
    */
  val taxiRideAvg: CatalogEntry = CatalogEntry(
    "taxi_ride_avg",
    (s, d) => Transforms.avgByDriver(events(s, d)),
    Some(s"SELECT user_id AS driver_id, ${sqlAvg("value")} AS avg_value FROM events GROUP BY user_id"))

  /** TaxiRideAveragePreAggregate (ref :46-64): 3-metric per-key average
    * (passengers / distance / elapsed ≙ value / props length / hour-of-day).
    */
  val taxiRideAvg3: CatalogEntry = CatalogEntry(
    "taxi_ride_avg3",
    (s, d) => Transforms.avg3ByDriver(events(s, d)),
    Some(s"""SELECT user_id AS driver_id,
             ${sqlAvg("value")} AS avg_value,
             AVG(CAST(length(props) AS BIGINT)) AS avg_props_len,
             AVG(CAST(hour(ts) AS BIGINT)) AS avg_hour
             FROM events GROUP BY user_id"""))

  /** TaxiRideCountDistinctPreAggregate (DataStream form, ref :53-70) — which
    * despite its name computes COUNT(*) per day (SURVEY §2.5). Bug-compatible
    * per-day count; the true distinct lives in taxiRideCountDistinctSql.
    */
  val taxiRideCountDay: CatalogEntry = CatalogEntry(
    "taxi_ride_count_day",
    (s, d) => Transforms.countByDay(events(s, d)),
    Some("SELECT CAST(dayofyear(ts) AS BIGINT) AS day, COUNT(*) AS cnt FROM events GROUP BY 1"))

  /** TaxiRideCountDistinctTablePreAggregate (ref :68-70): true SQL
    * COUNT(DISTINCT driverId) per day — exercised through spark.sql to cover
    * the Table/SQL surface. Catalyst plans this via Expand + two-phase agg
    * (its built-in equivalent of Blink's distinct-agg split).
    */
  val taxiRideCountDistinctSql: CatalogEntry = CatalogEntry(
    "taxi_ride_count_distinct_day",
    (s, d) => {
      events(s, d).createOrReplaceTempView("taxi_events")
      s.sql("""SELECT CAST(dayofyear(ts) AS BIGINT) AS day,
               COUNT(DISTINCT user_id) AS n_drivers
               FROM taxi_events GROUP BY dayofyear(ts)""")
    },
    Some("""SELECT CAST(dayofyear(ts) AS BIGINT) AS day,
            COUNT(DISTINCT user_id) AS n_drivers FROM events GROUP BY dayofyear(ts)"""))

  /** TaxiRideTopNPreAggregate (ref :46-63) realized to its evident intent:
    * top 10 drivers by total value. Exact-decimal totals make the ordering
    * deterministic across engines; driver_id breaks ties.
    */
  val taxiRideTopN: CatalogEntry = CatalogEntry(
    "taxi_ride_topn",
    (s, d) => events(s, d)
      .groupBy(col("user_id").as("driver_id"))
      .agg(dsum(col("value")).as("total_value"))
      .orderBy(desc("total_value"), asc("driver_id"))
      .limit(10),
    Some(s"""SELECT user_id AS driver_id, ${sqlSum("value")} AS total_value
             FROM events GROUP BY user_id
             ORDER BY total_value DESC, driver_id LIMIT 10"""))

  /** TopNPreAggregate (dead code, ref TopNPreAggregate.java:143-160): true
    * per-key top-N values. key ≙ event_type, top 5 values per key via the
    * bounded-heap combine aggregator (graft.combine.TopNAgg — the
    * reference's own Double[topN] insert-if-greater design,
    * TopNPreAggregate.java:214-253). Partial aggregation ships ≤5 entries
    * per key per map partition — scale-safe where the round-1 ranked-window
    * plan shuffled and sorted every row. Deterministic tie-break on
    * event_id.
    */
  private def topNOf(df: DataFrame, keyCol: Column, n: Int): DataFrame = {
    val topn = udaf(new graft.combine.TopNAgg(n))
    df.groupBy(keyCol.as("k"))
      .agg(topn(col("value"), col("event_id")).as("top"))
      .select(col("k"), posexplode(col("top.entries")))
      .select(
        col("k"), col("col.event_id"), col("col.value").as("value"),
        (col("pos") + 1).cast("long").as("rn"))
  }

  val topNPerKey: CatalogEntry = CatalogEntry(
    "topn_per_key",
    (s, d) => topNOf(
      events(s, d).select(col("event_type"), col("value"), col("event_id")),
      col("event_type"), 5)
      .withColumnRenamed("k", "event_type"),
    Some("""SELECT event_type, event_id, value, CAST(rn AS BIGINT) AS rn FROM (
              SELECT event_type, event_id, value,
                     row_number() OVER (PARTITION BY event_type ORDER BY value DESC, event_id) AS rn
              FROM events) WHERE rn <= 5"""))

  /** AveragePreAggregate / TaxiRideDistanceAveragePreAggregate (ref
    * AveragePreAggregate.java:141-160): global average distance. The
    * reference's random 0..9 key exists only to parallelize the global agg —
    * Spark's partial aggregation does that natively, so this is a plain
    * global aggregate. Coordinates are synthesized deterministically from
    * event ids (testdata has no lat/lon); distance = law of cosines (§2.8).
    */
  private def withSynthCoords(df: DataFrame): DataFrame = df
    .withColumn("start_lat", lit(40.5) + (col("event_id") % 97) / lit(400.0))
    .withColumn("start_lon", lit(-74.05) + (col("event_id") % 251) / lit(1000.0))
    .withColumn("end_lat", lit(40.5) + (col("user_id") % 89) / lit(250.0))
    .withColumn("end_lon", lit(-74.05) + (col("user_id") % 113) / lit(500.0))

  private val synthCoordsSql =
    """(SELECT *,
        40.5 + (event_id % 97) / 400.0 AS start_lat,
        -74.05 + (event_id % 251) / 1000.0 AS start_lon,
        40.5 + (user_id % 89) / 250.0 AS end_lat,
        -74.05 + (user_id % 113) / 500.0 AS end_lon
        FROM events)"""

  /** DuckDB text of Geo.distanceKm (must mirror the Column expression). */
  private val distanceKmSql =
    """(degrees(acos(least(greatest(
         sin(radians(start_lat)) * sin(radians(end_lat)) +
         cos(radians(start_lat)) * cos(radians(end_lat)) * cos(radians(start_lon - end_lon)),
        -1.0), 1.0))) * 60.0 * 1.1515 * 1.609344)"""

  /** Distances are rounded to 6 decimals (cross-engine libm drift guard),
    * then averaged through Exact.davg (decimal-exact, partition-order
    * independent) — a raw AVG(double) would be summation-order dependent,
    * contradicting the Exact determinism contract.
    */
  val avgDistanceGlobal: CatalogEntry = CatalogEntry(
    "avg_distance_global",
    (s, d) => withSynthCoords(events(s, d))
      .select(round(Geo.distanceKm(col("start_lat"), col("start_lon"), col("end_lat"), col("end_lon")), 6).as("dist"))
      .agg(round(davg(col("dist"), 20, 6), 4).as("avg_distance_km")),
    Some(s"""SELECT ROUND(${sqlAvg(s"ROUND($distanceKmSql, 6)", 20, 6)}, 4) AS avg_distance_km
             FROM $synthCoordsSql"""))

  /** TaxiRideDistanceTopNPreAggregate: top 5 distances per (user_id % 10)
    * key, via the same bounded-heap aggregator — critical here because the
    * key space is exactly 10 values: the old ranked-window plan sorted the
    * whole table in 10 partitions, while partial aggregation reduces each
    * map partition to ≤5 entries per key before the shuffle. Distances
    * rounded to 6 decimals before ranking so cross-engine libm 1-ulp drift
    * cannot flip the order; event_id breaks ties.
    */
  val distanceTopNPerKey: CatalogEntry = CatalogEntry(
    "distance_topn_per_key",
    (s, d) => topNOf(
      withSynthCoords(events(s, d)).select(
        (col("user_id") % 10).cast("long").as("kk"),
        col("event_id"),
        round(Geo.distanceKm(col("start_lat"), col("start_lon"), col("end_lat"), col("end_lon")), 6)
          .as("value")),
      col("kk"), 5)
      .select(col("k"), col("event_id"), col("value").as("distance_km"), col("rn")),
    Some(s"""SELECT k, event_id, distance_km, CAST(rn AS BIGINT) AS rn FROM (
               SELECT CAST(user_id % 10 AS BIGINT) AS k, event_id,
                      ROUND($distanceKmSql, 6) AS distance_km,
                      row_number() OVER (PARTITION BY user_id % 10
                                         ORDER BY ROUND($distanceKmSql, 6) DESC, event_id) AS rn
               FROM $synthCoordsSql) WHERE rn <= 5"""))

  /** WordCountPreAggregate (ref :112-204, tokenizer :219-233):
    * lower().split("\\W+") → per-word count, over documents.text.
    */
  val wordCount: CatalogEntry = CatalogEntry(
    "word_count",
    (s, d) => documents(s, d)
      .select(explode(split(lower(col("text")), "\\W+")).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word")
      .agg(count(lit(1)).as("cnt")),
    Some("""SELECT word, COUNT(*) AS cnt FROM (
              SELECT unnest(regexp_split_to_array(lower(text), '\W+')) AS word
              FROM documents) t WHERE word <> '' GROUP BY word"""))

  /** WordCountPreAggregate windowed variant (ref :178-185, tumbling
    * processing-time window) — realized as an event-time tumbling window
    * over the events stream: 1-hour windows per event_type. Window start is
    * emitted as epoch seconds (BIGINT) for cross-engine type stability.
    */
  val windowedCount: CatalogEntry = CatalogEntry(
    "windowed_count",
    (s, d) => events(s, d)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(
        unix_timestamp(col("window.start")).as("win_start_s"),
        col("event_type"), col("cnt")),
    Some("""SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS win_start_s,
            event_type, COUNT(*) AS cnt FROM events GROUP BY 1, 2"""))

  // ---------------------------------------------------------------------
  // TPC-H
  // ---------------------------------------------------------------------

  private def q1Aggregates(df: DataFrame): DataFrame = {
    val disc = col("l_discount").cast(DecimalType(6, 4))
    val tax = col("l_tax").cast(DecimalType(6, 4))
    val ep = col("l_extendedprice").cast(DecimalType(12, 4))
    // scales: ep(12,4) * (1-disc)(7,4) -> (20,8); * (1+tax)(7,4) -> (28,12).
    // All exact (within decimal), so the double casts match DuckDB bit-for-bit.
    df.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity"), 12, 4).as("sum_qty"),
        dsum(col("l_extendedprice"), 14, 4).as("sum_base_price"),
        sum(ep * (lit(1) - disc)).cast("double").as("sum_disc_price"),
        sum(ep * (lit(1) - disc) * (lit(1) + tax)).cast("double").as("sum_charge"),
        (dsum(col("l_quantity"), 12, 4) / count(lit(1))).as("avg_qty"),
        (dsum(col("l_extendedprice"), 14, 4) / count(lit(1))).as("avg_price"),
        (dsum(col("l_discount"), 8, 4) / count(lit(1))).as("avg_disc"),
        count(lit(1)).as("count_order"))
  }

  private def q1OracleSql(withFilter: Boolean): String = {
    val where = if (withFilter) "WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'" else ""
    s"""SELECT l_returnflag, l_linestatus,
        ${sqlSum("l_quantity", 12, 4)} AS sum_qty,
        ${sqlSum("l_extendedprice", 14, 4)} AS sum_base_price,
        ${sqlToDouble("SUM(CAST(l_extendedprice AS DECIMAL(12,4)) * (1 - CAST(l_discount AS DECIMAL(6,4))))")} AS sum_disc_price,
        ${sqlToDouble("SUM(CAST(l_extendedprice AS DECIMAL(12,4)) * (1 - CAST(l_discount AS DECIMAL(6,4))) * (1 + CAST(l_tax AS DECIMAL(6,4))))")} AS sum_charge,
        (${sqlSum("l_quantity", 12, 4)} / COUNT(*)) AS avg_qty,
        (${sqlSum("l_extendedprice", 14, 4)} / COUNT(*)) AS avg_price,
        (${sqlSum("l_discount", 8, 4)} / COUNT(*)) AS avg_disc,
        COUNT(*) AS count_order
        FROM lineitem $where GROUP BY l_returnflag, l_linestatus"""
  }

  /** TPCHQuery01PreAggregate (ref :73-113) — reference-faithful form: the
    * quoted SQL's shipdate filter and ORDER BY are NOT implemented by the
    * reference's pipeline (SURVEY §2.5), so neither here.
    */
  val tpchQ1: CatalogEntry = CatalogEntry(
    "tpch_q1",
    (s, d) => q1Aggregates(lineitem(s, d)),
    Some(q1OracleSql(withFilter = false)))

  /** Full-SQL TPC-H Q1 with the standard shipdate predicate (pushed to the
    * parquet scan by Catalyst).
    */
  val tpchQ1Full: CatalogEntry = CatalogEntry(
    "tpch_q1_full",
    (s, d) => q1Aggregates(
      lineitem(s, d).filter(col("l_shipdate") <= lit("1998-09-02 00:00:00").cast("timestamp"))),
    Some(q1OracleSql(withFilter = true)))

  /** TPCHQuery06PreAggregate (ref TPCHQuery06PreAggregate.java — body is
    * dead code; semantics recovered from the standard TPC-H Q6): forecast
    * revenue = SUM(extendedprice * discount) under range predicates. All
    * three predicates reach the parquet scan as pushed filters.
    */
  val tpchQ6: CatalogEntry = CatalogEntry(
    "tpch_q6",
    (s, d) => lineitem(s, d)
      .filter(
        col("l_shipdate") >= lit("1996-01-01 00:00:00").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01 00:00:00").cast("timestamp") &&
        col("l_discount").between(0.03, 0.07) &&
        col("l_quantity") < 24)
      .agg(
        sum(col("l_extendedprice").cast(DecimalType(12, 4)) * col("l_discount").cast(DecimalType(6, 4)))
          .cast("double").as("revenue")),
    Some(s"""SELECT ${sqlToDouble("SUM(CAST(l_extendedprice AS DECIMAL(12,4)) * CAST(l_discount AS DECIMAL(6,4)))")} AS revenue
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
              AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
              AND l_discount BETWEEN 0.03 AND 0.07
              AND l_quantity < 24"""))

  /** Global single-row average (AveragePreAggregate generic form). */
  val globalAvgValue: CatalogEntry = CatalogEntry(
    "global_avg_value",
    (s, d) => events(s, d).agg(davg(col("value")).as("avg_value")),
    Some(s"SELECT ${sqlAvg("value")} AS avg_value FROM events"))

  /** Exact interpolated percentiles of value per event_type (Spark
    * `percentile` ≙ DuckDB `quantile_cont`, both the standard
    * p·(n−1) 0-based interpolation), rounded 6 for cross-engine float
    * stability. Exact percentiles sort within each small group after a
    * single shuffle; for heavy groups at 100 TB the approx sketch path
    * below is the scale alternative.
    */
  val valuePercentiles: CatalogEntry = CatalogEntry(
    "value_percentiles",
    (s, d) => events(s, d)
      .groupBy("event_type")
      .agg(
        round(expr("percentile(value, 0.5)"), 6).as("p50"),
        round(expr("percentile(value, 0.9)"), 6).as("p90"),
        round(expr("percentile(value, 0.99)"), 6).as("p99"),
        count(lit(1)).as("n")),
    Some("""SELECT event_type,
            ROUND(quantile_cont(value, 0.5), 6) AS p50,
            ROUND(quantile_cont(value, 0.9), 6) AS p90,
            ROUND(quantile_cont(value, 0.99), 6) AS p99,
            COUNT(*) AS n
            FROM events GROUP BY event_type"""))

  /** Sketch path: approximate distinct users per event_type
    * (HyperLogLog++, 1% target RSD). Raw sketch estimates are
    * engine-specific (Spark's HLL++ vs DuckDB's sketch give different
    * values), so the entry emits the CHECKABLE form instead: the exact
    * group keys and counts, plus a per-group flag asserting the sketch
    * landed within 5× the configured RSD of the exact count. The oracle
    * reproduces the keys/counts exactly and expects every flag true —
    * graduating this entry from the old rows-only check to a full hash
    * compare while still exercising the sketch on every run. (5× RSD ≈
    * 5σ; HLL++ at 0.01 RSD is deterministic per input, and the suite
    * additionally bounds the error at 2% on the testdata.)
    */
  val approxDistinct: CatalogEntry = CatalogEntry(
    "events_approx_distinct",
    (s, d) => events(s, d)
      .groupBy("event_type")
      .agg(
        countDistinct(col("user_id")).as("exact_users"),
        approx_count_distinct(col("user_id"), 0.01).as("approx"))
      .select(col("event_type"), col("exact_users"),
        (abs(col("approx") - col("exact_users")) <=
          col("exact_users") * lit(0.05)).as("sketch_within_bound")),
    Some("""SELECT event_type,
                   COUNT(DISTINCT user_id) AS exact_users,
                   TRUE AS sketch_within_bound
            FROM events GROUP BY event_type"""))

  /** Sketch-quantile path: Spark's approx_percentile (the
    * Greenwald–Khanna/KLL-style mergeable sketch — the only viable
    * quantile at heavy-group 100 TB scale) checked the same way as the
    * HLL entry: the output carries the EXACT p90 plus a flag asserting
    * the sketch estimate landed inside the exact [p88, p92] band — the
    * sketch's rank-error guarantee (±n/accuracy ranks ≪ ±2% of ranks
    * here), expressed in values the oracle can reproduce.
    */
  val approxQuantile: CatalogEntry = CatalogEntry(
    "value_p90_sketch",
    (s, d) => events(s, d)
      .groupBy("event_type")
      .agg(
        round(expr("percentile(value, 0.9)"), 6).as("p90"),
        (expr("approx_percentile(value, 0.9, 10000)") >=
          expr("percentile(value, 0.88)") &&
         expr("approx_percentile(value, 0.9, 10000)") <=
          expr("percentile(value, 0.92)")).as("sketch_in_rank_band")),
    Some("""SELECT event_type,
                   ROUND(quantile_cont(value, 0.9), 6) AS p90,
                   TRUE AS sketch_in_rank_band
            FROM events GROUP BY event_type"""))

  val all: Seq[CatalogEntry] = Seq(
    taxiRideCount, taxiRideMax, taxiRideAvg, taxiRideAvg3,
    taxiRideCountDay, taxiRideCountDistinctSql, taxiRideTopN, topNPerKey,
    avgDistanceGlobal, distanceTopNPerKey, wordCount, windowedCount,
    tpchQ1, tpchQ1Full, tpchQ6, globalAvgValue,
    valuePercentiles, approxDistinct, approxQuantile)
}
