package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Multi-level OLAP aggregation surface: ROLLUP / CUBE lattices and
  * PIVOT — the grouping-sets family a reporting layer expects from an
  * analytics engine. All three plan as ONE expand + one hash-aggregate
  * pass in Spark (the Expand operator replicates each input row once per
  * grouping set before a single shuffle) — no per-level re-scans, which
  * is what makes the lattice affordable at 100 TB: cost scales with
  * (#grouping sets × input), never with re-reading the fact table.
  *
  * `grouping_id()` disambiguates lattice levels (a NULL key value from
  * aggregation vs a NULL in the data); Spark and DuckDB both implement
  * the standard bit encoding (first listed column = highest bit).
  */
object OlapCatalog {
  import Exact._

  /** Order counts and exact revenue at every ROLLUP level of
    * (status, priority): per pair, per status, grand total.
    */
  val ordersRollup: CatalogEntry = CatalogEntry(
    "orders_rollup",
    (s, d) => Tables.load(s, d, "orders")
      .rollup("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice"), 18, 4).as("total"),
        grouping_id().as("gid"))
      // Aggregated-out keys surface as the explicit 'ALL' label, not
      // NULL: gid already disambiguates, and NULL group keys trip
      // engine-dependent null sorting in downstream comparisons.
      .select(coalesce(col("o_orderstatus"), lit("ALL")).as("o_orderstatus"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("o_orderpriority"),
        col("n"), col("total"), col("gid")),
    Some(s"""SELECT COALESCE(o_orderstatus, 'ALL') AS o_orderstatus,
             COALESCE(o_orderpriority, 'ALL') AS o_orderpriority, COUNT(*) AS n,
             ${sqlSum("o_totalprice", 18, 4)} AS total,
             CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid
             FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)"""))

  /** The full CUBE lattice over the same keys — adds the per-priority
    * marginals ROLLUP omits.
    */
  val ordersCube: CatalogEntry = CatalogEntry(
    "orders_cube",
    (s, d) => Tables.load(s, d, "orders")
      .cube("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("n"), grouping_id().as("gid"))
      .select(coalesce(col("o_orderstatus"), lit("ALL")).as("o_orderstatus"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("o_orderpriority"),
        col("n"), col("gid")),
    Some("""SELECT COALESCE(o_orderstatus, 'ALL') AS o_orderstatus,
            COALESCE(o_orderpriority, 'ALL') AS o_orderpriority, COUNT(*) AS n,
            CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid
            FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)"""))

  private val EventTypes = Seq("click", "error", "purchase", "signup", "view")

  /** Events per user pivoted to one column per event type. The pivot
    * value list is EXPLICIT — with it, Spark plans a single pass
    * (pivot_first aggregates); without it, a driver-side distinct-values
    * collection runs first, which at 100 TB is an extra full shuffle
    * before planning can even start. Missing cells are filled to 0 to
    * match the conditional-aggregation semantics (COUNT of an empty set).
    */
  val eventsPivot: CatalogEntry = CatalogEntry(
    "events_pivot",
    (s, d) => Tables.events(s, d)
      .groupBy("user_id")
      .pivot("event_type", EventTypes)
      .agg(count(lit(1)))
      .na.fill(0, EventTypes),
    Some {
      val cells = EventTypes.map(t =>
        s"COUNT(CASE WHEN event_type = '$t' THEN 1 END) AS $t").mkString(", ")
      s"SELECT user_id, $cells FROM events GROUP BY user_id"
    })

  val all: Seq[CatalogEntry] = Seq(ordersRollup, ordersCube, eventsPivot)
}
