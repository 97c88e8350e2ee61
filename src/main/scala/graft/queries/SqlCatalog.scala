package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables

/** The Table-API/SQL surface (SURVEY §2.6): the same aggregations routed
  * through `spark.sql` over temp views — the reference's
  * `tableEnv.sqlQuery`/Table-expression examples. Catalyst plans these
  * identically to the DataFrame forms (same two-phase aggregation), which
  * the shared oracles confirm.
  */
object SqlCatalog {

  private def onEvents(s: SparkSession, d: String, sql: String): DataFrame = {
    Tables.events(s, d).createOrReplaceTempView("events_v")
    s.sql(sql)
  }

  /** TaxiRideCountTablePreAggregate.java:72-74. */
  val sqlCount: CatalogEntry = CatalogEntry(
    "taxi_ride_count_sql",
    (s, d) => onEvents(s, d,
      "SELECT user_id AS driver_id, COUNT(*) AS cnt FROM events_v GROUP BY user_id"),
    Some("SELECT user_id AS driver_id, COUNT(*) AS cnt FROM events GROUP BY user_id"))

  /** TaxiRideMaxPassengersTablePreAggregate.java:69-71. */
  val sqlMax: CatalogEntry = CatalogEntry(
    "taxi_ride_max_sql",
    (s, d) => onEvents(s, d,
      "SELECT user_id AS driver_id, MAX(value) AS max_value FROM events_v GROUP BY user_id"),
    Some("SELECT user_id AS driver_id, MAX(value) AS max_value FROM events GROUP BY user_id"))

  /** TaxiRideAvgPassengerTablePreAggregate.java:69-71 — decimal-exact
    * average in Spark SQL text (dsum/count), oracle in the Exact
    * varchar-routed form.
    */
  val sqlAvg: CatalogEntry = CatalogEntry(
    "taxi_ride_avg_sql",
    (s, d) => onEvents(s, d,
      """SELECT user_id AS driver_id,
         CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_value
         FROM events_v GROUP BY user_id"""),
    Some(s"SELECT user_id AS driver_id, ${Exact.sqlAvg("value")} AS avg_value FROM events GROUP BY user_id"))

  /** TPCHQuery01TablePreAggregate.java:111-124 (SQL form, no filter — the
    * reference's pipeline omits the shipdate predicate).
    */
  val sqlQ1: CatalogEntry = CatalogEntry(
    "tpch_q1_sql",
    (s, d) => {
      Tables.lineitem(s, d).createOrReplaceTempView("lineitem_v")
      s.sql(
        """SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,4))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,4))) AS DOUBLE) AS sum_base_price,
           COUNT(*) AS count_order
           FROM lineitem_v GROUP BY l_returnflag, l_linestatus""")
    },
    Some(s"""SELECT l_returnflag, l_linestatus,
             ${Exact.sqlSum("l_quantity", 12, 4)} AS sum_qty,
             ${Exact.sqlSum("l_extendedprice", 14, 4)} AS sum_base_price,
             COUNT(*) AS count_order
             FROM lineitem GROUP BY l_returnflag, l_linestatus"""))

  val all: Seq[CatalogEntry] = Seq(sqlCount, sqlMax, sqlAvg, sqlQ1)
}
