package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's output-formatter family (SURVEY §2.3) — display maps
  * from aggregate tuples to wire strings. Each mirrors one of the eight
  * formatter UDFs; all are single `concat` projections (codegen'd, no
  * UDF):
  *
  *  - `TaxiRideFlatOutputMap.java` / `TaxiRideDistinctFlatOutputMap.java`:
  *    `"f0 - f1"`
  *  - `TaxiRideDayOutputMap` style 3-field: `"f0 - f1 - f2"`
  *  - `TaxiRideAvgPassengerOutputMap.java`: driver avg
  *  - `TaxiRideAvgPassengerDistanceTimeOutputMap.java`: 3-metric avg
  *  - `TaxiRideTableOutputMap.java` / `TaxiRideAvgTableOutputMap.java` /
  *    `TaxiRideTableCountDistinctOutputMap.java`: retract-stream consumers
  *    — the Boolean add/retract flag prefixes the line; in Spark update
  *    mode every emission is an upsert, so the flag is constant `true`
  *    (SURVEY §1.2)
  *  - `Tuple11ToLineItemResult.java` / `LineItemTableOutputMap.java`:
  *    TPC-H Q1 result lines
  */
object Formatters {

  private def s(c: Column): Column = c.cast("string")

  /** `"f0 - f1"` (TaxiRideFlatOutputMap.java). */
  def flat2(c0: Column, c1: Column): Column = concat(s(c0), lit(" - "), s(c1))

  /** `"f0 - f1 - f2"` (day-keyed 3-tuples). */
  def flat3(c0: Column, c1: Column, c2: Column): Column =
    concat(s(c0), lit(" - "), s(c1), lit(" - "), s(c2))

  /** Retract-stream consumer: `"(true) f0 - f1"` — Spark update mode emits
    * upserts only, so the reference's Boolean retract flag is always true
    * (TaxiRideTableOutputMap.java).
    */
  def retract2(c0: Column, c1: Column): Column =
    concat(lit("(true) "), s(c0), lit(" - "), s(c1))

  /** Apply a formatter over a 2-column aggregate into a one-column frame. */
  def lines(df: DataFrame, fmt: (Column, Column) => Column): DataFrame = {
    val Array(a, b) = df.columns.take(2)
    df.select(fmt(col(a), col(b)).as("line"))
  }

  /** TPC-H Q1 line (Tuple11ToLineItemResult.java — pipe-joined measures). */
  def lineItemResult(df: DataFrame): DataFrame =
    df.select(concat_ws("|", df.columns.map(c => col(c).cast("string")): _*).as("line"))
}
