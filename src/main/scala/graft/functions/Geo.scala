package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Geospatial scalar functions from the reference engine, re-expressed as
  * compositions of built-in Column functions so the whole thing stays inside
  * whole-stage codegen (no UDF, no codegen fallback).
  *
  * Reference semantics: spherical law of cosines —
  * `acos(sin(lat1)sin(lat2) + cos(lat1)cos(lat2)cos(lon1-lon2))` in degrees,
  * converted to statute miles via `rad2deg * 60 * 1.1515`, then scaled per
  * unit (flink-adcom util/TaxiRideDistanceCalculator.java:7-24).
  *
  * NYC grid helpers mirror util/GeoUtils.java:1-224 (250x400 grid of
  * ~100m cells over the NYC bounding box).
  */
object Geo {
  // Bounding box + grid constants (GeoUtils.java header).
  val LonEast: Double = -73.7
  val LonWest: Double = -74.05
  val LatNorth: Double = 41.0
  val LatSouth: Double = 40.5
  val DeltaLon: Double = 0.0014 // ~100m east-west
  val DeltaLat: Double = 0.00125 // ~100m north-south
  val GridCellsX: Int = 250

  private def deg2rad(c: Column): Column = radians(c)

  /** Law-of-cosines distance in statute miles. */
  def distanceMiles(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column = {
    val theta = lon1 - lon2
    val d = sin(deg2rad(lat1)) * sin(deg2rad(lat2)) +
      cos(deg2rad(lat1)) * cos(deg2rad(lat2)) * cos(deg2rad(theta))
    // Guard acos domain against FP drift just outside [-1, 1].
    degrees(acos(least(greatest(d, lit(-1.0)), lit(1.0)))) * 60.0 * 1.1515
  }

  /** Distance in km (reference unit 'K'). */
  def distanceKm(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column =
    distanceMiles(lat1, lon1, lat2, lon2) * 1.609344

  /** Distance in nautical miles (reference unit 'N'). */
  def distanceNauticalMiles(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column =
    distanceMiles(lat1, lon1, lat2, lon2) * 0.8684

  /** Flat-earth euclidean distance, reference-exact
    * (GeoUtils.getEuclideanDistance, util/GeoUtils.java:196-200):
    * `DEG_LEN * sqrt((lat1-lat2)^2 + ((lon1-lon2)*cos(lat2))^2)` with
    * DEG_LEN=110.25 and — reference quirk preserved — `cos` applied to the
    * latitude in DEGREES (no radians conversion).
    */
  def euclideanDistanceKm(lon1: Column, lat1: Column, lon2: Column, lat2: Column): Column = {
    val x = lat1 - lat2
    val y = (lon1 - lon2) * cos(lat2) // sic: degrees fed to cos, as in the reference
    sqrt(x * x + y * y) * 110.25
  }

  /** True iff the point is inside the NYC bounding box (GeoUtils.isInNYC). */
  def isInNYC(lon: Column, lat: Column): Column =
    lon.between(lit(LonWest), lit(LonEast)) && lat.between(lit(LatSouth), lit(LatNorth))

  /** Map lon/lat to a grid cell id (GeoUtils.mapToGridCell, :58-63).
    * Uses the reference's `abs(LON_WEST) - abs(lon)` form (equivalent to
    * `lon - LON_WEST` only for western-hemisphere lons — kept reference-exact).
    */
  def mapToGridCell(lon: Column, lat: Column): Column = {
    val xIndex = floor((abs(lit(LonWest)) - abs(lon)) / lit(DeltaLon)).cast("int")
    val yIndex = floor((lit(LatNorth) - lat) / lit(DeltaLat)).cast("int")
    xIndex + yIndex * lit(GridCellsX)
  }
}
