package graft

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Geo

/** Geo column functions vs golden values computed with the reference
  * engine's exact Java formulas (util/TaxiRideDistanceCalculator.java:7-24,
  * util/GeoUtils.java:40-63,196-200) re-evaluated here in scalar Scala.
  */
class GeoSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  /** Scalar mirror of TaxiRideDistanceCalculator.distance (unit 'M'). */
  private def refDistanceMiles(lat1: Double, lon1: Double, lat2: Double, lon2: Double): Double = {
    val theta = lon1 - lon2
    var dist = math.sin(math.toRadians(lat1)) * math.sin(math.toRadians(lat2)) +
      math.cos(math.toRadians(lat1)) * math.cos(math.toRadians(lat2)) * math.cos(math.toRadians(theta))
    dist = math.acos(dist)
    math.toDegrees(dist) * 60 * 1.1515
  }

  /** Scalar mirror of GeoUtils.getEuclideanDistance (:196-200) — note the
    * reference feeds DEGREES to cos and uses DEG_LEN=110.25f.
    */
  private def refEuclidean(lon1: Double, lat1: Double, lon2: Double, lat2: Double): Double = {
    val x = lat1 - lat2
    val y = (lon1 - lon2) * math.cos(lat2)
    110.25f * math.sqrt(x * x + y * y)
  }

  /** Scalar mirror of GeoUtils.mapToGridCell (:58-63). */
  private def refGridCell(lon: Double, lat: Double): Int = {
    val xIndex = math.floor((math.abs(-74.05) - math.abs(lon)) / 0.0014).toInt
    val yIndex = math.floor((41.0 - lat) / 0.00125).toInt
    xIndex + yIndex * 250
  }

  private val points = Seq(
    // (lat1, lon1, lat2, lon2): JFK->Manhattan, mid-NYC pairs, identical point
    (40.6413, -73.7781, 40.7580, -73.9855),
    (40.7128, -74.0060, 40.7306, -73.9866),
    (40.9, -74.0, 40.6, -73.8),
    (40.75, -73.98, 40.75, -73.98))

  test("distanceMiles/Km/Nmi match the reference law-of-cosines formula") {
    val df = points.toDF("lat1", "lon1", "lat2", "lon2")
    val got = df.select(
      Geo.distanceMiles(col("lat1"), col("lon1"), col("lat2"), col("lon2")).as("mi"),
      Geo.distanceKm(col("lat1"), col("lon1"), col("lat2"), col("lon2")).as("km"),
      Geo.distanceNauticalMiles(col("lat1"), col("lon1"), col("lat2"), col("lon2")).as("nmi"))
      .as[(Double, Double, Double)].collect()
    points.zip(got).foreach { case ((lat1, lon1, lat2, lon2), (mi, km, nmi)) =>
      val want = refDistanceMiles(lat1, lon1, lat2, lon2)
      assert(math.abs(mi - want) < 1e-9, s"miles for ($lat1,$lon1)->($lat2,$lon2)")
      assert(math.abs(km - want * 1.609344) < 1e-9)
      assert(math.abs(nmi - want * 0.8684) < 1e-9)
    }
  }

  test("euclideanDistanceKm matches GeoUtils.getEuclideanDistance exactly (degrees-to-cos quirk included)") {
    val df = points.toDF("lat1", "lon1", "lat2", "lon2")
    val got = df.select(
      Geo.euclideanDistanceKm(col("lon1"), col("lat1"), col("lon2"), col("lat2")).as("d"))
      .as[Double].collect()
    points.zip(got).foreach { case ((lat1, lon1, lat2, lon2), d) =>
      assert(math.abs(d - refEuclidean(lon1, lat1, lon2, lat2)) < 1e-9)
    }
  }

  test("isInNYC matches the reference bounding box") {
    val pts = Seq(
      (-73.9855, 40.7580, true), // Times Square
      (-74.05, 40.5, true), // exact SW corner (inclusive)
      (-73.7, 41.0, true), // exact NE corner (inclusive)
      (-73.69, 40.75, false), // east of box
      (-74.06, 40.75, false), // west of box
      (-73.9, 41.01, false), // north of box
      (-73.9, 40.49, false)) // south of box
    val got = pts.map(p => (p._1, p._2)).toDF("lon", "lat")
      .select(Geo.isInNYC(col("lon"), col("lat"))).as[Boolean].collect()
    pts.zip(got).foreach { case ((lon, lat, want), g) =>
      assert(g == want, s"isInNYC($lon,$lat)")
    }
  }

  test("mapToGridCell matches GeoUtils.mapToGridCell") {
    val pts = Seq((-73.9855, 40.7580), (-74.05, 41.0), (-73.7, 40.5), (-74.0, 40.9))
    val got = pts.toDF("lon", "lat")
      .select(Geo.mapToGridCell(col("lon"), col("lat"))).as[Int].collect()
    pts.zip(got).foreach { case ((lon, lat), g) =>
      assert(g == refGridCell(lon, lat), s"gridCell($lon,$lat)")
    }
  }
}
