package graft.model

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.functions.Geo

/** TaxiRideRichValues (util/TaxiRideRichValues.java) — TaxiRide enriched
  * with the law-of-cosines distance in km (`getEuclideanDistance`, :53-60,
  * which — despite its name — calls the spherical
  * TaxiRideDistanceCalculator with unit "K") and the elapsed time
  * (`getElapsedTime`, :62-66).
  */
final case class TaxiRideRichValues(
    rideId: Long,
    isStart: Boolean,
    dayOfTheYear: Int,
    startLon: Float,
    startLat: Float,
    endLon: Float,
    endLat: Float,
    passengerCnt: Short,
    taxiId: Long,
    driverId: Long,
    euclideanDistance: Double,
    elapsedTime: Double)

object TaxiRideRichValues {

  /** The reference's elapsed-time formula, quirk preserved: it multiplies
    * milliseconds by 1000*60 while calling the result "minutes"
    * (TaxiRideRichValues.java:62-66 — to convert ms → minutes it should
    * DIVIDE by 1000*60). `TaxiRidePassengerDistanceTimeTokenizerMap`
    * feeds this into the 3-metric average, so bug-compatibility matters
    * for cross-engine comparisons against reference outputs.
    */
  def elapsedTimeRef(startMs: Long, endMs: Long): Double =
    (endMs - startMs).toDouble * 1000 * 60

  /** The mathematically-correct elapsed minutes (our default elsewhere). */
  def elapsedMinutes(startMs: Long, endMs: Long): Double =
    (endMs - startMs).toDouble / (1000 * 60)

  /** Enrichment map (udfs/TaxiRideRichValuesMap.java): declarative column
    * form — stays in whole-stage codegen, usable on batch and streams.
    */
  def enrich(rides: Dataset[TaxiRide]): DataFrame =
    rides.toDF()
      .withColumn("euclideanDistance",
        Geo.distanceKm(col("startLat"), col("startLon"), col("endLat"), col("endLon")))
      .withColumn("elapsedTime",
        (unix_millis(col("endTime")) - unix_millis(col("startTime"))).cast("double") * 1000 * 60)

  /** Typed enrichment for callers that want the case class. */
  def enrichTyped(rides: Dataset[TaxiRide]): Dataset[TaxiRideRichValues] = {
    import rides.sparkSession.implicits._
    rides.map { r =>
      val distMiles = {
        val theta = r.startLon - r.endLon
        val d = math.sin(math.toRadians(r.startLat)) * math.sin(math.toRadians(r.endLat)) +
          math.cos(math.toRadians(r.startLat)) * math.cos(math.toRadians(r.endLat)) *
            math.cos(math.toRadians(theta))
        math.toDegrees(math.acos(math.max(-1.0, math.min(1.0, d)))) * 60 * 1.1515
      }
      TaxiRideRichValues(
        r.rideId, r.isStart, r.dayOfTheYear,
        r.startLon, r.startLat, r.endLon, r.endLat,
        r.passengerCnt, r.taxiId, r.driverId,
        euclideanDistance = distMiles * 1.609344,
        elapsedTime = elapsedTimeRef(r.startTime.getTime, r.endTime.getTime))
    }
  }
}
