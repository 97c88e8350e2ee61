package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.model.{Codec, LineItem, TaxiFare, TaxiRide}

/** Codec tests against hand-built reference-format lines. */
class ModelSpec extends AnyFunSuite {

  test("TaxiRide START record: direct field order, dayOfTheYear from startTime") {
    val r = TaxiRide.fromString(
      "42,START,2013-01-05 10:00:00,2013-01-05 10:20:00,-73.99,40.75,-73.98,40.76,2,7,1001")
    assert(r.rideId == 42 && r.isStart)
    assert(Codec.formatTs(r.startTime) == "2013-01-05 10:00:00")
    assert(Codec.formatTs(r.endTime) == "2013-01-05 10:20:00")
    assert(r.dayOfTheYear == 5)
    assert(r.startLon == -73.99f && r.endLat == 40.76f)
    assert(r.passengerCnt == 2 && r.taxiId == 7 && r.driverId == 1001)
  }

  test("TaxiRide END record: tokens[2]/[3] swap (ref TaxiRide.java:74-91), dayOfTheYear from endTime") {
    val r = TaxiRide.fromString(
      "43,END,2013-02-01 23:55:00,2013-02-01 23:30:00,,,,,1,8,1002")
    assert(!r.isStart)
    // tokens[2] is the END (event) time; tokens[3] is the start time.
    assert(Codec.formatTs(r.endTime) == "2013-02-01 23:55:00")
    assert(Codec.formatTs(r.startTime) == "2013-02-01 23:30:00")
    assert(r.dayOfTheYear == 32) // from endTime
    assert(r.startLon == 0.0f && r.endLat == 0.0f) // empty coords -> 0.0f
  }

  test("TaxiRide toString emits 12 fields incl. dayOfTheYear; START round-trips") {
    val line = "42,START,2013-01-05 10:00:00,2013-01-05 10:20:00,-73.99,40.75,-73.98,40.76,2,7,1001"
    val r = TaxiRide.fromString(line)
    val out = TaxiRide.asString(r)
    assert(out.split(",").length == 12)
    assert(out == "42,START,2013-01-05 10:00:00,2013-01-05 10:20:00,5,-73.99,40.75,-73.98,40.76,2,7,1001")
  }

  test("TaxiRide rejects malformed lines") {
    intercept[Exception](TaxiRide.fromString("1,2,3"))
    intercept[Exception](TaxiRide.fromString(
      "42,MIDDLE,2013-01-05 10:00:00,2013-01-05 10:20:00,-73.99,40.75,-73.98,40.76,2,7,1001"))
  }

  test("TaxiFare parses 8 fields, empty fares default 0.0f") {
    val f = TaxiFare.fromString("42,7,1001,2013-01-05 10:00:00,CASH,1.5,,12.5")
    assert(f.rideId == 42 && f.paymentType == "CASH")
    assert(f.tip == 1.5f && f.tolls == 0.0f && f.totalFare == 12.5f)
  }

  test("LineItem .tbl codec: 16 pipe fields, exact doubles + reference-truncated longs") {
    val line = "1|155190|7706|1|17|21168.23|0.04|0.02|N|O|1996-03-13|1996-02-12|1996-03-22|DELIVER IN PERSON|TRUCK|egular courts above the"
    val li = LineItem.fromString(line, 0)
    assert(li.orderKey == 1 && li.partKey == 155190 && li.lineNumber == 1)
    assert(li.quantity == 17)
    assert(li.extendedPrice == 21168.23 && li.discount == 0.04 && li.tax == 0.02)
    // The reference's (long) truncation (LineItemSource.java:96-98).
    assert(li.extendedPriceRef == 21168L && li.discountRef == 0L && li.taxRef == 0L)
    assert(li.returnFlag == "N" && li.status == "O")
    assert(li.shipDate == 19960313 && li.commitDate == 19960212 && li.receiptDate == 19960322)
    assert(li.shipMode == "TRUCK")
  }

  test("LineItem tolerates dbgen trailing pipe") {
    val line = "1|155190|7706|1|17|21168.23|0.04|0.02|N|O|1996-03-13|1996-02-12|1996-03-22|DELIVER IN PERSON|TRUCK|comment|"
    assert(LineItem.fromString(line, 3).rowNumber == 3)
  }

  test("TaxiRideRichValues enrichment: distance km + reference elapsed-time quirk") {
    import TestSpark.spark
    import spark.implicits._
    import graft.model.TaxiRideRichValues
    val ride = TaxiRide.fromString(
      "1,START,2013-01-01 00:00:00,2013-01-01 00:10:00,-73.99,40.75,-73.98,40.76,2,7,1001")
    val ds = Seq(ride).toDS()
    val df = TaxiRideRichValues.enrich(ds).collect().head
    val typed = TaxiRideRichValues.enrichTyped(ds).collect().head
    // Column and typed paths agree.
    assert(math.abs(df.getAs[Double]("euclideanDistance") - typed.euclideanDistance) < 1e-9)
    assert(df.getAs[Double]("elapsedTime") == typed.elapsedTime)
    // The reference multiplies ms by 1000*60 (TaxiRideRichValues.java:62-66):
    // 10 minutes = 600000 ms -> 3.6e10, not 10.
    assert(typed.elapsedTime == 600000.0 * 1000 * 60)
    assert(TaxiRideRichValues.elapsedMinutes(0, 600000) == 10.0)
    assert(typed.euclideanDistance > 0.9 && typed.euclideanDistance < 3.0) // ~1.4 km
  }

  test("TaxiRide.readCsv is a distributed text->Dataset codec") {
    import TestSpark.spark
    val dir = java.nio.file.Files.createTempDirectory("rides").toFile
    val f = new java.io.File(dir, "rides.csv")
    val lines = Seq(
      "1,START,2013-01-01 00:00:00,2013-01-01 00:10:00,-73.9,40.7,-73.8,40.8,1,1,11",
      "1,END,2013-01-01 00:10:00,2013-01-01 00:00:00,-73.8,40.8,-73.9,40.7,1,1,11",
      "2,START,2013-01-02 00:00:00,2013-01-02 00:30:00,-73.95,40.75,-73.85,40.65,3,2,12")
    java.nio.file.Files.write(f.toPath, String.join("\n", lines: _*).getBytes)
    val ds = TaxiRide.readCsv(spark, f.getAbsolutePath)
    assert(ds.count() == 3)
    assert(ds.filter(_.isStart).count() == 2)
    assert(ds.filter(_.driverId == 11).count() == 2)
  }
}
