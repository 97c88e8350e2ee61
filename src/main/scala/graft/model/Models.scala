package graft.model

import java.sql.Timestamp
import java.time.{Instant, LocalDateTime, ZoneOffset}
import java.time.format.DateTimeFormatter

import org.apache.spark.sql.{Dataset, SparkSession}

/** The reference engine's record types and text codecs (SURVEY §1.1),
  * as Spark-encodable case classes. The codecs are pure functions used
  * through `Dataset.map` — distributed, no driver-side parsing.
  */
object Codec {
  /** `yyyy-MM-dd HH:mm:ss` UTC (util/TaxiRide.java:28-29). */
  private val fmt = DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")

  def parseTs(s: String): Timestamp =
    Timestamp.from(LocalDateTime.parse(s, fmt).toInstant(ZoneOffset.UTC))

  def formatTs(t: Timestamp): String =
    LocalDateTime.ofInstant(Instant.ofEpochMilli(t.getTime), ZoneOffset.UTC).format(fmt)

  def dayOfYear(t: Timestamp): Int =
    LocalDateTime.ofInstant(Instant.ofEpochMilli(t.getTime), ZoneOffset.UTC).getDayOfYear
}

/** TaxiRide (util/TaxiRide.java:26-64). `DateTime` → java.sql.Timestamp
  * (UTC), `short` passengerCnt kept as Short.
  */
final case class TaxiRide(
    rideId: Long,
    isStart: Boolean,
    startTime: Timestamp,
    endTime: Timestamp,
    dayOfTheYear: Int,
    startLon: Float,
    startLat: Float,
    endLon: Float,
    endLat: Float,
    passengerCnt: Short,
    taxiId: Long,
    driverId: Long)

object TaxiRide {

  /** CSV codec (util/TaxiRide.java:66-104): 11 comma-separated fields; the
    * START/END tag swaps which of tokens[2]/tokens[3] is start vs end time
    * (:74-91), and dayOfTheYear derives from the EVENT time (startTime for
    * START records, endTime for END records). Empty lon/lat parse as 0.0f.
    */
  def fromString(line: String): TaxiRide = {
    val t = line.split(",", -1)
    require(t.length == 11, s"Invalid record: $line")
    val (isStart, evTime, otherTime) = t(1) match {
      case "START" => (true, Codec.parseTs(t(2)), Codec.parseTs(t(3)))
      case "END" => (false, Codec.parseTs(t(2)), Codec.parseTs(t(3)))
      case _ => throw new IllegalArgumentException(s"Invalid record: $line")
    }
    val (startTime, endTime) = if (isStart) (evTime, otherTime) else (otherTime, evTime)
    def f(s: String): Float = if (s.nonEmpty) s.toFloat else 0.0f
    TaxiRide(
      rideId = t(0).toLong, isStart = isStart,
      startTime = startTime, endTime = endTime,
      dayOfTheYear = Codec.dayOfYear(evTime),
      startLon = f(t(4)), startLat = f(t(5)), endLon = f(t(6)), endLat = f(t(7)),
      passengerCnt = t(8).toShort, taxiId = t(9).toLong, driverId = t(10).toLong)
  }

  /** Emission format (util/TaxiRide.java:106-122) — 12 fields, adds
    * dayOfTheYear after the two timestamps. NOTE: toString does NOT undo
    * the START/END column swap (reference behavior preserved: it always
    * prints startTime then endTime), so fromString∘toString is identity on
    * START records only — same asymmetry as the reference.
    */
  def asString(r: TaxiRide): String = {
    val sb = new StringBuilder
    sb.append(r.rideId).append(',')
      .append(if (r.isStart) "START" else "END").append(',')
      .append(Codec.formatTs(r.startTime)).append(',')
      .append(Codec.formatTs(r.endTime)).append(',')
      .append(r.dayOfTheYear).append(',')
      .append(r.startLon).append(',').append(r.startLat).append(',')
      .append(r.endLon).append(',').append(r.endLat).append(',')
      .append(r.passengerCnt).append(',')
      .append(r.taxiId).append(',').append(r.driverId)
    sb.toString
  }

  /** Distributed CSV reader: text source → map(fromString). */
  def readCsv(spark: SparkSession, path: String): Dataset[TaxiRide] = {
    import spark.implicits._
    spark.read.textFile(path).map(fromString)
  }
}

/** TaxiFare (util/TaxiFare.java:21-28). */
final case class TaxiFare(
    rideId: Long,
    taxiId: Long,
    driverId: Long,
    startTime: Timestamp,
    paymentType: String,
    tip: Float,
    tolls: Float,
    totalFare: Float)

object TaxiFare {
  /** CSV codec (util/TaxiFare.java:53-78): 8 comma-separated fields. */
  def fromString(line: String): TaxiFare = {
    val t = line.split(",", -1)
    require(t.length == 8, s"Invalid record: $line")
    def f(s: String): Float = if (s.nonEmpty) s.toFloat else 0.0f
    TaxiFare(t(0).toLong, t(1).toLong, t(2).toLong, Codec.parseTs(t(3)),
      t(4), f(t(5)), f(t(6)), f(t(7)))
  }
}

/** TPC-H LineItem parsed from a 16-pipe-field `.tbl` row
  * (udfs/LineItemSource.java:101-132).
  *
  * DOCUMENTED DIVERGENCE: the reference truncates extendedPrice/discount/
  * tax with `(long) Double.parseDouble(...)` (:96-98) — discarding all
  * cents and making every discount/tax 0. We keep BOTH: the exact double
  * fields (`extendedPrice` etc., what our TPC-H queries consume) and the
  * reference-truncated longs (`extendedPriceRef` etc.) for bug-compatible
  * comparisons.
  */
final case class LineItem(
    rowNumber: Long,
    orderKey: Long,
    partKey: Long,
    supplierKey: Long,
    lineNumber: Int,
    quantity: Long,
    extendedPrice: Double,
    discount: Double,
    tax: Double,
    extendedPriceRef: Long,
    discountRef: Long,
    taxRef: Long,
    returnFlag: String,
    status: String,
    shipDate: Int, // yyyymmdd (reference strips dashes, :110)
    commitDate: Int,
    receiptDate: Int,
    shipInstructions: String,
    shipMode: String,
    comment: String)

object LineItem {
  def fromString(line: String, rowNumber: Long): LineItem = {
    val t = line.split("\\|", -1)
    val tokens = if (t.length == 17 && t(16).isEmpty) t.dropRight(1) else t // trailing '|' in dbgen output
    require(tokens.length == 16, s"Invalid record: $line")
    val ep = tokens(5).toDouble
    val disc = tokens(6).toDouble
    val tax = tokens(7).toDouble
    LineItem(
      rowNumber = rowNumber,
      orderKey = tokens(0).toLong, partKey = tokens(1).toLong,
      supplierKey = tokens(2).toLong, lineNumber = tokens(3).toInt,
      quantity = tokens(4).toLong,
      extendedPrice = ep, discount = disc, tax = tax,
      extendedPriceRef = ep.toLong, discountRef = disc.toLong, taxRef = tax.toLong,
      returnFlag = tokens(8), status = tokens(9),
      shipDate = tokens(10).replace("-", "").toInt,
      commitDate = tokens(11).replace("-", "").toInt,
      receiptDate = tokens(12).replace("-", "").toInt,
      shipInstructions = tokens(13), shipMode = tokens(14), comment = tokens(15))
  }

  /** Distributed `.tbl` reader with stable row numbers. */
  def readTbl(spark: SparkSession, path: String): Dataset[LineItem] = {
    import spark.implicits._
    spark.read.textFile(path).rdd.zipWithIndex()
      .map { case (line, i) => fromString(line, i) }.toDS()
  }
}
