package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Time-series smoothing / sessionization entries: driver-side replays of
  * the in-plan recursions, beyond the DuckDB oracle's value pin.
  */
class TimeSeriesSpec extends AnyFunSuite {
  import TestSpark.{sf0001, spark}

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("events_holt_trend: a plain-Scala Holt fold replays every output bit-for-bit") {
    // The entry's recursion lives in a Catalyst `aggregate` fold; this
    // replays the identical IEEE sequence in driver-side Scala from the
    // same daily-cents lattice, so a refactor that reorders one addition
    // (and silently diverges from the oracle's list_reduce) fails HERE
    // with the offending series named, not as an opaque hash mismatch.
    val daily = graft.queries.PipelineCatalog
      .dailyCents(Tables.events(spark, sf0001))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val want = daily.groupBy(_._1).collect { case (tpe, rows) if rows.length >= 2 =>
      val ys = rows.sortBy(_._2).map(_._3.toDouble)
      var l = ys.head; var b = 0.0; var sse = 0.0
      ys.tail.foreach { y =>
        val lNew = 0.5 * y + 0.5 * (l + b)
        val bNew = 0.5 * ((0.5 * y + 0.5 * (l + b)) - l) + 0.5 * b
        sse = sse + (y - (l + b)) * (y - (l + b))
        l = lNew; b = bNew
      }
      (tpe, ys.length.toLong, r6(l / 10000.0), r6(b / 10000.0),
        r6((l + b) / 10000.0), r6(math.sqrt(sse / (ys.length - 1)) / 10000.0))
    }.toSet
    assert(want.nonEmpty, "vacuous: no series at sf0.001")
    val got = SparkEntry.queries("events_holt_trend")(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5))).toSet
    assert(got == want, s"Holt fold diverged\n got=$got\nwant=$want")
  }

  test("events_holt_trend: on a constant series level is the value, trend and rmse are zero") {
    import spark.implicits._
    val daily = Seq(("a", 1L, 70000L), ("a", 2L, 70000L), ("a", 3L, 70000L),
      ("a", 4L, 70000L)).toDF("event_type", "day", "c")
    val row = graft.queries.PipelineCatalog.holtFrom(daily).collect()
    assert(row.length == 1)
    assert(row.head.getDouble(2) == 7.0 && row.head.getDouble(3) == 0.0 &&
      row.head.getDouble(4) == 7.0 && row.head.getDouble(5) == 0.0,
      s"constant series should be fully predictable: ${row.head}")
  }

  test("events_page_hinkley: a plain-Scala PH fold replays every output bit-for-bit") {
    // Same device as the Holt replay: the identical IEEE op sequence in
    // driver-side Scala, with the u-update expression repeated verbatim
    // in the min/excursion updates exactly as the in-plan fold and the
    // oracle's recursive CTE repeat it.
    val daily = graft.queries.PipelineCatalog
      .dailyCents(Tables.events(spark, sf0001))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val want = daily.groupBy(_._1).collect { case (tpe, rows) if rows.length >= 2 =>
      val ys = rows.sortBy(_._2).map(_._3.toDouble)
      var t = 1L; var s = ys.head; var u = 0.0; var minu = 0.0; var exc = 0.0
      ys.tail.foreach { y =>
        val uNew = u + (y - (s + y) / (t + 1))
        val minuNew = math.min(minu, u + (y - (s + y) / (t + 1)))
        val excNew = math.max(exc, u + (y - (s + y) / (t + 1)) - minu)
        t += 1; s += y; u = uNew; minu = minuNew; exc = excNew
      }
      (tpe, ys.length.toLong, r6(u / 10000.0), r6(minu / 10000.0),
        r6(exc / 10000.0))
    }.toSet
    assert(want.nonEmpty, "vacuous: no series at sf0.001")
    val got = SparkEntry.queries("events_page_hinkley")(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4))).toSet
    assert(got == want, s"PH fold diverged\n got=$got\nwant=$want")
  }

  test("events_page_hinkley: constant series sits at zero; a level shift raises the excursion") {
    import spark.implicits._
    val flat = Seq(("a", 1L, 50000L), ("a", 2L, 50000L), ("a", 3L, 50000L),
      ("a", 4L, 50000L)).toDF("event_type", "day", "c")
    val f = graft.queries.PipelineCatalog.pageHinkleyFrom(flat).collect().head
    assert(f.getDouble(2) == 0.0 && f.getDouble(3) == 0.0 && f.getDouble(4) == 0.0,
      s"constant series must carry zero PH statistic: $f")
    // Regime shift: flat at 1.0 then flat at 9.0 — u climbs away from
    // its minimum through the second regime, so the excursion is
    // strictly positive and the final statistic sits above the minimum.
    val shift = ((1L to 6L).map(d => ("a", d, 10000L)) ++
      (7L to 12L).map(d => ("a", d, 90000L))).toDF("event_type", "day", "c")
    val g = graft.queries.PipelineCatalog.pageHinkleyFrom(shift).collect().head
    assert(g.getDouble(4) > 1.0,
      s"level shift must produce a material excursion: $g")
    assert(g.getDouble(2) > g.getDouble(3),
      s"post-shift statistic must sit above its running minimum: $g")
  }

  test("user_gap_hazard: a driver-side bucket sweep recounts the curve; at-risk telescopes") {
    val events = Tables.events(spark, sf0001)
      .select(col("user_id"), col("event_id"), unix_timestamp(col("ts")).as("tss"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val gaps = events.groupBy(_._1).values.flatMap { rows =>
      val s = rows.sortBy(r => (r._3, r._2)).map(_._3)
      s.zip(s.tail).map { case (a, b) => b - a }
    }.toSeq
    def bucket(d: Long): Long =
      if (d <= 0L) 0L else 64L - java.lang.Long.numberOfLeadingZeros(d)
    val nb = gaps.groupBy(bucket).map { case (b, v) => b -> v.size.toLong }
    val want = nb.toSeq.sortBy(_._1).map { case (b, n) =>
      val atRisk = nb.filter(_._1 >= b).values.sum
      (b, if (b == 0L) 0L else 1L << (b - 1), (1L << b) - 1L, n, atRisk,
        r6(n.toDouble / atRisk))
    }
    assert(want.nonEmpty, "vacuous: no gaps at sf0.001")
    val got = SparkEntry.queries("user_gap_hazard")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5))).toSeq
    assert(got == want, s"hazard recount diverged\n got=$got\nwant=$want")
    // The at-risk column telescopes: at_risk(b) - n(b) = at_risk(next).
    got.sliding(2).foreach {
      case Seq((_, _, _, n1, ar1, _), (_, _, _, _, ar2, _)) =>
        assert(ar1 - n1 == ar2, "at-risk column does not telescope")
      case _ => ()
    }
    // Hazards are probabilities; the last bucket's hazard is exactly 1.
    got.foreach { case (_, _, _, _, _, h) => assert(h > 0.0 && h <= 1.0) }
    assert(got.last._6 == 1.0, "the final bucket must exhaust its risk set")
  }

  test("user_session_gap_sweep: driver-side sessionizer replays every sweep row; monotone in gap") {
    val events = Tables.events(spark, sf0001)
      .select(col("user_id"), col("event_id"), unix_timestamp(col("ts")).as("tss"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val want = graft.queries.PipelineCatalog.SessionGapsS.map { g =>
      val per = events.groupBy(_._1).values.flatMap { rows =>
        val sorted = rows.sortBy(r => (r._3, r._2))
        val lens = scala.collection.mutable.ArrayBuffer[Long]()
        var prev = Option.empty[Long]
        sorted.foreach { r =>
          if (prev.isEmpty || r._3 - prev.get > g) lens += 1L
          else lens(lens.size - 1) += 1L
          prev = Some(r._3)
        }
        lens
      }.toSeq
      (g, per.size.toLong, per.max, r6(per.sum.toDouble / per.size))
    }.toSet
    val got = SparkEntry.queries("user_session_gap_sweep")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.map(t => (t._1, t._2, t._3, t._4)).toSet == want,
      s"sweep rows diverged\n got=${got.toSet}\nwant=$want")
    // Wider gap can only merge sessions: n_sessions non-increasing in gap.
    val byGap = got.sortBy(_._1).map(_._2)
    assert(byGap.zip(byGap.tail).forall { case (a, b) => b <= a },
      s"n_sessions must be non-increasing in gap: ${got.sortBy(_._1).toSeq}")
  }

  test("events_daily_peaks: a driver-side replay reproduces the peak set; endpoints never peak") {
    val daily = graft.queries.PipelineCatalog
      .dailyCents(Tables.events(spark, sf0001))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val want = daily.groupBy(_._1).flatMap { case (tpe, rows) =>
      val s = rows.sortBy(_._2)
      val cs = s.map(_._3).sorted
      val med = cs((cs.length + 1) / 2 - 1) // lower median, 1-based rank (n+1)/2
      s.indices.collect {
        case i if i > 0 && i < s.length - 1 &&
          s(i)._3 > s(i - 1)._3 && s(i)._3 > s(i + 1)._3 &&
          s(i)._3 * 5 >= med * 6 =>
          (tpe, s(i)._2, s(i)._3, r6(s(i)._3.toDouble / med))
      }
    }.toSet
    assert(want.nonEmpty, "vacuous: no peaks at sf0.001")
    val got = SparkEntry.queries("events_daily_peaks")(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(got == want, s"peak set diverged\n got=$got\nwant=$want")
    // Endpoint days (first/last of each series) must be absent.
    val ends = daily.groupBy(_._1).flatMap { case (t, rows) =>
      val ds = rows.map(_._2); Seq((t, ds.min), (t, ds.max))
    }.toSet
    assert(got.forall { case (t, day, _, _) => !ends.contains((t, day)) },
      "an endpoint day leaked into the peak set")
  }
}
