package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}

import graft.queries.Transforms

/** Streaming (update-mode) forms of the reference's rolling keyed
  * aggregations (SURVEY §2.5/§2.9): the same declarative transforms as the
  * batch catalog, run over a streaming events DataFrame. `outputMode
  * ("update")` is the retract-stream bridge (`toRetractStream`,
  * TaxiRideCountTablePreAggregate.java:79-81 — Spark emits upserts instead
  * of Boolean add/retract pairs, SURVEY §1.2); the processing-time trigger
  * is the combiner flush interval (`combine(fn, intervalMs)`,
  * DataStream.java:1403-1436).
  */
/** One stored signature in a band bucket's dedup state. */
final case class SeenDoc(doc_id: Long, sig: Seq[String])

/** Keyed state of one (band, band-hash) bucket. */
final case class BucketState(docs: Seq[SeenDoc])

/** A streaming near-dup hit: `doc_id` matched `dup_of` (seen earlier in
  * the same LSH bucket) with MinHash-estimated Jaccard `est`.
  */
final case class NearDupVerdict(doc_id: Long, band: Int, dup_of: Long, est: Double)

/** Per-user CUSUM state: events seen (k), exact running value sum at
  * scale 4 carried as a STRING (a BigDecimal through the encoder would
  * re-scale to Spark's default decimal and break exactness), and whether
  * the band was already breached (a breached user emits once, ever).
  */
final case class CusumState(k: Long, cums: String, breached: Boolean)

/** A CUSUM band breach: user, the 1-based event index and timestamp of
  * the first breach, and the signed deviation S_k (value units, 6 dp).
  */
final case class CusumBreach(user_id: Long, breach_k: Long, breach_ts: Long, dev: Double)

/** One shard's Misra–Gries counter map (streaming heavy-hitter state). */
final case class HHSketch(counts: Map[String, Long])

/** Per-type EWMA tap ring: the last ≤16 values in (ts, event_id) order,
  * newest first — EXACTLY the window the batch `events_ewma` entry reads,
  * so the streamed smoothing is bit-identical, not merely convergent. */
final case class EwmaState(taps: Seq[Double])

/** One streamed EWMA observation (same columns as the batch entry). */
final case class EwmaPoint(
    event_id: Long, event_type: String, tss: Long, value: Double, ewma: Double)

/** One target day's active-user grid (streaming DAU/WAU state): the
  * distinct users seen ON the day (dau) and within its trailing 7-day
  * window (wau) — the same (user, day) contribution grid the batch
  * `events_active_users` entry builds, held as per-day keyed state. */
final case class ActiveUsersState(dau: Seq[Long], wau: Seq[Long])

/** Per-type day-of-week seasonality state: 7 slots of (count, exact
  * decimal value sum — serialized, the CUSUM discipline). Bounded at
  * 14 scalars per event type, forever.
  */
final case class DowSeasonState(ns: Seq[Long], sums: Seq[String])

/** One streamed seasonality row (same columns as the batch entry). */
final case class DowSeasonRow(
    event_type: String, dow: Long, n: Long, dow_mean: Double, seasonality: Double)

/** Per-user sequence-mining state: the last two event types (oldest
  * first) and the trigram keys this user already contributed — bounded
  * by |types|³, never by stream length.
  */
final case class TrigramState(lastTwo: Seq[String], seen: Seq[String])

/** One new (user, contiguous type trigram) observation. */
final case class TrigramIncrement(user_id: Long, t1: String, t2: String, t3: String)

/** One streamed DAU/WAU row (same columns as the batch entry). */
final case class ActiveUsersRow(
    day: java.sql.Timestamp, dau: Long, wau: Long, stickiness: Double)

object StreamingQueries {

  /** The five core rolling aggregations, keyed by catalog name. */
  val updating: Map[String, DataFrame => DataFrame] = Map(
    "taxi_ride_count" -> Transforms.countByDriver,
    "taxi_ride_max" -> Transforms.maxByDriver,
    "taxi_ride_avg" -> Transforms.avgByDriver,
    "taxi_ride_avg3" -> Transforms.avg3ByDriver,
    "taxi_ride_count_day" -> Transforms.countByDay,
    // The funnel's per-user stage table (first ts per stage): min is
    // associative across micro-batches, so the same plan runs as
    // update-mode streaming state; the scalar funnel fold is a batch
    // read over the upserted stage rows (update mode cannot chain a
    // second aggregation — the stage row IS the streaming state).
    "events_funnel_stages" -> Transforms.funnelStages,
    // Retention state: min + collect_set fold associatively across
    // micro-batches and per-key state is calendar-bounded (#days); the
    // triangle is Transforms.retentionFold over the upserted state.
    "events_retention_state" -> Transforms.retentionState,
    // z-score moment state (Σx, Σx², n — all associative): the live
    // side of the monitoring loop; Transforms.zscoreFlag applies the
    // upserted stats back over any frame to flag 3σ outliers.
    "events_zscore_stats" -> Transforms.zscoreStats,
    // Changelog compaction as a LIVE materialized view: the struct
    // argmax on (ts, event_id) is associative, so each micro-batch
    // folds into the same per-user latest-state row the batch entry
    // computes.
    "events_latest_state" -> Transforms.latestState,
    // Key-count state for the LIVE skew monitor: count is associative;
    // Transforms.keySkewFold over the upserted counts yields the same
    // statistics as the batch events_key_skew entry — the signal that
    // triggers salting before the hot key melts an executor.
    "events_key_counts" -> Transforms.keyCounts,
    // Regression moment state (n, Σx, Σx², Σy, Σy², Σxy — exact
    // BIGINT/DECIMAL sums, all associative): the LIVE side of the
    // events_value_trend drift monitor; Transforms.trendDerive over the
    // upserted moments yields the batch entry's slope/intercept/r.
    "events_trend_moments" -> Transforms.trendMoments)

  /** Start an update-mode query with a processing-time trigger (≙ the
    * reference's `combine(fn, intervalMs)` flush cadence) into a foreach
    * upsert sink; returns the running query.
    */
  def runUpdating(
      name: String,
      events: DataFrame,
      sink: UpsertSink,
      intervalMs: Long = 500L): StreamingQuery =
    writer(name, events, sink, intervalMs).start()

  def writer(
      name: String,
      events: DataFrame,
      sink: UpsertSink,
      intervalMs: Long): DataStreamWriter[Row] =
    updating(name)(events)
      .writeStream
      .queryName(name)
      .outputMode("update")
      .trigger(Trigger.ProcessingTime(intervalMs))
      .foreach(sink)

  /** Streaming tumbling-window count per event_type with an event-time
    * watermark (the WordCountPreAggregate windowed variant,
    * WordCountPreAggregate.java:178-185, on event time; SURVEY §2.9
    * streaming windows + late-data bound). Update mode emits window
    * upserts; state for windows older than the watermark is dropped.
    */
  def windowedCountByType(
      events: DataFrame,
      windowLength: String = "1 hour",
      watermarkDelay: String = "2 hours"): DataFrame = {
    import org.apache.spark.sql.functions._
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), windowLength), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(
        unix_timestamp(col("window.start")).as("win_start_s"),
        col("event_type"), col("cnt"))
  }

  /** Rolling per-key count via EXPLICIT keyed state
    * (`mapGroupsWithState`) — the closest Spark analogue of the
    * reference's rolling `KeyedStream.reduce` emission model (emit the
    * updated aggregate for every key touched in the micro-batch;
    * unbounded keyed state, SURVEY §2.9). The declarative
    * `groupBy().count()` form is preferred (Catalyst plans partial
    * aggregation); this path exists for custom state logic the built-in
    * aggregates can't express.
    */
  def rollingCountCustomState(events: DataFrame): org.apache.spark.sql.Dataset[(Long, Long)] = {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
    import events.sparkSession.implicits._
    events.select(col("user_id")).as[Long]
      .groupByKey((k: Long) => k)
      .mapGroupsWithState[Long, (Long, Long)](GroupStateTimeout.NoTimeout()) {
        (key: Long, rows: Iterator[Long], state: GroupState[Long]) =>
          val next = state.getOption.getOrElse(0L) + rows.size
          state.update(next)
          (key, next)
      }
  }

  /** Streaming CUSUM breach monitor — the LIVE side of the batch
    * `events_cusum_breach` entry (PipelineCatalog.cusumBreach): per user,
    * the first event where the cumulative deviation from a REFERENCE mean
    * leaves the ±H band. Streaming CUSUM needs the reference as an input
    * (the batch entry derives μ from the full corpus; a stream cannot see
    * its own future), so the caller passes the calibration moment
    * (refSum = Σv, refN = N) from a prior batch pass or a control
    * channel — re-arming with a fresh moment is a query restart, the same
    * operational seam as the adaptive trigger controller.
    *
    * Exactness: the state carries Σv at scale 4 and the band test is the
    * batch entry's division-free form N·S_k = N·cums − k·Σv compared to
    * H·N — every term an exact BigDecimal product, so a replay of an
    * in-order stream reproduces the batch breach set BIT-FOR-BIT (dev
    * rounds through the same HALF_UP-6 the batch side uses;
    * StreamingSpec asserts set equality). Rows are sorted by
    * (ts, event_id) WITHIN each micro-batch; cross-batch order is the
    * caller's replay contract, as in every rolling-state query here.
    *
    * 100 TB shape: one `flatMapGroupsWithState` shuffle on user_id;
    * state is three scalars per user (the running sum — never the
    * events), and a breached user's state goes cold immediately. Output
    * is append-mode: a breach is emitted exactly once.
    */
  def streamingCusumBreach(
      events: DataFrame,
      refSum: java.math.BigDecimal,
      refN: Long,
      h: Long = 500L): org.apache.spark.sql.Dataset[CusumBreach] = {
    import java.math.{BigDecimal => JBD, RoundingMode}
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    import events.sparkSession.implicits._
    val sy = refSum.setScale(4, RoundingMode.HALF_UP)
    val nBd = JBD.valueOf(refN)
    val band = JBD.valueOf(h).multiply(nBd)
    events
      .select(col("user_id"), col("event_id"), col("value"),
        col("ts").cast("long").as("tss"))
      .as[(Long, Long, Double, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[CusumState, CusumBreach](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[(Long, Long, Double, Long)],
            state: org.apache.spark.sql.streaming.GroupState[CusumState]) =>
          var st = state.getOption.getOrElse(CusumState(0L, "0.0000", false))
          val out = Vector.newBuilder[CusumBreach]
          if (!st.breached) {
            var k = st.k
            var cums = new JBD(st.cums)
            var breached = false
            val it = rows.toSeq.sortBy(r => (r._4, r._2)).iterator
            while (it.hasNext && !breached) {
              val (_, _, v, tss) = it.next()
              k += 1
              // Mirror the batch side's non-ANSI cast(value AS DECIMAL(18,4)):
              // NaN/Infinity and overflow (>14 integer digits after HALF_UP-4)
              // cast to NULL there — the row still takes a k (row_number counts
              // it) and the band test still runs on it, but the running sum is
              // unchanged. Without this guard a NaN kills the stream
              // (new BigDecimal("NaN") throws) and an overflowing value
              // diverges from the batch breach set.
              if (!v.isNaN && !v.isInfinite) {
                val d = JBD.valueOf(v).setScale(4, RoundingMode.HALF_UP)
                if (d.precision - d.scale <= 14) cums = cums.add(d)
              }
              val numer = nBd.multiply(cums).subtract(JBD.valueOf(k).multiply(sy))
              if (numer.abs.compareTo(band) > 0) {
                breached = true
                val dev = JBD.valueOf(numer.doubleValue() / refN.toDouble)
                  .setScale(6, RoundingMode.HALF_UP).doubleValue()
                out += CusumBreach(user, k, tss, dev)
              }
            }
            st = CusumState(k, cums.toPlainString, breached)
            state.update(st)
          }
          out.result().iterator
      }
  }

  /** Streaming EWMA — the live side of the batch `events_ewma` entry,
    * and BIT-IDENTICAL to it rather than asymptotically close: the keyed
    * state is the same ≤16-tap ring the batch window reads (a truncated
    * EWMA's state IS its taps), and each arrival replays the entry's
    * exact arithmetic — value snapped to DECIMAL(18,4), integer weight
    * ladder `32768 >> j`, one closing double division, HALF_UP at 6.
    * Rows sort by (tss, event_id) within each micro-batch; cross-batch
    * order is the caller's replay contract, as in every rolling-state
    * query here. State per key: 16 scalars, forever.
    */
  def streamingEwma(events: DataFrame): org.apache.spark.sql.Dataset[EwmaPoint] = {
    import java.math.{BigDecimal => JBD, RoundingMode}
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    import events.sparkSession.implicits._
    events
      .select(col("event_type"), col("event_id"), col("value"),
        org.apache.spark.sql.functions.unix_micros(col("ts")).as("tsu"),
        org.apache.spark.sql.functions.unix_timestamp(col("ts")).as("tss"))
      .as[(String, Long, Double, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[EwmaState, EwmaPoint](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (tpe: String, rows: Iterator[(String, Long, Double, Long, Long)],
            state: org.apache.spark.sql.streaming.GroupState[EwmaState]) =>
          var taps = state.getOption.map(_.taps).getOrElse(Seq.empty)
          val out = Vector.newBuilder[EwmaPoint]
          // Micro-precision order key (tsu), second-precision output (tss)
          // — exactly the batch entry's ORDER BY ts vs unix_timestamp(ts).
          rows.toSeq.sortBy(r => (r._4, r._2)).foreach { case (_, id, v, _, tss) =>
            taps = (v +: taps).take(16) // newest first
            var num = JBD.ZERO
            var den = 0L
            taps.zipWithIndex.foreach { case (tv, j) =>
              num = num.add(JBD.valueOf(tv).setScale(4, RoundingMode.HALF_UP)
                .multiply(JBD.valueOf(32768L >> j)))
              den += 32768L >> j
            }
            val ewma = JBD.valueOf(num.doubleValue() / den.toDouble)
              .setScale(6, RoundingMode.HALF_UP).doubleValue()
            out += EwmaPoint(id, tpe, tss, v, ewma)
          }
          state.update(EwmaState(taps))
          out.result().iterator
      }
  }

  /** Streaming DAU/WAU — the live side of the batch `events_active_users`
    * entry, the always-on engagement board production runs as a stream.
    * Same contribution-explosion shape as the batch plan: each event
    * fans out to the 7 target days it keeps its user "weekly active" for
    * (j = 0 marks the own-day DAU contribution), then per-TARGET-DAY
    * keyed state holds the distinct-user grid — `dau` = users seen on
    * the day, `wau` = users seen in its trailing window — and every
    * update re-emits the day's (dau, wau, dau/wau) row in update mode.
    * Emission waits for the first own-day user, mirroring the batch
    * entry's inner dau⋈wau join (a day with trailing-window users but no
    * own-day activity is not a report row).
    *
    * State and eviction: per-day state is bounded by the day's distinct
    * users (the batch grid row), and the watermark EVICTS it — the
    * event-time timeout fires once the watermark passes day+7d (no
    * contribution can reach the day after that), removing the grid row.
    * Total state ≈ distinct users × 8 live days, forever-bounded by the
    * watermark horizon, never by stream length. Late events inside the
    * 7-day watermark re-open nothing (their day's state is still live);
    * events later than the watermark are dropped upstream — the standard
    * completeness/latency trade, identical to `windowed_count`'s.
    *
    * Determinism: sets fold order-free (size is order-independent), and
    * stickiness replays the batch arithmetic — one double division,
    * HALF_UP at 6 — so a full in-watermark replay converges to the batch
    * entry EXACTLY (StreamingSpec).
    */
  def streamingActiveUsers(events: DataFrame)
      : org.apache.spark.sql.Dataset[ActiveUsersRow] = {
    import java.math.{BigDecimal => JBD, RoundingMode}
    import org.apache.spark.sql.functions.{col, date_trunc, explode, expr, unix_timestamp}
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    import events.sparkSession.implicits._
    val contrib = events
      .withWatermark("ts", "7 days")
      .select(col("user_id"), col("ts"),
        unix_timestamp(date_trunc("day", col("ts"))).as("daysec"),
        explode(expr("sequence(0, 6)")).as("j"))
      // The watermark-tagged ts column must ride into the grouped frame —
      // event-time timeout resolution requires it (analysis-checked).
      .select((col("daysec") + col("j") * 86400L).as("tday"),
        (col("j") === 0).as("own"), col("user_id"), col("ts"))
      .as[(Long, Boolean, Long, java.sql.Timestamp)]
    contrib.groupByKey(_._1)
      .flatMapGroupsWithState[ActiveUsersState, ActiveUsersRow](
        OutputMode.Update, GroupStateTimeout.EventTimeTimeout) {
        (tday: Long, rows: Iterator[(Long, Boolean, Long, java.sql.Timestamp)],
            state: org.apache.spark.sql.streaming.GroupState[ActiveUsersState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val st = state.getOption.getOrElse(ActiveUsersState(Nil, Nil))
            val dau = scala.collection.mutable.LinkedHashSet(st.dau: _*)
            val wau = scala.collection.mutable.LinkedHashSet(st.wau: _*)
            rows.foreach { case (_, own, user, _) =>
              wau += user
              if (own) dau += user
            }
            state.update(ActiveUsersState(dau.toSeq, wau.toSeq))
            // Evict once no contribution can reach this day: watermark
            // past day+7d (+1d margin over the 6-day fan-out; clamped
            // above the current watermark — required by the API when a
            // day is already older than the horizon at first sight).
            val evictAt = math.max((tday + 8 * 86400L) * 1000L,
              state.getCurrentWatermarkMs() + 60000L)
            state.setTimeoutTimestamp(evictAt)
            if (dau.isEmpty) Iterator.empty
            else {
              val stick = JBD.valueOf(dau.size.toDouble / wau.size.toDouble)
                .setScale(6, RoundingMode.HALF_UP).doubleValue()
              Iterator.single(ActiveUsersRow(
                new java.sql.Timestamp(tday * 1000L), dau.size.toLong,
                wau.size.toLong, stick))
            }
          }
      }
  }

  /** Streaming heavy-hitter candidates — the live side of the batch
    * `token_heavy_hitters` entry: items shard by deterministic hash, each
    * shard folds its arrivals into a Misra–Gries counter map held in
    * keyed state ([[graft.operators.MisraGries.foldInto]] — chunked
    * folding with a carried map IS the one-pass sketch, so micro-batch
    * boundaries cannot change the result), and every trigger re-emits
    * the shard's current sketch in update mode.
    *
    * Guarantees that survive streaming: each shard's state is ≤
    * `capacity` counters forever (bounded memory at any stream length);
    * every estimate UNDER-counts (c'(x) ≤ c(x)); and any item whose
    * count within a shard exceeds n_shard/(capacity+1) owns a counter —
    * so the emitted union is a candidate superset of the true heavy set,
    * exactly the superset the batch entry's second pass recounts. A
    * stream has no second pass; downstream either treats candidates as
    * approximate (bounded error N_shard/(k+1)) or recounts offline.
    *
    * 100 TB/day shape: one shuffle on the shard key; `shards` sets the
    * parallelism and `shards × capacity` the total state — both knobs,
    * neither grows with the stream.
    */
  def heavyHitterSketch(
      items: DataFrame,
      capacity: Int = 64,
      shards: Int = 16): DataFrame = {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    import items.sparkSession.implicits._
    items.select(col("item")).as[String]
      .groupByKey(it => math.floorMod(it.hashCode, shards))
      .flatMapGroupsWithState[HHSketch, (Int, String, Long)](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (shard: Int, rows: Iterator[String],
            state: org.apache.spark.sql.streaming.GroupState[HHSketch]) =>
          val m = scala.collection.mutable.HashMap.empty[String, Long]
          state.getOption.foreach(s => m ++= s.counts)
          graft.operators.MisraGries.foldInto(m, rows, capacity)
          state.update(HHSketch(m.toMap))
          m.toVector.sorted.iterator.map { case (it, c) => (shard, it, c) }
      }
      .toDF("shard", "item", "est")
  }

  /** Streaming Count-Min sketch: the cell matrix of the batch
    * `events_count_min` entry held as keyed state — one Long per
    * (row, bucket) group, i.e. the full sketch is depth×width cells
    * REGARDLESS of key cardinality (the definitional bounded-state
    * sketch; contrast the heavy-hitter MG state which is capacity×shards).
    * CM is linear, so per-batch increments commute with any arrival
    * order/split — the final cells equal the batch build bit-for-bit
    * (StreamingSpec replays the batch entry through
    * [[graft.operators.CountMinSketch.estimate]] to prove it). Update
    * mode re-emits a cell whenever it grows; probing (min over rows)
    * happens wherever the cells are consumed, exactly as in the batch
    * entry's broadcast probe.
    */
  def streamingCountMin(events: DataFrame)
      : org.apache.spark.sql.Dataset[(Int, Int, Long)] = {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.streaming.GroupStateTimeout
    import events.sparkSession.implicits._
    import graft.operators.CountMinSketch
    events.select(col("user_id")).as[Long]
      .flatMap(k => CountMinSketch.Hashes.indices
        .map(r => (r, CountMinSketch.bucket(r, k))))
      .groupByKey(identity)
      .mapGroupsWithState[Long, (Int, Int, Long)](GroupStateTimeout.NoTimeout) {
        case ((r, b), rows, state) =>
          val c = state.getOption.getOrElse(0L) + rows.size
          state.update(c)
          (r, b, c)
      }
  }

  /** Streaming sibling of the Count-Min JOIN-SIZE estimator
    * (`lineitem_join_size_sketch`, ScaleCatalog): BOTH sides' d×w cell
    * matrices held as keyed state — one Long per (side, row, bucket),
    * so total state is 2·depth·width cells REGARDLESS of key
    * cardinality, the planner statistic maintained live instead of
    * rebuilt per batch. Input: one row per (record, side-membership),
    * columns (side, k) — a record contributing to both frequency
    * vectors appears once per side, which is exactly the batch entry's
    * fa/fb split expressed as rows. CM cells are LINEAR, so per-batch
    * increments commute with any arrival order/split: the final cells
    * — and the min-over-rows inner product probed off them via
    * [[graft.operators.JoinSizeSketch.estimate]] — equal the batch
    * entry's cm_est bit-for-bit (StreamingSpec replays the catalog
    * entry to prove it). Update mode re-emits a cell whenever it grows;
    * the probe joins the two ≤ d·w cell sets wherever they are
    * consumed, exactly as the batch entry's broadcast probe does.
    */
  def streamingJoinSizeCells(rows: DataFrame)
      : org.apache.spark.sql.Dataset[(String, Int, Long, Long)] = {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.streaming.GroupStateTimeout
    import rows.sparkSession.implicits._
    import graft.operators.JoinSizeSketch
    rows.select(col("side").cast("string"), col("k").cast("long"))
      .as[(String, Long)]
      .flatMap { case (side, k) =>
        (0 until JoinSizeSketch.Depth).map(r => (side, r, JoinSizeSketch.bucket(r, k)))
      }
      .groupByKey(identity)
      .mapGroupsWithState[Long, (String, Int, Long, Long)](GroupStateTimeout.NoTimeout) {
        case ((side, r, b), rs, state) =>
          val c = state.getOption.getOrElse(0L) + rs.size
          state.update(c)
          (side, r, b, c)
      }
  }

  /** Streaming sibling of [[graft.operators.RoutedJoin.stats]]: the
    * router's sampled Count-Min cells maintained LIVE as keyed state, so
    * a long-running pipeline can re-decide its join topology from the
    * stream instead of re-scanning the fact table. Input columns
    * (k: any atomic type, disc): the SAME deterministic 1/SampleMod hash-sample
    * filter on the discriminator as the batch router, the same
    * [[graft.operators.JoinSizeSketch]] md5 hash family (long keys hash
    * by decimal text on both sides — the one-definition contract), one
    * Long of state per touched (row, bucket) cell, ≤ Depth·Width cells
    * total regardless of key cardinality. CM cells are linear, so the
    * drained cells equal the batch sampled aggregate bit-for-bit and
    * [[graft.operators.RoutedJoin.statsFromCells]] + `choose` yield the
    * batch route on the same corpus (StreamingSpec pins route equality
    * for all three organic corpora). Update mode re-emits a cell
    * whenever it grows.
    */
  def streamingRouteCells(fact: DataFrame)
      : org.apache.spark.sql.Dataset[(Int, Long, Long)] = {
    import org.apache.spark.sql.functions.{col, lit, pmod, xxhash64}
    import org.apache.spark.sql.streaming.GroupStateTimeout
    import fact.sparkSession.implicits._
    import graft.operators.{JoinSizeSketch, RoutedJoin}
    fact
      .filter(pmod(xxhash64(col("disc")), lit(RoutedJoin.SampleMod.toLong)) === 0L)
      // String form, NOT a long cast: the batch router's bucketCol hashes
      // the key's decimal/string text, and a long cast here would null
      // out string keys and silently collapse the sketch onto one bucket
      // — cast("string") keeps every atomic key type on the one contract.
      .select(col("k").cast("string")).as[String]
      .flatMap(k => (0 until JoinSizeSketch.Depth)
        .map(r => (r, JoinSizeSketch.bucket(r, k))))
      .groupByKey(identity)
      .mapGroupsWithState[Long, (Int, Long, Long)](GroupStateTimeout.NoTimeout) {
        case ((r, b), rs, state) =>
          val c = state.getOption.getOrElse(0L) + rs.size
          state.update(c)
          (r, b, c)
      }
  }

  /** Streaming sibling of `doc_dsir_weights`' model build: the two
    * ≤1024-bin bucket histograms (raw count + target-subset count) as
    * keyed state — one (Long, Long) per touched bucket, bounded by
    * DsirBuckets regardless of corpus size. Histogram cells are linear
    * and mergeable, so the drained (b, cr, ct) rows equal the batch
    * aggregate bit-for-bit after any arrival order/split, and the pure-
    * integer weight arithmetic (PipelineCatalog.dsirWeights — ONE
    * definition shared with the batch entry) yields the identical
    * weight table (StreamingSpec pins it). Input columns (lang, b) —
    * the dsirGrams bucket stream. Update mode re-emits a bucket when
    * either counter grows.
    */
  def streamingDsirCells(grams: DataFrame)
      : org.apache.spark.sql.Dataset[(Long, Long, Long)] = {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.streaming.GroupStateTimeout
    import grams.sparkSession.implicits._
    grams.select(col("b").cast("long"), col("lang").cast("string"))
      .as[(Long, String)]
      .groupByKey(_._1)
      .mapGroupsWithState[(Long, Long), (Long, Long, Long)](GroupStateTimeout.NoTimeout) {
        case (b, rows, state) =>
          val (cr0, ct0) = state.getOption.getOrElse((0L, 0L))
          var cr = cr0; var ct = ct0
          rows.foreach { case (_, lang) =>
            cr += 1L
            if (lang == "en") ct += 1L
          }
          state.update((cr, ct))
          (b, cr, ct)
      }
  }

  /** Streaming sibling of `emb_knn_ivfpq`'s coarse-assignment stage —
    * the IVFADC entry's ONLY corpus-touching aggregate: per-vector
    * argmax of the rounded cosine against the broadcast frozen-centroid
    * frame, maintained live as keyed state. ONE definition shared with
    * the batch entry (EmbeddingCatalog.ivfCoarseAssign — the
    * streamingDailyMeans delegation pattern): the cell scores are a
    * stream-static broadcast projection and the argmax is a keyed MAX —
    * linear, mergeable — so structured streaming maintains the
    * identical aggregate in update mode and the drained (vec_id, cell)
    * frame equals the batch assignment bit-for-bit after any arrival
    * order/split. StreamingSpec replays residual-PQ codes + ADC +
    * rerank (EmbeddingCatalog.ivfPqFrom) on the drained frame and pins
    * the final top-K against the batch entry. State is one (csim, cid)
    * pair per vector — corpus-row-bounded like any keyed dedup, with
    * the centroid side frozen and broadcast exactly as at 100 TB.
    *
    * Input columns: (vec_id, embedding); `centN` = the static
    * EmbeddingCatalog.ivfCentroidFrame. Update mode re-emits a vector's
    * cell when a better-scoring centroid arrives (never here — cells
    * are frozen — but the contract holds under re-delivery).
    */
  def streamingIvfCells(emb: DataFrame, centN: DataFrame): DataFrame =
    graft.queries.EmbeddingCatalog.ivfCoarseAssign(emb, centN)

  /** Streaming sibling of `emb_pq_distortion`'s corpus-touching stage —
    * the PQ encode: per (vector, subspace), the L2-nearest codebook
    * chunk and its lattice-exact quantization error, as keyed MIN-struct
    * state over the broadcast codebook. ONE definition shared with the
    * batch entry (EmbeddingCatalog.pqEncodeCells — the delegation
    * pattern of [[streamingIvfCells]]): the argmin is linear/mergeable,
    * so update mode maintains it live and the drained
    * (vec_id, j, code, d2s) cells replay the per-subspace distortion
    * report (EmbeddingCatalog.pqDistortionFrom) bit-for-bit
    * (StreamingSpec pins it). The report stage itself is ≤ 8×16 rows of
    * post-drain batch work — never streamed corpus state.
    */
  def streamingPqCells(emb: DataFrame, cent: DataFrame): DataFrame =
    graft.queries.EmbeddingCatalog.pqEncodeCells(emb, cent)

  /** Streaming sibling of `emb_opq_permute`'s corpus-touching moments
    * stage — the per-dimension (n, Σxs, Σxs²) lattice aggregate: plain
    * keyed count + decimal-exact sums (linear, mergeable), maintained
    * live in update mode. ONE definition shared with the batch entry
    * (EmbeddingCatalog.opqMoments — the [[streamingPqCells]] delegation
    * pattern); the drained 64-row frame replays the variance-ranked
    * snake permutation (opqPermOf) and from it the full permuted
    * distortion report, bit-for-bit (StreamingSpec pins both). State is
    * [[64]] rows — dimension-bounded, never corpus-bounded.
    */
  def streamingOpqMoments(emb: DataFrame): DataFrame =
    graft.queries.EmbeddingCatalog.opqMoments(emb)

  /** Streaming sibling of `events_theil_sen`'s corpus-touching stage:
    * the (event_type, day) daily-mean frame maintained as a live
    * aggregate — ONE graft.queries.PipelineCatalog.dailyMeans definition
    * shared with the batch entry, so the two can never drift. The daily
    * sum rides exact decimals and the count is exact, so the drained
    * frame — and the pairwise-median Theil–Sen slope `theilSenFrom`
    * computes from it (a #days-bounded, corpus-independent batch step) —
    * replays the batch entry bit-for-bit after any arrival order/split
    * (StreamingSpec pins it). Update mode re-emits a day when it
    * changes; state is one row per (type, day) — time-bounded, not
    * corpus-bounded, the same reason the batch entry's O(n²) stage is
    * scale-safe.
    */
  def streamingDailyMeans(events: DataFrame): DataFrame =
    graft.queries.PipelineCatalog.dailyMeans(events)

  /** Streaming sibling of `events_benford_profile`'s corpus-touching
    * stage — the (event_type, digit) first-significant-digit count: a
    * plain keyed COUNT (linear, mergeable), maintained live in update
    * mode over the lattice digit projection. ONE definition shared with
    * the batch entry (PipelineCatalog.benfordCounts — the delegation
    * pattern of [[streamingDailyMeans]]); the drained counts replay the
    * grid-sized Benford report (PipelineCatalog.benfordFrom)
    * bit-for-bit after any arrival order/split (StreamingSpec pins it).
    * State is ≤ 9 × #types rows — mix-bounded, never corpus-bounded.
    */
  def streamingBenfordCounts(events: DataFrame): DataFrame =
    graft.queries.PipelineCatalog.benfordCounts(events)

  /** Streaming sibling of `events_k_anonymity`'s corpus-touching stage —
    * the quasi-identifier equivalence-class COUNT (keyed, linear,
    * mergeable) maintained live in update mode: the privacy audit as a
    * continuously-updated monitor instead of a batch sweep. ONE
    * definition shared with the batch entry
    * (PipelineCatalog.kAnonCounts); the drained classes replay the
    * per-type report (PipelineCatalog.kAnonFrom) bit-for-bit after any
    * arrival order/split (StreamingSpec pins it). State is one row per
    * occupied QI cell — #types × #days × ≤10 buckets, time-bounded.
    */
  def streamingKAnonCounts(events: DataFrame): DataFrame =
    graft.queries.PipelineCatalog.kAnonCounts(events)

  /** Streaming sibling of `token_kneser_ney`'s corpus-touching stage —
    * the (x, y) bigram COUNT (keyed, linear, mergeable) maintained live
    * in update mode: the LM count table as a continuously-updated
    * monitor. ONE definition shared with the batch entry
    * (TrainPrepCatalog.knBigramCounts — the [[streamingBenfordCounts]]
    * delegation pattern); the drained counts replay the full KN-smoothed
    * top-20 report (TrainPrepCatalog.knFrom — a vocab-sized batch step)
    * bit-for-bit after any arrival order/split (StreamingSpec pins it).
    * State is one row per distinct bigram — vocab²-bounded, the same
    * table the batch entry materializes.
    */
  def streamingKnBigramCounts(docs: DataFrame): DataFrame =
    graft.queries.TrainPrepCatalog.knBigramCounts(docs)

  /** Streaming sibling of `doc_bootstrap_ci`'s corpus-touching stage —
    * the per-replica (r, Σw·x, Σw) weighted SUMs of exact integers
    * (keyed, linear, mergeable; the point-estimate moments ride the
    * same frame as the r = −1 sentinel row), maintained live in update
    * mode: the distributed Poisson bootstrap as a continuously-updated
    * uncertainty monitor. ONE definition shared with the batch entry
    * (TrainPrepCatalog.bootReplicaSums — the delegation pattern of
    * [[streamingBenfordCounts]]); the drained ≤ R+1 rows replay the
    * order-statistic interval report (TrainPrepCatalog.bootCiFrom)
    * bit-for-bit after any arrival order/split (StreamingSpec pins it).
    * State is ≤ R+1 rows — replica-bounded, never corpus-bounded.
    */
  def streamingBootReplicaSums(docs: DataFrame): DataFrame =
    graft.queries.TrainPrepCatalog.bootReplicaSums(docs)

  /** Streaming sibling of the basket family's corpus-touching stage —
    * per-order sorted part sets via a keyed collect_set (set union:
    * linear, mergeable, arrival-order-free after the closing
    * sort_array), maintained live in update mode: the market-basket
    * model as a continuously-updated state. ONE definition shared with
    * the batch entries (JoinCatalog.orderBaskets — the delegation
    * pattern of [[streamingBenfordCounts]]); the drained (ok, pks)
    * frame replays the pair statistics and the directional rule report
    * (JoinCatalog.basketStatsFrom / assocRulesFrom) bit-for-bit after
    * any arrival order/split (StreamingSpec pins it). State is one
    * basket-sized set per order — order-bounded, never
    * corpus-quadratic.
    */
  def streamingOrderBaskets(lineitem: DataFrame): DataFrame =
    graft.queries.JoinCatalog.orderBaskets(lineitem)

  /** Streaming sibling of `token_good_turing`'s corpus-touching stage —
    * the unigram count table (keyed COUNT: linear, mergeable),
    * maintained live in update mode: the vocabulary model as
    * continuously-updated state. ONE definition shared with the batch
    * entry (TrainPrepCatalog.unigramCounts — the
    * [[streamingKnBigramCounts]] delegation pattern); the drained table
    * replays the count-of-counts report (TrainPrepCatalog.goodTuringFrom)
    * bit-for-bit after any arrival order/split (StreamingSpec pins it).
    * State is vocab-bounded.
    */
  def streamingUnigramCounts(docs: DataFrame): DataFrame =
    graft.queries.TrainPrepCatalog.unigramCounts(docs)

  /** Streaming sibling of `source_chao1_richness`'s corpus-touching
    * stage — the (source, token) count grid (keyed COUNT: linear,
    * mergeable), maintained live in update mode: per-source vocabulary
    * saturation as a live crawl-budget monitor. ONE definition shared
    * with the batch entry (TrainPrepCatalog.sourceTokenCounts); the
    * drained grid replays the richness report
    * (TrainPrepCatalog.chao1From) bit-for-bit (StreamingSpec pins it).
    * State is per-source-vocab-bounded.
    */
  def streamingSourceTokenCounts(docs: DataFrame): DataFrame =
    graft.queries.TrainPrepCatalog.sourceTokenCounts(docs)

  /** Streaming sibling of `token_heaps_curve`'s corpus-touching stage —
    * the token first-occurrence frame (keyed MIN: linear, mergeable,
    * the canonical streaming-safe order statistic), maintained live in
    * update mode. ONE definition shared with the batch entry
    * (TrainPrepCatalog.firstOccurrence); the drained frame plus the
    * stream's document-id set replay the full vocabulary-growth curve
    * (TrainPrepCatalog.heapsFrom — GlobalRank + grid, corpus-free)
    * bit-for-bit (StreamingSpec pins it). State is vocab-bounded.
    */
  def streamingFirstOccurrence(docs: DataFrame): DataFrame =
    graft.queries.TrainPrepCatalog.firstOccurrence(docs)

  /** Streaming sibling of `token_burstiness`'s corpus-touching stage —
    * the (doc, token) count grid (keyed COUNT: linear, mergeable),
    * maintained live in update mode. ONE definition shared with the
    * batch entry (TrainPrepCatalog.docTokenCounts); the drained grid
    * replays the Church-adaptation report
    * (TrainPrepCatalog.burstinessFrom) bit-for-bit (StreamingSpec pins
    * it). State is one row per occupied (doc, token) cell.
    */
  def streamingDocTokenCounts(docs: DataFrame): DataFrame =
    graft.queries.TrainPrepCatalog.docTokenCounts(docs)

  /** Streaming sibling of `source_readability`'s corpus-touching stage —
    * the per-source (docs, words, sentence-marks, vowel-groups) sums
    * (keyed COUNT/SUMs of per-row integer regex counts: linear,
    * mergeable), maintained live in update mode: the readability
    * profile as a live ingest monitor. ONE definition shared with the
    * batch entry (TrainPrepCatalog.readabilitySums — the
    * streamingBenfordCounts delegation pattern); the drained sums
    * replay the Flesch report (TrainPrepCatalog.readabilityFrom)
    * bit-for-bit (StreamingSpec pins it). State is one row per source.
    */
  def streamingReadabilitySums(docs: DataFrame): DataFrame =
    graft.queries.TrainPrepCatalog.readabilitySums(docs)

  /** Streaming sibling of `source_length_quartiles`' corpus-touching
    * stage — the (source, length) COUNT grid (keyed COUNT: linear,
    * mergeable), maintained live in update mode. ONE definition shared
    * with the batch entry (TrainPrepCatalog.sourceLengthCounts); the
    * drained grid replays the exact quartile report
    * (TrainPrepCatalog.quartilesFromLengthGrid) bit-for-bit
    * (StreamingSpec pins it). State is grid-bounded — #sources ×
    * distinct lengths, never corpus volume.
    */
  def streamingSourceLengthCounts(docs: DataFrame): DataFrame =
    graft.queries.TrainPrepCatalog.sourceLengthCounts(docs)

  /** Streaming sessionization via `session_window`: per-user sessions
    * that close after `gap` idle time (the streaming counterpart of the
    * batch gaps-and-islands `user_sessions` entry). Append mode emits a
    * session only once the watermark passes its close — exactly-once
    * session records downstream.
    */
  def sessionsByUser(
      events: DataFrame,
      gap: String = "30 minutes",
      watermarkDelay: String = "1 hour"): DataFrame = {
    import org.apache.spark.sql.functions._
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(
        col("user_id"),
        unix_timestamp(col("session_window.start")).as("sess_start_s"),
        col("n_events"))
  }

  /** Streaming exact deduplication: the streaming counterpart of the
    * batch `doc_exact_dedup` operator — drop records whose normalized-
    * content hash was already seen, with a watermark bounding the dedup
    * state (old keys are evicted once the watermark passes; a duplicate
    * arriving later than the watermark would be re-admitted — the
    * standard bounded-state trade-off at 100 TB).
    *
    * `dropDuplicatesWithinWatermark`, not `dropDuplicates`: plain
    * dropDuplicates only evicts state when the EVENT-TIME COLUMN is part
    * of the dedup keys — keyed on the content hash alone its state grows
    * forever, watermark or no watermark (the silent 100 TB killer this
    * API exists for). The WithinWatermark form keys on the hash, stamps
    * each state entry with its event time, and expires it at watermark +
    * delay.
    */
  def streamingDedup(
      docs: DataFrame,
      tsCol: String,
      textCol: String = "text",
      watermarkDelay: String = "1 hour"): DataFrame = {
    import org.apache.spark.sql.functions._
    docs
      .withColumn("content_hash",
        md5(regexp_replace(lower(trim(col(textCol))), "\\s+", " ")))
      .withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark("content_hash")
  }

  /** Streaming form of the corpus-cleaning pipeline
    * (PipelineCatalog.cleanCorpus stages 1–2 + stats): quality filter
    * (≥ `minTokens` whitespace tokens) → watermark-bounded exact dedup on
    * the normalized-content hash → per-source running corpus stats
    * (docs kept, tokens kept). Every stage is the micro-batch counterpart
    * of an oracle-checked batch operator; with an ordered replay the
    * final state converges to the batch composition (StreamingSpec).
    *
    * MinHash near-dup SIGNATURES stream identically (pure per-row
    * projections — graft.functions.Text.minhashSignature applies to a
    * streaming frame unchanged); the pair JOIN stage is inherently
    * cross-batch and belongs in a periodic batch compaction, the
    * standard lambda split for dedup at 100 TB.
    */
  def streamingCleanCorpus(
      docs: DataFrame,
      tsCol: String,
      minTokens: Int = 25,
      watermarkDelay: String = "1 hour"): DataFrame = {
    import org.apache.spark.sql.functions._
    val quality = docs
      .withColumn("n_tokens",
        size(graft.functions.Text.wsTokens(col("text"))).cast("long"))
      .filter(col("n_tokens") >= minTokens)
    streamingDedup(quality, tsCol)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("docs_kept"), sum("n_tokens").as("tokens_kept"))
  }

  /** Streaming MinHash near-duplicate detection at ingest — the stateful
    * complement of [[streamingDedup]] (which is exact-only) and of the
    * batch LSH pair join (which is cross-batch and stays in compaction):
    * each doc's K-hash MinHash signature is banded exactly like
    * NearDupCatalog's batch pipeline; state lives PER BAND BUCKET
    * (band, band-hash) and holds the signatures seen in that bucket. A
    * new doc colliding with a stored signature whose component-match
    * fraction (the unbiased MinHash Jaccard estimator, Broder 1997)
    * reaches `simThreshold` emits a DupVerdict row; docs with no verdict
    * are the kept stream.
    *
    * Scale: the group key IS the LSH bucket, so state shards uniformly
    * (128-bit band hashes), each bucket holds at most `maxPerBucket`
    * signatures (FIFO eviction, matching LSH's premise that true
    * near-dups collide in a SMALL bucket), and — like all keyed state
    * here — it runs on the RocksDB provider when heap-resident state
    * won't fit. Estimator, not exact Jaccard: the stream never stores
    * shingle sets, so memory per doc is K hex strings, and the batch
    * compaction pass remains the exact authority (the standard
    * ingest-filter + batch-verify split).
    *
    * `stateTtl` (e.g. Some("2 hours")) expires idle buckets via
    * processing-time timeouts — pair it with a PACED trigger
    * (Trigger.ProcessingTime): pending timers make the default ASAP
    * trigger run continuous empty micro-batches (that is how Spark
    * fires timers), which also means `processAllAvailable` never
    * quiesces under a TTL in tests.
    */
  def streamingNearDup(
      docs: DataFrame,
      k: Int = 12,
      bands: Int = 4,
      simThreshold: Double = 0.8,
      maxPerBucket: Int = 64,
      stateTtl: Option[String] = None): org.apache.spark.sql.Dataset[NearDupVerdict] = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    val spark = docs.sparkSession
    import spark.implicits._
    require(k % bands == 0, s"bands ($bands) must divide k ($k)")
    val rows = k / bands
    val sigCols = graft.functions.Text.minhashSignature(
      graft.functions.Text.shingles(col("text"), 3), k)
    val sig = docs.select(col("doc_id") +: sigCols: _*)
    val bandStructs = (0 until bands).map { b =>
      val parts = (0 until rows).map(r => col(s"s${b * rows + r}"))
      struct(lit(b).as("band"), md5(concat(parts: _*)).as("h"))
    }
    val banded = sig
      .select(col("doc_id"), array((0 until k).map(i => col(s"s$i")): _*).as("sig"),
        explode(array(bandStructs: _*)).as("bh"))
      .select(col("doc_id"), col("bh.band").as("band"), col("bh.h").as("h"), col("sig"))
      .as[(Long, Int, String, Seq[String])]
    // With a TTL, idle buckets expire (cold buckets hold no dedup value
    // once the corpus has moved past them) — the second state bound next
    // to the per-bucket FIFO cap. Without one, state is capped per
    // bucket but the bucket COUNT tracks distinct band hashes seen.
    val timeoutConf =
      if (stateTtl.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    banded
      .groupByKey { case (_, band, h, _) => (band, h) }
      .flatMapGroupsWithState(OutputMode.Append, timeoutConf)(
        (_: (Int, String), it: Iterator[(Long, Int, String, Seq[String])],
            state: org.apache.spark.sql.streaming.GroupState[BucketState]) => {
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
          var seen = state.getOption.getOrElse(BucketState(Vector.empty)).docs
          val out = Vector.newBuilder[NearDupVerdict]
          // Deterministic within a micro-batch: lowest doc_id is senior.
          it.toSeq.sortBy(_._1).foreach { case (docId, band, _, sig) =>
            val best = seen.iterator
              .filter(_.doc_id != docId)
              .map(s => (s.doc_id,
                s.sig.zip(sig).count { case (a, b) => a == b }.toDouble / k))
              .foldLeft(Option.empty[(Long, Double)]) { (acc, c) =>
                if (acc.forall(a => c._2 > a._2 || (c._2 == a._2 && c._1 < a._1))) Some(c)
                else acc
              }
            best match {
              case Some((prior, est)) if est >= simThreshold =>
                out += NearDupVerdict(docId, band, prior, est)
              case _ =>
                seen = (seen :+ SeenDoc(docId, sig)).takeRight(maxPerBucket)
            }
          }
          state.update(BucketState(seen))
          stateTtl.foreach(state.setTimeoutDuration)
          out.result().iterator
          }
        })
  }

  /** Stream-stream event-time join: attribute each purchase to the SAME
    * user's click that preceded it by at most `horizon` — the streaming
    * enrichment/attribution shape. Both sides carry watermarks and the
    * join condition bounds purchase time to [click ts, click ts +
    * horizon], so Spark can size the state retention window from the
    * watermark + time bound and EVICT expired rows — an unbounded
    * stream-stream join (no time bound) would grow state forever. At
    * 100 TB the join state shards by user_id like any keyed state and
    * runs on RocksDB when heap-resident state won't fit.
    */
  /** Streaming transition pairs via EXPLICIT keyed state — the live side
    * of `events_type_transitions`. The batch form uses lead(), which is
    * not streamable (it needs the next row); the state form inverts it:
    * the per-user state is the last seen (ts, event_id, type), each
    * arriving event emits its (prev → current) pair and replaces the
    * state. Micro-batch groups are sorted by (ts, event_id) before the
    * fold; cross-batch ordering relies on the source's per-key in-order
    * delivery (the reference's rolling processing-time model — an
    * event-time hardening would add a watermark-paced sort buffer on the
    * same seam). State is O(1) per user; output is one pair per event
    * after each user's first.
    */
  def streamingTransitionPairs(
      events: DataFrame): org.apache.spark.sql.Dataset[(Long, String, String)] = {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .as[(Long, java.sql.Timestamp, Long, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Long, String), (Long, String, String)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[(Long, java.sql.Timestamp, Long, String)],
         state: GroupState[(Long, Long, String)]) =>
          val sorted = rows.toSeq.sortBy(r => (r._2.getTime, r._3))
          var prev = state.getOption
          val out = sorted.flatMap { r =>
            val pair = prev.map(p => (user, p._3, r._4))
            prev = Some((r._2.getTime, r._3, r._4))
            pair
          }
          prev.foreach(state.update)
          out.iterator
      }
  }

  /** Streaming inter-event gap extraction — the live side of the lag
    * stage shared by `user_gap_hazard` and `user_burstiness`
    * (graft.queries.PipelineCatalog.gapDeltas). Per-user keyed state is
    * ONE long (the last event's epoch second — the
    * [[streamingTransitionPairs]] shape); an arriving event closes the
    * gap against it and emits (user_id, delta). Micro-batch groups sort
    * by (epoch second, event_id) — the batch window's exact order;
    * cross-batch ordering rides the per-key in-order delivery contract
    * shared by every rolling-state query here. Downstream the emitted
    * gaps feed the SAME aggregates the batch entries run
    * ([[streamingGapBuckets]] / a user-keyed SUM) in the same query
    * (Append-mode state op → streaming agg, the supported composition);
    * drained, they replay `hazardFrom` / the burstiness report
    * bit-for-bit (StreamingSpec pins both).
    */
  def streamingGapDeltas(
      events: DataFrame): org.apache.spark.sql.Dataset[(Long, Long)] = {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("user_id"), col("ts"), col("event_id"))
      .as[(Long, java.sql.Timestamp, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Long, (Long, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[(Long, java.sql.Timestamp, Long)],
         state: GroupState[Long]) =>
          // Epoch SECONDS (floorDiv, matching unix_timestamp), ordered
          // exactly as the batch lag: (tss, event_id).
          val sorted = rows.map(r => (Math.floorDiv(r._2.getTime, 1000L), r._3))
            .toSeq.sortBy(identity)
          var prev = state.getOption
          val out = sorted.map { case (tss, _) =>
            val d = prev.map(p => (user, tss - p))
            prev = Some(tss)
            d
          }.flatten
          prev.foreach(state.update)
          out.iterator
      }
  }

  /** Streaming sibling of `user_gap_hazard`'s bucket aggregate: the
    * ceil-log2 gap histogram maintained live in update mode — the gap
    * stream from [[streamingGapDeltas]] feeding the batch entry's own
    * bucket aggregate (PipelineCatalog.bucketsFromDeltas, a keyed COUNT:
    * linear, mergeable). State is ≤ ~40 bucket rows plus one long per
    * user. The drained buckets replay the hazard report
    * (PipelineCatalog.hazardFrom) bit-for-bit (StreamingSpec).
    */
  def streamingGapBuckets(events: DataFrame): DataFrame =
    graft.queries.PipelineCatalog.bucketsFromDeltas(
      streamingGapDeltas(events).toDF("user_id", "delta"))

  /** Streaming first-seen n-gram novelty — the live side of
    * `doc_novelty`. First-seen ownership is MONOTONE over arrival order
    * (the owner of a gram is the first document carrying it; later
    * arrivals can never change it), so the batch entry's MIN(doc_id)
    * ownership streams as one bit of keyed state per gram: the
    * gram-keyed `flatMapGroupsWithState` emits a (doc_id, novel) flag
    * per (doc, gram) the moment the gram first appears — within a
    * micro-batch the LOWEST doc_id in the group is senior, matching the
    * batch MIN — and the per-document novelty aggregate runs downstream
    * of it in the same query (Append-mode state op → streaming agg, the
    * supported composition). Replayed in doc_id order (doc_id = arrival
    * order, this corpus's contract and the batch entry's premise), the
    * drained result equals the batch entry bit-for-bit (StreamingSpec).
    *
    * 100 TB shape: state is one long per DISTINCT gram — the same
    * cardinality the batch entry's gram-keyed MIN shuffle carries, held
    * as keyed state (RocksDB at scale) instead of a shuffle frame; per
    * batch the work is gram-keyed state lookups plus a doc-keyed
    * aggregate, both map-combined, never pair-quadratic.
    */
  def streamingNovelty(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = docs.sparkSession
    import spark.implicits._
    val flags = docs
      .select(col("doc_id"), explode(graft.functions.Text.shingles(col("text"), 3)).as("sh"))
      .as[(Long, String)]
      .groupByKey(_._2)
      .flatMapGroupsWithState[Long, (Long, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: String, rows: Iterator[(Long, String)], state: GroupState[Long]) =>
          val docsIn = rows.map(_._1).toSeq.sorted
          val unowned = state.getOption.isEmpty
          if (unowned) state.update(docsIn.head)
          docsIn.map(d => (d, if (unowned && d == docsIn.head) 1L else 0L)).iterator
      }
    flags.toDF("doc_id", "novel")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"), sum("novel").as("n_novel"))
      .select(col("doc_id"), col("n_grams"), col("n_novel"),
        round(col("n_novel") / col("n_grams"), 6).as("novelty"))
  }

  /** Streaming sequence-packing statistics — the live side of
    * `doc_pack_sequences`. The batch entry's source-keyed running token
    * sum IS per-source keyed state (one long: the tokens packed so
    * far), so an arriving document reads its interval [cum, cum+n) off
    * the state, emits its boundary-straddle flags, and advances the
    * state — the packing decision a streaming ingest makes per document
    * as it appends to the training shard. The per-source aggregate runs
    * downstream in the same query (Append-mode state op → streaming
    * agg). Replayed in (source, doc_id) order — the batch entry's
    * declared packing order — the drained result equals the batch frame
    * bit-for-bit (StreamingSpec). State is ONE long per source
    * regardless of stream length; micro-batch groups sort by doc_id,
    * cross-batch ordering rides the per-key in-order delivery contract
    * shared by every rolling-state query here.
    */
  def streamingPackStats(docs: DataFrame, budget: Int = 512): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = docs.sparkSession
    import spark.implicits._
    val flags = docs
      .select(col("doc_id"), col("source"),
        size(graft.functions.Text.normTokens(col("text"))).cast("long").as("n"))
      .filter(col("n") > 0)
      .as[(Long, String, Long)]
      .groupByKey(_._2)
      .flatMapGroupsWithState[Long, (String, Long, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (src: String, rows: Iterator[(Long, String, Long)], state: GroupState[Long]) =>
          var cum = state.getOption.getOrElse(0L)
          val out = rows.toSeq.sortBy(_._1).map { case (_, _, n) =>
            val firstSeq = cum / budget
            cum += n
            val lastSeq = (cum - 1) / budget
            (src, n, if (firstSeq != lastSeq) 1L else 0L)
          }
          state.update(cum)
          out.iterator
      }
    flags.toDF("source", "n", "split")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("n").as("total_tokens"),
        (expr(s"(sum(n) - 1) div $budget") + 1).as("n_sequences"),
        sum("split").as("n_split_docs"))
      .select(col("source"), col("n_docs"), col("total_tokens"),
        col("n_sequences"), col("n_split_docs"),
        (col("n_sequences") * budget - col("total_tokens")).as("tail_waste"),
        round(col("total_tokens") / (col("n_sequences") * budget), 6)
          .as("pack_efficiency"))
  }

  /** Streaming sequence mining — the live side of `events_seq_trigrams`.
    * Per-user keyed state holds the last two event types plus the set of
    * trigram keys this user has ALREADY contributed (support counts
    * distinct users, so each (user, trigram) must emit exactly once);
    * an arriving event closes a contiguous trigram with the two
    * remembered types and emits an increment iff it is new for the user.
    * Downstream, support is a plain streaming count over the increments
    * and the top-10 is the batch tail — replayed fully, the increment
    * multiset aggregates to the batch entry EXACTLY (StreamingSpec).
    *
    * State per user is bounded by |types|³ + 2 — the type vocabulary is
    * an operational constant (5 here), so state never grows with stream
    * length. Micro-batch groups sort by (ts, event_id), the batch
    * window's exact order; cross-batch ordering is the per-key in-order
    * delivery contract shared by every rolling-state query here.
    */
  def streamingSeqTrigrams(
      events: DataFrame): org.apache.spark.sql.Dataset[TrigramIncrement] = {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .as[(Long, java.sql.Timestamp, Long, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[TrigramState, TrigramIncrement](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[(Long, java.sql.Timestamp, Long, String)],
         state: GroupState[TrigramState]) =>
          val st = state.getOption.getOrElse(TrigramState(Seq.empty, Seq.empty))
          var last = st.lastTwo // oldest first, ≤ 2 entries
          var seen = st.seen.toSet
          val out = Vector.newBuilder[TrigramIncrement]
          rows.toSeq.sortBy(r => (r._2.getTime, r._3)).foreach { case (_, _, _, tpe) =>
            if (last.length == 2) {
              val key = s"${last.head}\u0000${last(1)}\u0000$tpe"
              if (!seen(key)) {
                seen += key
                out += TrigramIncrement(user, last.head, last(1), tpe)
              }
            }
            last = (last :+ tpe).takeRight(2)
          }
          state.update(TrigramState(last, seen.toSeq.sorted))
          out.result().iterator
      }
  }

  /** Streaming day-of-week seasonality — the live side of the batch
    * `events_dow_seasonality` entry, and BIT-IDENTICAL to it on a full
    * in-order replay rather than merely convergent: the keyed state is
    * the same arithmetic the batch plan aggregates — per (type, dow) an
    * event count and an EXACT DECIMAL(·,4) value sum (decimal addition
    * is associative, so micro-batch splits cannot change it) — and every
    * emission replays the batch entry's closing ops: decimal→double
    * (correctly rounded both paths), two divisions, HALF_UP at 6. The
    * seasonality index needs all 7 weekday slots of a TYPE at once, so
    * state keys on event_type with a 7-slot array (14 scalars per key,
    * forever) and each update re-emits the type's full dow profile in
    * update mode — the consumer upserts on (type, dow).
    */
  def streamingDowSeasonality(
      events: DataFrame): org.apache.spark.sql.Dataset[DowSeasonRow] = {
    import java.math.{BigDecimal => JBD, RoundingMode}
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("event_type"), expr("weekday(ts) + 1").as("dow"), col("value"))
      .as[(String, Int, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[DowSeasonState, DowSeasonRow](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (tpe: String, rows: Iterator[(String, Int, Double)],
         state: GroupState[DowSeasonState]) =>
          val st = state.getOption.getOrElse(
            DowSeasonState(Seq.fill(7)(0L), Seq.fill(7)("0.0000")))
          val ns = st.ns.toArray
          val sums = st.sums.map(new JBD(_)).toArray
          rows.foreach { case (_, dow, v) =>
            val i = dow - 1
            ns(i) += 1
            sums(i) = sums(i).add(JBD.valueOf(v).setScale(4, RoundingMode.HALF_UP))
          }
          state.update(DowSeasonState(ns.toSeq, sums.map(_.toPlainString).toSeq))
          val nt = ns.sum
          val stot = sums.reduce(_.add(_))
          val typeMean = stot.doubleValue() / nt.toDouble
          (0 until 7).iterator.filter(ns(_) > 0).map { i =>
            val dm = sums(i).doubleValue() / ns(i).toDouble
            DowSeasonRow(tpe, (i + 1).toLong, ns(i),
              JBD.valueOf(dm).setScale(6, RoundingMode.HALF_UP).doubleValue(),
              JBD.valueOf(dm / typeMean).setScale(6, RoundingMode.HALF_UP).doubleValue())
          }
      }
  }

  def streamAttributionJoin(
      clicks: DataFrame,
      purchases: DataFrame,
      watermarkDelay: String = "1 hour",
      horizon: String = "1 hour"): DataFrame = {
    import org.apache.spark.sql.functions._
    val c = clicks.select(col("user_id").as("c_user"), col("event_id").as("click_id"),
      col("ts").as("c_ts")).withWatermark("c_ts", watermarkDelay)
    val p = purchases.select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
      col("ts").as("p_ts")).withWatermark("p_ts", watermarkDelay)
    c.join(p,
      col("c_user") === col("p_user") &&
        col("p_ts") >= col("c_ts") &&
        col("p_ts") <= col("c_ts") + expr(s"INTERVAL $horizon"))
      .select(col("c_user").as("user_id"), col("click_id"), col("purchase_id"),
        col("c_ts"), col("p_ts"))
  }

  /** Register an AdaptiveTriggerController for `queryName` on this session;
    * caller owns removal. This is `adCombine` (DataStream.java:1424-1436):
    * same pipeline, controller-driven interval.
    */
  def withController(
      spark: SparkSession,
      queryName: String,
      initialIntervalMs: Long = 500L): AdaptiveTriggerController = {
    val c = new AdaptiveTriggerController(queryName, initialIntervalMs)
    spark.streams.addListener(c)
    c
  }
}
