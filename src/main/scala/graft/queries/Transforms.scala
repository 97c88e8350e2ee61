package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The core aggregation transforms, factored out of the catalog so the SAME
  * declarative plan runs in batch (CatalogEntry, oracle-checked) and in
  * Structured Streaming update mode (graft.streaming — the reference's
  * rolling keyed reduce, SURVEY §2.5/§2.9). Input: the `events` schema
  * (event_id, ts, user_id, event_type, value, props).
  */
object Transforms {
  import Exact._

  /** TaxiRideCountPreAggregate.java:53-70 — per-driver count. */
  def countByDriver(events: DataFrame): DataFrame = events
    .groupBy(col("user_id").as("driver_id"))
    .agg(count(lit(1)).as("cnt"))

  /** TaxiRideMaxPassengerPreAggregate.java:52-66 — per-driver rolling max. */
  def maxByDriver(events: DataFrame): DataFrame = events
    .groupBy(col("user_id").as("driver_id"))
    .agg(max(col("value")).as("max_value"))

  /** TaxiRideAvgPassengerPreAggregate.java:64-82 — per-driver true average
    * (reference count-reset bug not reproduced, SURVEY §2.5).
    */
  def avgByDriver(events: DataFrame): DataFrame = events
    .groupBy(col("user_id").as("driver_id"))
    .agg(davg(col("value")).as("avg_value"))

  /** TaxiRideAveragePreAggregate.java:46-64 — 3-metric per-driver average. */
  def avg3ByDriver(events: DataFrame): DataFrame = events
    .groupBy(col("user_id").as("driver_id"))
    .agg(
      davg(col("value")).as("avg_value"),
      avg(length(col("props")).cast("long")).as("avg_props_len"),
      avg(hour(col("ts")).cast("long")).as("avg_hour"))

  /** TaxiRideCountDistinctPreAggregate.java:53-70 — COUNT(*) per day
    * (bug-compatible, SURVEY §2.5).
    */
  def countByDay(events: DataFrame): DataFrame = events
    .groupBy(dayofyear(col("ts")).cast("long").as("day"))
    .agg(count(lit(1)).as("cnt"))

  /** Funnel stage table: each user's FIRST event timestamp per funnel
    * stage. One shuffle, min-combinable — which is exactly what makes it
    * run unchanged as an update-mode streaming aggregation (the per-user
    * row IS the funnel state; `min` folds micro-batches associatively).
    */
  def funnelStages(events: DataFrame): DataFrame = {
    def firstTs(t: String) =
      min(when(col("event_type") === t, col("ts"))).as(s"t_$t")
    events.groupBy("user_id")
      .agg(firstTs("signup"), firstTs("view"), firstTs("purchase"))
  }

  /** Per-user latest-state snapshot (changelog compaction): one struct
    * argmax on the (ts, event_id) total order. max is associative, so
    * the identical plan folds micro-batches as update-mode streaming
    * state (the live materialized view) and runs batch-wise for the
    * `events_latest_state` entry.
    */
  def latestState(events: DataFrame): DataFrame = events
    .select(col("user_id"),
      struct(col("ts"), col("event_id"), col("event_type"), col("value")).as("tv"))
    .groupBy("user_id")
    .agg(max(col("tv")).as("last"))
    .select(col("user_id"), col("last.ts").as("last_ts"),
      col("last.event_id").as("last_event_id"),
      col("last.event_type").as("last_type"), col("last.value").as("last_value"))

  /** Per-user event counts — the state side of the key-skew report.
    * count is associative, so the same aggregate runs as update-mode
    * streaming state (the live skew monitor feeding a salting decision)
    * and as the batch first stage of `events_key_skew`; the scalar skew
    * fold ([[keySkewFold]]) is a batch read over the upserted counts.
    */
  def keyCounts(events: DataFrame): DataFrame =
    events.groupBy("user_id").agg(count(lit(1)).as("c"))

  /** The scalar fold of [[keyCounts]] state into the skew statistics
    * (exact integer moments → one-shot IEEE derivations). */
  def keySkewFold(counts: DataFrame): DataFrame =
    counts.agg(count(lit(1)).as("n_keys"), max("c").as("max_cnt"),
        sum("c").as("sx"), sum(col("c") * col("c")).as("sx2"))
      .select(col("n_keys"), col("max_cnt"),
        round(col("sx") / col("n_keys"), 6).as("mean_cnt"),
        round(col("max_cnt") * col("n_keys") / col("sx"), 6).as("skew_ratio"),
        round(sqrt(col("sx2") / col("n_keys") -
          (col("sx") / col("n_keys")) * (col("sx") / col("n_keys"))) /
          (col("sx") / col("n_keys")), 6).as("cv"))

  /** Per-type z-score moment state: DECIMAL-exact Σx and Σx² plus the
    * exact count — the sufficient statistics for mean/variance. All
    * three are associative sums, so the same aggregation runs as
    * update-mode streaming state (the live monitoring loop) and as the
    * batch stats pass of [[zscoreFlag]].
    */
  def zscoreStats(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val v = col("value").cast(DecimalType(18, 4))
    events.groupBy("event_type")
      .agg(dsum(col("value")).as("sx"),
        sum((v * v).cast(DecimalType(38, 8))).cast("double").as("sx2"),
        count(lit(1)).as("n"))
  }

  /** Per-type regression moment state (n, Σx, Σx², Σy, Σy², Σxy; x = epoch
    * seconds re-based to 2024-01-01, y = value) — every column is an exact
    * associative sum (BIGINT counts, DECIMAL sums), so the SAME aggregate
    * is the batch entry's first phase and a streaming update-mode rolling
    * state. [[trendDerive]] turns the moments into slope/intercept/r.
    */
  def trendMoments(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val base = 1704067200L // 2024-01-01T00:00:00Z
    val vd = col("value").cast(DecimalType(18, 4))
    events
      .select(col("event_type"), (unix_timestamp(col("ts")) - base).as("x"), col("value"))
      .groupBy("event_type").agg(
        count(lit(1)).as("n"),
        sum(col("x").cast(DecimalType(38, 0))).as("sxd"),
        sum((col("x") * col("x")).cast(DecimalType(38, 0))).as("sxxd"),
        sum(vd).as("syd"),
        sum((vd * vd).cast(DecimalType(38, 8))).as("syyd"),
        sum((col("x").cast(DecimalType(18, 0)) * vd).cast(DecimalType(38, 4))).as("sxyd"))
  }

  /** Closed-form OLS + Pearson r over a [[trendMoments]] table. The double
    * phase has a fixed IEEE expression shape (identical to the DuckDB
    * oracle's text), so identical exact moments give identical bits.
    */
  def trendDerive(m: DataFrame): DataFrame = {
    val n = col("n").cast("double")
    val sx = col("sxd").cast("double")
    val sxx = col("sxxd").cast("double")
    val sy = col("syd").cast("double")
    val syy = col("syyd").cast("double")
    val sxy = col("sxyd").cast("double")
    val cov = n * sxy - sx * sy
    val varx = n * sxx - sx * sx
    val vary = n * syy - sy * sy
    m.select(col("event_type"), col("n"),
      round(cov / varx, 6).as("slope"),
      round((sy - (cov / varx) * sx) / n, 6).as("intercept"),
      round(cov / (sqrt(varx) * sqrt(vary)), 6).as("corr"))
  }

  /** Flag events > 3σ from their type mean given a [[zscoreStats]] table
    * (broadcast back — the fact side never shuffles). mean/var/z are
    * derived from the exact sums with a fixed IEEE expression shape, so
    * the z² > 9 membership boundary is bit-deterministic; var > 0 guards
    * the constant-group NaN case.
    */
  def zscoreFlag(events: DataFrame, stats: DataFrame): DataFrame =
    events.join(broadcast(stats), "event_type")
      .withColumn("mean", col("sx") / col("n"))
      .withColumn("vr", col("sx2") / col("n") - col("mean") * col("mean"))
      .withColumn("zr", (col("value") - col("mean")) / sqrt(col("vr")))
      .filter(col("vr") > 0 && col("zr") * col("zr") > 9)
      .select(col("event_id"), col("event_type"), col("value"),
        round(col("zr"), 6).as("z"))

  /** Cohort retention triangle (batch form): first-active-day cohorts
    * counted on each later active day. Cohort day via a MIN window over
    * the user partition — never a cohort⋈activity self-join. cohort_day
    * travels as an ISO string (parquet date32 vs DuckDB DATE surface as
    * different physical dtypes in the driver compare).
    */
  def retention(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    events
      .select(col("user_id"), to_date(col("ts")).as("d"))
      .distinct()
      .withColumn("cohort_day", min("d").over(Window.partitionBy("user_id")))
      .groupBy(date_format(col("cohort_day"), "yyyy-MM-dd").as("cohort_day"),
        datediff(col("d"), col("cohort_day")).cast("long").as("day_offset"))
      .agg(count(lit(1)).as("active_users"))
  }

  /** Streaming-suitable retention STATE: per-user first active day plus
    * the active-day set — a single update-mode aggregation whose per-key
    * state is bounded by the calendar (#days), not the event volume.
    * [[retentionFold]] turns the upserted state rows into the same
    * triangle [[retention]] computes directly.
    */
  def retentionState(events: DataFrame): DataFrame =
    events.select(col("user_id"), to_date(col("ts")).as("d"))
      .groupBy("user_id")
      .agg(min("d").as("cohort_day"), collect_set("d").as("days"))

  /** The retention triangle from a [[retentionState]] table. */
  def retentionFold(state: DataFrame): DataFrame =
    state.select(col("cohort_day"), explode(col("days")).as("d"))
      .groupBy(date_format(col("cohort_day"), "yyyy-MM-dd").as("cohort_day"),
        datediff(col("d"), col("cohort_day")).cast("long").as("day_offset"))
      .agg(count(lit(1)).as("active_users"))

  /** Scalar funnel fold over a stage table: users entering each prefix
    * of signup → view → purchase in strict event-time order. Null stage
    * timestamps make the comparison null → otherwise(0): a user missing
    * any earlier stage never counts downstream.
    */
  def funnelFold(stages: DataFrame): DataFrame = stages.agg(
    count(col("t_signup")).as("n_signup"),
    sum(when(col("t_view") > col("t_signup"), 1L).otherwise(0L))
      .as("n_signup_view"),
    sum(when(col("t_purchase") > col("t_view") &&
             col("t_view") > col("t_signup"), 1L).otherwise(0L))
      .as("n_signup_view_purchase"))

  /** BM25 retrieval state at (doc_id, tok) grain — ONE associative count
    * aggregate, so the same plan is a batch pass and an update-mode
    * streaming rolling state (the [[zscoreStats]] device applied to
    * retrieval): each query-term occurrence feeds its (doc, term) tf row,
    * and EVERY token also feeds the doc's `*` sentinel row, whose count IS
    * the doc length — which is how df, N and avgdl (all the global BM25
    * ingredients) become folds over this one state table instead of a
    * second corpus pass ([[bm25Fold]]). ≤ |query|+1 state rows per doc.
    *
    * The sentinel counts `count(orig)` (nulls skipped), so a document
    * whose tokenizer yields nothing still registers with len 0 via the
    * explode_outer null row — N must count every doc, not every doc with
    * tokens.
    */
  def bm25TermState(docs: DataFrame): DataFrame = {
    val qs = PipelineCatalog.Bm25Terms
    docs
      .select(col("doc_id"),
        explode_outer(graft.functions.Text.normTokens(col("text"))).as("orig"))
      .select(col("doc_id"), col("orig"),
        explode(when(col("orig").isin(qs: _*), array(col("orig"), lit("*")))
          .otherwise(array(lit("*")))).as("tok"))
      .groupBy("doc_id", "tok")
      .agg(count(col("orig")).as("tf"))
  }

  /** BM25 top-20 from a [[bm25TermState]] table — the same arithmetic, in
    * the same IEEE expression shape, as the `doc_bm25_topk` entry (raw
    * Robertson-odds idf, k1 = 1.2, b = 0.75, k1+1 written as the literal
    * 2.2, fixed term order), so folding the batch state reproduces the
    * entry's rows bit-for-bit and the streamed state replays it
    * (StreamingSpec asserts both).
    */
  def bm25Fold(state: DataFrame): DataFrame = {
    val Seq(q1, q2, q3) = PipelineCatalog.Bm25Terms
    val k1 = lit(1.2)
    val k1p1 = lit(2.2)
    val b = lit(0.75)
    val lens = state.filter(col("tok") === "*")
      .select(col("doc_id"), col("tf").as("len"))
    val stats = lens.agg(count(lit(1)).as("nd"), sum(col("len")).as("suml"))
      .select(col("nd"), (col("suml").cast("double") / col("nd")).as("avgl"))
    val tf = state.filter(col("tok") =!= "*")
    val df = tf.groupBy("tok").agg(count(lit(1)).as("df"))
    val term = tf.join(broadcast(df), "tok")
      .join(lens, "doc_id")
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        ((col("nd") - col("df")).cast("double") + lit(0.5))
          / (col("df").cast("double") + lit(0.5)))
      .withColumn("tfn",
        col("tf").cast("double") * k1p1
          / (col("tf").cast("double")
            + k1 * (lit(1.0) - b + b * (col("len").cast("double") / col("avgl")))))
      .withColumn("ts", col("idf") * col("tfn"))
    val scored = term.groupBy("doc_id").agg(
      sum(when(col("tok") === q1, col("ts"))).as("s1"),
      sum(when(col("tok") === q2, col("ts"))).as("s2"),
      sum(when(col("tok") === q3, col("ts"))).as("s3"))
      .select(col("doc_id"),
        round(coalesce(col("s1"), lit(0.0)) + coalesce(col("s2"), lit(0.0))
          + coalesce(col("s3"), lit(0.0)), 6).as("score"))
    graft.operators.GlobalRank.withRank(
      scored.orderBy(col("score").desc, col("doc_id")).limit(20),
      Seq(col("score").desc, col("doc_id")), numPartitions = 2, rankCol = "rank")
  }
}
