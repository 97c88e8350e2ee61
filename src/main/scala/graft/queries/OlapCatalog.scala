package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Multi-level OLAP aggregation surface: ROLLUP / CUBE lattices and
  * PIVOT — the grouping-sets family a reporting layer expects from an
  * analytics engine. All three plan as ONE expand + one hash-aggregate
  * pass in Spark (the Expand operator replicates each input row once per
  * grouping set before a single shuffle) — no per-level re-scans, which
  * is what makes the lattice affordable at 100 TB: cost scales with
  * (#grouping sets × input), never with re-reading the fact table.
  *
  * `grouping_id()` disambiguates lattice levels (a NULL key value from
  * aggregation vs a NULL in the data); Spark and DuckDB both implement
  * the standard bit encoding (first listed column = highest bit).
  */
object OlapCatalog {
  import Exact._

  /** Order counts and exact revenue at every ROLLUP level of
    * (status, priority): per pair, per status, grand total.
    */
  val ordersRollup: CatalogEntry = CatalogEntry(
    "orders_rollup",
    (s, d) => Tables.load(s, d, "orders")
      .rollup("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice"), 18, 4).as("total"),
        grouping_id().as("gid"))
      // Aggregated-out keys surface as the explicit 'ALL' label, not
      // NULL: gid already disambiguates, and NULL group keys trip
      // engine-dependent null sorting in downstream comparisons.
      .select(coalesce(col("o_orderstatus"), lit("ALL")).as("o_orderstatus"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("o_orderpriority"),
        col("n"), col("total"), col("gid")),
    Some(s"""SELECT COALESCE(o_orderstatus, 'ALL') AS o_orderstatus,
             COALESCE(o_orderpriority, 'ALL') AS o_orderpriority, COUNT(*) AS n,
             ${sqlSum("o_totalprice", 18, 4)} AS total,
             CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid
             FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)"""))

  /** The full CUBE lattice over the same keys — adds the per-priority
    * marginals ROLLUP omits.
    */
  val ordersCube: CatalogEntry = CatalogEntry(
    "orders_cube",
    (s, d) => Tables.load(s, d, "orders")
      .cube("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("n"), grouping_id().as("gid"))
      .select(coalesce(col("o_orderstatus"), lit("ALL")).as("o_orderstatus"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("o_orderpriority"),
        col("n"), col("gid")),
    Some("""SELECT COALESCE(o_orderstatus, 'ALL') AS o_orderstatus,
            COALESCE(o_orderpriority, 'ALL') AS o_orderpriority, COUNT(*) AS n,
            CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid
            FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)"""))

  private val EventTypes = Seq("click", "error", "purchase", "signup", "view")

  /** Events per user pivoted to one column per event type. The pivot
    * value list is EXPLICIT — with it, Spark plans a single pass
    * (pivot_first aggregates); without it, a driver-side distinct-values
    * collection runs first, which at 100 TB is an extra full shuffle
    * before planning can even start. Missing cells are filled to 0 to
    * match the conditional-aggregation semantics (COUNT of an empty set).
    */
  val eventsPivot: CatalogEntry = CatalogEntry(
    "events_pivot",
    (s, d) => Tables.events(s, d)
      .groupBy("user_id")
      .pivot("event_type", EventTypes)
      .agg(count(lit(1)))
      .na.fill(0, EventTypes),
    Some {
      val cells = EventTypes.map(t =>
        s"COUNT(CASE WHEN event_type = '$t' THEN 1 END) AS $t").mkString(", ")
      s"SELECT user_id, $cells FROM events GROUP BY user_id"
    })

  /** Conversion funnel over the event stream: of the users who signed
    * up, how many later viewed, and of those how many later purchased —
    * strict per-user event-time ordering on each user's FIRST event of
    * each stage. One shuffle keyed on user_id reduces each user to three
    * timestamps (map-side combined min), then a scalar fold — at 100 TB
    * the funnel costs exactly one pass over events plus a per-user
    * 3-column aggregate, never a self-join per stage pair. The stage
    * aggregation (Transforms.funnelStages) doubles as the update-mode
    * streaming form — min folds micro-batches associatively, so the
    * live funnel is the same plan with streaming state (StreamingSpec).
    */
  val eventsFunnel: CatalogEntry = CatalogEntry(
    "events_funnel",
    (s, d) => Transforms.funnelFold(Transforms.funnelStages(Tables.events(s, d))),
    Some("""SELECT COUNT(t_signup) AS n_signup,
                   CAST(COALESCE(SUM(CASE WHEN t_view > t_signup THEN 1 ELSE 0 END), 0)
                     AS BIGINT) AS n_signup_view,
                   CAST(COALESCE(SUM(CASE WHEN t_purchase > t_view AND t_view > t_signup
                     THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_signup_view_purchase
            FROM (SELECT user_id,
                         MIN(CASE WHEN event_type = 'signup' THEN ts END) AS t_signup,
                         MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
                         MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
                  FROM events GROUP BY user_id)"""))

  /** Cohort retention: users grouped by their first active day, counted
    * on each later day they return (the day-offset retention triangle).
    * The cohort day comes from a MIN window over the user partition —
    * no cohort⋈activity self-join, so the plan is distinct → window →
    * aggregate, three map-reduced exchanges on uniform keys and zero
    * join state. Output cardinality is days², independent of corpus
    * size.
    */
  val eventsRetention: CatalogEntry = CatalogEntry(
    "events_retention",
    (s, d) => Transforms.retention(Tables.events(s, d)),
    Some("""SELECT strftime(cohort_day, '%Y-%m-%d') AS cohort_day,
                   CAST(date_diff('day', cohort_day, d) AS BIGINT) AS day_offset,
                   COUNT(*) AS active_users
            FROM (SELECT user_id, d, MIN(d) OVER (PARTITION BY user_id) AS cohort_day
                  FROM (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events))
            GROUP BY 1, 2"""))

  /** Behavioral transition matrix: counts (and row-normalized
    * probabilities) of consecutive event-type pairs per user in event
    * time — the Markov-chain view of user paths that powers next-action
    * models and anomalous-flow detection. One shuffle keyed on user_id
    * (the lead window's partition), a per-user local sort, then a
    * #types²-key aggregate: output cardinality is the squared type
    * vocabulary, independent of event volume.
    */
  /** The (from_type, to_type) transition-count matrix — the corpus stage
    * shared by [[eventsTransitions]] and [[markovStationary]]: one
    * user-partitioned lead window, then a #types²-key map-combined
    * aggregate. The live form is
    * graft.streaming.StreamingQueries.streamingTransitionPairs (per-user
    * last-event keyed state; StreamingSpec pins the drained matrix
    * against this exact window).
    */
  private[graft] def transitionCounts(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    events
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("next_type", lead("event_type", 1).over(w))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("next_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
  }

  val eventsTransitions: CatalogEntry = CatalogEntry(
    "events_type_transitions",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      transitionCounts(Tables.events(s, d))
        .withColumn("p",
          round(col("n") / sum("n").over(Window.partitionBy("from_type")), 6))
    },
    Some("""SELECT from_type, to_type, COUNT(*) AS n,
                   ROUND(COUNT(*) / SUM(COUNT(*)) OVER (PARTITION BY from_type), 6) AS p
            FROM (SELECT event_type AS from_type,
                         lead(event_type) OVER (PARTITION BY user_id
                           ORDER BY ts, event_id) AS to_type
                  FROM events)
            WHERE to_type IS NOT NULL
            GROUP BY from_type, to_type"""))

  /** Power-iteration step count and lattice scale for
    * [[markovStationary]] — shared with the oracle's unrolled CTEs and
    * OlapMarkovSpec so the two iterations cannot drift. 12 steps on a
    * ≤ |types| chain is far past mixing for any observed event mix, but
    * the entry's CONTRACT is "the 12-step iterate", identical in both
    * engines, not a convergence claim. */
  private[graft] val MarkovIters = 12
  private[graft] val MarkovScale = 1000000L

  /** Long-run event-type mix: the stationary distribution of the
    * empirical (from_type → to_type) Markov chain (Kemeny & Snell 1960
    * ch. IV; the power iteration is the PageRank device, Page et al.
    * 1999, on the observed chain) — what the traffic mix TRENDS TOWARD
    * if today's transition behavior holds, read against the current
    * type shares to see which event classes are still growing. The
    * drift monitors (`events_page_hinkley`, `events_cusum_breach`)
    * catch level shifts; this prices the equilibrium those shifts move
    * toward.
    *
    * Exactness device: the chain lives on the [[MarkovScale]] integer
    * lattice — v₀ = S for every type, step v' = normalize(v·P) carried
    * out as w_j = Σ_i (v_i·n_ij) div r_i (row totals r_i; terms with
    * r_i = 0 — absorbing types — contribute nothing, the substochastic
    * mass the normalization re-inflates) then v'_j = (w_j·S) div Σw
    * (kept at the previous iterate when Σw = 0). Every operation is a
    * truncating integer division — Scala BigInt `/` on the driver and
    * DuckDB `//`, identical on nonnegative operands — so the two
    * engines walk bit-identical integer vectors (the `emb_pca_project`
    * power-iteration recipe on a row-stochastic matrix). The closing π
    * is ONE double division of exact integers, HALF_UP 6 (the
    * streamingDowSeasonality rounding bridge).
    *
    * 100 TB shape: the corpus collapses to the ≤ |types|² transition
    * matrix in [[transitionCounts]] (one lag window + map-combined
    * aggregate, already streamed live via streamingTransitionPairs);
    * the collect is model-sized — O(|types|²) rows, an operational
    * constant like the KMeans centroids — and the iteration is driver
    * arithmetic on that matrix. Nothing downstream touches the corpus.
    */
  /** The [[MarkovIters]]-step integer-lattice power iteration over a
    * transition-count matrix — ONE definition shared by
    * [[markovStationary]] and MarkovSpec's generative property (random
    * chains vs a converged double iteration), so the entry and its test
    * cannot drift. Truncating BigInt division throughout (= DuckDB `//`
    * on nonnegative operands); rows with zero outgoing mass contribute
    * nothing (substochastic — the normalization re-inflates).
    */
  private[graft] def stationaryLattice(nMat: Array[Array[Long]]): Array[BigInt] = {
    val k = nMat.length
    val rowTot = nMat.map(_.sum)
    var v = Array.fill(k)(BigInt(MarkovScale))
    (1 to MarkovIters).foreach { _ =>
      val w = Array.tabulate(k) { j =>
        (0 until k).map { i =>
          if (rowTot(i) > 0) v(i) * nMat(i)(j) / rowTot(i) else BigInt(0)
        }.sum
      }
      val tot = w.sum
      if (tot > 0) v = w.map(x => x * MarkovScale / tot)
    }
    v
  }

  val markovStationary: CatalogEntry = CatalogEntry(
    "events_markov_stationary",
    (s, d) => {
      import s.implicits._
      // Null-typed events may sit between neighbors in the lag, but
      // transitions with a NULL endpoint are excluded from the chain in
      // BOTH engines (the null-exclusion convention: NULL cannot ride
      // the oracle's equi-join CTE chain, and a null "state" is ingest
      // noise, not a behavior class).
      val cells = transitionCounts(Tables.events(s, d))
        .filter(col("from_type").isNotNull && col("to_type").isNotNull)
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      val types = cells.flatMap(c => Seq(c._1, c._2)).distinct.sorted
      val idx = types.zipWithIndex.toMap
      val k = types.length
      val nMat = Array.ofDim[Long](k, k)
      cells.foreach { case (a, b, n) => nMat(idx(a))(idx(b)) = n }
      val rowTot = nMat.map(_.sum)
      val v = stationaryLattice(nMat)
      val tot = v.sum
      val rows = types.zipWithIndex.map { case (t, i) =>
        (t, rowTot(i), v(i).toLong,
          new java.math.BigDecimal(v(i).toDouble / tot.toDouble)
            .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue)
      }.toSeq
      rows.toDF("event_type", "n_out", "v_scaled", "pi").orderBy("event_type")
    },
    Some {
      val steps = (1 to MarkovIters).map { i =>
        val prev = if (i == 1) "v0" else s"v${i - 1}"
        // Single-reference chain (the emb_pca_project CTE-inlining
        // lesson: two references per step inline to 2^12 copies of the
        // corpus CTE): the zero-weight self-edge every type gets in
        // `es` carries the previous iterate's own value through the
        // one join as pv = MAX over rows with f = t2.
        s"""w$i AS (SELECT e.t2 AS t,
                           MAX(CASE WHEN e.f = e.t2 THEN p.v END) AS pv,
                           SUM((p.v * e.n) // e.r) AS w
                    FROM es e JOIN $prev p ON p.t = e.f
                    GROUP BY e.t2),
             v$i AS (SELECT t, CASE WHEN SUM(w) OVER () > 0
                                    THEN (w * $MarkovScale) // SUM(w) OVER ()
                                    ELSE pv END AS v
                     FROM w$i)"""
      }.mkString(",\n             ")
      s"""WITH tr AS (SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n
                      FROM (SELECT event_type AS from_type,
                                   lead(event_type) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS to_type
                            FROM events)
                      WHERE to_type IS NOT NULL AND from_type IS NOT NULL
                      GROUP BY 1, 2),
             types AS (SELECT DISTINCT t
                       FROM (SELECT from_type AS t FROM tr
                             UNION ALL SELECT to_type FROM tr)),
             rt AS (SELECT ty.t,
                           COALESCE((SELECT CAST(SUM(n) AS BIGINT) FROM tr
                                     WHERE from_type = ty.t), 0) AS r
                    FROM types ty),
             es AS (SELECT tr.from_type AS f, tr.to_type AS t2,
                           CAST(tr.n AS HUGEINT) AS n, CAST(rt.r AS HUGEINT) AS r
                    FROM tr JOIN rt ON rt.t = tr.from_type WHERE rt.r > 0
                    UNION ALL
                    SELECT t, t, CAST(0 AS HUGEINT), CAST(1 AS HUGEINT) FROM types),
             v0 AS (SELECT t, CAST($MarkovScale AS HUGEINT) AS v FROM types),
             $steps
          SELECT f.t AS event_type, CAST(rt.r AS BIGINT) AS n_out,
                 CAST(f.v AS BIGINT) AS v_scaled,
                 ROUND(CAST(f.v AS DOUBLE)
                       / CAST(SUM(f.v) OVER () AS DOUBLE), 6) AS pi
          FROM v$MarkovIters f JOIN rt ON rt.t = f.t
          ORDER BY event_type"""
    })

  /** Explicit GROUPING SETS — the mixed lattice neither ROLLUP nor CUBE
    * expresses: the (type, day) detail plus BOTH one-dimensional
    * marginals, and no grand total. The DataFrame API only exposes
    * rollup/cube, so this routes through Spark SQL's GROUPING SETS —
    * which plans to the same ONE Expand + one hash-aggregate pass (3
    * replicas per row here), not per-set re-scans.
    */
  val eventsGroupingSets: CatalogEntry = CatalogEntry(
    "events_grouping_sets",
    (s, d) => {
      Tables.events(s, d).createOrReplaceTempView("events_gs_v")
      s.sql(
        """SELECT COALESCE(event_type, 'ALL') AS event_type,
                  COALESCE(CAST(DATE(ts) AS STRING), 'ALL') AS day,
                  COUNT(*) AS n,
                  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total,
                  CAST(GROUPING_ID(event_type, DATE(ts)) AS BIGINT) AS gid
           FROM events_gs_v
           GROUP BY GROUPING SETS ((event_type, DATE(ts)), (event_type), (DATE(ts)))""")
    },
    Some(s"""SELECT COALESCE(event_type, 'ALL') AS event_type,
                    COALESCE(CAST(CAST(ts AS DATE) AS VARCHAR), 'ALL') AS day,
                    COUNT(*) AS n,
                    ${sqlSum("value", 18, 4)} AS total,
                    CAST(GROUPING(event_type, CAST(ts AS DATE)) AS BIGINT) AS gid
             FROM events
             GROUP BY GROUPING SETS ((event_type, CAST(ts AS DATE)), (event_type), (CAST(ts AS DATE)))"""))

  /** 2-D Pareto frontier (skyline) of orders per priority class:
    * maximize price, minimize date — an order survives when no other
    * order in its class is both no-later AND no-cheaper (with one
    * strict). Computed WITHOUT the quadratic dominance self-join: sort
    * each class by date and compare every row against (a) the running
    * price max over STRICTLY earlier dates (RANGE … 1 PRECEDING) and
    * (b) its same-timestamp group max — two window passes over one
    * shuffle+sort per class. That is the skyline algorithm that holds at
    * 100 TB: cost is the sort, never |class|² pairs; co-equal rows
    * (same date, same price, both maximal) are all kept, so the result
    * is set-deterministic with no tie-break dependence.
    */
  val ordersParetoFrontier: CatalogEntry = CatalogEntry(
    "orders_pareto_frontier",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val o = Tables.load(s, d, "orders").select(
        col("o_orderkey"),
        col("o_orderpriority").as("priority"),
        unix_timestamp(col("o_orderdate")).as("od"),
        col("o_totalprice").as("price"))
      val earlier = Window.partitionBy("priority").orderBy("od")
        .rangeBetween(Window.unboundedPreceding, -1)
      val sameDay = Window.partitionBy("priority", "od")
      o.withColumn("m1", max(col("price")).over(earlier))
        .withColumn("m2", max(col("price")).over(sameDay))
        .where((col("m1").isNull || col("m1") < col("price")) &&
          col("m2") === col("price"))
        .select("o_orderkey", "priority", "od", "price")
    },
    Some("""SELECT o_orderkey, priority, od, price FROM (
              SELECT o_orderkey, o_orderpriority AS priority,
                     CAST(FLOOR(epoch(o_orderdate)) AS BIGINT) AS od,
                     o_totalprice AS price,
                     MAX(o_totalprice) OVER (
                       PARTITION BY o_orderpriority
                       ORDER BY CAST(FLOOR(epoch(o_orderdate)) AS BIGINT)
                       RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS m1,
                     MAX(o_totalprice) OVER (
                       PARTITION BY o_orderpriority,
                                    CAST(FLOOR(epoch(o_orderdate)) AS BIGINT)) AS m2
              FROM orders)
            WHERE (m1 IS NULL OR m1 < price) AND m2 = price"""))

  /** Revenue concentration per priority class: Gini coefficient + top-decile
    * share — the inequality statistics a mixing/billing dashboard reads.
    * Lorenz arithmetic needs each row's GLOBAL rank within its class, so the
    * plan is one shuffle+sort per class (row_number + windowed count share
    * the sort) followed by a tiny-key moment aggregate; at 100 TB the cost
    * is the per-class sort — there is no rank-free closed form for Gini.
    *
    * Exactness: rank·price moments accumulate in DECIMAL (rank is an exact
    * BIGINT, the scale-0 × scale-4 product is exact); Gini's closed form
    * G = (2·Σ rn·p − (n+1)·Σp) / (n·Σp) is then TWO exact decimals pushed
    * through the identical double expression in both engines, ROUND 6.
    */
  val ordersRevenueGini: CatalogEntry = CatalogEntry(
    "orders_revenue_gini",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.types.DecimalType
      val w = Window.partitionBy("priority").orderBy("price", "o_orderkey")
      val wp = Window.partitionBy("priority")
      val ranked = Tables.load(s, d, "orders")
        .select(col("o_orderpriority").as("priority"),
          col("o_totalprice").as("price"), col("o_orderkey"))
        .withColumn("rn", row_number().over(w).cast("long"))
        .withColumn("n", count(lit(1)).over(wp))
      val pd = col("price").cast(DecimalType(18, 4))
      val m = ranked.groupBy("priority").agg(
        max("n").as("n"),
        sum(pd).as("spd"),
        sum((col("rn").cast(DecimalType(18, 0)) * pd).cast(DecimalType(38, 4))).as("srpd"),
        sum(when(col("rn") > col("n") - floor(col("n") / lit(10.0)).cast("long"), pd)).as("sptopd"))
      val sp = col("spd").cast("double")
      val srp = col("srpd").cast("double")
      val sptop = col("sptopd").cast("double")
      m.select(col("priority"), col("n"),
        round((lit(2.0) * srp - (col("n") + 1).cast("double") * sp)
          / (col("n").cast("double") * sp), 6).as("gini"),
        round(sptop / sp, 6).as("top_decile_share"))
    },
    Some(s"""WITH r AS (SELECT o_orderpriority AS priority, o_totalprice AS price,
                               o_orderkey,
                               ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                                  ORDER BY o_totalprice, o_orderkey) AS rn,
                               COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
                        FROM orders),
                 m AS (SELECT priority, MAX(n) AS n,
                              SUM(CAST(price AS DECIMAL(18,4))) AS spd,
                              SUM(CAST(CAST(rn AS DECIMAL(18,0))
                                       * CAST(price AS DECIMAL(18,4)) AS DECIMAL(38,4))) AS srpd,
                              SUM(CASE WHEN rn > n - CAST(FLOOR(n / 10.0) AS BIGINT)
                                       THEN CAST(price AS DECIMAL(18,4)) END) AS sptopd
                       FROM r GROUP BY priority)
             SELECT priority, n,
                    ROUND((2.0 * ${Exact.sqlToDouble("srpd")}
                           - CAST(n + 1 AS DOUBLE) * ${Exact.sqlToDouble("spd")})
                          / (CAST(n AS DOUBLE) * ${Exact.sqlToDouble("spd")}), 6) AS gini,
                    ROUND(${Exact.sqlToDouble("sptopd")} / ${Exact.sqlToDouble("spd")}, 6)
                      AS top_decile_share
             FROM m"""))

  /** Rolling active users — DAU, trailing-7-day WAU, and stickiness
    * (DAU/WAU) per calendar day, all EXACT distinct counts. Rolling
    * COUNT(DISTINCT) does not decompose over a window (sets, not sums),
    * so the scalable shape is contribution explosion: dedup to
    * (user, active-day) pairs — the ONLY corpus-sized shuffle — then
    * each pair contributes to the 7 target days it keeps the user
    * "weekly active" for, and a second distinct collapses multi-day
    * users per target window. Work after dedup is bounded by
    * users × days × 7 (activity-grid-sized, not event-sized); no
    * quadratic day-range self-join, no HLL approximation (the
    * `events_approx_distinct` entry covers the sketch path; engagement
    * reporting wants the exact numbers). Stickiness divides two exact
    * longs — one correctly-rounded IEEE op, identical in both engines.
    */
  val eventsActiveUsers: CatalogEntry = CatalogEntry(
    "events_active_users",
    (s, d) => {
      // Day stays TIMESTAMP (midnight), not DATE: the driver compare
      // round-trips timestamps losslessly, while parquet DATE surfaces
      // as a python date object the hash layer cannot align with
      // DuckDB's datetime64 days.
      val daily = Tables.events(s, d)
        .select(col("user_id"), date_trunc("day", col("ts")).as("day"))
        .distinct()
      val contrib = daily
        .select(col("user_id"),
          explode(expr("sequence(day, day + interval 6 days, interval 1 day)"))
            .as("tday"))
        .distinct()
      val dau = daily.groupBy("day").agg(count(lit(1)).as("dau"))
      val wau = contrib.groupBy(col("tday").as("day"))
        .agg(count(lit(1)).as("wau"))
      dau.join(wau, Seq("day"))
        .select(col("day"), col("dau"), col("wau"),
          round(col("dau").cast("double") / col("wau"), 6).as("stickiness"))
        .orderBy("day")
    },
    Some("""WITH daily AS (SELECT DISTINCT user_id,
                                  date_trunc('day', ts) AS day
                           FROM events),
                 contrib AS (SELECT DISTINCT user_id,
                                    unnest(generate_series(
                                      day, day + INTERVAL '6 days',
                                      INTERVAL '1 day')) AS tday
                             FROM daily),
                 dau AS (SELECT day, CAST(COUNT(*) AS BIGINT) AS dau
                         FROM daily GROUP BY day),
                 wau AS (SELECT tday AS day, CAST(COUNT(*) AS BIGINT) AS wau
                         FROM contrib GROUP BY tday)
            SELECT d.day, d.dau, w.wau,
                   ROUND(CAST(d.dau AS DOUBLE) / w.wau, 6) AS stickiness
            FROM dau d JOIN wau w USING (day)
            ORDER BY d.day"""))

  /** RFM customer segmentation — the classic lifecycle-marketing cut:
    * per customer recency (days since last order, against the corpus
    * high-water date), frequency (order count), monetary (exact decimal
    * revenue), each quintile-scored 1–5 (5 = best), then a fixed
    * rule-ladder label (champion / loyal / big_spender / at_risk /
    * hibernating / casual — CASE order is the priority).
    *
    * Quintiles use the quality-tiers device: THREE
    * [[graft.operators.GlobalRank]] passes (range shuffle +
    * zipWithIndex, never a single-partition NTILE window) over the
    * customer-cardinality aggregate — each rank's total order pins ties
    * by custkey, and score = 5 − (rank−1)·5 div n is pure integer
    * arithmetic. The only corpus-sized work is the one orders→customer
    * aggregate; everything after is |customers|-sized. Monetary sums in
    * DECIMAL (exact, associative) and crosses engines through the
    * varchar-routed double cast (Exact).
    */
  val customerRfm: CatalogEntry = CatalogEntry(
    "customer_rfm",
    (s, d) => {
      val orders = Tables.load(s, d, "orders")
      val hiWater = orders.agg(max("o_orderdate").as("maxd"))
      // localCheckpoint AFTER the one corpus-sized aggregate: the three
      // GlobalRank passes each run an eager zipWithIndex job, and without
      // truncation every one of them (plus the final action) would replay
      // the orders shuffle — 4 corpus passes for a |customers|-sized
      // frame. Checkpointed, the ranks re-read ~|customers| rows.
      val base = orders
        .groupBy(col("o_custkey").as("c_custkey"))
        .agg(count(lit(1)).as("n_orders"), max("o_orderdate").as("lastd"),
          dsum(col("o_totalprice"), 18, 4).as("monetary"))
        .crossJoin(broadcast(hiWater))
        .select(col("c_custkey"), col("n_orders"),
          datediff(col("maxd"), col("lastd")).cast("long").as("recency_days"),
          col("monetary"))
        .localCheckpoint()
      val ranked = Seq[(String, Seq[org.apache.spark.sql.Column])](
        ("rr", Seq(col("recency_days").asc, col("c_custkey").asc)),
        ("fr", Seq(col("n_orders").desc, col("c_custkey").asc)),
        ("mr", Seq(col("monetary").desc, col("c_custkey").asc)))
        .foldLeft(base) { case (df, (rc, ord)) =>
          graft.operators.GlobalRank.withRank(df, ord,
            numPartitions = graft.operators.GlobalRank.sessionPartitions(df), rc)
        }
      val scored = ranked
        .crossJoin(broadcast(base.agg(count(lit(1)).as("nn"))))
        .select(col("c_custkey"), col("recency_days"), col("n_orders"),
          col("monetary"),
          expr("CAST(5 - ((rr - 1) * 5) DIV nn AS BIGINT)").as("r_score"),
          expr("CAST(5 - ((fr - 1) * 5) DIV nn AS BIGINT)").as("f_score"),
          expr("CAST(5 - ((mr - 1) * 5) DIV nn AS BIGINT)").as("m_score"))
      scored
        .withColumn("segment",
          when(col("r_score") >= 4 && col("f_score") >= 4 && col("m_score") >= 4,
            "champion")
            .when(col("f_score") >= 4, "loyal")
            .when(col("m_score") >= 4, "big_spender")
            .when(col("r_score") <= 2 && col("f_score") >= 3, "at_risk")
            .when(col("r_score") <= 2, "hibernating")
            .otherwise("casual"))
        .orderBy("c_custkey")
    },
    Some(s"""WITH base AS (SELECT o_custkey AS c_custkey,
                    CAST(COUNT(*) AS BIGINT) AS n_orders,
                    CAST(date_diff('day', MAX(o_orderdate),
                                   (SELECT MAX(o_orderdate) FROM orders)) AS BIGINT)
                      AS recency_days,
                    ${sqlSum("o_totalprice", 18, 4)} AS monetary
             FROM orders GROUP BY 1),
             n AS (SELECT CAST(COUNT(*) AS BIGINT) AS nn FROM base),
             rk AS (SELECT b.*, nn,
                    ROW_NUMBER() OVER (ORDER BY recency_days ASC, c_custkey) AS rr,
                    ROW_NUMBER() OVER (ORDER BY n_orders DESC, c_custkey) AS fr,
                    ROW_NUMBER() OVER (ORDER BY monetary DESC, c_custkey) AS mr
                    FROM base b CROSS JOIN n)
           SELECT c_custkey, recency_days, n_orders, monetary,
                  CAST(5 - ((rr-1)*5)//nn AS BIGINT) AS r_score,
                  CAST(5 - ((fr-1)*5)//nn AS BIGINT) AS f_score,
                  CAST(5 - ((mr-1)*5)//nn AS BIGINT) AS m_score,
                  CASE WHEN 5-((rr-1)*5)//nn >= 4 AND 5-((fr-1)*5)//nn >= 4
                            AND 5-((mr-1)*5)//nn >= 4 THEN 'champion'
                       WHEN 5-((fr-1)*5)//nn >= 4 THEN 'loyal'
                       WHEN 5-((mr-1)*5)//nn >= 4 THEN 'big_spender'
                       WHEN 5-((rr-1)*5)//nn <= 2 AND 5-((fr-1)*5)//nn >= 3 THEN 'at_risk'
                       WHEN 5-((rr-1)*5)//nn <= 2 THEN 'hibernating'
                       ELSE 'casual' END AS segment
           FROM rk ORDER BY c_custkey"""))

  /** Cohort LTV triangle — the revenue-weighted sibling of
    * `events_retention`: customers grouped by FIRST-order month, revenue
    * accumulated by months-since-acquisition, reported as cumulative
    * lifetime value per cohort member. Reads as: "the 1995-03 cohort was
    * worth X/customer by month 6".
    *
    * Exactness: revenue sums in DECIMAL end-to-end — including the
    * RUNNING sum, a window over exact decimals (associative, order-free)
    * — and each (cum, per-customer) pair converts once through the
    * Exact varchar-routed double cast, then ONE division by the integer
    * cohort size. Month index is integer year/month arithmetic, immune
    * to months_between's fractional-day semantics.
    *
    * Shape: one customer-keyed aggregate finds cohorts (corpus-sized,
    * map-combined), one (cohort, month) aggregate collapses to
    * calendar² rows, and the running window partitions by cohort —
    * state ∝ months, never orders. Cohort sizes ride a broadcast join.
    */
  val ordersCohortLtv: CatalogEntry = CatalogEntry(
    "orders_cohort_ltv",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val orders = Tables.load(s, d, "orders")
      val firsts = orders.groupBy(col("o_custkey"))
        .agg(date_trunc("month", min("o_orderdate")).as("cohort_month"))
      val sizes = firsts.groupBy("cohort_month")
        .agg(count(lit(1)).as("cohort_size"))
      val monthly = orders.join(firsts, Seq("o_custkey"))
        .withColumn("om", date_trunc("month", col("o_orderdate")))
        .withColumn("month_index",
          expr("""CAST((year(om) * 12 + month(om))
                  - (year(cohort_month) * 12 + month(cohort_month)) AS BIGINT)"""))
        .groupBy("cohort_month", "month_index")
        .agg(sum(col("o_totalprice").cast(DecimalType(18, 4))).as("rev_dec"))
      val w = Window.partitionBy("cohort_month").orderBy("month_index")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      monthly
        .withColumn("cum_dec", sum(col("rev_dec")).over(w))
        .join(broadcast(sizes), Seq("cohort_month"))
        .select(col("cohort_month"), col("month_index"), col("cohort_size"),
          col("rev_dec").cast("double").as("period_rev"),
          col("cum_dec").cast("double").as("cum_rev"),
          round(col("cum_dec").cast("double") / col("cohort_size"), 6)
            .as("ltv_per_customer"))
        .orderBy("cohort_month", "month_index")
    },
    Some("""WITH firsts AS (SELECT o_custkey,
                                   date_trunc('month', MIN(o_orderdate)) AS cohort_month
                            FROM orders GROUP BY 1),
                 sizes AS (SELECT cohort_month, CAST(COUNT(*) AS BIGINT) AS cohort_size
                           FROM firsts GROUP BY 1),
                 monthly AS (SELECT f.cohort_month,
                                    CAST((year(date_trunc('month', o.o_orderdate)) * 12
                                          + month(date_trunc('month', o.o_orderdate)))
                                         - (year(f.cohort_month) * 12
                                            + month(f.cohort_month)) AS BIGINT)
                                      AS month_index,
                                    SUM(CAST(o.o_totalprice AS DECIMAL(18,4))) AS rev_dec
                             FROM orders o JOIN firsts f USING (o_custkey)
                             GROUP BY 1, 2),
                 cum AS (SELECT cohort_month, month_index, rev_dec,
                                SUM(rev_dec) OVER (PARTITION BY cohort_month
                                                   ORDER BY month_index
                                                   ROWS UNBOUNDED PRECEDING) AS cum_dec
                         FROM monthly)
            SELECT c.cohort_month, c.month_index, s.cohort_size,
                   CAST(CAST(c.rev_dec AS VARCHAR) AS DOUBLE) AS period_rev,
                   CAST(CAST(c.cum_dec AS VARCHAR) AS DOUBLE) AS cum_rev,
                   ROUND(CAST(CAST(c.cum_dec AS VARCHAR) AS DOUBLE) / s.cohort_size, 6)
                     AS ltv_per_customer
            FROM cum c JOIN sizes s USING (cohort_month)
            ORDER BY c.cohort_month, c.month_index"""))

  /** Peak concurrent sessions per day — the capacity-planning metric
    * ("how many users were on at once, and when") computed EXACTLY by a
    * sweep line over session intervals: +1 at each session start, −1 one
    * second after its inclusive end, concurrency = prefix sum of the
    * deltas in time order, peak = the day's max with `first_peak_s` the
    * earliest second attaining it (struct-free argmin: a day-level join
    * against the day's peak).
    *
    * The global prefix sum is decomposed scan-style so NO global window
    * exists (the PlanLint hard rule): deltas aggregate per second, the
    * running sum partitions BY UTC DAY (epoch-day integer division —
    * timezone-free and identical in both engines), and each day's
    * carry-in is the triangular join over the #days-sized daily-total
    * frame — the same two-level trick a 1000-executor scan uses
    * (per-partition prefix + broadcast partition offsets), expressed
    * relationally. Days with no sweep point are absent by definition
    * (their concurrency is constant; nothing peaks). Sessions reuse the
    * `user_sessions` gaps-and-islands device (same 30-min gap, same
    * tie-break), windows partitioned per user.
    */
  val peakConcurrency: CatalogEntry = CatalogEntry(
    "user_peak_concurrency",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy("tss", "event_id")
      val gapS = 1800L
      val iv = Tables.events(s, d)
        .select(col("user_id"), col("event_id"), unix_timestamp(col("ts")).as("tss"))
        .withColumn("new_s",
          when(lag("tss", 1).over(w).isNull ||
            col("tss") - lag("tss", 1).over(w) > gapS, 1L).otherwise(0L))
        .withColumn("sid", sum("new_s").over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy("user_id", "sid")
        .agg(min("tss").as("st"), max("tss").as("en"))
      val del = iv.select(col("st").as("t"), lit(1L).as("d"))
        .unionByName(iv.select((col("en") + 1).as("t"), lit(-1L).as("d")))
        .groupBy("t").agg(sum("d").as("d"))
        .withColumn("day_idx", expr("t div 86400"))
      val run0 = del.withColumn("run", sum("d").over(
        Window.partitionBy("day_idx").orderBy("t")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val tot = del.groupBy("day_idx").agg(sum("d").as("td")).localCheckpoint()
      val carry = tot.as("a")
        .join(broadcast(tot.as("b")), col("b.day_idx") < col("a.day_idx"), "left")
        .groupBy(col("a.day_idx").as("day_idx"))
        .agg(coalesce(sum(col("b.td")), lit(0L)).as("c"))
      val r = run0.join(broadcast(carry), Seq("day_idx"))
        .select(col("day_idx"), col("t"), (col("run") + col("c")).as("run"))
        .localCheckpoint()
      val peak = r.groupBy("day_idx").agg(max("run").as("peak_sessions"))
      val first = r.as("rr").join(broadcast(peak.as("pk")),
          col("rr.day_idx") === col("pk.day_idx") &&
            col("rr.run") === col("pk.peak_sessions"))
        .groupBy(col("rr.day_idx").as("day_idx"))
        .agg(min("t").as("first_peak_s"))
      // Day stays TIMESTAMP (midnight UTC), the events_active_users
      // convention — parquet DATE surfaces as a python date object the
      // driver's hash layer cannot align with DuckDB's datetime64.
      peak.join(broadcast(first), Seq("day_idx"))
        .select(timestamp_seconds(col("day_idx") * 86400).as("day"),
          col("peak_sessions"), col("first_peak_s"))
    },
    Some("""WITH base AS (SELECT user_id, event_id,
                                 CAST(FLOOR(epoch(ts)) AS BIGINT) AS tss FROM events),
                 flags AS (SELECT user_id, event_id, tss,
                                  CASE WHEN lag(tss) OVER w IS NULL
                                            OR tss - lag(tss) OVER w > 1800
                                       THEN 1 ELSE 0 END AS new_s
                           FROM base
                           WINDOW w AS (PARTITION BY user_id ORDER BY tss, event_id)),
                 sess AS (SELECT user_id, tss,
                                 SUM(new_s) OVER (PARTITION BY user_id
                                                  ORDER BY tss, event_id
                                                  ROWS UNBOUNDED PRECEDING) AS sid
                          FROM flags),
                 iv AS (SELECT user_id, sid, MIN(tss) AS st, MAX(tss) AS en
                        FROM sess GROUP BY user_id, sid),
                 pts AS (SELECT st AS t, CAST(1 AS BIGINT) AS d FROM iv
                         UNION ALL SELECT en + 1, CAST(-1 AS BIGINT) FROM iv),
                 del AS (SELECT t, CAST(SUM(d) AS BIGINT) AS d, t // 86400 AS day_idx
                         FROM pts GROUP BY t),
                 run0 AS (SELECT day_idx, t, d,
                                 SUM(d) OVER (PARTITION BY day_idx ORDER BY t
                                              ROWS UNBOUNDED PRECEDING) AS run
                          FROM del),
                 tot AS (SELECT day_idx, CAST(SUM(d) AS BIGINT) AS td
                         FROM del GROUP BY day_idx),
                 carry AS (SELECT a.day_idx, CAST(COALESCE(SUM(b.td), 0) AS BIGINT) AS c
                           FROM tot a LEFT JOIN tot b ON b.day_idx < a.day_idx
                           GROUP BY a.day_idx),
                 r AS (SELECT run0.day_idx, t, run + c AS run
                       FROM run0 JOIN carry USING (day_idx)),
                 peak AS (SELECT day_idx, CAST(MAX(run) AS BIGINT) AS peak_sessions
                          FROM r GROUP BY day_idx),
                 frst AS (SELECT r.day_idx, MIN(t) AS first_peak_s
                          FROM r JOIN peak ON peak.day_idx = r.day_idx
                                          AND r.run = peak.peak_sessions
                          GROUP BY r.day_idx)
            SELECT make_timestamp(p.day_idx * 86400 * 1000000) AS day,
                   p.peak_sessions, f.first_peak_s
            FROM peak p JOIN frst f ON f.day_idx = p.day_idx"""))

  /** Sequential-pattern mining over user event streams, restricted to
    * CONTIGUOUS length-3 type sequences — the restriction is the scale
    * design: general subsequence support (PrefixSpan/SPAM) is
    * combinatorial in stream length, while contiguous n-grams cost one
    * lead-window pass, LINEAR in events. Support counts DISTINCT users
    * (a loop-happy user must not dominate the ranking), so the pipeline
    * is window → per-user distinct → types³-bounded aggregate → global
    * top-10 (TakeOrdered, never a full sort), ties broken
    * lexicographically.
    */
  val eventsSeqTrigrams: CatalogEntry = CatalogEntry(
    "events_seq_trigrams",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      Tables.events(s, d)
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
        .withColumn("t2", lead("event_type", 1).over(w))
        .withColumn("t3", lead("event_type", 2).over(w))
        .filter(col("t3").isNotNull)
        .select(col("user_id"), col("event_type").as("t1"), col("t2"), col("t3"))
        .distinct()
        .groupBy("t1", "t2", "t3").agg(count(lit(1)).as("support"))
        .orderBy(col("support").desc, col("t1"), col("t2"), col("t3"))
        .limit(10)
    },
    Some("""WITH tri AS (
              SELECT DISTINCT user_id, t1, t2, t3 FROM (
                SELECT user_id, event_type AS t1,
                       lead(event_type, 1) OVER (PARTITION BY user_id
                         ORDER BY ts, event_id) AS t2,
                       lead(event_type, 2) OVER (PARTITION BY user_id
                         ORDER BY ts, event_id) AS t3
                FROM events)
              WHERE t3 IS NOT NULL)
            SELECT t1, t2, t3, COUNT(*) AS support
            FROM tri GROUP BY t1, t2, t3
            ORDER BY support DESC, t1, t2, t3 LIMIT 10"""))

  /** Inter-purchase cadence per market segment: exact percentiles of the
    * per-customer day gaps between consecutive orders — the
    * replenishment-cycle report behind churn alarms ("customer is 2×
    * past their segment's p90 gap") and demand forecasting. Gap values
    * depend only on each customer's sorted date multiset, so the
    * (o_orderdate, o_orderkey) tie-break pins plan determinism without
    * affecting the statistics.
    *
    * Scale: ONE custkey-keyed shuffle serves both the lag window and the
    * segment join (same key — the join reuses the window's
    * partitioning rather than re-shuffling the gap rows); the aggregate
    * has 5 groups. Exact `percentile` holds because per-GROUP data is
    * segment-sized; the sketch swap at extreme scale is the
    * `value_p90_sketch` device, already in the catalog.
    */
  val customerOrderGaps: CatalogEntry = CatalogEntry(
    "customer_order_gaps",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
      val gaps = Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderdate"), col("o_orderkey"))
        .withColumn("prev", lag("o_orderdate", 1).over(w))
        .filter(col("prev").isNotNull)
        .select(col("o_custkey"),
          datediff(col("o_orderdate").cast("date"), col("prev").cast("date"))
            .cast("long").as("gap_days"))
      val seg = Tables.customer(s, d)
        .select(col("c_custkey").as("o_custkey"), col("c_mktsegment").as("segment"))
      gaps.join(seg, Seq("o_custkey"))
        .groupBy("segment")
        .agg(count(lit(1)).as("n_gaps"),
          min("gap_days").as("min_gap"),
          round(expr("percentile(gap_days, 0.5)"), 6).as("median_gap"),
          round(expr("percentile(gap_days, 0.9)"), 6).as("p90_gap"),
          max("gap_days").as("max_gap"))
        .orderBy("segment")
    },
    Some("""WITH g AS (SELECT o_custkey,
                              date_diff('day',
                                CAST(lag(o_orderdate) OVER (PARTITION BY o_custkey
                                  ORDER BY o_orderdate, o_orderkey) AS DATE),
                                CAST(o_orderdate AS DATE)) AS gap_days
                       FROM orders),
                 sg AS (SELECT c.c_mktsegment AS segment, gap_days
                        FROM g JOIN customer c ON c.c_custkey = g.o_custkey
                        WHERE gap_days IS NOT NULL)
            SELECT segment, COUNT(*) AS n_gaps,
                   MIN(gap_days) AS min_gap,
                   ROUND(quantile_cont(gap_days, 0.5), 6) AS median_gap,
                   ROUND(quantile_cont(gap_days, 0.9), 6) AS p90_gap,
                   MAX(gap_days) AS max_gap
            FROM sg GROUP BY segment ORDER BY segment"""))

  /** Incremental view maintenance: yesterday's materialized aggregate
    * plus today's delta, merged — NOT recomputed. The base/delta split
    * is a deterministic salted key hash (the split-assign device:
    * content-stable, so "the base" is the same set on every run); both
    * sides aggregate to (status, priority) groups with count + exact
    * DECIMAL revenue — the self-maintainable aggregate pair (counts and
    * decimal sums merge associatively with no error term; an AVG or
    * stddev view maintains its (sum, count) / (sum, sum², count)
    * moments the same way) — and the merge is a groups-keyed full-outer
    * join with coalesce-to-zero. The oracle is the FULL recompute over
    * the undivided table: hash equality proves merge(base, delta) ≡
    * recompute bit-for-bit, decimals staying decimal until the one
    * closing double cast.
    *
    * At 100 TB this is the nightly-pipeline economics: the delta scan is
    * day-sized, the merge is view-sized (groups, not rows), and the base
    * is READ, not rescanned — here the base aggregate is recomputed only
    * to keep the entry self-contained on the driver's tables (the
    * heavy-hitter rescan discipline).
    */
  val ordersRollupIncremental: CatalogEntry = CatalogEntry(
    "orders_rollup_incremental",
    (s, d) => {
      val o = Tables.load(s, d, "orders")
      val isDelta =
        substring(md5(concat(lit("ivm|"), col("o_orderkey").cast("string"))), 1, 2) >= "e6"
      def view(df: org.apache.spark.sql.DataFrame) =
        df.groupBy("o_orderstatus", "o_orderpriority")
          .agg(count(lit(1)).as("n"),
            sum(col("o_totalprice").cast(DecimalType(18, 4))).as("total"))
      val base = view(o.filter(!isDelta))
      val delta = view(o.filter(isDelta))
      base.select(col("o_orderstatus"), col("o_orderpriority"),
          col("n").as("bn"), col("total").as("bt"))
        .join(delta.select(col("o_orderstatus"), col("o_orderpriority"),
          col("n").as("dn"), col("total").as("dt")),
          Seq("o_orderstatus", "o_orderpriority"), "full_outer")
        .select(col("o_orderstatus"), col("o_orderpriority"),
          (coalesce(col("bn"), lit(0L)) + coalesce(col("dn"), lit(0L))).as("n"),
          (coalesce(col("bt"), lit(0).cast(DecimalType(18, 4)))
            + coalesce(col("dt"), lit(0).cast(DecimalType(18, 4))))
            .cast("double").as("total"))
        .orderBy("o_orderstatus", "o_orderpriority")
    },
    Some(s"""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
                    ${sqlSum("o_totalprice", 18, 4)} AS total
             FROM orders GROUP BY 1, 2 ORDER BY 1, 2"""))

  /** Kaplan–Meier survival curve for time-from-signup-to-first-purchase
    * (right-censored at the corpus horizon) — the product-analytics
    * estimator behind "how long until users convert", done properly:
    * users who never purchase are CENSORED at the last observed
    * timestamp, not dropped (dropping them biases conversion time low —
    * the mistake the estimator exists to fix). Standard convention:
    * deaths at duration d precede censorings at d, so the at-risk set
    * at d includes same-day leavers.
    *
    * Determinism and scale share one device: the per-duration
    * (deaths, leaving) table is DAY-bounded, so at-risk counts come
    * from a bounded `dur < dur` self-join (broadcast-declared, the
    * peak-concurrency day-frame pattern — never a global rank window,
    * PlanLint's hard rule) and the running product
    * S(d) = Π (1 − deaths/at_risk) folds a duration-SORTED factor list
    * per output row — the labelCentroids ordered-fold pattern. Both
    * engines execute the identical multiply sequence on factors derived
    * from exact integers, so the unrounded product is bit-identical and
    * rounding happens once per emitted row. (A single struct-state fold
    * would be tighter, but DuckDB 1.0 drops list-valued struct fields
    * across list_reduce iterations — measured; the per-row sorted-list
    * fold sidesteps the bug and stays day²-bounded.) Corpus-side work
    * is two event-type filtered aggregates and one user-keyed left
    * join; everything after is day-bounded.
    */
  val userSurvivalKm: CatalogEntry = CatalogEntry(
    "user_survival_km",
    (s, d) => {
      val ev = Tables.events(s, d)
      val su = ev.filter(col("event_type") === "signup")
        .groupBy("user_id").agg(min("ts").as("signup"))
      val fp = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts").as("pts"))
        .join(su, Seq("user_id"))
        .filter(col("pts") >= col("signup"))
        .groupBy("user_id").agg(min("pts").as("purchase"))
      val mx = ev.agg(max(col("ts")).as("mx"))
      val durs = su.join(fp, Seq("user_id"), "left").crossJoin(broadcast(mx))
        .select(
          when(col("purchase").isNotNull,
            datediff(col("purchase").cast("date"), col("signup").cast("date")))
            .otherwise(datediff(col("mx").cast("date"), col("signup").cast("date")))
            .cast("long").as("dur"),
          col("purchase").isNotNull.as("observed"))
      val byDur = durs.groupBy("dur").agg(
        sum(when(col("observed"), 1L).otherwise(0L)).as("deaths"),
        count(lit(1)).as("leaving"))
        .localCheckpoint(eager = true)
      val tot = byDur.agg(sum("leaving").as("n0"))
      // at_risk(d) = everyone still unresolved at d = n0 − Σ leaving(d' < d).
      val atRisk = byDur.as("a")
        .join(broadcast(byDur.select(col("dur").as("bd"), col("leaving").as("bl"))),
          col("bd") < col("a.dur"), "left")
        .groupBy(col("a.dur").as("dur"), col("a.deaths").as("deaths"))
        .agg(sum(coalesce(col("bl"), lit(0L))).as("gone"))
        .crossJoin(broadcast(tot))
        .select(col("dur"), col("deaths"),
          (col("n0") - coalesce(col("gone"), lit(0L))).as("at_risk"))
        .filter(col("deaths") > 0)
        .select(col("dur"), col("at_risk"), col("deaths"),
          (lit(1.0) - col("deaths").cast("double") / col("at_risk").cast("double"))
            .as("factor"))
        .localCheckpoint(eager = true)
      // S(d): fold the dur-sorted factors of every event day ≤ d.
      atRisk.as("x")
        .join(broadcast(atRisk.select(col("dur").as("yd"), col("factor").as("yf"))),
          col("yd") <= col("x.dur"))
        .groupBy(col("x.dur").as("dur"), col("x.at_risk").as("at_risk"),
          col("x.deaths").as("deaths"))
        .agg(sort_array(collect_list(struct(col("yd"), col("yf")))).as("fs"))
        .select(col("dur"), col("at_risk"), col("deaths"),
          round(aggregate(col("fs"), lit(1.0),
            (acc, f) => acc * f.getField("yf")), 6).as("survival"))
        .orderBy("dur")
    },
    Some("""WITH su AS (SELECT user_id, MIN(ts) AS signup FROM events
                        WHERE event_type = 'signup' GROUP BY 1),
                 fp AS (SELECT e.user_id, MIN(e.ts) AS purchase
                        FROM events e JOIN su ON su.user_id = e.user_id
                        WHERE e.event_type = 'purchase' AND e.ts >= su.signup
                        GROUP BY 1),
                 mx AS (SELECT MAX(ts) AS mx FROM events),
                 durs AS (SELECT CAST(CASE WHEN fp.purchase IS NOT NULL
                                 THEN date_diff('day', CAST(su.signup AS DATE),
                                                CAST(fp.purchase AS DATE))
                                 ELSE date_diff('day', CAST(su.signup AS DATE),
                                                CAST(mx.mx AS DATE)) END AS BIGINT) AS dur,
                                 fp.purchase IS NOT NULL AS observed
                          FROM su LEFT JOIN fp ON fp.user_id = su.user_id CROSS JOIN mx),
                 bd AS (SELECT dur,
                               CAST(SUM(CASE WHEN observed THEN 1 ELSE 0 END) AS BIGINT) AS deaths,
                               CAST(COUNT(*) AS BIGINT) AS leaving
                        FROM durs GROUP BY dur),
                 ar AS (SELECT a.dur, a.deaths,
                               (SELECT CAST(SUM(leaving) AS BIGINT) FROM bd)
                                 - COALESCE(CAST(SUM(b.leaving) AS BIGINT), 0) AS at_risk
                        FROM bd a LEFT JOIN bd b ON b.dur < a.dur
                        GROUP BY a.dur, a.deaths),
                 f AS (SELECT dur, at_risk, deaths,
                              CAST(1.0 AS DOUBLE)
                                - CAST(deaths AS DOUBLE) / CAST(at_risk AS DOUBLE) AS factor
                       FROM ar WHERE deaths > 0)
            SELECT x.dur, x.at_risk, x.deaths,
                   ROUND(list_reduce(
                     list_prepend(CAST(1.0 AS DOUBLE),
                       (SELECT list(y.factor ORDER BY y.dur) FROM f y
                        WHERE y.dur <= x.dur)),
                     (acc, v) -> acc * v), 6) AS survival
            FROM f x ORDER BY x.dur"""))

  /** The pooled two-proportion z statistic — ONE text, interpolated into
    * both the Spark expr and the oracle so the op sequence cannot drift;
    * every literal carries an explicit DOUBLE cast (DuckDB parses bare
    * `1.0` as DECIMAL, Spark as its own decimal — the cast pins both).
    */
  private val abZExpr =
    """(CAST(c_a AS DOUBLE) / n_a - CAST(c_b AS DOUBLE) / n_b) /
       sqrt((CAST(c_a + c_b AS DOUBLE) / (n_a + n_b))
            * (CAST(1.0 AS DOUBLE) - CAST(c_a + c_b AS DOUBLE) / (n_a + n_b))
            * (CAST(1.0 AS DOUBLE) / n_a + CAST(1.0 AS DOUBLE) / n_b))"""

  /** A/B experiment readout: users assigned to arms by salted id hash
    * (deterministic, re-runnable — the split-assign device; an arm
    * column would normally come from the experiment service), the
    * conversion metric is time-bounded — "first purchase within one day
    * of the user's first activity" (an ever-converted flag saturates to
    * 100% on a long-enough stream and degenerates the variance; bounded
    * conversion is what experiments actually measure) — and the
    * comparison ships as the pooled two-proportion z STATISTIC,
    * deliberately not a p-value: the normal CDF is a transcendental
    * whose last bit differs across engines, while z is one fixed
    * divide/sqrt sequence over exact counts (the file-wide
    * ln()-avoidance discipline; the analyst thresholds z at 1.96
    * exactly as they would p at 0.05). A zero pooled variance (all or
    * none converted) yields NULL, the statistic's honest value there.
    *
    * Shape: two user-keyed min-aggregates, a broadcast-sized left join,
    * a 2-group aggregate, and a 1-row conditional pivot — nothing
    * scales with event volume but the per-user mins.
    */
  val eventsAbTest: CatalogEntry = CatalogEntry(
    "events_ab_test",
    (s, d) => {
      val ev = Tables.events(s, d)
      val firsts = ev.groupBy("user_id").agg(min("ts").as("first_ts"))
      val firstP = ev.filter(col("event_type") === "purchase")
        .groupBy("user_id").agg(min("ts").as("first_p"))
      firsts.join(firstP, Seq("user_id"), "left")
        .select(
          when(substring(md5(concat(lit("ab|"), col("user_id").cast("string"))), 1, 1)
            .isin("0", "1", "2", "3", "4", "5", "6", "7"), "A")
            .otherwise("B").as("arm"),
          when(col("first_p").isNotNull &&
            col("first_p") <= col("first_ts") + expr("INTERVAL 1 DAY"), 1L)
            .otherwise(0L).as("converted"))
        .groupBy("arm").agg(count(lit(1)).as("n"), sum(col("converted")).as("c"))
        .agg(
          max(when(col("arm") === "A", col("n"))).as("n_a"),
          max(when(col("arm") === "A", col("c"))).as("c_a"),
          max(when(col("arm") === "B", col("n"))).as("n_b"),
          max(when(col("arm") === "B", col("c"))).as("c_b"))
        .select(col("n_a"), col("c_a"), col("n_b"), col("c_b"),
          round(col("c_a").cast("double") / col("n_a"), 6).as("rate_a"),
          round(col("c_b").cast("double") / col("n_b"), 6).as("rate_b"),
          round(expr(s"CASE WHEN c_a + c_b > 0 AND c_a + c_b < n_a + n_b THEN $abZExpr END"), 6)
            .as("z"))
    },
    Some(s"""WITH firsts AS (SELECT user_id, MIN(ts) AS first_ts FROM events GROUP BY 1),
                 fp AS (SELECT user_id, MIN(ts) AS first_p FROM events
                        WHERE event_type = 'purchase' GROUP BY 1),
                 flags AS (SELECT
                    CASE WHEN substr(md5('ab|' || CAST(f.user_id AS VARCHAR)), 1, 1)
                              IN ('0','1','2','3','4','5','6','7')
                         THEN 'A' ELSE 'B' END AS arm,
                    CASE WHEN fp.first_p IS NOT NULL
                              AND fp.first_p <= f.first_ts + INTERVAL 1 DAY
                         THEN 1 ELSE 0 END AS converted
                  FROM firsts f LEFT JOIN fp ON fp.user_id = f.user_id),
                 per AS (SELECT arm, CAST(COUNT(*) AS BIGINT) AS n,
                                CAST(SUM(converted) AS BIGINT) AS c
                         FROM flags GROUP BY arm),
                 wide AS (SELECT MAX(CASE WHEN arm = 'A' THEN n END) AS n_a,
                                 MAX(CASE WHEN arm = 'A' THEN c END) AS c_a,
                                 MAX(CASE WHEN arm = 'B' THEN n END) AS n_b,
                                 MAX(CASE WHEN arm = 'B' THEN c END) AS c_b
                          FROM per)
             SELECT n_a, c_a, n_b, c_b,
                    ROUND(CAST(c_a AS DOUBLE) / n_a, 6) AS rate_a,
                    ROUND(CAST(c_b AS DOUBLE) / n_b, 6) AS rate_b,
                    ROUND(CASE WHEN c_a + c_b > 0 AND c_a + c_b < n_a + n_b
                               THEN $abZExpr END, 6) AS z
             FROM wide"""))

  /** Day-of-week seasonality index per event type: the mean value each
    * ISO weekday runs relative to the type's overall mean — the
    * calendar profile behind staffing/alerting baselines ("Mondays run
    * 1.3× on purchases") and the denominator a seasonal anomaly monitor
    * normalizes by before flagging. ISO weekday deliberately: Spark's
    * `dayofweek` is Sunday-1 while DuckDB's `dayofweek` is Sunday-0 —
    * `weekday(ts)+1` / `isodow(ts)` agree (Monday=1).
    *
    * Exactness: values snap to DECIMAL(18,4) before ANY sum; type
    * totals re-aggregate the per-(type,dow) DECIMAL sums (never a
    * second corpus pass), and each mean/ratio is a fixed two-division
    * IEEE sequence off decimal-exact numerators (the varchar-routed
    * decimal→double cast on the oracle side, the Exact device). One
    * corpus aggregate (the checkpoint boundary), then type×7-bounded
    * work.
    */
  val eventsDowSeasonality: CatalogEntry = CatalogEntry(
    "events_dow_seasonality",
    (s, d) => {
      val per = Tables.events(s, d)
        .select(col("event_type"), expr("weekday(ts) + 1").as("dow"),
          col("value").cast(DecimalType(18, 4)).as("dv"))
        .groupBy("event_type", "dow")
        .agg(count(lit(1)).as("n"), sum("dv").as("sd"))
        .localCheckpoint(eager = true)
      val tot = per.groupBy("event_type")
        .agg(sum("n").as("nt"), sum("sd").as("st"))
      per.join(broadcast(tot), Seq("event_type"))
        .select(col("event_type"), col("dow").cast("long").as("dow"), col("n"),
          round(col("sd").cast("double") / col("n"), 6).as("dow_mean"),
          round((col("sd").cast("double") / col("n"))
            / (col("st").cast("double") / col("nt")), 6).as("seasonality"))
        .orderBy("event_type", "dow")
    },
    Some(s"""WITH per AS (SELECT event_type, isodow(ts) AS dow,
                                 CAST(COUNT(*) AS BIGINT) AS n,
                                 SUM(CAST(value AS DECIMAL(18,4))) AS sd
                          FROM events GROUP BY 1, 2),
                  tot AS (SELECT event_type, CAST(SUM(n) AS BIGINT) AS nt,
                                 SUM(sd) AS st
                          FROM per GROUP BY 1)
             SELECT per.event_type, CAST(per.dow AS BIGINT) AS dow, per.n,
                    ROUND(${sqlToDouble("sd")} / n, 6) AS dow_mean,
                    ROUND((${sqlToDouble("sd")} / n) / (${sqlToDouble("st")} / nt), 6)
                      AS seasonality
             FROM per JOIN tot USING (event_type)
             ORDER BY event_type, dow"""))

  /** Ingest-completeness gate (the data-contract check a pipeline runs
    * before trusting a day's partition): per calendar day, event volume
    * and the number of DISTINCT hours with any data — a day missing
    * hours means a collector outage or a late partition, and downstream
    * aggregates over it silently under-report. One day-keyed aggregate;
    * the hour set per group is ≤ 24, so the distinct count is
    * constant-bounded per group. (Missing WHOLE days need a calendar
    * spine anti join — day-bounded, the KM at-risk device — left to the
    * alerting layer, which knows the expected range.)
    */
  val eventsCompleteDays: CatalogEntry = CatalogEntry(
    "events_complete_days",
    (s, d) => Tables.events(s, d)
      .select(date_format(col("ts"), "yyyy-MM-dd").as("day"), hour(col("ts")).as("hr"))
      .groupBy("day")
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("hr")).as("hours_present"))
      .select(col("day"), col("n_events"), col("hours_present"),
        (col("hours_present") === 24).as("complete"))
      .orderBy("day"),
    Some("""SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
                   COUNT(*) AS n_events,
                   CAST(COUNT(DISTINCT EXTRACT(hour FROM ts)) AS BIGINT) AS hours_present,
                   COUNT(DISTINCT EXTRACT(hour FROM ts)) = 24 AS complete
            FROM events GROUP BY 1 ORDER BY 1"""))

  /** The churn-model feature store — ONE wide per-customer frame
    * materialized from the catalog's own operators (the feature-store
    * pattern: features are computed once, versioned, and served to
    * every model, never re-derived ad hoc per notebook): the RFM block
    * ([[customerRfm]] composed verbatim, oracle included — scores,
    * recency, monetary, behavioural segment), the purchase-cadence
    * block (tenure span and exact mean inter-order gap; NULL on
    * single-order customers — "unknown cadence" must stay distinct from
    * "zero-day cadence"), and the static dimension (market segment).
    * Mean gap = tenure/(n−1) exactly, since per-customer gaps telescope
    * — one aggregate, no window, no per-pair work.
    *
    * Shape: everything is custkey-keyed — the RFM pipeline's own cost
    * plus one orders aggregate and two hash joins on the same key; the
    * output is customer-sized, the serving table a training run
    * snapshots.
    */
  val customerFeatureStore: CatalogEntry = CatalogEntry(
    "customer_feature_store",
    (s, d) => {
      val rfm = customerRfm.build(s, d)
      val span = Tables.load(s, d, "orders")
        .groupBy(col("o_custkey").as("c_custkey"))
        .agg(min(col("o_orderdate").cast("date")).as("first_d"),
          max(col("o_orderdate").cast("date")).as("last_d"),
          count(lit(1)).as("n_o"))
        .select(col("c_custkey"),
          datediff(col("last_d"), col("first_d")).cast("long").as("tenure_days"),
          when(col("n_o") > 1,
            round(datediff(col("last_d"), col("first_d")).cast("double")
              / (col("n_o") - 1), 6)).as("mean_gap_days"))
      val dim = Tables.customer(s, d)
        .select(col("c_custkey"), col("c_mktsegment").as("mkt_segment"))
      rfm.join(span, Seq("c_custkey")).join(dim, Seq("c_custkey"))
        .select(col("c_custkey"), col("mkt_segment"), col("segment").as("rfm_segment"),
          col("r_score"), col("f_score"), col("m_score"),
          col("recency_days"), col("n_orders"), col("monetary"),
          col("tenure_days"), col("mean_gap_days"))
        .orderBy("c_custkey")
    },
    Some(s"""WITH rfm AS (${customerRfm.oracle.get}),
                 span AS (SELECT o_custkey AS c_custkey,
                                 CAST(date_diff('day',
                                   MIN(CAST(o_orderdate AS DATE)),
                                   MAX(CAST(o_orderdate AS DATE))) AS BIGINT) AS tenure_days,
                                 CASE WHEN COUNT(*) > 1
                                      THEN ROUND(CAST(date_diff('day',
                                        MIN(CAST(o_orderdate AS DATE)),
                                        MAX(CAST(o_orderdate AS DATE))) AS DOUBLE)
                                        / (COUNT(*) - 1), 6) END AS mean_gap_days
                          FROM orders GROUP BY 1)
            SELECT r.c_custkey, c.c_mktsegment AS mkt_segment, r.segment AS rfm_segment,
                   r.r_score, r.f_score, r.m_score, r.recency_days, r.n_orders,
                   r.monetary, s.tenure_days, s.mean_gap_days
            FROM rfm r JOIN span s ON s.c_custkey = r.c_custkey
            JOIN customer c ON c.c_custkey = r.c_custkey
            ORDER BY r.c_custkey"""))

  /** Return-rate ranking with uncertainty — per part brand, the share of
    * lineitems returned (l_returnflag = 'R') with its Wilson 95% score
    * interval (Wilson 1927; the "sort by lower bound" ranking device
    * popularized for rating lists): a brand with 3 returns out of 5
    * rows must NOT outrank one with 300 of 1000, and the raw rate says
    * it does — the lower bound is the defensible QA shortlist order.
    * The [[eventsAbTest]] z STATISTIC answers "are two arms different";
    * this answers "how bad is each cell, at worst, given its n".
    *
    * Determinism: n and r are exact counts; the Wilson expression is
    * ONE fixed IEEE sequence per row over r/n with the z constants as
    * identical decimal literals in both engines (1.96, and its square
    * 3.8416 / half 1.9208 / quarter 0.9604 WRITTEN OUT — a computed
    * 1.96*1.96 need not equal the parsed 3.8416, the MmrLambda rule);
    * sqrt is correctly rounded by IEEE spec; ROUND 6 closes.
    *
    * 100 TB shape: part is a broadcast dimension; ONE (brand)-keyed
    * count aggregate (map-combined) collapses the fact table; the
    * interval math is brands-sized. Ranking rides the derived lower
    * bound — a brands-sized sort, not a corpus one.
    */
  val partReturnRateCi: CatalogEntry = CatalogEntry(
    "part_return_rate_ci",
    (s, d) => {
      val counts = Tables.load(s, d, "lineitem")
        .select(col("l_partkey"), col("l_returnflag"))
        .join(broadcast(Tables.load(s, d, "part").select("p_partkey", "p_brand")),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("l_returnflag") === "R", 1L).otherwise(0L)).as("r"))
      val ph = col("r").cast("double") / col("n")
      val denom = lit(1.0) + lit(3.8416) / col("n")
      val center = ph + lit(1.9208) / col("n")
      val rad = lit(1.96) * sqrt((ph * (lit(1.0) - ph) + lit(0.9604) / col("n")) / col("n"))
      counts
        .select(col("p_brand"), col("n"), col("r"),
          round(ph, 6).as("return_rate"),
          round((center - rad) / denom, 6).as("wilson_lo"),
          round((center + rad) / denom, 6).as("wilson_hi"))
        .orderBy("p_brand")
    },
    Some("""WITH counts AS (
              SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS n,
                     CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS r
              FROM lineitem JOIN part ON p_partkey = l_partkey
              GROUP BY p_brand)
            SELECT p_brand, n, r,
                   ROUND(CAST(r AS DOUBLE) / n, 6) AS return_rate,
                   ROUND((CAST(r AS DOUBLE) / n + 1.9208 / n
                          - 1.96 * sqrt((CAST(r AS DOUBLE) / n * (1.0 - CAST(r AS DOUBLE) / n) + 0.9604 / n) / n))
                         / (1.0 + 3.8416 / n), 6) AS wilson_lo,
                   ROUND((CAST(r AS DOUBLE) / n + 1.9208 / n
                          + 1.96 * sqrt((CAST(r AS DOUBLE) / n * (1.0 - CAST(r AS DOUBLE) / n) + 0.9604 / n) / n))
                         / (1.0 + 3.8416 / n), 6) AS wilson_hi
            FROM counts ORDER BY p_brand"""))

  val all: Seq[CatalogEntry] =
    Seq(ordersRollup, ordersCube, eventsPivot, eventsFunnel, eventsRetention,
      eventsTransitions, markovStationary, eventsGroupingSets, ordersParetoFrontier,
      ordersRevenueGini, eventsActiveUsers, customerRfm, ordersCohortLtv,
      peakConcurrency, eventsSeqTrigrams, customerOrderGaps,
      ordersRollupIncremental, userSurvivalKm, eventsAbTest, eventsDowSeasonality,
      eventsCompleteDays, customerFeatureStore, partReturnRateCi)
}
