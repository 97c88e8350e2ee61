package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sketch-routed join — the round-12 Count-Min join statistic
  * ([[JoinSizeSketch]], `lineitem_join_size_sketch`) closed into an
  * actual PLAN DECISION: pick the join strategy from sketch-derived
  * statistics BEFORE paying the shuffle, the call a cost-based planner
  * makes at 100 TB where a wrong default is a lost cluster-hour.
  *
  * Decision ladder (the order a real planner uses):
  *
  *  1. '''broadcast''' — if the dimension is small enough to replicate,
  *     nothing else matters: the fact side never shuffles and skew is
  *     irrelevant (every executor owns the whole build side). The gate
  *     is BYTES (estimated in the same dim pass as the row count — see
  *     [[dimStats]]; production reads it free from file statistics)
  *     with the row ceiling kept as guard and as the fallback when no
  *     byte estimate exists (the streamed-cells form).
  *  2. '''salted''' — the dimension must shuffle, so fact-side key skew
  *     now matters: a hot key sends its whole mass to one reducer. The
  *     hot-key mass is estimated from a Count-Min sketch over a
  *     deterministic row sample: for each sketch row the heaviest key
  *     lands in SOME bucket, so `max_bucket cell(r) ≥ f_max`, and
  *     `min_r max_bucket cell(r)` is the classic CM point upper bound
  *     on the heaviest frequency (Cormode & Muthukrishnan 2005 §4.1).
  *     If that bound exceeds [[HotMassThreshold]] of the sampled mass,
  *     the plan salts: fact rows get a discriminator-derived salt in
  *     [0, [[Salt]]), the dimension replicates ×Salt, and the hot key
  *     spreads over Salt reducers (the `lineitem_salted_join` device,
  *     now chosen by measurement instead of by hand).
  *  3. '''shuffle''' — no broadcast, no skew: a plain shuffled hash
  *     join on the key.
  *
  * Cost of deciding: one sampled cell aggregate over a 1/[[SampleMod]]
  * hash-sample of the fact keys (intermediate bounded by depth×width
  * cells; CM is linear, so sampled cells are an unbiased 1/16-scale of
  * the true cells) reduced by a second per-sketch-row aggregate to
  * ≤ depth driver rows, plus one dimension count a planner reads from
  * file stats for free. Same pay-a-small-scan-to-pick-the-plan trade as the
  * n-gram chooser (`NearDupCatalog.ngramMode`) and AQE's runtime
  * re-plan — made here at build time because the choice changes the
  * whole topology. Routes only trade plan shape, never results: all
  * three produce the identical join output, which is what the oracle
  * checks (mode-independent SQL).
  */
object RoutedJoin {
  sealed trait Route { def tag: String }
  case object BroadcastRoute extends Route { val tag = "broadcast" }
  case object ShuffleRoute extends Route { val tag = "shuffle" }
  case object SaltedRoute extends Route { val tag = "salted" }

  /** Fact rows are sampled 1-in-SampleMod (deterministic hash of the
    * discriminator — re-runnable, no rand()). */
  val SampleMod = 16
  /** Salt fan-out, matching `lineitem_salted_join`'s S. */
  val Salt = 8
  /** Hot-key mass fraction above which the salted route wins. */
  val HotMassThreshold = 0.2
  /** Dimension row ceiling for the broadcast route — the fallback gate
    * when no byte estimate is available (streamed cell state carries no
    * dim measurement), and a guard against pathological row counts even
    * when one is; catalog entries narrow it where the demo corpus is
    * small. */
  val BroadcastRowLimit = 1000000L
  /** Dimension byte ceiling for the broadcast route — the gate a
    * production planner actually uses (Spark's
    * `autoBroadcastJoinThreshold` default, 10 MB): a million narrow
    * rows broadcast fine while the same count of wide blob rows would
    * OOM every executor, so rows alone is the wrong unit. */
  val BroadcastByteLimit = 10L << 20

  /** The router's inputs: sampled fact-row mass, the CM upper bound on
    * the heaviest key's sampled mass, and the dimension row count plus
    * estimated serialized bytes (−1 = unmeasured → row gate only). */
  final case class Stats(sampledRows: Long, hotEst: Long, dimRows: Long,
      dimBytes: Long = -1L) {
    def hotMass: Double =
      if (sampledRows == 0L) 0.0 else hotEst.toDouble / sampledRows
  }

  /** Dimension row count + estimated serialized bytes in ONE pass:
    * sum(octet_length(to_json(row))) — UTF-8 BYTES, not characters:
    * length() counts codepoints, so a CJK/emoji payload would be
    * under-estimated up to 4x and the byte gate would broadcast a dim
    * several times its apparent size — the exact wide-row OOM the gate
    * exists to prevent. octet_length keeps the documented invariant
    * honest: JSON framing over-counts vs Tungsten rows, so the estimate
    * errs in the safe direction (never broadcasts something bigger than
    * estimated). In production both numbers come free from file
    * statistics; this measured form is for dims that are already
    * derived frames. Shared by the batch router and the streaming
    * parity tests so Stats equality stays meaningful. */
  def dimStats(dim: DataFrame): (Long, Long) = {
    val row = dim.agg(count(lit(1)).as("n"),
      coalesce(sum(octet_length(to_json(struct(dim.columns.toIndexedSeq.map(col): _*))))
        .cast("long"), lit(0L)).as("bytes")).head()
    (row.getLong(0), row.getLong(1))
  }

  /** Measure the routing statistics: CM cells over a 1/[[SampleMod]]
    * sample of fact keys (bounded intermediate: ≤ Depth×Width cells no
    * matter the key cardinality), reduced to one row PER SKETCH ROW by a
    * second aggregate before reaching the driver — the driver collects
    * ≤ Depth rows (per-row max cell + per-row total), never the cell
    * grid itself. `min_r max_bucket` and `Σ_bucket` both distribute over
    * the row grouping, so this is the same arithmetic the cell-grid
    * reduction did, pushed into the plan where it belongs (at fleet
    * scale a router runs per-query; 262k-cell collects add up, Depth
    * rows don't). Plus the dimension row count, which a production
    * planner reads from file statistics for free. */
  def stats(fact: DataFrame, factKey: String, discriminator: Column,
      dim: DataFrame): Stats = {
    val depth = JoinSizeSketch.Depth
    // No cast on the key: bucketCol hashes the key's string form, so any
    // atomic key type works (a long cast would null out string keys and
    // silently collapse the sketch onto one bucket).
    val perRow = fact
      .filter(pmod(xxhash64(discriminator), lit(SampleMod.toLong)) === 0L)
      .select(col(factKey).as("k"))
      .select(explode(array((0 until depth).map(r =>
        struct(lit(r).as("r"),
          JoinSizeSketch.bucketCol(r, col("k")).as("bucket"))): _*)).as("h"))
      .groupBy(col("h.r").as("r"), col("h.bucket").as("bucket"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("r"))
      .agg(max(col("c")).as("rowMax"), sum(col("c")).as("rowTotal"))
      .collect()
      .map(row => (row.getInt(0), (row.getLong(1), row.getLong(2))))
      .toMap
    val (dimRows, dimBytes) = dimStats(dim)
    Stats(totalFromPerRow(perRow), hotEstFromPerRow(perRow), dimRows, dimBytes)
  }

  // Every sampled row lands in exactly one bucket of every sketch row,
  // so any row's total is the sampled-row count; row 0 is canonical.
  private def totalFromPerRow(perRow: Map[Int, (Long, Long)]): Long =
    perRow.get(0).map(_._2).getOrElse(0L)

  private def hotEstFromPerRow(perRow: Map[Int, (Long, Long)]): Long =
    if (perRow.isEmpty) 0L
    else (0 until JoinSizeSketch.Depth)
      .map(r => perRow.get(r).map(_._1).getOrElse(0L)).min

  /** [[Stats]] from a MATERIALIZED cell map ((row, bucket) → count) —
    * the streaming-state form of [[stats]]: the same per-row max /
    * row-0 total reduction, applied to CM cells maintained live as
    * keyed state ([[graft.streaming.StreamingQueries.streamingRouteCells]]).
    * CM cells are linear, so cells drained from any arrival order/split
    * equal the batch sampled aggregate bit-for-bit, and the route chosen
    * from a live stream equals the batch route on the same corpus
    * (StreamingSpec pins this for all three organic corpora). */
  def statsFromCells(cells: Map[(Int, Long), Long], dimRows: Long,
      dimBytes: Long = -1L): Stats = {
    val perRow = cells.groupBy(_._1._1).map { case (r, cs) =>
      r -> (cs.valuesIterator.foldLeft(0L)(math.max), cs.valuesIterator.sum)
    }
    Stats(totalFromPerRow(perRow), hotEstFromPerRow(perRow), dimRows, dimBytes)
  }

  /** Route choice from measured stats — pure, unit-testable. Broadcast
    * requires the dim under the ROW limit and, when a byte estimate is
    * present, under the BYTE limit too (the production-shaped gate: see
    * [[BroadcastByteLimit]]); unmeasured bytes (−1, the streamed-cells
    * form) degrade to the row gate alone. */
  def choose(st: Stats, hotMassThreshold: Double = HotMassThreshold,
      broadcastRowLimit: Long = BroadcastRowLimit,
      broadcastByteLimit: Long = BroadcastByteLimit): Route =
    if (st.dimRows <= broadcastRowLimit &&
        (st.dimBytes < 0L || st.dimBytes <= broadcastByteLimit)) BroadcastRoute
    else if (st.hotMass > hotMassThreshold) SaltedRoute
    else ShuffleRoute

  /** Measure, choose, and build the joined frame. `discriminator` must
    * be a row-level column of the fact side (it seeds both the stat
    * sample and the salt — NOT rand(), so the operator is re-runnable
    * and oracle-checkable). Returns the joined frame plus the route
    * taken, so callers (and PlanSpec) can pin the decision.
    */
  def join(fact: DataFrame, factKey: String, discriminator: Column,
      dim: DataFrame, dimKey: String,
      hotMassThreshold: Double = HotMassThreshold,
      broadcastRowLimit: Long = BroadcastRowLimit,
      broadcastByteLimit: Long = BroadcastByteLimit): (DataFrame, Route) = {
    val route = choose(stats(fact, factKey, discriminator, dim),
      hotMassThreshold, broadcastRowLimit, broadcastByteLimit)
    val joined = route match {
      case BroadcastRoute =>
        fact.join(broadcast(dim), fact(factKey) === dim(dimKey))
      case ShuffleRoute =>
        fact.join(dim.hint("shuffle_hash"), fact(factKey) === dim(dimKey))
      case SaltedRoute =>
        // The shuffle_hash hint keeps the demonstration honest (the
        // lineitem_salted_join rationale): without it Catalyst would
        // broadcast a small replicated dim and the salt would be
        // decorative; at scale the ×Salt dim does not broadcast and
        // this IS the plan.
        val f = fact.withColumn("__salt", pmod(hash(discriminator), lit(Salt)))
        val dd = dim.withColumn("__salt",
          explode(sequence(lit(0), lit(Salt - 1))))
        f.join(dd.hint("shuffle_hash"),
            f(factKey) === dd(dimKey) && f("__salt") === dd("__salt"))
          .drop("__salt")
    }
    (joined, route)
  }
}
