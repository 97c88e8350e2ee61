package graft.operators

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.SparkContext
import org.apache.spark.sql.{DataFrame, GraftSqlBridge, SparkSession}

/** The small-graph execution profile for iterative frame algorithms
  * (connected components, PageRank, k-core peeling, label propagation).
  *
  * Iterative rounds over a TINY frame are driver-overhead-bound, not
  * data-bound (round-10 finding; measured r11 on the golden-record match
  * graph, sf0.1, ~1k edges, 6 star rounds, min of 2): under the default
  * session conf (32 shuffle partitions, AQE, whole-stage codegen) the
  * iteration costs 3.6–7.3 s and ~60 stage-jobs — AQE turns every
  * shuffle stage into its own job, each round's fresh plan pays Catalyst
  * + janino compilation, and 32-task stages pay scheduling for
  * partitions holding ~30 rows. With parallelism matched to the data,
  * AQE off (rounds fuse back to one job each) and codegen off (nothing
  * to amortize a per-round compile against), the same iteration runs
  * 2.2–2.8 s and 8 jobs. At real scale the threshold never fires and
  * rounds keep the session's AQE/codegen — exactly the regime those
  * features win in.
  *
  * Isolation (round-11 ADVICE): the profile lives in a CHILD session
  * ([[SparkSession.newSession]] — per-SessionState SQL conf, shared
  * SparkContext/SharedState), never as a mutate-and-restore of the
  * caller's conf. A query planned concurrently on the caller's session
  * can no longer inherit tiny-graph parallelism, and two concurrent
  * iterations cannot race a save/restore. Frames cross sessions via
  * [[rebase]]; this works because every frame the iteration call sites
  * move is flat (localCheckpoint-backed or a trivial projection of one)
  * — cached/checkpointed blocks live in the shared context and transfer
  * for free. The child session inherits the SparkConf-level settings
  * (builder-set confs like the session timezone); runtime `SET`s made on
  * the caller's session after startup are deliberately not copied — the
  * fast path pins its own execution profile.
  */
object SmallGraph {

  /** Below this many rows (edges resp. nodes), iteration rounds run on
    * the fast path. 2M rows of 2×long is ~32 MB — trivially single-task
    * work. */
  val SmallGraphRows = 2000000L

  /** Rows per shuffle partition on the fast path — sized so the largest
    * fast-path graph still gets a handful of partitions. */
  val SmallGraphRowsPerPartition = 250000L

  /** Child-session cache, keyed by (SparkContext, shuffle-partition
    * count). Round-12 shipped `spark.newSession()` PER CALL, which the
    * r12 audit adjudicated as the real `doc_pagerank` regression
    * (1.71 → 2.4–3.5 s): every sub-threshold invocation paid a fresh
    * SessionState (analyzer + optimizer + conf instantiation) plus an
    * ExecutionListenerBus registration on the shared LiveListenerBus
    * that was never disposed — iterative catalog entries call this
    * hundreds of times per run. The profile a child carries is a pure
    * function of the key, so one session per profile is semantically
    * identical and amortizes the SessionState to once per JVM. Entries
    * whose SparkContext has been stopped are dead weight but bounded (a
    * handful of profiles per context, contexts per JVM ~1) — not worth
    * an eviction thread. */
  private val children =
    new ConcurrentHashMap[(SparkContext, Long), SparkSession]()

  /** The session iteration rounds should run in: the caller's own
    * session when `rows` is at or above [[SmallGraphRows]], otherwise
    * the cached child session carrying the small-graph profile
    * (parallelism matched to the data, AQE off, whole-stage codegen
    * off). Children inherit SparkConf-level settings only — runtime
    * `SET`s on any caller session are deliberately not copied (see
    * class scaladoc), which is also what makes cross-caller sharing
    * sound. */
  def sessionFor(spark: SparkSession, rows: Long): SparkSession =
    if (rows >= SmallGraphRows) spark
    else {
      val parts = math.max(1L, rows / SmallGraphRowsPerPartition)
      children.computeIfAbsent((spark.sparkContext, parts), { _ =>
        val child = spark.newSession()
        child.conf.set("spark.sql.shuffle.partitions", parts.toString)
        child.conf.set("spark.sql.adaptive.enabled", "false")
        child.conf.set("spark.sql.codegen.wholeStage", "false")
        child
      })
    }

  /** Re-root a frame's logical plan onto `to`, so actions on frames
    * derived from it plan under `to`'s conf. No-op when already there.
    * Intended for FLAT frames (checkpoint scans / parallelized results /
    * simple projections of either): their plans carry no session-local
    * name resolution (temp views, temp functions), so re-analysis under
    * the target session is trivial. */
  def rebase(df: DataFrame, to: SparkSession): DataFrame =
    if (df.sparkSession eq to) df
    else GraftSqlBridge.ofRows(to, df.queryExecution.logical)
}
