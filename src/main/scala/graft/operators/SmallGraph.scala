package graft.operators

import org.apache.spark.sql.SparkSession

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
  * The conf flip is SESSION-scoped for its duration (restored in a
  * finally): a concurrent query planned in the same session inside the
  * window would pick up the reduced parallelism. The harness and catalog
  * run entries sequentially; callers running parallel queries should
  * isolate with `spark.newSession()` (conf is per-SessionState).
  */
object SmallGraph {

  /** Below this many rows (edges resp. nodes), iteration rounds run on
    * the fast path. 2M rows of 2×long is ~32 MB — trivially single-task
    * work. */
  val SmallGraphRows = 2000000L

  /** Rows per shuffle partition on the fast path — sized so the largest
    * fast-path graph still gets a handful of partitions. */
  val SmallGraphRowsPerPartition = 250000L

  /** Run `f` under the small-graph conf when `rows` is below the
    * threshold; pass through untouched otherwise. */
  def withSmallGraphConf[T](spark: SparkSession, rows: Long)(f: => T): T =
    if (rows >= SmallGraphRows) f
    else {
      val conf = spark.conf
      val keys = Seq("spark.sql.shuffle.partitions",
        "spark.sql.adaptive.enabled", "spark.sql.codegen.wholeStage")
      val saved = keys.map(k => k -> conf.getOption(k))
      conf.set("spark.sql.shuffle.partitions",
        math.max(1L, rows / SmallGraphRowsPerPartition).toString)
      conf.set("spark.sql.adaptive.enabled", "false")
      conf.set("spark.sql.codegen.wholeStage", "false")
      try f finally saved.foreach { case (k, ov) =>
        ov match { case Some(v) => conf.set(k, v); case None => conf.unset(k) }
      }
    }
}
