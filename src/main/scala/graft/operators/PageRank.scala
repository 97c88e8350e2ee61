package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PageRank in FIXED-POINT integer arithmetic — centrality over a
  * pair graph (here: which document in a near-dup neighbourhood is the
  * "authoritative" copy), computed so that every engine derives the
  * bit-identical result.
  *
  * Why fixed-point: float PageRank sums partition-ordered doubles, so no
  * two engines (or two runs with different partitioning) agree in the
  * last ulps — unverifiable against an oracle. Here rank mass is a
  * BIGINT in `scale` units and every step is integer add / multiply /
  * FLOOR division (`div`): associative, order-free, overflow-safe
  * (mass ≤ scale ≤ 10¹², 85·mass ≪ 2⁶³). The tiny mass lost to
  * flooring each round only damps ranks uniformly — ordering, the thing
  * PageRank exists for, is unaffected.
  *
  * Scale shape (the [[ConnectedComponents]] discipline): per round, ONE
  * join of the rank frame with the degree-annotated edge list and one
  * dst-keyed sum — cost ∝ edges. Rounds between materialization points
  * stay LAZY, so `checkpointEvery` consecutive rounds fuse into one
  * multi-stage job (same shuffles, a fraction of the job-scheduling
  * round-trips — measured 2.5× on small graphs) while each
  * localCheckpoint bounds lineage depth for the big-graph case. Driver
  * traffic: a single node-count scalar up front. No dangling-mass term:
  * an undirected pair graph gives every node outdegree ≥ 1.
  *
  * ENDGAME (round 13, mirrors [[ConnectedComponents.LocalFinishEdges]]):
  * at or under `localFinishEdges` DIRECTED edge rows the whole power
  * iteration FINISHES ON THE DRIVER — collect the bounded directed edge
  * list, iterate in primitive long arithmetic, parallelize the ranks
  * back. Fixed-round iteration over a tiny frame is pure driver/job
  * latency (10 rounds × join + agg jobs over kilobytes); the same
  * integer recurrence closes locally in microseconds, and because every
  * step is order-free floor arithmetic the local result is BIT-IDENTICAL
  * to the distributed fixpoint (PageRankSpec pins the equality). At
  * 100 TB the threshold never fires and the distributed rounds keep the
  * session's AQE/codegen — exactly the regime they win in.
  */
object PageRank {

  /** Driver fixed-point power iteration over an already-collected
    * DIRECTED edge list. Exactly the distributed recurrence:
    * r₀ = scale div n; per round, per directed edge (s, d):
    * contribution r(s) div outdeg(s), summed per d; then
    * r' = base + (85·Σ) div 100 with base = scale·15 div 100 div n.
    * All operands positive longs, so JVM `/` (truncation) ≡ SQL `div`
    * (floor) — the bit-identity argument. Driver memory: the worst case
    * (2M directed rows) is the [[ConnectedComponents.localFinish]]
    * envelope — tens of MB of primitive arrays/maps. */
  private def localRanks(
      dir: Array[(Long, Long)], iterations: Int, scale: Long): Array[(Long, Long)] = {
    val outdeg = new scala.collection.mutable.LongMap[Long](dir.length * 2)
    dir.foreach { case (s, _) => outdeg(s) = outdeg.getOrElse(s, 0L) + 1L }
    val n = outdeg.size.toLong
    val base = scale * 15L / 100L / n
    var r = new scala.collection.mutable.LongMap[Long](outdeg.size * 2)
    outdeg.foreachKey(s => r(s) = scale / n)
    var iter = 0
    while (iter < iterations) {
      val acc = new scala.collection.mutable.LongMap[Long](outdeg.size * 2)
      dir.foreach { case (s, d) =>
        acc(d) = acc.getOrElse(d, 0L) + r(s) / outdeg(s)
      }
      val next = new scala.collection.mutable.LongMap[Long](outdeg.size * 2)
      // Symmetric graph: every node has indeg ≥ 1, so acc covers the
      // node set — same row set as the distributed dst-keyed aggregate.
      acc.foreachEntry((d, sum) => next(d) = base + 85L * sum / 100L)
      r = next
      iter += 1
    }
    val out = new Array[(Long, Long)](r.size)
    var i = 0
    r.foreachEntry((node, rank) => { out(i) = (node, rank); i += 1 })
    out
  }

  private def isIntegral(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
    case _: org.apache.spark.sql.types.ByteType | _: org.apache.spark.sql.types.ShortType |
         _: org.apache.spark.sql.types.IntegerType | _: org.apache.spark.sql.types.LongType => true
    case _ => false
  }

  /** `edges`: one row per UNDIRECTED pair (a, b), a ≠ b, no duplicates.
    * Returns (node, r) with r in `scale` fixed-point units.
    * `localFinishEdges` gates the driver endgame on the DIRECTED row
    * count (2× the pair count); tests pin the distributed path with 0.
    */
  def ranks(
      edges: DataFrame,
      iterations: Int = 10,
      scale: Long = 1000000000000L,
      checkpointEvery: Int = 5,
      localFinishEdges: Long = ConnectedComponents.LocalFinishEdges): DataFrame = {
    val a = edges.columns(0)
    val b = edges.columns(1)
    val spark0 = edges.sparkSession
    val nodeType = edges.schema.head.dataType
    val dir = edges.select(col(a).as("src"), col(b).as("dst"))
      .union(edges.select(col(b).as("src"), col(a).as("dst")))
    if (edges.schema.forall(f => isIntegral(f.dataType))) {
      // Cheap pre-gate: the directed row count, from the (map-combined)
      // pair count — no join or degree work paid before the routing
      // decision.
      val nDir = edges.count() * 2
      if (nDir > 0 && nDir <= localFinishEdges) {
        import spark0.implicits._
        val dirRows = dir
          .select(col("src").cast("long"), col("dst").cast("long"))
          .as[(Long, Long)].collect()
        val ranks = localRanks(dirRows, iterations, scale)
        val slices = math.max(1,
          ranks.length / SmallGraph.SmallGraphRowsPerPartition).toInt
        return spark0.sparkContext
          .parallelize(scala.collection.immutable.ArraySeq.unsafeWrapArray(ranks), slices)
          .toDF("node", "r")
          .select(col("node").cast(nodeType).as("node"), col("r"))
      }
    }
    val links = dir
      .join(dir.groupBy("src").agg(count(lit(1)).as("outdeg")), "src")
      .localCheckpoint(eager = false) // materialized by the probe below
    // One probe returns the node count (the base term needs it anyway)
    // and the edge-row count that picks the iteration session; its
    // action writes the checkpoint blocks — one job, not two.
    val probe = links.agg(countDistinct(col("src")), count(lit(1))).head()
    val n = probe.getLong(0)
    val nEdgeRows = probe.getLong(1)
    // Edgeless input yields an empty rank frame — the ConnectedComponents
    // contract (an empty corpus has no graph; it is not an error).
    if (n == 0)
      return dir.select(col("src").cast(nodeType).as("node"), lit(0L).as("r")).limit(0)
    val base = scale * 15L / 100L / n
    var iter = 0
    // Fixed-round iteration over a small graph is driver/plan-overhead
    // bound — sub-threshold rounds run in a child session carrying the
    // small-graph profile (see SmallGraph scaladoc); the checkpointed
    // link frame rebases across sessions for free.
    val linksS = SmallGraph.rebase(links, SmallGraph.sessionFor(spark0, nEdgeRows))
    var r = linksS.select(col("src").as("node")).distinct()
      .withColumn("r", lit(scale / n))
    while (iter < iterations) {
      val next = linksS.join(r, col("src") === col("node"))
        .select(col("dst"), expr("r div outdeg").as("c"))
        .groupBy("dst")
        .agg(sum(col("c")).as("s"))
        .select(col("dst").as("node"),
          (lit(base) + expr("(85 * s) div 100")).as("r"))
      iter += 1
      r = if (iter % checkpointEvery == 0 || iter == iterations)
        next.localCheckpoint()
      else next
    }
    SmallGraph.rebase(r, spark0)
  }
}
