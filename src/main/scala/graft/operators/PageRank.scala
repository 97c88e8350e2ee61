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
  */
object PageRank {

  /** `edges`: one row per UNDIRECTED pair (a, b), a ≠ b, no duplicates.
    * Returns (node, r) with r in `scale` fixed-point units.
    */
  def ranks(
      edges: DataFrame,
      iterations: Int = 10,
      scale: Long = 1000000000000L,
      checkpointEvery: Int = 5): DataFrame = {
    val a = edges.columns(0)
    val b = edges.columns(1)
    val dir = edges.select(col(a).as("src"), col(b).as("dst"))
      .union(edges.select(col(b).as("src"), col(a).as("dst")))
    val links = dir
      .join(dir.groupBy("src").agg(count(lit(1)).as("outdeg")), "src")
      .localCheckpoint() // one resident edge list, lineage cut at the source
    // One probe returns the node count (the base term needs it anyway)
    // and the edge-row count that gates the small-graph fast path.
    val probe = links.agg(countDistinct(col("src")), count(lit(1))).head()
    val n = probe.getLong(0)
    val nEdgeRows = probe.getLong(1)
    require(n > 0, "PageRank over an empty edge list")
    val base = scale * 15L / 100L / n
    var iter = 0
    // Fixed-round iteration over a small graph is driver/plan-overhead
    // bound — sub-threshold rounds run in a child session carrying the
    // small-graph profile (see SmallGraph scaladoc); the checkpointed
    // link frame rebases across sessions for free.
    val spark0 = edges.sparkSession
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
