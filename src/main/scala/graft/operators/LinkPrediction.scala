package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.CacheOnce._

/** Common-neighbor link prediction over an undirected (u < v)-oriented
  * edge list: for every NON-adjacent pair with ≥ `minCommon` common
  * neighbors, the three classic scores — common-neighbor count,
  * resource allocation Σ 1/deg(z) (Zhou, Lü & Zhang 2009), and
  * Adamic–Adar Σ 1/ln(deg(z)) (Adamic & Adar 2003).
  *
  * Determinism: each score is an order-independent BIGINT sum of
  * per-neighbor scaled-integer terms (⌊10⁶/deg⌋ by integer division,
  * round(10⁶/ln deg) rounded ONCE per term), so cross-engine float
  * summation order can never flutter an oracle hash. The nearest
  * round-half boundary of the ln term sits 1.4e-7 away over all
  * deg ≤ 2·10⁶ (measured), vs ≤ ~2e-10 of possible libm divergence.
  *
  * Scale: wedge enumeration is Σ deg² over THROUGH-nodes, so one
  * celebrity/boilerplate hub generates a quadratic candidate blow-up
  * while contributing the LEAST evidence (its 1/ln(deg) weight is by
  * construction the smallest). `hubCap` bounds the fan-out per
  * through-node row — the standard production device — and the caller's
  * oracle applies the identical cap, making the pruning part of the
  * checked semantics rather than a silent approximation. The closing
  * anti join runs on the (already-oriented) edge list, never all pairs.
  */
object LinkPrediction {
  /** Default through-node degree cap. */
  val HubCap = 64

  /** Scores over `edges` with columns (u, v), u < v; DUPLICATE rows are
    * tolerated (and not worth a distinct upstream): neighbor sets dedup
    * via collect_set, and the closing anti join is idempotent in its
    * right side — so callers should hand over the raw pair stream and
    * skip the shuffle a DISTINCT would cost. Output:
    * (node_a, node_b, cn, ra_scaled, aa_scaled), node_a < node_b.
    *
    * Wedge device: ONE groupBy collects each through-node's sorted
    * neighbor set, so deg(z) is `size(vs)` for free (the separate degree
    * aggregate + degree join of the naive form disappear), the hub cap
    * is a row filter, and wedges come from a per-row ordered-pair array
    * comprehension — no adjacency self-join at all. The r13 self-join
    * form shuffled the adjacency twice more (deg join + both self-join
    * sides) and hashed millions of rows; this form's only wedge-side
    * shuffle is the neighbor collect, and the pair fan-out happens
    * inside the scan of its output (this change plus the caller-side
    * distinct drop: 4.56 → 2.5–2.7 s isolated at sf0.1 on the
    * 1.2M-edge graph, identical oracle hash). Per-row
    * memory is the through-node's neighbor array — bounded by hubCap
    * for every row that survives to the explode, and a pre-cap row for
    * a mega-hub is one array of its distinct neighbors, the same order
    * of memory the self-join's hash bucket for that key held; a graph
    * with 10⁷-degree hubs would pre-filter by a degree aggregate first
    * (the r13 shape) at the price of one more shuffle. */
  def scores(edges: DataFrame, hubCap: Int = HubCap, minCommon: Long = 2L): DataFrame = {
    // Materialized once: read by both union legs and the closing anti
    // join (3 reads of the upstream edge build otherwise).
    val e = edges.select(col("u"), col("v")).cacheOnce()
    val sym = e.union(e.select(col("v").as("u"), col("u").as("v")))
    val wedges = sym.groupBy("u")
      .agg(sort_array(collect_set(col("v"))).as("vs"))
      .filter(size(col("vs")) <= hubCap && size(col("vs")) >= 2)
      .select(size(col("vs")).as("degz"), explode(expr(
        """flatten(transform(vs,
             (x, i) -> transform(slice(vs, i + 2, size(vs)),
                         y -> struct(x AS a, y AS b))))""")).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"), col("degz"))
    // Aggregate BEFORE the adjacency anti join: both key on the (a, b)
    // pair, so they commute — and the aggregate (map-combined) plus the
    // minCommon filter collapse the wedge stream to the scored pair list
    // before the join has to shuffle anything (anti-joining the raw
    // wedge stream paid its full volume twice).
    val scored = wedges.groupBy("a", "b")
      .agg(count(lit(1)).as("cn"),
        sum(expr("1000000 div degz")).as("ra_scaled"),
        sum(round(lit(1000000.0) / log(col("degz")), 0).cast("long")).as("aa_scaled"))
      .filter(col("cn") >= minCommon)
    val out = scored.join(e.select(col("u").as("a"), col("v").as("b")),
        Seq("a", "b"), "left_anti")
      .select(col("a").as("node_a"), col("b").as("node_b"),
        col("cn"), col("ra_scaled"), col("aa_scaled"))
      .localCheckpoint()
    e.unpersist(blocking = false)
    out
  }
}
