package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Vectors

/** Deterministic Lloyd's k-means over an embedding column — the trainer
  * for an IVF coarse quantizer (the catalog's `emb_knn_ivf` uses a
  * sampled quantizer so its DuckDB oracle can reproduce it; production
  * IVF trains centroids with exactly this loop).
  *
  * Distributed shape per iteration: one broadcast of k centroids, one
  * narrow assignment pass (argmin L2 via k codegen'd dot products), one
  * hash-aggregation computing per-cluster element-wise sums — k×dim
  * doubles cross the wire, never the vectors. Initialization is the
  * first k vectors by id (deterministic, re-runnable).
  */
object KMeans {

  final case class Model(centroids: Seq[(Int, Array[Double])], inertia: Double) {
    def k: Int = centroids.size
  }

  /** Squared L2 distance between a vector column and a centroid literal.
    * The vector is widened to array<double> to match the literal's type
    * (dot_product requires matching element types).
    */
  private def sqDist(v: Column, c: Array[Double]): Column = {
    val vd = v.cast("array<double>")
    val cLit = array(c.map(lit): _*)
    // |v|^2 - 2 v·c + |c|^2 ; the dot products are the native expression.
    Vectors.dot(vd, vd) - lit(2.0) * Vectors.dot(vd, cLit) + lit(c.map(x => x * x).sum)
  }

  /** All (distance, cid) cells as one array column — callers take element
    * 0 for the assignment or a prefix for multi-probe. Linear expression
    * size in k: the previous `reduce(when(b.d < a.d, b).otherwise(a))`
    * duplicated both subtrees at every step, i.e. a 2^k-node tree that
    * OOMed the driver at k=16/dim=64 just stringifying the plan.
    */
  private[graft] def sortedCells(v: Column, centroids: Seq[(Int, Array[Double])]): Column =
    array_sort(array(centroids.map { case (cid, c) =>
      struct(sqDist(v, c).as("d"), lit(cid).as("cid"))
    }: _*))

  /** Cluster assignment column: argmin squared distance, lowest id wins
    * ties (array_sort on (d, cid) structs is lexicographic ascending).
    */
  def assignment(v: Column, centroids: Seq[(Int, Array[Double])]): Column =
    sortedCells(v, centroids).getItem(0).getField("cid")

  /** Fit k clusters with `iters` Lloyd iterations. */
  def fit(df: DataFrame, vecCol: String, idCol: String, k: Int, iters: Int, dim: Int): Model = {
    require(k > 0 && iters >= 0)
    val init = df.orderBy(col(idCol)).limit(k)
      .select(col(vecCol)).collect()
      .zipWithIndex
      .map { case (r, i) => i -> r.getSeq[Any](0).map(x => x.toString.toDouble).toArray }
      .toSeq
    var centroids = init
    var inertia = Double.MaxValue
    for (_ <- 0 until iters) {
      val assigned = df.select(col(vecCol).as("v"),
        assignment(col(vecCol), centroids).as("cid"))
      // Element-wise sums per cluster: posexplode the vector once, then a
      // single (cid, dim) hash-aggregation.
      val sums = assigned
        .select(col("cid"), posexplode(col("v")))
        .groupBy(col("cid"), col("pos"))
        .agg(sum(col("col").cast("double")).as("s"), count(lit(1)).as("n"))
        .collect()
      val byCluster = sums.groupBy(_.getInt(0))
      centroids = centroids.map { case (cid, old) =>
        byCluster.get(cid) match {
          case Some(rows) =>
            val arr = new Array[Double](dim)
            var n = 0L
            rows.foreach { r => arr(r.getInt(1)) = r.getDouble(2); n = r.getLong(3) }
            cid -> (if (n > 0) arr.map(_ / n) else old)
          case None => cid -> old // empty cluster keeps its centroid
        }
      }
      inertia = df.select(
        centroids.map { case (_, c) => sqDist(col(vecCol), c) }
          .reduce((a, b) => least(a, b)).as("d"))
        .agg(sum("d")).collect().head.getDouble(0)
    }
    Model(centroids, inertia)
  }

  /** Assign every row to its trained cell — the IVF build step. */
  def transform(df: DataFrame, vecCol: String, model: Model): DataFrame =
    df.withColumn("cell", assignment(col(vecCol), model.centroids))
}
