package graft.tools

import org.apache.spark.sql.SparkSession

/** One-shot trainer that produced `EmbeddingCatalog.ivfKmeansCentroids`:
  * runs graft.operators.KMeans.fit on the sf0.01 embeddings (k=16,
  * iters=5, init = first 16 vectors by vec_id) and prints the centroids
  * rounded to 4 decimals as a Scala literal. The rounding makes the
  * frozen constants exactly representable as decimal strings, so the
  * Spark literals and the DuckDB oracle literals parse to bit-identical
  * doubles. Re-run to regenerate; KMeansSpec asserts the committed
  * constants still match a fresh fit to 1e-4.
  */
object TrainIvf {
  /** The 4-decimal HALF_UP freeze applied to every committed centroid
    * literal — ONE definition shared with KMeansSpec's drift test, so a
    * future regeneration through this trainer provably lands on the
    * same lattice the committed literals (and the oracles built against
    * them) live on. */
  def freeze(c: Array[Double]): Array[Double] =
    c.map(x => BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val ks = args.drop(1).headOption.map(_.split(",").map(_.trim.toInt).toSeq)
      .getOrElse(Seq(16))
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = graft.Tables.embeddings(spark, sfDir)
    ks.foreach { k =>
      val model = graft.operators.KMeans.fit(emb, "embedding", "vec_id", k = k, iters = 5, dim = 64)
      println(s"// KMeans.fit(sf0.01 embeddings, k=$k, iters=5) inertia=${model.inertia}")
      println("Seq(")
      model.centroids.foreach { case (cid, c) =>
        println(s"  $cid -> Array(${freeze(c).mkString(", ")}),")
      }
      println(")")
    }
    spark.stop()
  }
}
