package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object BandProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32")
      .config("spark.sql.session.timeZone","UTC")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.1"
    def time[T](l: String)(f: => T): T = { val t0=System.nanoTime(); val r=f; println(f"$l%-30s ${(System.nanoTime()-t0)/1e9}%7.2fs"); r }
    import graft.functions.Vectors
    import graft.queries.EmbeddingCatalog
    def candDF = {
      val emb = graft.Tables.embeddings(spark, sf)
      val bands = emb.select(col("vec_id"), posexplode(array(
        (0 until 4).map(t => Vectors.hyperplaneBucket(col("embedding"), EmbeddingCatalog.bandedSigns(t))): _*)).as(Seq("t","b")))
      bands.as("a").join(bands.as("b"),
        col("a.t")===col("b.t") && col("a.b")===col("b.b") && col("a.vec_id")<col("b.vec_id"))
        .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b")).distinct()
    }
    graft.Tables.embeddings(spark, sf).count()
    time("cand codegen on")(candDF.count())
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    time("cand codegen OFF 1")(candDF.count())
    time("cand codegen OFF 2")(candDF.count())
    spark.conf.set("spark.sql.codegen.wholeStage", "true")
    // cached bands variant: projection evaluated once, joins read the cache
    def candCached = {
      val emb = graft.Tables.embeddings(spark, sf)
      val bands = emb.select(col("vec_id"), posexplode(array(
        (0 until 4).map(t => Vectors.hyperplaneBucket(col("embedding"), EmbeddingCatalog.bandedSigns(t))): _*)).as(Seq("t","b"))).cache()
      bands.as("a").join(bands.as("b"),
        col("a.t")===col("b.t") && col("a.b")===col("b.b") && col("a.vec_id")<col("b.vec_id"))
        .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b")).distinct()
    }
    time("cand cached-bands 1")(candCached.count())
    time("cand cached-bands 2")(candCached.count())
    spark.stop()
  }
}
