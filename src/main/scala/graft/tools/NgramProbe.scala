package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object NgramProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32")
      .config("spark.sql.session.timeZone","UTC")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.1"
    def time[T](l: String)(f: => T): T = { val t0=System.nanoTime(); val r=f; println(f"$l%-32s ${(System.nanoTime()-t0)/1e9}%7.2fs"); r }
    val docs = graft.Tables.documents(spark, sf)
    time("docs scan")(docs.count())
    val bg = graft.queries.NearDupCatalog.bigramIndex(docs)
    time("bg 1st")(bg.queryExecution.toRdd.count())
    time("bg 2nd (same plan)")(bg.queryExecution.toRdd.count())
    val bg2 = graft.queries.NearDupCatalog.bigramIndex(docs)
    time("bg rebuilt")(bg2.queryExecution.toRdd.count())
    def full = graft.queries.NearDupCatalog.ngramJaccardFrom(docs, prefixFilter = false)
    time("full 1st")(full.count())
    time("full 2nd (rebuilt)")(full.count())
    time("full 3rd (rebuilt)")(full.count())
    spark.stop()
  }
}
