package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object PrefixProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32")
      .config("spark.sql.session.timeZone","UTC")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.1"
    def time[T](l: String)(f: => T): T = { val t0=System.nanoTime(); val r=f; println(f"$l%-30s ${(System.nanoTime()-t0)/1e9}%7.2fs"); r }
    val docs = graft.Tables.documents(spark, sf)
    val bg = graft.queries.NearDupCatalog.bigramIndex(docs).cache()
    time("bg count")(bg.count())
    val perDoc = graft.queries.NearDupCatalog.perDocByDf(bg).cache()
    time("perDoc")(perDoc.count())
    time("perDoc again")(perDoc.count())
    val cand = graft.queries.NearDupCatalog.candidatePairs(bg, prefixFilter = true)
    println("candidates: " + time("cand count")(cand.count()))
    val candN = graft.queries.NearDupCatalog.candidatePairs(bg, prefixFilter = false)
    println("naive candidates: " + time("naive cand count")(candN.count()))
    time("full prefix query")(graft.queries.NearDupCatalog.ngramJaccardFrom(docs, prefixFilter = true).count())
    time("full prefix query again")(graft.queries.NearDupCatalog.ngramJaccardFrom(docs, prefixFilter = true).count())
    time("full naive query")(graft.queries.NearDupCatalog.ngramJaccardFrom(docs, prefixFilter = false).count())
    spark.stop()
  }
}
