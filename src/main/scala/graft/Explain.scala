package graft
import org.apache.spark.sql.SparkSession
/** Scratch main: print an entry's physical plan (dev tool, not part of the
  * driver contract). Usage: runMain graft.Explain <entry> <sfDir>
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(args(0))(spark, args(1))
    df.count() // materialize (AQE final plan) without shipping rows
    println(df.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
