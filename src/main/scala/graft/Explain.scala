package graft
import org.apache.spark.sql.SparkSession

import graft.SessionHygiene.dropEntryState

/** Scratch main: print an entry's physical plan (dev tool, not part of the
  * driver contract). Usage:
  *   runMain graft.Explain <entry> <sfDir>            — print executedPlan
  *   runMain graft.Explain --dump <outDir> <sfDir> <entry> [entry ...]
  *     — write <outDir>/<entry>.txt with the explain("formatted") output
  *       (the plans/rNN before/after artifacts).
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    if (args.headOption.contains("--dump")) {
      val outDir = new java.io.File(args(1))
      outDir.mkdirs()
      val sfDir = args(2)
      val entries =
        if (args.lift(3).contains("--all")) queries.Catalog.all.map(_.name)
        else args.drop(3).toSeq
      entries.foreach { entry =>
        val df = SparkEntry.queries(entry)(spark, sfDir)
        val formatted = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        val w = new java.io.PrintWriter(new java.io.File(outDir, s"$entry.txt"), "UTF-8")
        try w.println(formatted) finally w.close()
        dropEntryState(spark)
        println(s"wrote ${outDir}/$entry.txt")
      }
    } else {
      val df = SparkEntry.queries(args(0))(spark, args(1))
      df.count() // materialize (AQE final plan) without shipping rows
      println(df.queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
