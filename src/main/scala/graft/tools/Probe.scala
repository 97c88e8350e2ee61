package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch diagnostics main — not part of the engine surface. Usage:
  * `runMain graft.tools.Probe [queryName ...]` — with args, prints the
  * formatted physical plan of each named catalog query at sf0.001; without
  * args, runs the driver smoke contract.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    if (args.nonEmpty) {
      args.foreach { name =>
        println(s"===== $name =====")
        graft.SparkEntry.queries(name)(spark, "/root/testdata/sf0.001").explain("formatted")
      }
    } else {
      // Driver smoke contract: entry() on sf0.001 must return rows > 0.
      val entry = graft.SparkEntry.entry(spark)
      println(s"entry rows=${entry.count()}")
      entry.show(3, truncate = false)
      // Probe: unknown sfDir should fail loudly (AnalysisException), not NPE.
      try {
        graft.SparkEntry.queries("taxi_ride_count")(spark, "/root/testdata/nope").count()
        println("probe bogus-dir: NO ERROR (unexpected)")
      } catch {
        case e: Exception => println(s"probe bogus-dir: ${e.getClass.getSimpleName}: ${e.getMessage.linesIterator.next()}")
      }
    }
    spark.stop()
  }
}
