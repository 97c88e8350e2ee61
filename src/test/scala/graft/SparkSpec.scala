package graft

import org.apache.spark.sql.SparkSession

/** One shared local SparkSession for the whole forked test JVM. */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    // The suite follows the harness contract (frames fully consumed
    // before SessionHygiene.dropEntryState teardown), so the per-RDD
    // "was locally checkpointed … cannot be recomputed after
    // unpersisting" WARN that teardown necessarily triggers is noise
    // here exactly as in the Bench/Verify mains — ~550 lines per full
    // run burying real warnings.
    SessionHygiene.quietCheckpointTeardownLogs()
    s
  }
  val sf0001 = "/root/testdata/sf0.001"
  val sf001 = "/root/testdata/sf0.01"
}
