package graft
import org.apache.spark.sql.SparkSession

/** Between-entry state hygiene for long-lived sessions that compose many
  * catalog entries (the bench/verify harness loops, or a production
  * session running the catalog as a library).
  *
  * `spark.catalog.clearCache()` drops SQL-cached relations but NOT the
  * RDD blocks created by `Dataset.localCheckpoint()` — those are plain
  * persisted RDDs registered with the context, invisible to the SQL
  * cache manager. Round 10 measured the consequence: over 198 entries ×
  * 2 bench passes the checkpoint blocks of the near-dup pipelines
  * accumulated in the BlockManager and inflated late-catalog timings
  * 2–4.6× ("Block rdd_* already exists" warnings were the symptom). So
  * entry teardown must clear BOTH layers.
  *
  * Unpersisting a localCheckpointed RDD whose frame is still referenced
  * would break that frame (its lineage was truncated), but the harness
  * contract is that each entry's returned frame is fully consumed
  * (`.count()` / write) and dropped before teardown runs, so nothing
  * here can be re-read afterwards.
  */
object SessionHygiene {
  /** Drop all cached SQL relations AND all persisted RDD blocks
    * (including localCheckpoint blocks) registered with the context. */
  def dropEntryState(spark: SparkSession): Unit = {
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = false))
  }

  /** Number of RDDs still holding persisted blocks — the suite asserts
    * this returns to zero after each catalog entry's teardown, so the
    * leak class fixed in round 11 cannot silently return. */
  def persistentRddCount(spark: SparkSession): Int =
    spark.sparkContext.getPersistentRDDs.size
}
