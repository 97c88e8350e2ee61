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
    * (including localCheckpoint blocks) registered with the context.
    *
    * BLOCKING by design (round-11 finding #1): this is HARNESS teardown
    * — it runs between entries, off any query's critical path — and the
    * async form let 206 entries × 2 passes of deferred block-removal
    * storms (plus checkpoint-block GC churn) land on whichever cheap
    * entries followed the heavy ones, inflating the committed bench for
    * a moving cluster of entries 3–6.6× vs isolated runs two rounds in a
    * row. Waiting here charges cleanup to the entry that made the mess.
    * Query-INTERNAL unpersists (inside catalog entries, on their own
    * critical path) correctly stay `blocking = false`.
    */
  def dropEntryState(spark: SparkSession): Unit = {
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = true))
  }

  /** Number of RDDs still holding persisted blocks — the suite asserts
    * this returns to zero after each catalog entry's teardown, so the
    * leak class fixed in round 11 cannot silently return. */
  def persistentRddCount(spark: SparkSession): Int =
    spark.sparkContext.getPersistentRDDs.size

  /** Silence the per-RDD "was locally checkpointed … cannot be
    * recomputed after unpersisting" WARN that [[dropEntryState]]
    * necessarily triggers (it unpersists checkpoint blocks between
    * entries — safe under the harness contract that every returned frame
    * is fully consumed first, but Spark cannot know that). 206 entries ×
    * 2 passes of that spam buried real warnings in the bench/verify
    * tails. Scoped to the `org.apache.spark.rdd` loggers only (the
    * warning is logged under the concrete RDD class name), and called
    * only from harness mains — library callers keep full logging.
    */
  def quietCheckpointTeardownLogs(): Unit =
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.rdd", org.apache.logging.log4j.Level.ERROR)
}
