package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The RUNTIME leg of the skew toolkit, pinned: next to the STATIC salt
  * device (`lineitem_salted_join` / RoutedJoin's salted route) and the
  * PLAN-TIME sketch router (RoutedJoin.choose), Spark's AQE can split a
  * skewed shuffle partition at runtime from the actual map output sizes
  * — no salt, no sketch, but only AFTER the skewed shuffle has been
  * written. This spec pins that the mechanism actually fires on a
  * hot-key sort-merge join (so the catalog scaladocs' "AQE's skew-join
  * split covers the sort-merge case at runtime" stays true on this
  * Spark version), and that the split is result-invisible.
  *
  * Two test-scale notes that ARE the production lessons: thresholds are
  * scaled down from the 256 MB default (factor/threshold semantics
  * identical), and the pad column must be incompressible — skew
  * detection reads the COMPRESSED map-output sizes, so a constant pad
  * lz4-collapses and the hot partition never clears the byte threshold
  * (exactly how low-entropy hot keys dodge AQE in production while
  * still blowing a reducer's memory).
  */
class AqeSkewSpec extends AnyFunSuite {
  import TestSpark.spark

  test("AQE splits the hot partition of a skewed sort-merge join at runtime") {
    val s = spark.newSession()
    s.conf.set("spark.sql.adaptive.enabled", "true")
    s.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16384")
    s.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8192")
    s.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s.conf.set("spark.sql.shuffle.partitions", "8")
    import s.implicits._
    // 80% of the fact mass on key 1; incompressible per-row pad (see
    // the class scaladoc for why that matters).
    val fact = (1L to 20000L)
      .map(i => (i, if (i % 10 < 8) 1L else i % 97 + 2,
        java.lang.Long.toHexString(i * 2654435761L) * 8))
      .toDF("id", "k", "pad")
    val dim = (1L to 100L).map(i => (i, s"attr$i")).toDF("dk", "attr")
    val joined = fact.join(dim.hint("merge"), col("k") === col("dk"))
    val got = joined.collect()
      .groupBy(_.getAs[String]("attr")).view.mapValues(_.length.toLong).toMap
    // The final adaptive plan must mark the SMJ as skew-split with a
    // skewed shuffle read on the fact side.
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("isFinalPlan=true"), s"AQE did not finalize\n$plan")
    assert(plan.contains("SortMergeJoin(skew=true)"),
      s"AQE skew split did not fire\n$plan")
    assert(plan.contains("AQEShuffleRead skewed"),
      s"no skewed shuffle read in the final plan\n$plan")
    // Result-invisible: equals the broadcast join of the same frames.
    val want = fact.join(broadcast(dim), col("k") === col("dk"))
      .groupBy("attr").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got == want, "skew-split join result diverges from broadcast join")
  }
}
