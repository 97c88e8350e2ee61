package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Bucketing

/** Bucketed co-located join: same bucket layout on both sides ⇒ the join
  * plans with no shuffle exchange.
  */
class BucketingSpec extends AnyFunSuite {
  import TestSpark.{sf0001, spark}

  test("matching bucket layouts join without any exchange") {
    val orders = Tables.orders(spark, sf0001).select("o_orderkey", "o_custkey", "o_totalprice")
    val lineitem = Tables.lineitem(spark, sf0001).select("l_orderkey", "l_quantity")
    Bucketing.writeBucketed(orders, "orders_b", "o_orderkey", numBuckets = 8)
    Bucketing.writeBucketed(lineitem, "lineitem_b", "l_orderkey", numBuckets = 8)
    try {
      val joined = Bucketing.bucketedJoin(spark, "orders_b", "lineitem_b", "o_orderkey", "l_orderkey")
      // Force planning + execution.
      val n = joined.count()
      assert(n == lineitem.join(orders, col("l_orderkey") === col("o_orderkey")).count())
      assert(Bucketing.isExchangeFree(joined),
        s"bucketed join still shuffles:\n${joined.queryExecution.executedPlan}")
      // Aggregating ON the bucket key also reuses the layout (no exchange
      // before the partial/final aggregation pair on bucketed input).
      val agg = spark.table("lineitem_b").groupBy("l_orderkey").count()
      agg.count()
      assert(Bucketing.isExchangeFree(agg),
        s"bucket-key aggregation still shuffles:\n${agg.queryExecution.executedPlan}")
    } finally {
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }

  test("partitioned writes prune whole directories at planning time") {
    val dir = java.nio.file.Files.createTempDirectory("graft-part").toString
    val docs = Tables.documents(spark, sf0001)
    Bucketing.writePartitioned(docs, dir, "source")
    val back = spark.read.parquet(dir).filter(col("source") === "src1")
    val plan = back.queryExecution.executedPlan.toString
    // The source predicate must land in PartitionFilters (directory
    // pruning), NOT PushedFilters (row-group evaluation inside files).
    assert(plan.contains("PartitionFilters: [isnotnull(source"),
      s"partition predicate not pruned at planning time:\n$plan")
    assert(back.count() == docs.filter(col("source") === "src1").count())
    // And only the one matching directory's files are read.
    val partitionsRead = back.queryExecution.executedPlan.collectLeaves()
      .collect { case s: org.apache.spark.sql.execution.FileSourceScanExec =>
        s.selectedPartitions.partitionCount }.sum
    assert(partitionsRead == 1, s"expected exactly 1 selected partition, got $partitionsRead")
  }
}
