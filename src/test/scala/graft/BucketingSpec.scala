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

  test("z-ordered parquet files let the probe predicate skip row groups the natural layout cannot") {
    // The write-path proof of the lineitem_zorder entry: actually LAY the
    // files along the curve (range-partition by z ≙ GlobalRank's range
    // shuffle, one row group per file at this size), then measure what
    // the scan READS under the entry's probe predicate. Parquet's
    // row-group stats do the pruning — the scan's numOutputRows is the
    // rows surviving group-level skip, BEFORE Spark's row filter.
    val base = java.nio.file.Files.createTempDirectory("graft-zorder").toString
    val li = Tables.lineitem(spark, sf0001)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"), col("l_suppkey"))
      .withColumn("z", expr(graft.queries.ScaleCatalog.zSpark))
    def write(name: String, order: Seq[org.apache.spark.sql.Column]): String = {
      val dir = s"$base/$name"
      li.repartitionByRange(16, order: _*).sortWithinPartitions(order: _*)
        .drop("z").write.mode("overwrite").parquet(dir)
      dir
    }
    val naturalDir = write("natural", Seq(col("l_orderkey"), col("l_linenumber")))
    val zorderDir = write("zorder", Seq(col("z"), col("l_orderkey"), col("l_linenumber")))
    val total = li.count()
    val matching = li.filter(col("l_partkey").between(64, 127)).count()
    def scanRead(dir: String): (Long, Long) = {
      val df = spark.read.parquet(dir).filter(col("l_partkey").between(64, 127))
      val rows = df.count()
      df.collect() // execute the scan+filter shape so the metric is real
      val plan = df.queryExecution.executedPlan
      assert(plan.toString.contains("PushedFilters: [IsNotNull(l_partkey), GreaterThanOrEqual(l_partkey,64), LessThanOrEqual(l_partkey,127)]"),
        s"probe predicate not pushed to parquet:\n$plan")
      val read = plan.collectLeaves().collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec =>
          s.metrics("numOutputRows").value
      }.sum
      (rows, read)
    }
    val (nRows, nRead) = scanRead(naturalDir)
    val (zRows, zRead) = scanRead(zorderDir)
    // Same answer from both layouts...
    assert(nRows == matching && zRows == matching)
    // ...but the natural layout reads everything (every file's part
    // envelope spans the probe), while the z-order layout skips the
    // row groups whose (part, supp) rectangle misses it.
    assert(nRead == total, s"natural layout unexpectedly pruned: read $nRead of $total")
    assert(zRead < total / 2,
      s"z-order layout pruned too little: read $zRead of $total (matching=$matching)")
    assert(zRead >= matching, s"pruning cannot read fewer than the matching rows")
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
