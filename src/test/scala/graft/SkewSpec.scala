package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Salting
import graft.sources.Sources

/** Skew mitigation: salted aggregation equivalence + AQE skew-join
  * runtime re-planning on a synthetically skewed join.
  */
class SkewSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("salted count/sum equal the direct aggregation on a 40%-hot-key stream") {
    val words = Sources.skewedWords("GUTENBERG", (1 to 30).map(i => s"w$i"), 20000, 0.4)
    val df = words.zipWithIndex.map { case (w, i) => (w, i.toLong, (i % 7).toDouble) }
      .toDF("word", "idx", "v")
    val direct = df.groupBy("word").count().as[(String, Long)].collect().toMap
    val salted = Salting.saltedCount(df, col("word"), col("idx"))
      .as[(String, Long)].collect().toMap
    assert(salted == direct)
    val directSum = df.groupBy("word").agg(sum("v")).as[(String, Double)].collect().toMap
    val saltedSum = Salting.saltedSum(df, col("word"), col("v"), col("idx"))
      .as[(String, Double)].collect().toMap
    assert(saltedSum.keySet == directSum.keySet)
    // Long-valued doubles (i%7): addition is exact, any grouping agrees.
    saltedSum.foreach { case (k, v) => assert(v == directSum(k), s"key $k") }
  }

  test("salted plan: first shuffle keys on (key, salt) — uniform by construction") {
    val df = Seq(("a", 1L), ("a", 2L), ("b", 3L)).toDF("word", "idx")
    val plan = Salting.saltedCount(df, col("word"), col("idx"))
      .queryExecution.optimizedPlan.toString
    // Two aggregation levels are present (salted partial + final merge).
    assert(plan.contains("salt"), s"salt column missing from plan:\n$plan")
    assert("Aggregate".r.findAllIn(plan).size >= 2, s"expected two Aggregates:\n$plan")
  }

  test("adaptive controller raises the flush interval under a heavy skewed stream (the AdCom demo)") {
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.{Sinks, StreamingQueries, UpsertSink}
    // Start at the floor: real micro-batches of a 150k-row skewed word
    // count take far longer than 50ms, so utilization >= 100% (overload)
    // and the banded policy must walk the interval UP.
    val ctl = StreamingQueries.withController(spark, "skew_adapt", initialIntervalMs = 50L)
    val words = Sources.skewedWords("GUTENBERG", (1 to 50).map(i => s"w$i"), 150000, 0.4)
    val input = MemoryStream[String](spark)
    val sinkId = s"skewadapt-${System.nanoTime()}"
    val q = input.toDF().toDF("word").groupBy("word").count()
      .writeStream.queryName("skew_adapt").outputMode("update")
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(50L))
      .foreach(new UpsertSink(sinkId)).start()
    try {
      words.grouped(50000).foreach { chunk =>
        input.addData(chunk)
        q.processAllAvailable()
      }
      val deadline = System.currentTimeMillis() + 10000
      while (ctl.decisions.size < 2 && System.currentTimeMillis() < deadline) Thread.sleep(100)
    } finally {
      q.stop()
      spark.streams.removeListener(ctl)
      Sinks.clear(sinkId)
    }
    assert(ctl.decisions.nonEmpty, "no progress signals reached the controller")
    assert(ctl.decisions.exists(_.utilizationPct >= 100.0),
      s"no overloaded batch observed: ${ctl.decisions.map(_.utilizationPct)}")
    assert(ctl.currentIntervalMs > 50L,
      s"interval did not adapt upward: ${ctl.decisions}")
  }

  test("AQE splits a skewed sort-merge join at runtime") {
    val prev = Map(
      "spark.sql.adaptive.skewJoin.enabled" -> spark.conf.getOption("spark.sql.adaptive.skewJoin.enabled"),
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" ->
        spark.conf.getOption("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes"),
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" ->
        spark.conf.getOption("spark.sql.adaptive.advisoryPartitionSizeInBytes"),
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" ->
        spark.conf.getOption("spark.sql.adaptive.skewJoin.skewedPartitionFactor"),
      "spark.sql.autoBroadcastJoinThreshold" ->
        spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold"))
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    try {
      // Left side: 95% of 60k rows share one key; right side small-but-
      // not-broadcast lookup.
      val left = (1 to 60000).map(i => (if (i % 20 != 0) 0L else i.toLong % 50, s"payload-$i-${"x" * 64}"))
        .toDF("k", "payload")
      val right = (0 to 49).map(i => (i.toLong, s"dim-$i")).toDF("k2", "name")
      val joined = left.join(right, col("k") === col("k2"))
      // collect() executes THIS QueryExecution so the adaptive plan is
      // final when we inspect it (count() would plan a separate query).
      assert(joined.collect().length == 60000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"), s"AQE did not mark the skew join:\n${plan.take(2000)}")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
