package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.combine.Aggregations._
import graft.combine.{Combine, TopNAgg}

/** End-to-end: the Combine surface on real Spark datasets must agree with
  * the plain declarative aggregates (Catalyst's own partial/final split),
  * and the DataFrame TopNAgg must agree with the ranked-window formulation
  * it replaced.
  */
class CombineSparkSpec extends AnyFunSuite {
  import TestSpark.{sf0001, spark}
  import spark.implicits._

  private lazy val events = Tables.events(spark, sf0001)

  test("Combine.combine(CountPreAgg) == groupBy().count()") {
    val ds = events.select(col("user_id"), lit(1L)).as[(Long, Long)]
    val got = Combine.combine(ds, new CountPreAgg[Long]).collect().toMap
    val want = events.groupBy("user_id").count()
      .as[(Long, Long)].collect().toMap
    assert(got == want)
  }

  test("Combine.combine(MaxPreAgg) == groupBy().max()") {
    val ds = events.select(col("user_id"), col("value").cast("long")).as[(Long, Long)]
    val got = Combine.combine(ds, new MaxPreAgg[Long]).collect().toMap
    val want = events.groupBy("user_id").agg(max(col("value").cast("long")))
      .as[(Long, Long)].collect().toMap
    assert(got == want)
  }

  test("Combine.combine(AvgPreAgg) == groupBy().avg() (1e-9)") {
    val ds = events.select(col("user_id"), col("value")).as[(Long, Double)]
    val got = Combine.combine(ds, new AvgPreAgg[Long]).collect().toMap
    val want = events.groupBy("user_id").agg(avg("value"))
      .as[(Long, Double)].collect().toMap
    assert(got.keySet == want.keySet)
    got.foreach { case (k, v) => assert(math.abs(v - want(k)) < 1e-9, s"key $k") }
  }

  test("TopNAgg udaf == ranked-window top-5 (the plan it replaced)") {
    import org.apache.spark.sql.expressions.Window
    val topn = udaf(new TopNAgg(5))
    val got = events.groupBy("event_type")
      .agg(topn(col("value"), col("event_id")).as("top"))
      .select(col("event_type"), posexplode(col("top.entries")))
      .select(col("event_type"), col("col.event_id"), col("col.value"), (col("pos") + 1).as("rn"))
      .as[(String, Long, Double, Int)].collect().toSet
    val w = Window.partitionBy(col("event_type")).orderBy(desc("value"), asc("event_id"))
    val want = events
      .select(col("event_type"), col("event_id"), col("value"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
      .as[(String, Long, Double, Int)].collect().toSet
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("Combine.combine runs on a streaming Dataset in update mode (the reference's operator mode)") {
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.{Sinks, UpsertSink}
    val input = MemoryStream[(Long, Long)](spark)
    val counted = Combine.combine(input.toDS(), new CountPreAgg[Long])
    val sinkId = s"combine-stream-${System.nanoTime()}"
    val q = counted.toDF("k", "cnt").writeStream.outputMode("update")
      .foreach(new UpsertSink(sinkId)).start()
    val data = (1L to 200L).map(i => (i % 9, 1L))
    try {
      input.addData(data.take(120): _*)
      q.processAllAvailable()
      input.addData(data.drop(120): _*)
      q.processAllAvailable()
    } finally q.stop()
    val got = Sinks.registry(sinkId).asScala.toMap.map { case (k, r) => k.toLong -> r.getLong(1) }
    Sinks.clear(sinkId)
    val want = data.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    assert(got == want)
  }

  test("TopNAgg plan has a partial ObjectHashAggregate before the exchange") {
    val topn = udaf(new TopNAgg(5))
    val plan = events.groupBy("event_type")
      .agg(topn(col("value"), col("event_id")).as("top"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_topnagg"), s"no partial aggregation in plan:\n$plan")
  }
}
