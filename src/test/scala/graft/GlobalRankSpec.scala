package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.GlobalRank

/** GlobalRank: distributed ROW_NUMBER equivalence, multi-partition
  * execution (never one task), and run-to-run determinism under ties.
  */
class GlobalRankSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def frame(n: Int) =
    (1 to n).map(i => (i.toLong, (i * 7919 % 101).toDouble, s"s${i % 5}"))
      .toDF("id", "score", "tag")

  test("withRank equals the single-partition window ROW_NUMBER") {
    val df = frame(997)
    val got = GlobalRank.withRank(df, Seq(col("score").desc, col("id").asc), 8)
      .select("id", "rank").as[(Long, Long)].collect().toMap
    val want = df
      .withColumn("rank", row_number().over(Window.orderBy(col("score").desc, col("id").asc)).cast("long"))
      .select("id", "rank").as[(Long, Long)].collect().toMap
    assert(got == want)
  }

  test("ranking runs on many partitions, not one") {
    val ranked = GlobalRank.withRank(frame(2000), Seq(col("score").desc, col("id").asc), 16)
    assert(ranked.rdd.getNumPartitions == 16)
    val perPart = ranked.rdd.mapPartitions(it => Iterator(it.size)).collect()
    assert(perPart.count(_ > 0) > 4, s"rows concentrated: ${perPart.mkString(",")}")
    // Partition borders respect the global order: each partition's ranks
    // are contiguous and ascending across partition index.
    val ranges = ranked.select("rank").rdd
      .mapPartitionsWithIndex { (i, it) =>
        val rs = it.map(_.getLong(0)).toSeq
        if (rs.isEmpty) Iterator.empty else Iterator((i, rs.min, rs.max, rs.size))
      }.collect().sortBy(_._1)
    ranges.foreach { case (_, lo, hi, n) => assert(hi - lo + 1 == n) }
    ranges.sliding(2).foreach {
      case Array((_, _, hi, _), (_, lo, _, _)) => assert(lo == hi + 1)
      case _ =>
    }
  }

  test("deterministic across runs, including heavy ties") {
    val df = (1 to 500).map(i => (i.toLong, (i % 3).toDouble)).toDF("id", "v")
    val order = Seq(col("v").asc, col("id").asc)
    val a = GlobalRank.withRank(df, order, 7).select("id", "rank").as[(Long, Long)].collect().toMap
    val b = GlobalRank.withRank(df, order, 13).select("id", "rank").as[(Long, Long)].collect().toMap
    assert(a == b, "rank depends on partition count")
  }

  test("withRankPerKey equals the keyed window ROW_NUMBER") {
    val df = frame(997)
    val got = GlobalRank
      .withRankPerKey(df, Seq("tag"), Seq(col("score").asc, col("id").asc), 8)
      .select("id", "rank").as[(Long, Long)].collect().toMap
    val want = df
      .withColumn("rank", row_number().over(
        Window.partitionBy("tag").orderBy(col("score").asc, col("id").asc)).cast("long"))
      .select("id", "rank").as[(Long, Long)].collect().toMap
    assert(got == want)
  }

  test("withRankPerKey: a dominating key spans partitions instead of one task") {
    // 90% of rows share one key — the fat-crawl-source shape the
    // operator exists for. The fat key's rows must occupy >1 partition
    // (a keyed window would put them all in one sort task), and its
    // ranks must still be the contiguous 1..n sequence.
    val df = (1 to 3000)
      .map(i => (i.toLong, i.toLong, if (i % 10 == 0) s"small${i % 3}" else "fat"))
      .toDF("id", "score", "tag")
    val ranked = GlobalRank
      .withRankPerKey(df, Seq("tag"), Seq(col("score").asc, col("id").asc), 16)
    val fatParts = ranked.filter(col("tag") === "fat").rdd
      .mapPartitions(it => Iterator(it.size)).collect().count(_ > 0)
    assert(fatParts > 1, s"fat key collapsed to $fatParts partition(s)")
    val fatRanks = ranked.filter(col("tag") === "fat")
      .select("rank").as[Long].collect().sorted
    assert(fatRanks.toSeq == (1L to fatRanks.length).toSeq,
      "fat key's ranks are not the contiguous 1..n sequence")
  }

  test("withRankPerKey equals the keyed window on seeded-random frames") {
    // Generative equivalence over shapes a fixed fixture misses: random
    // key cardinality (1..40, so some runs have one giant key and some
    // have key-per-row), random tie density, null keys AND null order
    // values, random partition counts.
    val rnd = new scala.util.Random(424242L)
    (1 to 5).foreach { trial =>
      val n = 200 + rnd.nextInt(800)
      val nKeys = 1 + rnd.nextInt(40)
      val tieMod = 1 + rnd.nextInt(20)
      val rows = (1 to n).map { i =>
        val k = if (rnd.nextInt(10) == 0) null else s"k${rnd.nextInt(nKeys)}"
        val v: java.lang.Long =
          if (rnd.nextInt(15) == 0) null else Long.box(rnd.nextInt(tieMod).toLong)
        (i.toLong, v, k)
      }
      val df = rows.toDF("id", "v", "tag")
      val order = Seq(col("v").asc, col("id").asc)
      val parts = 2 + rnd.nextInt(15)
      val got = GlobalRank.withRankPerKey(df, Seq("tag"), order, parts)
        .select("id", "rank").as[(Long, Long)].collect().toMap
      val want = df.withColumn("rank", row_number().over(
          Window.partitionBy("tag").orderBy(order: _*)).cast("long"))
        .select("id", "rank").as[(Long, Long)].collect().toMap
      assert(got == want, s"trial $trial (n=$n keys=$nKeys parts=$parts) diverged")
    }
  }

  test("withPrefixSumPerKey equals the keyed running-sum window, both frames") {
    val df = frame(800).withColumn("w", (col("id") % 13).cast("long"))
    val order = Seq(col("score").asc, col("id").asc)
    val wIncl = Window.partitionBy("tag").orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wExcl = Window.partitionBy("tag").orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val gotIncl = GlobalRank
      .withPrefixSumPerKey(df, Seq("tag"), order, "w", 8, "cum", inclusive = true)
      .select("id", "cum").as[(Long, Long)].collect().toMap
    val wantIncl = df.withColumn("cum", sum("w").over(wIncl))
      .select("id", "cum").as[(Long, Long)].collect().toMap
    assert(gotIncl == wantIncl, "inclusive prefix sum diverges from the window")
    val gotExcl = GlobalRank
      .withPrefixSumPerKey(df, Seq("tag"), order, "w", 8, "cum", inclusive = false)
      .select("id", "cum").as[(Long, Long)].collect().toMap
    val wantExcl = df.withColumn("cum", coalesce(sum("w").over(wExcl), lit(0L)))
      .select("id", "cum").as[(Long, Long)].collect().toMap
    assert(gotExcl == wantExcl, "exclusive prefix sum diverges from coalesce(window, 0)")
  }

  test("withPrefixSumPerKey on seeded-random frames: nulls contribute 0, keys span partitions") {
    val rnd = new scala.util.Random(515151L)
    (1 to 4).foreach { trial =>
      val n = 300 + rnd.nextInt(500)
      val rows = (1 to n).map { i =>
        val k = if (rnd.nextInt(12) == 0) null else s"k${rnd.nextInt(1 + rnd.nextInt(20))}"
        val w: java.lang.Long =
          if (rnd.nextInt(10) == 0) null else Long.box(rnd.nextInt(50).toLong)
        (i.toLong, w, k)
      }
      val df = rows.toDF("id", "w", "tag")
      val order = Seq(col("id").asc)
      val parts = 3 + rnd.nextInt(12)
      val got = GlobalRank
        .withPrefixSumPerKey(df, Seq("tag"), order, "w", parts, "cum", inclusive = true)
        .select("id", "cum").as[(Long, Long)].collect().toMap
      // Null w skips (contributes 0); cum itself is never null — the
      // window mirror needs the null-skip coalesce only on the empty
      // leading frame.
      val w = Window.partitionBy("tag").orderBy(order: _*)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val want = df.withColumn("cum", coalesce(sum("w").over(w), lit(0L)))
        .select("id", "cum").as[(Long, Long)].collect().toMap
      assert(got == want, s"trial $trial (n=$n parts=$parts) diverged")
    }
  }

  test("withPrefixSumPerKey rejects a non-Long sum column with a contract error") {
    // r18 ADVICE: an int/decimal sumCol used to die at executor time
    // with an opaque ClassCastException; the operator now names the
    // contract at the driver before any job runs.
    val df = (1 to 10).map(i => (i.toLong, i, s"k${i % 2}")).toDF("id", "w", "tag")
    val e = intercept[IllegalArgumentException] {
      GlobalRank.withPrefixSumPerKey(df, Seq("tag"), Seq(col("id")), "w", 4)
    }
    assert(e.getMessage.contains("must be LongType"), e.getMessage)
  }

  test("withRankPerKey is partition-count invariant, including ties and null keys") {
    val df = (1 to 400)
      .map(i => (i.toLong, (i % 5).toDouble,
        if (i % 7 == 0) null else s"k${i % 3}"))
      .toDF("id", "v", "tag")
    val order = Seq(col("v").asc, col("id").asc)
    val a = GlobalRank.withRankPerKey(df, Seq("tag"), order, 6)
      .select("id", "rank").as[(Long, Long)].collect().toMap
    val b = GlobalRank.withRankPerKey(df, Seq("tag"), order, 17)
      .select("id", "rank").as[(Long, Long)].collect().toMap
    assert(a == b, "per-key rank depends on partition count")
    val want = df.withColumn("rank", row_number().over(
        Window.partitionBy("tag").orderBy(order: _*)).cast("long"))
      .select("id", "rank").as[(Long, Long)].collect().toMap
    assert(a == want, "per-key rank diverges from the keyed window under ties/nulls")
  }
}
