package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.MisraGries

/** ScaleCatalog: bounded-memory heavy hitters, Z-order layout, EWMA. */
class ScaleCatalogSpec extends AnyFunSuite {
  import TestSpark.{sf0001, spark}
  import spark.implicits._

  private def run(name: String) = SparkEntry.queries(name)(spark, sf0001)

  // ---------------- Misra–Gries kernel (the eviction path the catalog
  // entry's oversized budget never exercises at test SF) ----------------

  test("MisraGries: survival guarantee under heavy eviction, size bounded") {
    // Zipf-ish stream: item i appears ~N/i times; vocabulary 200 >> k = 8.
    val stream = (1 to 200).flatMap(i => Seq.fill(2000 / i)(s"item$i"))
    // Deterministic shuffle so survival can't ride on adversarial order.
    val rnd = new scala.util.Random(42)
    val shuffled = rnd.shuffle(stream)
    val k = 8
    val out = MisraGries.survivors(shuffled.iterator, k).toSet
    assert(out.size <= k, s"sketch kept ${out.size} > capacity $k")
    val n = shuffled.size
    val counts = shuffled.groupBy(identity).view.mapValues(_.size)
    val mustSurvive = counts.filter { case (_, c) => c * (k + 1) > n }.keys.toSet
    assert(mustSurvive.nonEmpty, "test vacuous: no item above n/(k+1)")
    assert(mustSurvive.subsetOf(out),
      s"guarantee violated: ${(mustSurvive -- out).mkString(",")} evicted")
  }

  test("MisraGries: stream shorter than capacity is returned exactly") {
    val out = MisraGries.survivors(Iterator("a", "b", "a"), 16).toSet
    assert(out == Set("a", "b"))
  }

  test("MisraGries: chunked fold with a carried map equals the one-pass sketch") {
    // The streaming-state contract: micro-batch boundaries cannot change
    // the sketch. Fold the same stream whole and in 7 uneven chunks.
    val stream = (1 to 100).flatMap(i => Seq.fill(500 / i)(s"w$i"))
    val rnd = new scala.util.Random(11)
    val shuffled = rnd.shuffle(stream)
    val whole = scala.collection.mutable.HashMap.empty[String, Long]
    MisraGries.foldInto(whole, shuffled.iterator, 8)
    val chunked = scala.collection.mutable.HashMap.empty[String, Long]
    shuffled.grouped(shuffled.size / 7 + 1).foreach(c =>
      MisraGries.foldInto(chunked, c.iterator, 8))
    assert(whole.toMap == chunked.toMap)
  }

  // ---------------- token_heavy_hitters ----------------

  test("token_heavy_hitters == naive exact count (partition-independent)") {
    import graft.functions.Text
    val naive = {
      val toks = Tables.documents(spark, sf0001)
        .select(Text.normTokens(col("text")).as("t"))
      val bigrams = toks.filter(size(col("t")) >= 2)
        .select(explode(Text.wordNgrams(col("t"), 2)).as("bg"))
      val n = bigrams.count()
      bigrams.groupBy("bg").agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") * 1025 > n)
        .select(col("bg"), col("cnt"),
          round(col("cnt").cast("double") / n, 6).as("share"))
    }
    val got = run("token_heavy_hitters")
    assert(got.collect().map(_.toSeq).toSet == naive.collect().map(_.toSeq).toSet)
    assert(got.count() > 0, "vacuous: no frequent bigrams at sf0.001")
  }

  // ---------------- lineitem_zorder ----------------

  test("lineitem_zorder: per-layout partition of all rows, zorder prunes more") {
    val out = run("lineitem_zorder").cache()
    val total = Tables.lineitem(spark, sf0001).count()
    val perLayout = out.groupBy("layout")
      .agg(sum("n_rows").as("rows"), sum("probe_prunable").as("prunable"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(perLayout("natural")._1 == total && perLayout("zorder")._1 == total,
      "bucket row counts must partition the table in both layouts")
    // The whole point of the entry: arrival order leaves full-width key
    // envelopes (nothing prunable), Z-order gives tight rectangles.
    assert(perLayout("zorder")._2 > perLayout("natural")._2,
      s"zorder pruned ${perLayout("zorder")._2} <= natural ${perLayout("natural")._2}")
    // Envelope sanity: a prunable bucket really is disjoint from the probe.
    val bad = out.filter(col("probe_prunable") === 1 &&
      col("max_part") >= 64 && col("min_part") <= 127).count()
    assert(bad == 0)
    out.unpersist(blocking = false)
  }

  // ---------------- events_ewma ----------------

  test("events_ewma matches a driver-side exact replay of the 16-tap fold") {
    val out = run("events_ewma")
      .select("event_id", "event_type", "value", "ewma")
      .collect().map(r => r.getLong(0) -> r).toMap
    // Replay per type in (ts, event_id) order with the same integer
    // weight ladder in BigDecimal — exact, so the comparison is ==.
    val ev = Tables.events(spark, sf0001)
      .select(col("event_type"), col("ts"), col("event_id"), col("value"))
      .collect()
      .map(r => (r.getString(0), r.getTimestamp(1).getTime, r.getLong(2), r.getDouble(3)))
      .groupBy(_._1)
    var checked = 0
    ev.foreach { case (_, rows) =>
      val ordered = rows.sortBy(r => (r._2, r._3))
      ordered.indices.foreach { i =>
        val taps = (0 until 16).flatMap { j =>
          if (i - j >= 0) Some((BigDecimal(ordered(i - j)._4).setScale(4), 32768 >> j))
          else None
        }
        val num = taps.map { case (v, w) => v * w }.sum
        val den = taps.map(_._2).sum
        val want = BigDecimal(num.toDouble / den)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        val got = out(ordered(i)._3)
        assert(got.getDouble(3) == want,
          s"event ${ordered(i)._3}: ewma ${got.getDouble(3)} != $want")
        checked += 1
      }
    }
    assert(checked == out.size)
  }

  // ---------------- KMV distinct-overlap sketch ----------------

  test("KMV: degenerate branch — sketches under K values make estimates EXACT") {
    // Two tiny sources sharing half their vocabulary: every distinct
    // bigram fits in the K=256 sketch, so est_union/est_inter/jaccard_est
    // must equal the exact values bit-for-bit (the estimator's documented
    // degenerate contract; the test corpus only exercises the >K branch).
    def text(words: Seq[String]) = words.mkString(" ")
    val shared = (0 until 10).map(i => s"shared$i")
    val docs = Seq(
      (1L, text(shared ++ (0 until 10).map(i => s"aonly$i")), "en", "sA", 0L),
      (2L, text(shared ++ (0 until 10).map(i => s"bonly$i")), "en", "sB", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = graft.queries.ScaleCatalog.kmvOverlapFrom(docs).collect()
    assert(r.length == 1)
    val row = r.head
    val (exU, exI) = (row.getAs[Long]("exact_union"), row.getAs[Long]("exact_inter"))
    assert(exI > 0 && exU > exI, "test vacuous: no partial overlap")
    assert(row.getAs[Double]("est_union") == exU.toDouble)
    assert(row.getAs[Double]("est_inter") == exI.toDouble)
    assert(row.getAs[Double]("jaccard_est") == row.getAs[Double]("jaccard_exact"))
  }

  test("KMV: estimator branch at sf0.001 — every estimate within 4/sqrt(K) of exact") {
    // Beyer et al. give ~1/sqrt(K) standard error for the union
    // estimator; 4 sigma over 190 pairs is a generous but real bound —
    // a broken hash-space constant or truncation bug lands far outside.
    val rows = run("source_kmv_overlap").collect()
    assert(rows.nonEmpty)
    val bound = 4.0 / math.sqrt(256.0)
    rows.foreach { r =>
      val exU = r.getAs[Long]("exact_union").toDouble
      val relErr = math.abs(r.getAs[Double]("est_union") - exU) / exU
      assert(relErr <= bound,
        s"${r.getAs[String]("src_a")}-${r.getAs[String]("src_b")}: " +
          s"union rel err $relErr exceeds $bound")
      val j = r.getAs[Double]("jaccard_est")
      assert(j >= 0.0 && j <= 1.0)
    }
  }
}
