package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/** Dataset-level dedup facade. */
class DedupSpec extends AnyFunSuite {
  import TestSpark.{sf0001, spark}
  import spark.implicits._

  test("exactByContent keeps the min-id survivor per content") {
    val df = Seq(
      (3L, "Alpha  Beta"), (1L, " alpha beta "), (2L, "gamma"), (5L, "alpha beta"))
      .toDF("doc_id", "text")
    val kept = Dedup.exactByContent(df, col("text"), col("doc_id"))
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 2L))
  }

  test("doc_decontaminate: flags exactly the docs sharing an 8-gram with the benchmark slice") {
    // Brute-force ground truth: explode 8-shingles of every doc, flag any
    // corpus doc whose shingle set intersects the benchmark (%50) docs'.
    val docs = Tables.documents(spark, sf0001)
    val sh = docs.select(col("doc_id"),
      explode(graft.functions.Text.shingles(col("text"), 8)).as("g"))
    val benchG = sh.filter(col("doc_id") % 50 === 0).select("g").distinct()
      .as[String].collect().toSet
    val truth = sh.filter(col("doc_id") % 50 =!= 0)
      .as[(Long, String)].collect()
      .groupBy(_._1).map { case (id, gs) => id -> gs.exists(g => benchG(g._2)) }
    val got = SparkEntry.queries("doc_decontaminate")(spark, sf0001)
      .as[(Long, Boolean)].collect().toMap
    assert(got == truth)
    // The flag must carry signal on this corpus (near-dups of benchmark
    // docs exist by construction) without flagging everything.
    val nTrue = got.values.count(identity)
    assert(nTrue > 0 && nTrue < got.size, s"vacuous flag: $nTrue of ${got.size}")
    // 100 TB shape: the membership probe broadcasts the benchmark grams —
    // the corpus-side explode is never shuffled into the semi join.
    val plan = SparkEntry.queries("doc_decontaminate")(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftSemi"),
      s"benchmark gram probe is not a broadcast semi join:\n$plan")
  }

  test("doc_incremental_dedup: increment keeps exactly the signatures unseen in the base snapshot") {
    val hashed = SparkEntry.queries("doc_simhash")(spark, sf0001)
      .as[(Long, Long)].collect()
    val baseH = hashed.filter(_._1 % 10 < 7).map(_._2).toSet
    val truth = hashed.filter(r => r._1 % 10 >= 7 && !baseH(r._2)).map(_._1).toSet
    val got = SparkEntry.queries("doc_incremental_dedup")(spark, sf0001)
      .select("doc_id").as[Long].collect().toSet
    assert(got == truth)
    // Signal: near-dup recrawls collide on the signature across the
    // split, so some increment docs must be dropped — and not all.
    val incrementN = hashed.count(_._1 % 10 >= 7)
    assert(got.nonEmpty && got.size < incrementN,
      s"vacuous increment dedup: kept ${got.size} of $incrementN")
  }

  test("doc_quality_filter: per-source p25 gate — kept docs at/above their own source's cut") {
    val out = SparkEntry.queries("doc_quality_filter")(spark, sf0001)
      .as[(Long, String, Double, Double)].collect()
    assert(out.forall { case (_, _, q, q25) => q >= q25 })
    // One threshold per source, and the gate must actually drop docs
    // while keeping >= 75% minus ties (p25 semantics).
    val perSource = out.groupBy(_._2)
    val totals = Tables.documents(spark, sf0001).groupBy("source").count()
      .as[(String, Long)].collect().toMap
    assert(perSource.keySet == totals.keySet)
    perSource.foreach { case (src, rows) =>
      assert(rows.map(_._4).distinct.size == 1, s"$src: multiple thresholds")
      val kept = rows.size.toDouble / totals(src)
      assert(kept >= 0.70 && kept <= 1.0, s"$src kept ratio $kept out of p25 range")
    }
    assert(out.size < totals.values.sum, "gate dropped nothing")
    // Thresholds ride a broadcast join back onto the corpus — the scored
    // frame must not shuffle on the low-cardinality source key.
    val plan = SparkEntry.queries("doc_quality_filter")(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"threshold join not broadcast:\n$plan")
  }

  test("cdcChunks: a front insertion perturbs at most the chunk containing the seam") {
    import spark.implicits._
    import graft.functions.Text
    // The Rabin-CDC property the operator exists for: boundaries are
    // per-token content, so prepending text changes only chunks up to
    // the first boundary at/after the seam — every later chunk
    // re-aligns identically. Fixed blocks (doc_block_dedup's cutting)
    // would shift ALL of them.
    val base = Tables.documents(spark, sf0001)
      .select(col("text")).as[String].head(5)
    base.foreach { t =>
      val Seq(orig, edited) = Seq(t, "breaking news inserted here " + t)
        .toDF("text")
        .select(Text.cdcChunks(col("text")).as("cs"))
        .as[Seq[String]].collect().toSeq
      val lost = orig.toSet -- edited.toSet
      assert(lost.size <= 1,
        s"CDC blast radius ${lost.size} > 1 chunk for a front edit: $lost")
      assert(orig.nonEmpty && orig.mkString(" ") ==
        t.trim.toLowerCase.replaceAll("\\s+", " "),
        "chunks must partition the normalized text")
    }
  }

  test("doc_winnow_overlap: a long shared token run is caught, disjoint docs are not") {
    // The winnowing guarantee (Schleimer 2003 §3): any shared run of
    // >= W + K - 1 = 6 tokens yields at least one shared fingerprint.
    // The 16-token run here yields several, clearing the shared >= 2
    // reporting floor; the disjoint-vocabulary doc must produce nothing.
    val dir = java.nio.file.Files.createTempDirectory("winnow").toString
    val sharedRun = (10 to 25).map(i => s"tok$i").mkString(" ")
    val docs = Seq(
      (0L, (1 to 30).map(i => s"tok$i").mkString(" ")),
      (1L, "alpha beta gamma delta " + sharedRun + " epsilon zeta"),
      (2L, (1 to 30).map(i => s"other$i").mkString(" ")),
      (3L, (1 to 30).map(i => s"tok$i").mkString(" ")) // identical to doc 0
    ).toDF("doc_id", "text")
      .select(col("doc_id"), col("text"), lit("en").as("lang"),
        lit("s1").as("source"), length(col("text")).cast("long").as("n_chars"))
    docs.coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("doc_winnow_overlap")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    assert(got.contains((0L, 1L)), s"shared-run pair missed: ${got.keySet}")
    assert(got((0L, 3L))._2 == 1.0, "identical docs must overlap 1.0")
    // Doc 3 is byte-identical to doc 0, so its sharing with doc 1 matches.
    assert(got((1L, 3L))._1 == got((0L, 1L))._1)
    assert(!got.keySet.exists { case (a, b) => a == 2L || b == 2L },
      "disjoint-vocabulary doc produced a pair")
  }

  test("dropNearDuplicates removes pair losers from the corpus") {
    val docs = Tables.documents(spark, sf0001)
    val pairs = SparkEntry.queries("doc_near_dup_lsh")(spark, sf0001)
    val cleaned = Dedup.dropNearDuplicates(docs, col("doc_id"), pairs)
    val losers = pairs.select("doc_b").distinct().count()
    assert(cleaned.count() == docs.count() - losers)
    // No surviving doc appears as a pair loser.
    assert(cleaned.join(pairs, col("doc_id") === col("doc_b")).count() == 0)
  }
}
