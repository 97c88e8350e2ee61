package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Training-set preparation operators: structural invariants beyond the
  * DuckDB oracle (which pins exact values).
  */
class TrainPrepSpec extends AnyFunSuite {
  import TestSpark.{sf0001, spark}

  private def run(name: String) = SparkEntry.queries(name)(spark, sf0001)

  test("doc_split_assign: every doc assigned once, train dominates, assignment is stable") {
    val got = run("doc_split_assign").cache()
    val n = Tables.documents(spark, sf0001).count()
    assert(got.count() == n)
    val byceil = got.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byceil.keySet.subsetOf(Set("train", "val", "test")))
    // 230/256 expected train share; 500 docs leave room for variance.
    assert(byceil("train") > n * 7 / 10, s"train share too low: $byceil")
    // Determinism: a second run assigns identically.
    assert(run("doc_split_assign").except(got).count() == 0)
    got.unpersist()
  }

  test("doc_repetition: fractions in [0,1], flag consistent with threshold") {
    val got = run("doc_repetition")
    assert(got.filter(col("dup_frac") < 0 || col("dup_frac") > 1).count() == 0)
    assert(got.filter(col("repetitive") =!= (col("dup_frac") > 0.2)).count() == 0)
    assert(got.filter(col("n_distinct") > col("n_bigrams")).count() == 0)
  }

  test("source_mix_weights: shares sum to ~1, uniform target inverts shares") {
    val rows = run("source_mix_weights").collect()
    val shareSum = rows.map(_.getAs[Double]("token_share")).sum
    assert(math.abs(shareSum - 1.0) < 1e-4, s"shares sum to $shareSum")
    // weight * share ≈ 1 / n_sources for every source.
    val n = rows.length
    rows.foreach { r =>
      val prod = r.getAs[Double]("token_share") * r.getAs[Double]("mix_weight")
      assert(math.abs(prod - 1.0 / n) < 1e-4, s"share*weight = $prod for ${r.getString(0)}")
    }
  }

  test("token_df: 20 rows, df bounded by corpus size, descending") {
    val got = run("token_df").collect()
    assert(got.length == 20)
    val n = Tables.documents(spark, sf0001).count()
    assert(got.forall(r => r.getLong(1) >= 1 && r.getLong(1) <= n))
    val dfs = got.map(_.getLong(1)).toSeq
    assert(dfs == dfs.sortBy(-_), "df not descending")
  }

  test("doc_chunk: strided starts, bounded chunks, last chunk reaches the doc end") {
    val got = run("doc_chunk").cache()
    val docs = Tables.documents(spark, sf0001)
    assert(got.filter(col("chunk_start") % 24 =!= 0).count() == 0)
    assert(got.filter(col("n_tokens") < 1 || col("n_tokens") > 32).count() == 0)
    // The chunk text really holds n_tokens tokens.
    assert(got.filter(size(split(col("chunk_text"), " ")) =!= col("n_tokens"))
      .count() == 0)
    // Per doc: chunks cover exactly the token range [0, n_toks).
    val cover = got.groupBy("doc_id")
      .agg(max(col("chunk_start") + col("n_tokens")).as("covered"),
        count(lit(1)).as("n_chunks"))
    val toks = docs.select(col("doc_id"),
      size(graft.functions.Text.normTokens(col("text"))).cast("long").as("n_toks"))
    assert(cover.join(toks, "doc_id").filter(col("covered") =!= col("n_toks"))
      .count() == 0, "chunks do not cover the token range")
    assert(cover.count() == docs.count(), "a document produced no chunks")
    got.unpersist()
  }

  test("doc_shuffle_order: a deterministic permutation, dense per-shard positions") {
    val got = run("doc_shuffle_order").cache()
    val n = Tables.documents(spark, sf0001).count()
    assert(got.count() == n)
    assert(got.select("doc_id").distinct().count() == n)
    assert(got.filter(col("shard") < 0 || col("shard") > 255).count() == 0)
    // pos is 1..count within every shard (dense, no gaps/dups).
    val perShard = got.groupBy("shard")
      .agg(count(lit(1)).as("c"), max("pos").as("mx"), min("pos").as("mn"),
        countDistinct("pos").as("dp"))
    assert(perShard.filter(col("mx") =!= col("c") || col("mn") =!= 1 ||
      col("dp") =!= col("c")).count() == 0, "positions not dense per shard")
    // Stable under re-run.
    assert(run("doc_shuffle_order").except(got).count() == 0)
    got.unpersist()
  }

  test("doc_length_histogram: buckets are 64-aligned, docs and shares total out") {
    val rows = run("doc_length_histogram").collect()
    val n = Tables.documents(spark, sf0001).count()
    assert(rows.forall(_.getAs[Long]("bucket") % 64 == 0))
    assert(rows.map(_.getAs[Long]("docs")).sum == n)
    val shares = rows.map(_.getAs[Double]("share")).sum
    assert(math.abs(shares - 1.0) < 1e-4, s"shares sum to $shares")
  }

  test("doc_mix_sample: under-represented sources keep everything, kept sets are stable") {
    val got = run("doc_mix_sample").cache()
    val docs = Tables.documents(spark, sf0001)
    assert(got.count() > 0 && got.count() <= docs.count())
    assert(got.filter(col("keep_rate") <= 0 || col("keep_rate") > 1).count() == 0)
    // rate = 1 sources are kept in full.
    val full = got.filter(col("keep_rate") === 1.0)
      .groupBy("source").count()
    val sizes = docs.groupBy("source").count().withColumnRenamed("count", "total")
    assert(full.join(sizes, "source").filter(col("count") =!= col("total")).count() == 0,
      "a keep_rate=1 source lost documents")
    // Deterministic: identical kept set on re-run.
    assert(run("doc_mix_sample").except(got).count() == 0)
    got.unpersist()
  }

  test("doc_sample_per_source: min(20, source size) docs each, dense ranks, stable") {
    val got = run("doc_sample_per_source").cache()
    val sizes = Tables.documents(spark, sf0001).groupBy("source").count()
    val per = got.groupBy("source")
      .agg(count(lit(1)).as("k"), max("rn").as("mx"), countDistinct("doc_id").as("dd"))
    assert(per.join(sizes, "source")
      .filter(col("k") =!= least(lit(20), col("count")) ||
        col("mx") =!= col("k") || col("dd") =!= col("k")).count() == 0,
      "sample sizes/ranks malformed")
    assert(run("doc_sample_per_source").except(got).count() == 0)
    got.unpersist()
  }

  test("source_lang_mix: per-source shares sum to 1, doc totals match the corpus") {
    val rows = run("source_lang_mix").collect()
    val n = Tables.documents(spark, sf0001).count()
    assert(rows.map(_.getAs[Long]("docs")).sum == n)
    rows.groupBy(_.getAs[String]("source")).foreach { case (src, rs) =>
      val s = rs.map(_.getAs[Double]("src_share")).sum
      assert(math.abs(s - 1.0) < 1e-4, s"source $src shares sum to $s")
    }
  }

  test("split_token_divergence: a bounded metric over the real split totals") {
    spark.sharedState.cacheManager.clearCache()
    val r = run("split_token_divergence").collect().head
    assert(spark.sharedState.cacheManager.isEmpty,
      "divergence left the count vector cached")
    val (nt, nv) = (r.getAs[Long]("n_train_tokens"), r.getAs[Long]("n_val_tokens"))
    val (vt, vv, vs) = (r.getAs[Long]("vocab_train"), r.getAs[Long]("vocab_val"),
      r.getAs[Long]("vocab_shared"))
    val tv = r.getAs[Double]("tv_distance")
    assert(tv >= 0.0 && tv <= 1.0, s"TV distance out of range: $tv")
    assert(vs <= math.min(vt, vv) && vt >= vs && vv >= vs)
    assert(nt > nv, "train split should dominate token mass (~90/5 split)")
    // Cross-check the token totals against a direct count of the split
    // expression — the entry must partition exactly the train+val mass.
    val direct = Tables.documents(spark, sf0001)
      .select(substring(md5(concat(lit("split|"), col("doc_id").cast("string"))), 1, 2).as("hx"),
        size(split(expr("regexp_replace(lower(trim(text)), '\\\\s+', ' ')"), " ").as("t")).as("n"))
      .select(when(col("hx") < "e6", "train").when(col("hx") < "f3", "val").as("split"), col("n"))
      .filter(col("split").isNotNull)
      .groupBy("split").agg(sum("n").as("n"))
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(direct("train") == nt && direct("val") == nv,
      s"token totals drifted: direct=$direct entry=($nt,$nv)")
  }

  test("source_divergence_matrix: full upper triangle, symmetric-metric bounds") {
    spark.sharedState.cacheManager.clearCache()
    val got = run("source_divergence_matrix").collect()
    assert(spark.sharedState.cacheManager.isEmpty,
      "divergence matrix left the count vector cached")
    val nSrc = Tables.documents(spark, sf0001).select("source").distinct().count()
    assert(got.length == nSrc * (nSrc - 1) / 2, s"expected full upper triangle, got ${got.length}")
    got.foreach { r =>
      val tv = r.getAs[Double]("tv_distance")
      assert(r.getAs[String]("src_a") < r.getAs[String]("src_b"))
      assert(tv >= 0.0 && tv <= 1.0, s"TV out of range: $tv")
    }
    // Identical-distribution sanity: a source compared against itself has
    // TV 0 — checked through the same closed form on one source's counts.
    // (The entry never emits self-pairs; this pins the formula instead.)
    val toks = Tables.documents(spark, sf0001)
      .select(col("source"), explode(split(expr(
        "regexp_replace(lower(trim(text)), '\\\\s+', ' ')"), " ")).as("tok"))
      .groupBy("source", "tok").agg(count(lit(1)).as("c"))
    val one = toks.filter(col("source") === "src0")
    val n = one.agg(sum("c")).head().getLong(0)
    val num = one.select(abs(col("c") * n - col("c") * n).as("z"))
      .agg(sum("z")).head().getLong(0)
    assert(num == 0L)
  }

  test("source_token_diversity: bounds hold, one source matches a direct recount") {
    val got = SparkEntry.queries("source_token_diversity")(spark, TestSpark.sf0001).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("n_vocab"), r.getAs[Double]("simpson_diversity")))
      .toMap
    assert(got.nonEmpty)
    got.values.foreach { case (n, v, div) =>
      assert(n >= v && v >= 1)
      assert(div >= 0.0 && div < 1.0)
      // Uniform bound: diversity can never exceed 1 − 1/vocab.
      assert(div <= 1.0 - 1.0 / v + 1e-9)
    }
    val (src, (n, v, div)) = got.head
    val counts = Tables.documents(spark, TestSpark.sf0001)
      .filter(col("source") === src)
      .select(explode(graft.functions.Text.normTokens(col("text"))).as("tok"))
      .groupBy("tok").count().collect().map(_.getLong(1))
    assert(counts.sum == n && counts.length == v)
    val expect = 1.0 - counts.map(c => c.toDouble * c / n / n).sum
    assert(math.abs(div - expect) < 1e-6, s"$src diversity $div vs $expect")
  }

  test("token_bpe_merges: a plain-Scala BPE replays the distributed merge path exactly") {
    // Third implementation (after the Spark fold and the oracle's CTE
    // chain): reference BPE in driver-side Scala over the same word
    // counts — greedy leftmost rewrite, (count desc, pair asc) argmax.
    val wc = Tables.documents(spark, TestSpark.sf0001)
      .select(explode(graft.functions.Text.normTokens(col("text"))).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").count().collect()
      .map(r => r.getString(0).split("").filter(_.nonEmpty).toVector -> r.getLong(1))
    var words = wc.toVector
    val expect = (1 to 5).map { k =>
      val pc = scala.collection.mutable.Map.empty[(String, String), Long]
      words.foreach { case (sym, c) =>
        sym.sliding(2).filter(_.size == 2).foreach(p =>
          pc((p(0), p(1))) = pc.getOrElse((p(0), p(1)), 0L) + c)
      }
      val ((a, b), c) = pc.toSeq.minBy { case ((x, y), n) => (-n, x, y) }
      words = words.map { case (sym, cnt) =>
        sym.foldLeft(Vector.empty[String]) { (acc, s) =>
          if (acc.nonEmpty && acc.last == a && s == b) acc.dropRight(1) :+ (a + b)
          else acc :+ s
        } -> cnt
      }
      (k.toLong, a, b, a + b, c)
    }
    val got = run("token_bpe_merges").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
      .sortBy(_._1).toSeq
    assert(got == expect, s"merge paths diverge:\n got=$got\nwant=$expect")
  }

  test("token_bpe_encode: a plain-Scala encode over the learned merges recounts every source") {
    val merges = run("token_bpe_merges").collect()
      .sortBy(_.getLong(0)).map(r => (r.getString(1), r.getString(2))).toSeq
    def encode(w: String): Vector[String] =
      merges.foldLeft(w.split("").filter(_.nonEmpty).toVector) { case (sym, (a, b)) =>
        sym.foldLeft(Vector.empty[String]) { (acc, s) =>
          if (acc.nonEmpty && acc.last == a && s == b) acc.dropRight(1) :+ (a + b)
          else acc :+ s
        }
      }
    val norm = (t: String) => t.trim.toLowerCase.replaceAll("\\s+", " ")
    val bySource = Tables.documents(spark, TestSpark.sf0001)
      .select("source", "text").collect()
      .flatMap(r => norm(r.getString(1)).split(" ").filter(_.nonEmpty)
        .map(w => r.getString(0) -> w))
      .groupBy(_._1)
    val want = bySource.map { case (src, ws) =>
      val words = ws.map(_._2)
      val chars = words.map(_.length.toLong).sum
      val syms = words.map(w => encode(w).length.toLong).sum
      src -> (words.length.toLong, chars, syms,
        BigDecimal(chars.toDouble / syms)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    val got = run("token_bpe_encode").collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(got == want, s"encode recount diverges:\n got=$got\nwant=$want")
  }

  test("doc_phrase_search: a plain-Scala scan recounts the argmax phrase and its hits") {
    val norm = (t: String) => t.trim.toLowerCase.replaceAll("\\s+", " ")
    val docs = Tables.documents(spark, TestSpark.sf0001)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> norm(r.getString(1)).split(" ").toSeq)
    val bigrams = docs.flatMap { case (_, t) =>
      if (t.length >= 2) t.zip(t.tail).map(p => s"${p._1} ${p._2}") else Seq.empty
    }
    val phrase = bigrams.groupBy(identity).view.mapValues(_.size)
      .toSeq.minBy { case (bg, c) => (-c, bg) }._1
    val Array(w1, w2) = phrase.split(" ")
    val want = docs.flatMap { case (id, t) =>
      val hits = t.indices.dropRight(1).filter(i => t(i) == w1 && t(i + 1) == w2)
      if (hits.nonEmpty) Some(id -> (phrase, hits.length.toLong, hits.min.toLong))
      else None
    }.toMap
    val got = run("doc_phrase_search").collect()
      .map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    assert(got == want, s"phrase hits diverge (phrase=$phrase)")
  }

  test("source_ks_drift: bounds, full upper triangle, one pair recounted exactly") {
    val rows = run("source_ks_drift").collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
    val sources = Tables.documents(spark, TestSpark.sf0001)
      .select("source").distinct().count().toInt
    assert(rows.length == sources * (sources - 1) / 2, "not the full upper triangle")
    rows.foreach { case (a, b, ks) =>
      assert(a < b && ks >= 0.0 && ks <= 1.0, s"($a,$b) ks=$ks")
    }
    // Exact recount of one pair in plain Scala.
    val (sa, sb, ks) = rows.head
    val byDoc = Tables.documents(spark, TestSpark.sf0001)
      .filter(col("source").isin(sa, sb))
      .select(col("source"),
        org.apache.spark.sql.functions.size(
          graft.functions.Text.normTokens(col("text"))).as("x"))
      .collect().map(r => r.getString(0) -> r.getInt(1))
    val va = byDoc.filter(_._1 == sa).map(_._2).sorted
    val vb = byDoc.filter(_._1 == sb).map(_._2).sorted
    val grid = (va ++ vb).distinct.sorted
    val d = grid.map { x =>
      math.abs(va.count(_ <= x).toDouble / va.length -
        vb.count(_ <= x).toDouble / vb.length)
    }.max
    assert(math.abs(ks - d) < 1e-6, s"($sa,$sb): $ks vs recount $d")
  }

  test("pipeline_dataset_card: card lines total out against direct per-source recounts") {
    val card = run("pipeline_dataset_card").collect()
      .map(r => r.getString(0) -> r).toMap
    val docs = Tables.documents(spark, TestSpark.sf0001)
    assert(card.size == docs.select("source").distinct().count())
    val nBySrc = docs.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    card.foreach { case (src, r) =>
      assert(r.getAs[Long]("n_docs") == nBySrc(src))
      val share = r.getAs[Double]("train_share")
      val dup = r.getAs[Double]("dup_doc_ratio")
      assert(share >= 0 && share <= 1 && dup >= 0 && dup <= 1)
    }
    // The split share must agree with THE split definition's entry.
    val trainBySrc = run("doc_split_assign")
      .join(docs.select("doc_id", "source"), "doc_id")
      .filter(col("split") === "train")
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    card.foreach { case (src, r) =>
      val want = math.round(trainBySrc.getOrElse(src, 0L).toDouble / nBySrc(src) * 1e6) / 1e6
      assert(math.abs(r.getAs[Double]("train_share") - want) < 1e-9,
        s"$src train_share disagrees with doc_split_assign")
    }
  }

  test("doc_bigram_fluency: a plain-Scala bigram model replays the lattice scores exactly") {
    val norm = (t: String) => t.trim.toLowerCase.replaceAll("\\s+", " ")
    val corpus = Tables.documents(spark, sf0001)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> norm(r.getString(1)).split(" ").toSeq).toMap
    val bigrams = corpus.values.toSeq.filter(_.length >= 2)
      .flatMap(t => t.zip(t.tail))
    val cxy = bigrams.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val cx = bigrams.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val want = corpus.collect { case (id, t) if t.length >= 2 =>
      // The exact arithmetic the entry performs: BIGINT lattice sum, one
      // IEEE double division, Spark's HALF_UP 6-decimal round.
      val scores = t.zip(t.tail).map(bg => cxy(bg) * 1000000L / cx(bg._1))
      val f = BigDecimal(scores.sum.toDouble / (scores.length * 1000000L).toDouble)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      id -> (t.length - 1L, f)
    }
    val got = run("doc_bigram_fluency").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got.keySet == want.keySet, "scored doc sets differ")
    want.foreach { case (id, (n, f)) =>
      assert(got(id)._1 == n, s"doc $id: bigram count ${got(id)._1} != $n")
      assert(got(id)._2 == f, s"doc $id: fluency ${got(id)._2} != $f")
    }
  }

  test("doc_weighted_sample: k per source, deterministic, biased toward token mass") {
    val docs = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("source"),
        greatest(lit(1), size(split(trim(col("text")), "\\s+"))).cast("long").as("w"))
      .cache()
    val got = run("doc_weighted_sample").cache()
    // Exactly min(k, source size) rows per source, rank sequence 1..n.
    val perSrc = got.groupBy("source").agg(count(lit(1)).as("n"), max("rn").as("mx"))
      .collect()
    assert(perSrc.nonEmpty)
    perSrc.foreach(r => assert(r.getLong(1) <= 10 && r.getLong(1) == r.getLong(2)))
    // Deterministic md5 keys: a second run is identical.
    assert(run("doc_weighted_sample").except(got).count() == 0)
    // The A-ES point: inclusion probability scales with the token weight,
    // so the sampled docs' mean weight must exceed the corpus mean (this
    // corpus's doc lengths vary; the margin is wide and the data fixed —
    // no flakiness).
    val sampleMean = got.join(docs, Seq("doc_id"))
      .agg(avg("w")).head().getDouble(0)
    val corpusMean = docs.agg(avg("w")).head().getDouble(0)
    assert(sampleMean > corpusMean,
      s"weighted sample not length-biased: sample $sampleMean vs corpus $corpusMean")
    got.unpersist(); docs.unpersist()
  }

  test("pipeline_token_budget: greedy prefix recounts against a driver-side replay of the shuffle law") {
    import spark.implicits._
    val got = run("pipeline_token_budget")
      .select("source", "docs_available", "tokens_available", "budget_tokens",
        "docs_taken", "tokens_taken")
      .as[(String, Long, Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(got.nonEmpty, "vacuous: no sources at sf0.001")
    // Driver-side replay: same salt, same (h, doc_id) order, same
    // inclusive-cum greedy rule.
    val md = java.security.MessageDigest.getInstance("MD5")
    def h(id: Long): String =
      md.digest(s"shuffle|$id".getBytes("UTF-8")).map("%02x".format(_)).mkString
    val docs = Tables.documents(spark, sf0001)
      .selectExpr("source", "doc_id", "CAST(size(split(trim(text), '\\\\s+')) AS LONG) AS n")
      .as[(String, Long, Long)].collect()
    val total = docs.map(_._3).sum
    val nSrc = docs.map(_._1).distinct.size
    val budget = total / (2L * nSrc)
    docs.groupBy(_._1).foreach { case (src, rows) =>
      val ordered = rows.map { case (_, id, n) => (h(id), id, n) }.sortBy(r => (r._1, r._2))
      var cum = 0L; var taken = 0L; var tok = 0L
      ordered.foreach { case (_, _, n) =>
        cum += n
        if (cum <= budget) { taken += 1; tok += n }
      }
      val (_, avail, availTok, b, dt, tt) = got(src)
      assert(avail == rows.length && availTok == rows.map(_._3).sum, s"$src availability")
      assert(b == budget, s"$src budget $b != $budget")
      assert(dt == taken && tt == tok, s"$src taken ($dt, $tt) != ($taken, $tok)")
      assert(tt <= budget, s"$src overshoots the budget")
    }
  }

  test("token_zipf_curve: points recount against a driver-side rank-frequency sweep") {
    import spark.implicits._
    import graft.functions.Text
    val got = run("token_zipf_curve")
      .select("rank", "token", "c", "cum_c", "frac", "cum_frac")
      .as[(Long, String, Long, Long, Double, Double)].collect().sortBy(_._1)
    assert(got.nonEmpty, "vacuous: no zipf points at sf0.001")
    // Direct recount: token counts in Scala, ranked (count desc, token asc).
    val counts = Tables.documents(spark, sf0001)
      .select(explode(Text.normTokens(col("text"))).as("t"))
      .as[String].collect()
      .groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .sortBy { case (t, c) => (-c, t) }
    val total = counts.map(_._2).sum
    val cum = counts.scanLeft(0L)(_ + _._2).tail
    val wantRanks = (0 to 10).map(1 << _).filter(_ <= counts.size)
    assert(got.map(_._1).toSeq == wantRanks.map(_.toLong),
      s"ranks ${got.map(_._1).toList} != expected $wantRanks")
    got.foreach { case (rank, tok, c, cc, frac, cfrac) =>
      val i = rank.toInt - 1
      assert(tok == counts(i)._1 && c == counts(i)._2,
        s"rank $rank: ($tok, $c) != ${counts(i)}")
      assert(cc == cum(i), s"rank $rank: cum $cc != ${cum(i)}")
      // The entry reports 6-decimal-rounded shares.
      assert(math.abs(frac - c.toDouble / total) < 5.1e-7)
      assert(math.abs(cfrac - cc.toDouble / total) < 5.1e-7)
    }
    // Zipf shape sanity: counts non-increasing, cumulative share <= 1.
    assert(got.map(_._3).sliding(2).forall(w => w.length < 2 || w(0) >= w(1)))
    assert(got.last._6 <= 1.0 + 1e-9)
  }

  test("doc_bootstrap_ci: driver-side Poisson replay reproduces the interval bit-for-bit") {
    import spark.implicits._
    val got = run("doc_bootstrap_ci")
      .as[(Long, Long, Double, Double, Double)].collect()
    assert(got.length == 1, "one summary row expected")
    val (nDocs, nReps, mean, lo, hi) = got.head
    assert(nReps == 200L)
    assert(lo <= mean && mean <= hi, s"point estimate outside its own CI: $lo $mean $hi")
    // Replay: same salt, same 32-bit uniform, same integer thresholds,
    // same order-statistic convention (5th smallest / 5th largest of the
    // replica means, ties by replica id).
    val md = java.security.MessageDigest.getInstance("MD5")
    def u32(r: Long, id: Long): Long = java.lang.Long.parseLong(
      md.digest(s"boot|$r|$id".getBytes("UTF-8")).map("%02x".format(_))
        .mkString.take(8), 16)
    val thresholds = Seq(1580030168L, 3160060337L, 3950075421L, 4213413783L,
      4279248373L, 4292415291L, 4294609777L, 4294923276L, 4294962463L, 4294966817L)
    val docs = Tables.documents(spark, sf0001)
      .selectExpr("doc_id", "CAST(size(split(trim(text), '\\\\s+')) AS LONG) AS x")
      .as[(Long, Long)].collect()
    assert(nDocs == docs.length)
    val means = (0L until 200L).flatMap { r =>
      var swx = 0L; var sw = 0L
      docs.foreach { case (id, x) =>
        val u = u32(r, id)
        val w = thresholds.count(_ <= u).toLong
        swx += w * x; sw += w
      }
      if (sw > 0) Some((swx.toDouble / sw, r)) else None
    }
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val asc = means.sortBy(identity)
    assert(lo == r6(asc(4)._1), s"ci_lo $lo != replay ${r6(asc(4)._1)}")
    val desc = means.sortBy { case (m, r) => (-m, r) }
    assert(hi == r6(desc(4)._1), s"ci_hi $hi != replay ${r6(desc(4)._1)}")
    assert(mean == r6(docs.map(_._2).sum.toDouble / docs.length))
    // The interval must be non-degenerate on a real corpus.
    assert(hi > lo, "bootstrap interval collapsed")
  }

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("token_kneser_ney: exact-integer replay reproduces the top-20; discount law holds") {
    import spark.implicits._
    val texts = Tables.documents(spark, sf0001).select("text").as[String].collect()
    val bigrams = texts.flatMap { t =>
      val toks = t.trim.toLowerCase.split("\\s+").toSeq
      if (toks.length < 2) Nil else toks.zip(toks.tail)
    }
    val cab = bigrams.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val ca = cab.groupBy(_._1._1).map { case (x, m) => x -> (m.values.sum, m.size.toLong) }
    val cb = cab.groupBy(_._1._2).map { case (y, m) => y -> m.size.toLong }
    val ndd = cab.size.toLong
    val scored = cab.toSeq.map { case ((x, y), c) =>
      val (cA, n1a) = ca(x)
      val num = math.max(4 * c - 3, 0L) * ndd + 3L * n1a * cb(y)
      val den = 4L * cA * ndd
      (x, y, c, num.toDouble / den)
    }.sortBy { case (x, y, _, p) => (-p, x, y) }.take(20)
    val got = run("token_kneser_ney").as[(String, String, Long, Double)].collect()
    assert(got.length == scored.length)
    got.zip(scored).foreach { case ((gx, gy, gc, gp), (x, y, c, p)) =>
      assert(gx == x && gy == y && gc == c && gp == r6(p),
        s"row mismatch: got ($gx,$gy,$gc,$gp) want ($x,$y,$c,${r6(p)})")
    }
    // Discount law: p_kn − MLE = D·(n1a·n1b/N − 1)/c_a, so the smoothed
    // probability sits below the MLE exactly when n1a·n1b < N (the
    // continuation bonus is smaller than the discount taken) and above
    // it when n1a·n1b > N — that SIGN is the KN redistribution at work.
    got.foreach { case (x, y, c, p) =>
      val (cA, n1a) = ca(x)
      val mle = c.toDouble / cA
      val sign = n1a * cb(y) - ndd
      assert(p > 0, s"($x,$y): p must be positive")
      if (sign < 0) assert(p <= r6(mle) + 1e-9, s"($x,$y): p $p should sit below MLE $mle")
      if (sign > 0) assert(p >= r6(mle) - 1e-9, s"($x,$y): p $p should sit above MLE $mle")
    }
  }

  test("source_neyman_allocation: driver moments replay shares; allocation tracks the budget") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf0001)
      .selectExpr("source", "CAST(size(split(trim(text), '\\\\s+')) AS LONG) AS x")
      .as[(String, Long)].collect()
    val m = docs.groupBy(_._1).map { case (src, rows) =>
      val n = rows.length.toLong
      val sx = rows.map(_._2).sum.toDouble
      val sx2 = rows.map(r => r._2 * r._2).sum.toDouble
      val sd = if (n >= 2) math.sqrt(math.max((sx2 - sx * sx / n) / (n - 1), 0.0)) else 0.0
      src -> (n, sx / n, sd, n * sd)
    }
    val wtot = m.toSeq.sortBy(_._1).foldLeft(0.0) { case (acc, (_, (_, _, _, w))) => acc + w }
    val got = run("source_neyman_allocation")
      .as[(String, Long, Double, Double, Double, Long)].collect()
    assert(got.nonEmpty)
    got.foreach { case (src, n, mean, sd, share, alloc) =>
      val (wn, wmean, wsd, ww) = m(src)
      assert(n == wn && mean == r6(wmean) && sd == r6(wsd), s"$src moments")
      assert(share == r6(ww / wtot), s"$src share")
      assert(alloc == math.round(1000L * (ww / wtot)), s"$src alloc")
    }
    // Budget conservation up to rounding drift of half a source each.
    val total = got.map(_._6).sum
    assert(math.abs(total - 1000L) <= got.length / 2 + 1, s"allocation total $total")
    // Shares are a distribution.
    assert(math.abs(got.map(_._5).sum - 1.0) < 1e-3)
  }

  test("token_good_turing: a plain-Scala count-of-counts replays the table; mass law holds") {
    import spark.implicits._
    val toks = Tables.documents(spark, sf0001).select("text").as[String].collect()
      .flatMap(_.trim.toLowerCase.split("\\s+"))
    val counts = toks.groupBy(identity).map { case (_, v) => v.size.toLong }.toSeq
    val cc = counts.groupBy(identity).map { case (r, v) => r -> v.size.toLong }
    val n = counts.sum
    // Conservation: Σ_r r·N_r recovers the token total exactly.
    assert(cc.map { case (r, nr) => r * nr }.sum == n)
    val want = cc.toSeq.sortBy(_._1).take(20).map { case (r, nr) =>
      val nr1 = cc.getOrElse(r + 1, 0L)
      (r, nr, nr1,
        if (cc.contains(r + 1)) Some(r6(((r + 1) * nr1).toDouble / nr)) else None,
        r6((r * nr).toDouble / n))
    }
    val got = run("token_good_turing").collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)),
        r.getDouble(4))).toSeq
    assert(got == want, s"Good-Turing replay diverged\n got=$got\nwant=$want")
    // The r = 1 row's mass_frac IS the missing-mass estimate N1/N.
    got.find(_._1 == 1L).foreach { row =>
      assert(row._5 == r6(cc(1L).toDouble / n), "P0 row inconsistent")
    }
  }

  test("source_chao1_richness: one-source recount matches; estimator laws hold corpus-wide") {
    import spark.implicits._
    val got = run("source_chao1_richness").collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getDouble(5), r.getDouble(6)))
    assert(got.nonEmpty)
    got.foreach { case (src, n, v, f1, f2, chao1, cov) =>
      assert(chao1 >= v - 1e-9, s"$src: chao1 $chao1 below observed $v")
      assert(f1 + f2 <= v && f1 + 2 * f2 <= n, s"$src: class masses inconsistent")
      assert(cov >= -1e-9 && cov <= 1.0 + 1e-9, s"$src: coverage $cov out of range")
    }
    val src = got.head._1
    val counts = Tables.documents(spark, sf0001)
      .filter(col("source") === src).select("text").as[String].collect()
      .flatMap(_.trim.toLowerCase.split("\\s+"))
      .groupBy(identity).map { case (_, v) => v.size.toLong }.toSeq
    val (n, v) = (counts.sum, counts.size.toLong)
    val f1 = counts.count(_ == 1L).toLong
    val f2 = counts.count(_ == 2L).toLong
    val want = (src, n, v, f1, f2,
      r6(v + (f1 * (f1 - 1)).toDouble / (2 * (f2 + 1))),
      r6(1.0 - f1.toDouble / n))
    assert(got.head == want, s"Chao1 recount diverged: ${got.head} vs $want")
  }

  test("token_heaps_curve: a driver-side prefix sweep recounts every grid point") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf0001).select("doc_id", "text")
      .as[(Long, String)].collect().sortBy(_._1)
    val n = docs.length.toLong
    // First-occurrence rank per token, then the kmin histogram — the
    // entry's own integer device, recomputed independently.
    val firstRank = scala.collection.mutable.Map.empty[String, Long]
    docs.zipWithIndex.foreach { case ((_, text), i) =>
      text.trim.toLowerCase.split("\\s+").foreach { t =>
        if (!firstRank.contains(t)) firstRank(t) = i + 1L
      }
    }
    def kmin(r: Long): Long =
      if (r <= 1L) 0L else 64L - java.lang.Long.numberOfLeadingZeros(r - 1L)
    val km = firstRank.values.groupBy(kmin).map { case (k, v) => k -> v.size.toLong }
    val want = (0L to km.keys.max).map { k =>
      (k, math.min(1L << k, n),
        km.filter(_._1 <= k).values.sum)
    }.toSeq
    val got = run("token_heaps_curve").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == want, s"Heaps sweep diverged\n got=$got\nwant=$want")
    // Vocabulary growth is monotone and ends at the full vocab size.
    assert(got.map(_._3) == got.map(_._3).sorted)
    assert(got.last._3 == firstRank.size.toLong)
  }

  test("token_burstiness: a plain-Scala adaptation recount replays the top-20") {
    import spark.implicits._
    val grid = Tables.documents(spark, sf0001).select("doc_id", "text")
      .as[(Long, String)].collect()
      .flatMap { case (id, t) =>
        t.trim.toLowerCase.split("\\s+").map(tok => (id, tok))
      }
      .groupBy(identity).toSeq
      .map { case ((_, tok), v) => (tok, v.size.toLong) }
    val want = grid.groupBy(_._1).map { case (tok, cells) =>
      val tf = cells.map(_._2).sum
      val df1 = cells.size.toLong
      val df2 = cells.count(_._2 >= 2L).toLong
      (tok, tf, df1, df2, r6(df2.toDouble / df1))
    }.filter(_._3 >= 5L).toSeq
      .sortBy { case (tok, _, _, _, a) => (-a, tok) }.take(20)
    val got = run("token_burstiness").collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSeq
    assert(got == want, s"burstiness recount diverged\n got=$got\nwant=$want")
    // Adaptation is a conditional probability: df2 <= df1 always.
    got.foreach { case (tok, _, df1, df2, a) =>
      assert(df2 <= df1 && a >= 0.0 && a <= 1.0, s"$tok: broken bounds")
    }
  }

  test("source_gini_length: one-source recount matches; coefficient bounded in [0, 1)") {
    import spark.implicits._
    val got = run("source_gini_length").collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.nonEmpty)
    got.foreach { case (src, n, tot, g) =>
      assert(g >= -1e-9 && g < 1.0, s"$src: gini $g out of range")
      assert(n >= 1 && tot >= 1)
    }
    val src = got.head._1
    val xs = Tables.documents(spark, sf0001)
      .filter(col("source") === src).select("doc_id", "text")
      .as[(Long, String)].collect()
      .map { case (id, t) => (t.trim.split("\\s+").length.toLong, id) }
      .sortBy(identity)
    val n = xs.length.toLong
    val tot = xs.map(_._1).sum
    val srx = xs.zipWithIndex.map { case ((x, _), i) => (i + 1L) * x }.sum
    val want = (src, n, tot,
      r6(2.0 * srx.toDouble / (n * tot).toDouble - (n + 1).toDouble / n))
    assert(got.head == want, s"gini recount diverged: ${got.head} vs $want")
    // A constant-length synthetic source must sit at (n-1)-free zero-ish:
    // G = (2*sum(r)*x)/(n*n*x) - (n+1)/n = (n+1)/n - (n+1)/n = 0 exactly.
    val const = Seq.tabulate(6)(i => ("s", i.toLong, "a b c"))
      .toDF("source", "doc_id", "text")
    // Direct frame check through the same arithmetic: constant lengths.
    val lens = const.select(col("source"), col("doc_id"),
      org.apache.spark.sql.functions.size(
        graft.functions.Text.wsTokens(col("text"))).cast("long").as("x"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy(col("x"), col("doc_id"))
    val row = lens
      .withColumn("r", org.apache.spark.sql.functions.row_number().over(w).cast("long"))
      .groupBy("source")
      .agg(org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)).as("n"),
        org.apache.spark.sql.functions.sum("x").as("t"),
        org.apache.spark.sql.functions.sum(col("r") * col("x")).as("srx"))
      .select((org.apache.spark.sql.functions.lit(2.0) * col("srx").cast("double")
        / (col("n") * col("t")).cast("double")
        - (col("n") + 1L).cast("double") / col("n")).as("g"))
      .head().getDouble(0)
    assert(math.abs(row) < 1e-12, s"constant-length Gini must be 0, got $row")
  }

  test("length quartiles: the grid cumulative form equals the per-key rank form") {
    import spark.implicits._
    // Two exact devices for per-key order statistics (the entry's
    // scaladoc contract): the grid form the entry ships (cheap when the
    // value domain collapses) and the general withRankPerKey form
    // (needed for near-unique order keys). The ⌈q·n⌉ order statistic
    // must be IDENTICAL through both.
    val want = SparkEntry.queries("source_length_quartiles")(spark, sf0001)
      .collect().map(_.toSeq.toList).toSet
    assert(want.nonEmpty)
    val lens = Tables.documents(spark, sf0001)
      .select(col("source"), col("doc_id"),
        size(graft.functions.Text.wsTokens(col("text"))).cast("long").as("x"))
      .filter(col("x").isNotNull)
    val ranked = graft.operators.GlobalRank.withRankPerKey(
      lens, Seq("source"), Seq(col("x"), col("doc_id")), numPartitions = 8, rankCol = "r")
    val totals = lens.groupBy("source").agg(count(lit(1)).as("n_docs"))
    val got = ranked
      .join(org.apache.spark.sql.functions.broadcast(totals), Seq("source"))
      .groupBy("source")
      .agg(max("n_docs").as("n_docs"),
        max(when(col("r") === expr("(n_docs + 3) div 4"), col("x"))).as("p25"),
        max(when(col("r") === expr("(n_docs + 1) div 2"), col("x"))).as("p50"),
        max(when(col("r") === expr("(3 * n_docs + 3) div 4"), col("x"))).as("p75"),
        max(when(col("r") === expr("(9 * n_docs + 9) div 10"), col("x"))).as("p90"))
      .collect().map(_.toSeq.toList).toSet
    assert(got == want, "rank-form quartiles diverge from the entry's grid form")
  }
}
