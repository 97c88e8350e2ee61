package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Similarity-search operators over embeddings. */
class EmbeddingSpec extends AnyFunSuite {
  import TestSpark.{sf0001, spark}
  import spark.implicits._

  private def run(name: String) = SparkEntry.queries(name)(spark, sf0001)

  test("emb_knn_brute: 5 ranked neighbours per query, matches a window-ranked recomputation") {
    val got = run("emb_knn_brute")
    val queries = got.select("query_id").distinct().count()
    assert(got.count() == queries * 5)
    // Scores non-increasing within each query.
    val w = Window.partitionBy("query_id").orderBy("rn")
    assert(got.withColumn("prev", lag("score", 1).over(w))
      .filter(col("prev") < col("score")).count() == 0)
    // No self-matches.
    assert(got.filter(col("query_id") === col("vec_id")).count() == 0)
  }

  test("emb_knn_lsh: candidates restricted to the query's hyperplane bucket") {
    import graft.queries.EmbeddingCatalog
    val bucketOf = EmbeddingCatalog.planeSigns.zipWithIndex.map { case (signs, p) =>
      val proj = signs.zipWithIndex.map { case (s, i) =>
        (if (s > 0) "+" else "-") + s" CAST(embedding[$i] AS DOUBLE)"
      }.mkString(" ")
      s"(CASE WHEN ($proj) > 0 THEN ${1 << p} ELSE 0 END)"
    }.mkString(" + ")
    val buckets = Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), expr(bucketOf).as("bucket"))
    val got = run("emb_knn_lsh")
    val joined = got
      .join(buckets.as("q"), col("q.vec_id") === col("query_id"))
      .join(buckets.as("c"), col("c.vec_id") === got("vec_id"))
    assert(joined.filter(col("q.bucket") =!= col("c.bucket")).count() == 0)
    assert(got.filter(col("rn") > 5).count() == 0)
  }

  test("multi-probe top-1 is never worse than single-probe top-1 (recall upgrade)") {
    val single = run("emb_knn_lsh").filter(col("rn") === 1)
      .select("query_id", "score").as[(Long, Double)].collect().toMap
    val multi = run("emb_knn_lsh_multiprobe").filter(col("rn") === 1)
      .select("query_id", "score").as[(Long, Double)].collect().toMap
    assert(multi.keySet.intersect(single.keySet).nonEmpty)
    single.foreach { case (q, s) =>
      assert(multi.getOrElse(q, Double.MinValue) >= s, s"query $q lost recall")
    }
  }

  test("user_sessions: one row per driver, sane bounds") {
    val df = SparkEntry.queries("user_sessions")(spark, sf0001)
    val nDrivers = Tables.events(spark, sf0001).select("user_id").distinct().count()
    assert(df.count() == nDrivers)
    assert(df.filter(col("n_sessions") < 1 || col("max_session_events") < 1).count() == 0)
    val nEvents = Tables.events(spark, sf0001).count()
    assert(df.agg(sum("max_session_events")).as[Long].head() <= nEvents)
  }

  test("emb_knn_ivf: ranked results per query, no self matches") {
    val got = run("emb_knn_ivf")
    assert(got.count() > 0)
    assert(got.filter(col("rn") > 5).count() == 0)
    assert(got.filter(col("query_id") === col("vec_id")).count() == 0)
    // Scores non-increasing in rank within each query.
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("query_id").orderBy("rn")
    assert(got.withColumn("prev", lag("score", 1).over(w))
      .filter(col("prev") < col("score")).count() == 0)
  }

  test("emb_near_dup: ordered pairs above threshold, bucket-restricted") {
    val got = run("emb_near_dup")
    assert(got.filter(col("vec_a") >= col("vec_b")).count() == 0)
    assert(got.filter(col("cosine") < 0.3).count() == 0)
  }

  test("emb_near_dup_banded: subset of the exact >=threshold pair set, ordered") {
    val got = run("emb_near_dup_banded")
    assert(got.count() > 0)
    assert(got.filter(col("vec_a") >= col("vec_b")).count() == 0)
    assert(got.filter(col("cosine") < 0.3).count() == 0)
    // No false positives: every reported pair is a true >=threshold pair
    // (recall is probabilistic; precision of the verify step is exact).
    val emb = Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), col("embedding"),
        graft.functions.Vectors.norm(col("embedding")).as("nrm"))
    val exact = emb.as("a").join(emb.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        round(graft.functions.Vectors.cosineWithNorms(
          col("a.embedding"), col("b.embedding"), col("a.nrm"), col("b.nrm")), 6).as("cos"))
      .filter(col("cos") >= 0.3)
    assert(got.join(exact, Seq("vec_a", "vec_b"), "left_anti").count() == 0)
  }

  test("emb_knn_ivf_kmeans: K ranked rows per query, no self matches, cells cover corpus") {
    val got = run("emb_knn_ivf_kmeans")
    val queries = got.select("query_id").distinct().count()
    assert(got.count() == queries * 5)
    assert(got.filter(col("query_id") === col("vec_id")).count() == 0)
    val w = Window.partitionBy("query_id").orderBy("rn")
    assert(got.withColumn("prev", lag("score", 1).over(w))
      .filter(col("prev") < col("score")).count() == 0)
    // The frozen quantizer assigns every vector to exactly one of 16 cells.
    val assigned = Tables.embeddings(spark, sf0001).select(
      graft.operators.KMeans.assignment(
        col("embedding"), graft.queries.IvfCentroids.kmeans16).as("cell"))
    assert(assigned.filter(col("cell").isNull || col("cell") < 0 || col("cell") > 15).count() == 0)
  }

  test("emb_knn_recall: one row per (index, query), hits bounded by k, matches a direct recount") {
    val got = run("emb_knn_recall").cache()
    val queries = run("emb_knn_brute").select("query_id").distinct().count()
    // Ten indexed rows per query: the whole measured ladder (every
    // index variant in the catalog).
    assert(got.count() == 10 * queries)
    assert(got.select("idx").distinct().count() == 10)
    assert(got.filter(col("k") =!= 5 || col("hits") < 0 || col("hits") > col("k") ||
      col("recall") < 0 || col("recall") > 1).count() == 0)
    // Direct recount per index: intersection of the result sets per query.
    val b = run("emb_knn_brute").select("query_id", "vec_id")
    Seq("lsh" -> "emb_knn_lsh", "multiprobe" -> "emb_knn_lsh_multiprobe",
      "ivf" -> "emb_knn_ivf", "ivf_kmeans" -> "emb_knn_ivf_kmeans",
      "mrl" -> "emb_knn_mrl", "mrl_ivf" -> "emb_knn_mrl_ivf",
      "bq" -> "emb_knn_bq", "sq8" -> "emb_knn_sq8", "pq" -> "emb_knn_pq",
      "ivfpq" -> "emb_knn_ivfpq").foreach {
      case (idx, entry) =>
        val inter = b.intersect(run(entry).select("query_id", "vec_id"))
          .groupBy("query_id").count()
        assert(got.filter(col("idx") === idx).join(inter, Seq("query_id"), "left")
          .filter(coalesce(col("count"), lit(0L)) =!= col("hits")).count() == 0,
          s"$idx recall hits diverge from a direct set intersection")
    }
    got.unpersist()
  }

  test("emb_label_centroids: full (label × dim) grid, means match a direct recount") {
    val got = run("emb_label_centroids").cache()
    val labels = Tables.embeddings(spark, sf0001).select("label").distinct().count()
    assert(got.count() == labels * 64, "missing (label, dim) cells")
    assert(got.filter(col("dim") < 0 || col("dim") > 63).count() == 0)
    // n_vecs is constant across dims within a label and totals the table.
    assert(got.groupBy("label").agg(countDistinct("n_vecs").as("k"))
      .filter(col("k") =!= 1).count() == 0)
    val total = Tables.embeddings(spark, sf0001).count()
    assert(got.filter(col("dim") === 0).agg(sum("n_vecs")).as[Long].head() == total)
    // One cell vs a driver-side mean.
    val r = got.filter(col("label") === 0 && col("dim") === 0)
      .select("centroid", "n_vecs").as[(Double, Long)].head()
    val direct = Tables.embeddings(spark, sf0001).filter(col("label") === 0)
      .select(element_at(col("embedding"), 1).cast("double")).as[Double].collect()
    assert(r._2 == direct.length)
    assert(math.abs(r._1 - direct.sum / direct.length) < 1e-6)
    got.unpersist()
  }

  test("emb_knn_mrl: 5 ranked per query, exact-rerank scores bounded by brute top-1") {
    val got = run("emb_knn_mrl")
    val queries = got.select("query_id").distinct().count()
    assert(got.count() == queries * 5)
    assert(got.filter(col("query_id") === col("vec_id")).count() == 0)
    val w = Window.partitionBy("query_id").orderBy("rn")
    assert(got.withColumn("prev", lag("score", 1).over(w))
      .filter(col("prev") < col("score")).count() == 0)
    // The rerank is the exact cosine, so no MRL top-1 can beat brute's.
    val brute1 = run("emb_knn_brute").filter(col("rn") === 1)
      .select("query_id", "score").as[(Long, Double)].collect().toMap
    got.filter(col("rn") === 1)
      .select("query_id", "score").as[(Long, Double)].collect()
      .foreach { case (q, s) =>
        assert(s <= brute1(q) + 1e-9, s"query $q: MRL top-1 $s beats brute ${brute1(q)}")
      }
  }

  test("emb_semdedup: dup set matches a brute within-cell recomputation") {
    val got = run("emb_semdedup").collect()
    val corpus = Tables.embeddings(spark, sf0001)
      .select("vec_id", "embedding").as[(Long, Seq[Float])].collect().sortBy(_._1)
    assert(got.length == corpus.length, "must emit one row per corpus vector")

    def dot(a: Seq[Double], b: Seq[Double]): Double =
      a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + x * y }
    val cents = graft.queries.IvfCentroids.kmeans16
      .map { case (cid, c) => (cid, c.toSeq, c.map(x => x * x).sum) }
    val assigned = corpus.map { case (id, e) =>
      val v = e.map(_.toDouble).toSeq
      val cell = cents.map { case (cid, c, cn2) =>
        (dot(v, v) - 2.0 * dot(v, c) + cn2, cid)
      }.min._2
      (id, v, cell)
    }
    val dups = (for {
      (ai, av, ac) <- assigned
      (bi, bv, bc) <- assigned
      if ac == bc && ai < bi
      cos = dot(av, bv) / (math.sqrt(dot(av, av)) * math.sqrt(dot(bv, bv)))
      if BigDecimal(cos).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble >= 0.3
    } yield bi).toSet
    assert(dups.nonEmpty, "vacuous fixture: no within-cell near-dups at sf0.001")

    val cellOf = assigned.map(a => a._1 -> a._3.toLong).toMap
    got.foreach { r =>
      val id = r.getAs[Long]("vec_id")
      assert(r.getAs[Long]("cell") == cellOf(id), s"vector $id assigned to wrong cell")
      assert(r.getAs[Boolean]("is_dup") == dups.contains(id), s"dup flag wrong for $id")
    }
  }

  test("emb_gram_matrix: full upper triangle, nonnegative diagonal, lattice-exact cells") {
    val dim = 64
    val got = run("emb_gram_matrix").collect()
    assert(got.length == dim * (dim + 1) / 2)
    val g = got.map(r => (r.getAs[Long]("i"), r.getAs[Long]("j")) -> r.getAs[Double]("g")).toMap
    (0 until dim).foreach(i => assert(g((i.toLong, i.toLong)) >= 0.0, s"negative diagonal at $i"))
    // Spot cells vs a driver-side replay of the exact integer lattice.
    val corpus = Tables.embeddings(spark, sf0001)
      .select("embedding").as[Seq[Float]].collect()
    def brute(i: Int, j: Int): Double = {
      val s = corpus.map(e => math.floor(e(i).toDouble * e(j).toDouble * 1e9 + 0.5).toLong).sum
      BigDecimal(s / 1e9).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    Seq((0, 0), (0, 63), (7, 23), (63, 63)).foreach { case (i, j) =>
      assert(g((i.toLong, j.toLong)) == brute(i, j), s"cell ($i,$j) mismatch")
    }
  }

  test("emb_hard_negatives: cross-label argmax matches a brute replay") {
    val emb = Tables.embeddings(spark, sf0001)
      .select("vec_id", "label", "embedding").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Float](2).toArray))
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      a.indices.foreach { i =>
        d += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
      }
      BigDecimal(d / (math.sqrt(na) * math.sqrt(nb)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val want = emb.map { case (id, lab, e) =>
      val best = emb.filter(_._2 != lab)
        .map { case (cid, clab, ce) => (cos(e, ce), cid, clab) }
        .minBy { case (s, cid, _) => (-s, cid) }
      (id, lab.toLong, best._2, best._3.toLong, best._1)
    }.toSet
    val got = run("emb_hard_negatives").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toSet
    assert(got == want, "hard negatives diverge from the brute replay")
    // Every mined negative really is cross-label.
    got.foreach { case (id, lab, _, nl, _) =>
      assert(lab != nl, s"vector $id mined a same-label negative")
    }
  }

  test("emb_pca_project: exact integer replay; direction dominates random Rayleigh quotients") {
    val dim = 64
    val emb = Tables.embeddings(spark, sf0001)
      .select("vec_id", "label", "embedding").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Float](2).toArray))
    // Driver replay of the exact pipeline: lattice gram → 8 BigInt power
    // steps (truncating rescale) → lattice projection.
    val g = Array.ofDim[Long](dim, dim)
    emb.foreach { case (_, _, e) =>
      var i = 0
      while (i < dim) {
        var j = 0
        while (j < dim) {
          g(i)(j) += math.floor(e(i).toDouble * e(j).toDouble * 1e9 + 0.5).toLong
          j += 1
        }
        i += 1
      }
    }
    var v = Array.fill(dim)(BigInt(10000))
    (1 to 8).foreach { _ =>
      val w = Array.tabulate(dim)(i => (0 until dim).map(j => BigInt(g(i)(j)) * v(j)).sum)
      val m = w.map(_.abs).max
      if (m > 0) v = w.map(_ * 10000 / m)
    }
    val want = emb.map { case (id, lab, e) =>
      val ps = (0 until dim).map(d =>
        math.floor(e(d).toDouble * 1e6 + 0.5).toLong * v(d).toLong).sum
      (id, lab.toLong,
        BigDecimal(ps.toDouble / 1.0e10).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toSet
    val got = run("emb_pca_project").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == want, "entry diverges from the driver-side integer replay")
    // ABTT residual from the same direction: exact replay of the fixed
    // IEEE sequence, plus the geometry it must satisfy.
    val cNorm = v.map(x => x * x).sum.toLong
    val wantResid = emb.map { case (id, lab, e) =>
      val lat = (0 until dim).map(d => math.floor(e(d).toDouble * 1e6 + 0.5).toLong)
      val a = lat.map(x => x * x).sum
      val b = (0 until dim).map(d => lat(d) * v(d).toLong).sum
      val r2 = (a.toDouble - (b.toDouble / cNorm.toDouble) * b.toDouble) / 1.0e12
      (id, lab.toLong,
        BigDecimal(math.sqrt(math.max(r2, 0.0)))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toSet
    val gotResid = run("emb_abtt_residual").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(gotResid == wantResid,
      "residual entry diverges from the driver-side replay")
    // Residual never exceeds the vector norm, and removing the top
    // component strictly reduces total second moment.
    val norms = emb.map { case (id, _, e) =>
      id -> math.sqrt(e.map(x => x.toDouble * x.toDouble).sum)
    }.toMap
    gotResid.foreach { case (id, _, r) =>
      assert(r <= norms(id) + 1e-6, s"residual above the vector norm for $id")
    }
    val sumR2 = gotResid.toSeq.map { case (_, _, r) => r * r }.sum
    val sumN2 = norms.values.map(x => x * x).sum
    assert(sumR2 < sumN2, "top-component removal did not reduce total energy")
    // Convergence is semantic, not just reproducible: after 8 steps the
    // direction's Rayleigh quotient v'Gv/v'v must beat seeded random
    // directions (the dominant eigenvector maximizes it).
    val gd = g.map(_.map(_ / 1e9))
    def rayleigh(u: Array[Double]): Double = {
      val gu = Array.tabulate(dim)(i => (0 until dim).map(j => gd(i)(j) * u(j)).sum)
      val num = (0 until dim).map(i => u(i) * gu(i)).sum
      val den = u.map(x => x * x).sum
      num / den
    }
    val rv = rayleigh(v.map(_.toDouble))
    val rnd = new scala.util.Random(7)
    (1 to 10).foreach { _ =>
      val u = Array.fill(dim)(rnd.nextDouble() - 0.5)
      assert(rayleigh(u) <= rv + 1e-6,
        "a random direction beat the power-iteration direction")
    }
  }

  test("emb_centroid_outliers: bottom-3 recounted off the published centroids") {
    val got = run("emb_centroid_outliers").collect()
      .groupBy(_.getAs[Int]("label"))
      .view.mapValues(_.sortBy(_.getAs[Long]("rnk"))
        .map(r => (r.getAs[Long]("vec_id"), r.getAs[Double]("cos"))).toList)
      .toMap
    val cent = run("emb_label_centroids").collect()
      .groupBy(_.getAs[Int]("label"))
      .view.mapValues(_.sortBy(_.getAs[Long]("dim"))
        .map(_.getAs[Double]("centroid")).toArray).toMap
    val byLabel = graft.Tables.embeddings(spark, sf0001).collect()
      .groupBy(_.getAs[Int]("label"))
    assert(got.keySet == byLabel.keySet)
    byLabel.foreach { case (l, vs) =>
      val c = cent(l)
      val nc = math.sqrt(c.indices.foldLeft(0.0)((a, i) => a + c(i) * c(i)))
      val scored = vs.map { r =>
        val e = r.getSeq[Float](r.fieldIndex("embedding")).map(_.toDouble).toArray
        val dot = e.indices.foldLeft(0.0)((a, i) => a + e(i) * c(i))
        val ne = math.sqrt(e.indices.foldLeft(0.0)((a, i) => a + e(i) * e(i)))
        val cos = BigDecimal(dot / (ne * nc))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        (r.getAs[Long]("vec_id"), cos)
      }
      val want = scored.sortBy { case (id, s) => (s, id) }.take(3).toList
      assert(got(l) == want, s"label $l outliers diverge from the recount")
    }
  }

  test("emb_mmr_rerank: a plain-Scala greedy replay matches step-for-step") {
    val emb = graft.Tables.embeddings(spark, sf0001).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getSeq[Float](r.fieldIndex("embedding")).map(_.toDouble).toArray)
      .toMap
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def dot(a: Array[Double], b: Array[Double]) =
      a.indices.foldLeft(0.0)((s, i) => s + a(i) * b(i))
    def cos(a: Long, b: Long) = {
      val (x, y) = (emb(a), emb(b))
      r6(dot(x, y) / (math.sqrt(dot(x, x)) * math.sqrt(dot(y, y))))
    }
    val want = emb.keys.filter(_ < 8).toSeq.sorted.flatMap { q =>
      val rel = emb.keys.filter(_ != q).toSeq
        .map(c => c -> cos(q, c)).sortBy { case (c, s) => (-s, c) }.take(10)
      val relMap = rel.toMap
      var sel = Vector(rel.minBy { case (c, s) => (-s, c) }._1)
      for (_ <- 2 to 5) {
        val pick = rel.map(_._1).filterNot(sel.contains)
          .map { c =>
            val ms = sel.map(s0 => cos(c, s0)).max
            c -> r6(0.7 * relMap(c) - 0.3 * ms)
          }.minBy { case (c, m) => (-m, c) }._1
        sel = sel :+ pick
      }
      sel.zipWithIndex.map { case (c, i) => (q, (i + 1).toLong, c, relMap(c)) }
    }
    val got = run("emb_mmr_rerank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got.sorted == want.sorted, "greedy MMR replay diverges")
  }

  test("bq sign packing: popcount of the packed halves equals the positive-dim count") {
    import graft.queries.EmbeddingCatalog
    val emb = graft.Tables.embeddings(spark, sf0001)
    val bad = emb.select(
      expr(EmbeddingCatalog.bqPackExpr(0, "embedding", oneBased = false)).as("h0"),
      expr(EmbeddingCatalog.bqPackExpr(1, "embedding", oneBased = false)).as("h1"),
      size(filter(col("embedding"), x => x.cast("double") > 0)).as("npos"))
      .filter(expr("bit_count(h0) + bit_count(h1)") =!= col("npos"))
    assert(bad.count() == 0, "packed sign bits disagree with a direct positive-dim recount")
  }

  test("emb_knn_bq: 5 ranked per query, exact-rerank scores bounded by brute top-1") {
    val got = run("emb_knn_bq")
    val queries = got.select("query_id").distinct().count()
    assert(got.count() == queries * 5)
    assert(got.filter(col("query_id") === col("vec_id")).count() == 0)
    val w = Window.partitionBy("query_id").orderBy("rn")
    assert(got.withColumn("prev", lag("score", 1).over(w))
      .filter(col("prev") < col("score")).count() == 0)
    // The rerank is the exact cosine, so no BQ top-1 can beat brute's.
    val brute1 = run("emb_knn_brute").filter(col("rn") === 1)
      .select("query_id", "score").as[(Long, Double)].collect().toMap
    got.filter(col("rn") === 1)
      .select("query_id", "score").as[(Long, Double)].collect()
      .foreach { case (q, s) =>
        assert(s <= brute1(q) + 1e-9, s"query $q: BQ top-1 $s beats brute ${brute1(q)}")
      }
  }

  test("emb_pq_shortlist_sweep: recall monotone in width, widest row reproduces emb_knn_pq") {
    val got = run("emb_pq_shortlist_sweep")
      .select("shortlist_c", "hits", "recall", "reranked")
      .as[(Long, Long, Double, Long)].collect().sortBy(_._1)
    assert(got.map(_._1).toSeq == Seq(8L, 16L, 32L, 64L))
    // Widening the shortlist can only ADD rerank candidates, so hits
    // (vs the same truth) are non-decreasing in width.
    assert(got.sliding(2).forall(w => w.length < 2 || w(0)._2 <= w(1)._2),
      s"hits not monotone: ${got.map(_._2).toList}")
    // reranked counts are exactly queries × min(width, n-1) here
    // (enough ADC candidates exist at sf0.001 for every width).
    got.foreach { case (w, _, _, r) => assert(r <= 8 * w, s"width $w reranked $r > 8*$w") }
    // The widest width IS production's PqShortlist: its hits must equal
    // a direct intersection of emb_knn_pq with the brute truth.
    val pq = run("emb_knn_pq").select("query_id", "vec_id")
    val truth = run("emb_knn_brute").select("query_id", "vec_id")
    val wantHits = pq.intersect(truth).count()
    assert(got.last._2 == wantHits,
      s"widest sweep row ${got.last._2} != emb_knn_pq direct hits $wantHits")
  }

  test("emb_opq_permute: snake permutation is a bijection spreading variance octiles; report shape holds") {
    import graft.queries.EmbeddingCatalog
    val emb = Tables.embeddings(spark, sf0001)
    val perm = EmbeddingCatalog.opqPermOf(EmbeddingCatalog.opqMoments(emb))
    assert(perm.sorted == (0 until 64).toList, "perm is not a bijection of 0..63")
    // The defining snake property: each subspace receives EXACTLY one
    // dim from each variance octile (ranks r*8..r*8+7 spread across all
    // 8 subspaces). Recover each dim's rank from its (j, slot): slot IS
    // the octile.
    (0 until 8).foreach { j =>
      val slots = (0 until 8).map(slot => perm(j * 8 + slot))
      assert(slots.distinct.size == 8, s"subspace $j repeats a dim")
    }
    // Octile check: position k = j*8 + slot, and every slot value is
    // drawn from a distinct octile by construction — verify via a
    // direct variance ranking.
    val ranked = EmbeddingCatalog.opqMoments(emb)
      .select(col("d"),
        (col("n").cast("decimal(12,0)") * col("s2").cast("decimal(26,0)") -
          col("s1").cast("decimal(19,0)") * col("s1").cast("decimal(19,0)")).as("v"))
      .orderBy(col("v").desc, col("d").asc)
      .select("d").as[Long].collect().map(_.toInt)
    val rankOf = ranked.zipWithIndex.toMap
    (0 until 8).foreach { j =>
      val octiles = (0 until 8).map(slot => rankOf(perm(j * 8 + slot)) / 8).sorted
      assert(octiles == (0 until 8).toList,
        s"subspace $j octiles $octiles are not one per octile")
    }
    val got = run("emb_opq_permute").cache()
    assert(got.count() == 8, "one report row per subspace")
    val total = emb.count()
    assert(got.filter(col("n_vectors") =!= total).count() == 0,
      "every subspace must encode every vector")
    assert(got.filter(col("codes_used") < 1 || col("codes_used") > 16).count() == 0)
    got.unpersist()
  }

  test("emb_intrinsic_dim: mu quantiles are >= 1, monotone, and recount against a direct top-2") {
    import graft.queries.EmbeddingCatalog
    val got = run("emb_intrinsic_dim").cache()
    assert(got.count() > 0, "vacuous: no label rows at sf0.001")
    // mu = r2/r1 >= 1 by construction, and quantiles are monotone in p.
    assert(got.filter(col("mu_p25") < 1.0).count() == 0, "mu below 1")
    assert(got.filter(col("mu_p25") > col("mu_p50") || col("mu_p50") > col("mu_p75") ||
      col("mu_p75") > col("mu_p90")).count() == 0, "quantiles not monotone")
    // Point coverage: every vector in a cell of >= 3 members whose r1 > 0
    // contributes exactly one mu — recount n_points from the assignment.
    val emb = Tables.embeddings(spark, sf0001)
    val assign = EmbeddingCatalog.ivfCoarseAssign(
      emb, EmbeddingCatalog.ivfCentroidFrame(emb))
    val cellSizes = assign.groupBy("cell").count()
      .as[(Long, Long)].collect().toMap
    val eligible = assign.as[(Long, Long)].collect()
      .count { case (_, cell) => cellSizes(cell) >= 3 }
    val nPts = got.agg(sum("n_points")).as[Long].head()
    // r1 = 0 exclusions can only shrink the eligible set (none expected
    // in this fixture, but the bound must hold either way).
    assert(nPts <= eligible && nPts > 0,
      s"n_points $nPts outside (0, eligible=$eligible]")
    got.unpersist()
  }

  test("opqPermOf: bijection + one-dim-per-octile hold on generated moments, ties included") {
    import graft.queries.EmbeddingCatalog
    // Generative check of the allocation law itself, independent of the
    // corpus: random moment frames (including deliberate variance TIES,
    // the case the d-ascending tie-break exists for), permutation
    // recomputed driver-side with BigInt arithmetic.
    val rnd = new scala.util.Random(20260815L)
    (1 to 5).foreach { trial =>
      val moments = (0 until 64).map { d =>
        val n = 1L + rnd.nextInt(1000)
        val s1 = rnd.nextLong() % 1000000L
        // Half the dims share a variance value via shared s2 buckets.
        val s2 = if (d % 2 == trial % 2) 5000000L + (d % 4) * 1000L
                 else math.abs(rnd.nextLong() % 10000000L) + 1000000L
        (d.toLong, n, BigDecimal(s1), BigDecimal(s2))
      }
      val mom = moments.toDF("d", "n", "s1", "s2")
        .select(col("d"), col("n"),
          col("s1").cast("decimal(19,0)").as("s1"),
          col("s2").cast("decimal(26,0)").as("s2"))
      val perm = EmbeddingCatalog.opqPermOf(mom)
      assert(perm.sorted == (0 until 64).toList, s"trial $trial: not a bijection")
      // Independent BigInt ranking with the same (varn desc, d asc) law.
      val ranked = moments
        .map { case (d, n, s1, s2) =>
          (d.toInt, BigInt(n) * s2.toBigInt - s1.toBigInt * s1.toBigInt)
        }
        .sortBy { case (d, v) => (-v, d) }
        .map(_._1)
      val rankOf = ranked.zipWithIndex.toMap
      (0 until 8).foreach { j =>
        val octiles = (0 until 8).map(slot => rankOf(perm(j * 8 + slot)) / 8).sorted
        assert(octiles == (0 until 8).toList,
          s"trial $trial subspace $j: octiles $octiles")
      }
    }
  }

  test("emb_hubness: one row per vector, k-occurrence mass conserved against cell sizes") {
    val got = run("emb_hubness").cache()
    val total = Tables.embeddings(spark, sf0001).count()
    assert(got.count() == total, "not one row per corpus vector")
    assert(got.filter(col("n_k") < 0).count() == 0)
    // Mass conservation: every vector queries its cell and contributes
    // exactly min(K, |cell| - 1) list slots, so Σ n_k over the corpus
    // must equal Σ_cells |cell| · min(5, |cell| - 1). A top-k that
    // over- or under-fills (a tie mishandled at the K boundary, a
    // dropped anti-hub row) breaks this identity.
    val cells = got.groupBy("cell").count().as[(Long, Long)].collect()
    val wantMass = cells.map { case (_, n) => n * math.min(5L, n - 1) }.sum
    val gotMass = got.agg(sum("n_k")).as[Long].head()
    assert(gotMass == wantMass, s"k-occurrence mass $gotMass != expected $wantMass")
    // The distribution must actually skew (hubness is the point): some
    // vector collects more than K occurrences.
    assert(got.agg(max("n_k")).as[Long].head() > 5, "vacuous: no hub in the fixture")
    got.unpersist()
  }

  test("emb_kmeans_elbow: inertia falls with k, and a driver recount pins the k=2 row") {
    import spark.implicits._
    val got = run("emb_kmeans_elbow")
      .as[(Long, Long, Long, Long, Long, Double, Double)].collect().sortBy(_._1)
    assert(got.map(_._1).toSeq == Seq(2L, 4L, 8L, 16L))
    val n = Tables.embeddings(spark, sf0001).count()
    got.foreach { case (k, nv, cells, maxCell, inertia, meanD2, scanFrac) =>
      assert(nv == n, s"k=$k: row count $nv != corpus $n")
      assert(cells >= 1 && cells <= k, s"k=$k: $cells cells")
      assert(maxCell <= nv && inertia >= 0, s"k=$k: $maxCell/$inertia")
      assert(math.abs(meanD2 - inertia.toDouble / (nv * 1e6)) < 1e-6)
      // Σ|cell|²/n² bounds: at least 1/k (perfect balance), at most 1
      // (one fat cell), and never below the max cell's own share².
      assert(scanFrac >= 1.0 / k - 1e-6 && scanFrac <= 1.0 + 1e-9,
        s"k=$k: scan_frac $scanFrac out of bounds")
      assert(scanFrac >= math.pow(maxCell.toDouble / nv, 2) - 1e-6,
        s"k=$k: scan_frac $scanFrac below the max cell's share^2")
    }
    // More cells must shrink the in-cell pair bound (the production
    // claim the column exists to audit): scan_frac non-increasing in k.
    val fracs = got.map(_._7)
    assert(fracs.zip(fracs.tail).forall { case (a, b) => b <= a + 1e-9 },
      s"scan_frac not non-increasing in k: ${fracs.toSeq}")
    // The elbow must actually bend: more cells, less inertia.
    val inertias = got.map(_._5)
    assert(inertias.zip(inertias.tail).forall { case (a, b) => b <= a },
      s"inertia not non-increasing in k: ${inertias.toSeq}")
    assert(inertias.last < inertias.head, "vacuous: k=16 no better than k=2")
    // Driver recount of the k=2 row: same |v|^2 - 2 v.c + |c|^2 with
    // left-fold dots, ROUND 6, x1e6 lattice.
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s = s + a(i) * b(i); i += 1 }
      s
    }
    val cents = graft.queries.IvfCentroids.kmeans2
    val rows = Tables.embeddings(spark, sf0001).select("embedding").collect()
      .map(_.getSeq[Float](0).toArray.map(_.toDouble))
    val want = rows.map { v =>
      cents.map { case (cid, c) =>
        (dot(v, v) - 2.0 * dot(v, c) + c.map(x => x * x).sum, cid)
      }.min._1
    }.map(d => (BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP)
      * 1000000).toLongExact).sum
    assert(got.head._5 == want, s"k=2 inertia ${got.head._5} != recount $want")
  }

  test("emb_ood_mahalanobis: driver-side moments + fold replay the top-5 per label exactly") {
    import spark.implicits._
    val got = run("emb_ood_mahalanobis")
      .as[(Int, Long, Long, Double)].collect()
      .map { case (label, rnk, id, md2) => (label, rnk) -> (id, md2) }.toMap
    assert(got.nonEmpty, "vacuous: no OOD rows at sf0.001")
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val rows = Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), col("label"), col("embedding"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Float](2).toArray))
    rows.groupBy(_._2).foreach { case (label, vs) =>
      val byId = vs.sortBy(_._1)
      val n = byId.length
      val dim = byId.head._3.length
      // Ordered folds per dim, exactly like the in-plan aggregate.
      val mu = new Array[Double](dim); val va = new Array[Double](dim)
      (0 until dim).foreach { i =>
        var s = 0.0; var sq = 0.0
        byId.foreach { case (_, _, e) =>
          val x = e(i).toDouble; s = s + x; sq = sq + x * x
        }
        mu(i) = s / n
        va(i) = sq / n - (s / n) * (s / n)
      }
      val scored = byId.map { case (id, _, e) =>
        var acc = 0.0
        (0 until dim).foreach { i =>
          acc = acc + (e(i).toDouble - mu(i)) * (e(i).toDouble - mu(i)) / (va(i) + 0.000001)
        }
        (id, r6(acc))
      }.sortBy { case (id, m) => (-m, id) }
      scored.take(5).zipWithIndex.foreach { case ((id, m), k) =>
        assert(got((label, k + 1L)) == ((id, m)),
          s"label $label rank ${k + 1}: got ${got((label, k + 1L))}, want ($id, $m)")
      }
      // The flagged set must separate from the bulk: rank-1 md2 above
      // the label median (otherwise the audit flags nothing unusual).
      val med = scored.map(_._2).sorted.apply(scored.length / 2)
      assert(scored.head._2 > med, s"label $label: no separation above the median")
    }
  }

  test("emb_rank_agreement: a driver-side Kendall recount replays every query; tau in [-1, 1]") {
    def shortlist(name: String): Map[Long, Map[Long, Long]] =
      run(name).select("query_id", "vec_id", "rn").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .groupBy(_._1).map { case (q, rows) =>
          q -> rows.map(r => r._2 -> r._3).toMap
        }
    val a = shortlist("emb_knn_lsh")
    val b = shortlist("emb_knn_ivf_kmeans")
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val want = a.keySet.intersect(b.keySet).toSeq.sorted.flatMap { q =>
      val common = a(q).keySet.intersect(b(q).keySet).toSeq.sorted
      if (common.isEmpty) None else {
        val pairs = for {
          i <- common.indices; j <- (i + 1) until common.length
        } yield (a(q)(common(i)) - a(q)(common(j))) * (b(q)(common(i)) - b(q)(common(j)))
        val (c, d) = (pairs.count(_ > 0).toLong, pairs.count(_ < 0).toLong)
        val m = common.length.toLong
        Some((q, m, c, d,
          if (m >= 2) Some(r6((c - d).toDouble / (m * (m - 1) / 2))) else None))
      }
    }
    assert(want.nonEmpty, "vacuous: the two retrievers share no candidates")
    val got = run("emb_rank_agreement").collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getDouble(4)))).toSeq
    assert(got == want, s"Kendall recount diverged\n got=$got\nwant=$want")
    got.flatMap(_._5).foreach(t => assert(t >= -1.0 && t <= 1.0, s"tau $t out of range"))
    // The fused-index premise: agreement must not be total everywhere
    // (if both indexes always rank identically, fusing them adds nothing).
    assert(got.flatMap(_._5).exists(_ < 1.0) || got.exists(_._2 <= 1),
      "retrievers agree perfectly everywhere — fusion premise violated")
  }
}
