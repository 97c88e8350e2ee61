package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ConnectedComponents

/** Both components algorithms against a driver-side union-find ground
  * truth, the diameter-independence claim on a chain graph, and the
  * iteration-hygiene contract (no cached frames survive a call).
  */
class ConnectedComponentsSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    // Path-compress to the true minimum root.
    nodes.map(n => n -> find(n)).toMap
  }

  private def labelsOf(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.as[(Long, Long)].collect().toMap

  test("random graph: both algorithms match union-find ground truth") {
    val rnd = new scala.util.Random(7)
    // ~120 nodes, 90 edges: several components, some singleton-free clumps.
    val edges = (0 until 90).map { _ =>
      (rnd.nextInt(120).toLong, rnd.nextInt(120).toLong)
    }.filter(e => e._1 != e._2)
    val truth = unionFind(edges)
    val df = edges.toDF("a", "b")
    // Default call = the driver union-find local-finish path (these
    // graphs are far under LocalFinishEdges); localFinishEdges = 0 pins
    // the DISTRIBUTED iterations — both must match ground truth.
    assert(labelsOf(ConnectedComponents.labelPropagation(df)) == truth)
    assert(labelsOf(ConnectedComponents.alternatingStar(df)) == truth)
    assert(labelsOf(ConnectedComponents.labelPropagation(df, localFinishEdges = 0)) == truth)
    assert(labelsOf(ConnectedComponents.alternatingStar(df, localFinishEdges = 0)) == truth)
  }

  test("randomized graphs (mixed clumps + a chain tail): both algorithms match union-find") {
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(seed)
      val n = 20 + rnd.nextInt(60)
      val clump = (0 until n).map(_ => (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      // A path segment on fresh node ids stresses diameter handling in
      // the same run as the dense clumps.
      val chain = (0 until 12).map(i => (n + i.toLong, n + i + 1L))
      val edges = (clump ++ chain).filter(e => e._1 != e._2)
      val truth = unionFind(edges)
      val df = edges.toDF("a", "b")
      assert(labelsOf(ConnectedComponents.labelPropagation(df, maxRounds = 40)) == truth,
        s"propagation diverged from union-find at seed $seed")
      assert(labelsOf(ConnectedComponents.labelPropagation(df, maxRounds = 40,
        localFinishEdges = 0)) == truth,
        s"distributed propagation diverged from union-find at seed $seed")
      // Fused probing (probeEvery > 1) may run idempotent trailing
      // rounds but must land on the identical fixpoint.
      assert(labelsOf(ConnectedComponents.labelPropagation(df, maxRounds = 40,
        probeEvery = 3, localFinishEdges = 0)) == truth,
        s"fused-probe propagation diverged from union-find at seed $seed")
      assert(labelsOf(ConnectedComponents.alternatingStar(df)) == truth,
        s"alternating star diverged from union-find at seed $seed")
      assert(labelsOf(ConnectedComponents.alternatingStar(df, localFinishEdges = 0)) == truth,
        s"distributed alternating star diverged from union-find at seed $seed")
    }
  }

  test("chain graph: star converges in O(log n) rounds, propagation needs the diameter") {
    // A single path 0-1-2-...-64: diameter 64. Min-label propagation moves
    // the label one hop per round, so it CANNOT finish inside a 20-round
    // budget; the star rewrites collapse it in a handful of rounds.
    val chain = (0L until 64L).map(i => (i, i + 1))
    val df = chain.toDF("a", "b")
    val (labels, rounds) =
      ConnectedComponents.alternatingStarWithRounds(df, localFinishEdges = 0)
    info(s"star rounds on a diameter-64 chain: $rounds")
    assert(rounds <= 10, s"star took $rounds rounds — not diameter-independent")
    assert(labelsOf(labels).values.toSet == Set(0L))
    val diameterBound = intercept[IllegalArgumentException] {
      ConnectedComponents.labelPropagation(df, maxRounds = 20, localFinishEdges = 0)
    }
    assert(diameterBound.getMessage.contains("did not converge"))
    // With the budget matched to the diameter it does finish.
    assert(labelsOf(ConnectedComponents.labelPropagation(df, maxRounds = 65,
      localFinishEdges = 0)).values.toSet == Set(0L))
  }

  test("probeEvery > 1 budgeting: the documented maxRounds bound is a real contract") {
    // Scaladoc rule (labelPropagation): convergence is only OBSERVED at
    // probe boundaries, so budget maxRounds ≥ diameter + 2·probeEvery − 1.
    // Chain 0-1-...-9: diameter 9. With probeEvery = 2 the last label
    // move (round 9) lands INSIDE the final gap of a 10-round budget —
    // the probe at 10 sees a changed sum and the convergence require
    // trips even though the labeling is complete. The same 10-round
    // budget succeeds at probeEvery = 1, and the documented bound
    // (9 + 2·2 − 1 = 12) succeeds at probeEvery = 2.
    val chain = (0L until 9L).map(i => (i, i + 1)).toDF("a", "b")
    assert(labelsOf(ConnectedComponents.labelPropagation(chain, maxRounds = 10,
      probeEvery = 1, localFinishEdges = 0)).values.toSet == Set(0L))
    val gapTrap = intercept[IllegalArgumentException] {
      ConnectedComponents.labelPropagation(chain, maxRounds = 10,
        probeEvery = 2, localFinishEdges = 0)
    }
    assert(gapTrap.getMessage.contains("did not converge"))
    assert(labelsOf(ConnectedComponents.labelPropagation(chain, maxRounds = 12,
      probeEvery = 2, localFinishEdges = 0)).values.toSet == Set(0L))
  }

  test("star endgame: distributed rounds hand off to the local finish mid-iteration") {
    // A dense clump CONTRACTS under the star rewrites (redundant edges
    // collapse toward the n−1-edge fixpoint star), so a threshold set
    // between the fixpoint size and the input size forces ≥1 distributed
    // round and then the driver union-find endgame — fewer rounds than
    // the pure-distributed run, identical labels.
    val rnd = new scala.util.Random(11)
    val edges = (0 until 300).map(_ => (rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
      .filter(e => e._1 != e._2)
    val truth = unionFind(edges)
    val df = edges.toDF("a", "b")
    val (distLabels, distRounds) =
      ConnectedComponents.alternatingStarWithRounds(df, localFinishEdges = 0)
    val (locLabels, locRounds) =
      ConnectedComponents.alternatingStarWithRounds(df, localFinishEdges = 60)
    info(s"endgame handoff: $locRounds rounds vs $distRounds pure-distributed")
    assert(locRounds >= 1, "threshold below input size must still run distributed rounds")
    assert(locRounds < distRounds,
      "the sub-threshold probe should have handed off before distributed convergence")
    assert(labelsOf(distLabels) == truth)
    assert(labelsOf(locLabels) == truth)
  }

  test("edgeless input: both algorithms return an empty labeling, no NPE") {
    val empty = Seq.empty[(Long, Long)].toDF("a", "b")
    assert(ConnectedComponents.labelPropagation(empty).count() == 0)
    assert(ConnectedComponents.alternatingStar(empty).count() == 0)
    // Self-loops only: still no components to label.
    val loops = Seq((1L, 1L), (2L, 2L)).toDF("a", "b")
    assert(ConnectedComponents.labelPropagation(loops).count() == 0)
    assert(ConnectedComponents.alternatingStar(loops).count() == 0)
  }

  test("both algorithms leave the Dataset cache empty") {
    spark.sharedState.cacheManager.clearCache()
    val edges = (0L until 30L).map(i => (i, (i * 7 + 3) % 30)).filter(e => e._1 != e._2)
    val df = edges.toDF("a", "b")
    val truth = unionFind(edges)
    assert(labelsOf(ConnectedComponents.labelPropagation(df)) == truth)
    assert(labelsOf(ConnectedComponents.alternatingStar(df)) == truth)
    assert(spark.sharedState.cacheManager.isEmpty,
      "a components iteration left Dataset caches behind")
  }

  test("doc_dup_clusters_star: identical result to doc_dup_clusters on the LSH graph") {
    val prop = SparkEntry.queries("doc_dup_clusters")(spark, TestSpark.sf0001)
      .as[(Long, Long)].collect().toSeq
    val star = SparkEntry.queries("doc_dup_clusters_star")(spark, TestSpark.sf0001)
      .as[(Long, Long)].collect().toSeq
    assert(prop.nonEmpty && prop == star)
  }

  private def countSparkJobs(build: => Unit): Int = {
    import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = { jobs.incrementAndGet(); () }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      build
      var last = -1
      var settled = 0
      while (settled < 5) {
        Thread.sleep(100)
        val now = jobs.get()
        if (now == last) settled += 1 else { settled = 0; last = now }
      }
      jobs.get()
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("small-graph fast path: rounds fuse to ~one job each, session conf restored") {
    // Round-10 item #4: iterative CC was driver-overhead-bound — each
    // round paid an eager-checkpoint job PLUS a probe job, and AQE split
    // every shuffle stage into its own job (~10 jobs/round measured on
    // the golden-record graph). The fix is twofold: non-eager
    // checkpoints materialized by the probe's own action, and the
    // small-graph conf (AQE off, parallelism matched to data) for the
    // round bodies. This pins both: total jobs bounded by ~1 per round
    // plus a constant for the default-conf initial probe and the final
    // labeling — the pre-fix behavior lands 3–10× above the bound.
    val keys = Seq("spark.sql.shuffle.partitions",
      "spark.sql.adaptive.enabled", "spark.sql.codegen.wholeStage")
    val before = keys.map(k => k -> spark.conf.getOption(k))
    val edges = (0 until 200).map(i => (i.toLong, i + 1L)).toDF("a", "b")
    var rounds = 0
    val jobs = countSparkJobs {
      val (out, r) =
        ConnectedComponents.alternatingStarWithRounds(edges, localFinishEdges = 0)
      rounds = r
      out.count()
    }
    info(s"alternatingStar: $rounds rounds, $jobs jobs")
    // Per-round anatomy under the fast path (measured): the two star
    // rewrites' broadcast-join builds fire ~4 eager broadcast-collect
    // jobs when the lazy checkpoint compiles its physical plan, plus one
    // fused materialize+probe job. The regression signatures this bound
    // catches: AQE re-enabled in the rounds (~10 stage-jobs/round) or a
    // re-split materialize/probe — both land well above 5·rounds.
    assert(jobs <= 5 * rounds + 8,
      s"star iteration submitted $jobs jobs for $rounds rounds — the fused " +
        "materialize+probe or the small-graph conf regressed")
    assert(keys.map(k => k -> spark.conf.getOption(k)) == before,
      "small-graph fast path did not restore the session conf")
  }

  test("small-graph profile is session-isolated: caller conf never touched") {
    import graft.operators.SmallGraph
    val keys = Seq("spark.sql.shuffle.partitions",
      "spark.sql.adaptive.enabled", "spark.sql.codegen.wholeStage")
    val before = keys.map(k => k -> spark.conf.getOption(k))
    // Below the threshold: a CHILD session carries the profile; the
    // caller's session conf is untouched for the whole window (the
    // round-11 ADVICE concurrency hazard — a mutate-and-restore flip —
    // is structurally gone, so there is nothing to "restore" on throw).
    val child = SmallGraph.sessionFor(spark, 10L)
    assert(!(child eq spark), "sub-threshold rows must get a child session")
    assert(child.conf.get("spark.sql.adaptive.enabled") == "false")
    assert(child.conf.get("spark.sql.codegen.wholeStage") == "false")
    assert(child.conf.get("spark.sql.shuffle.partitions") == "1")
    assert(keys.map(k => k -> spark.conf.getOption(k)) == before,
      "creating the small-graph session mutated the caller's conf")
    // At/above the threshold the caller's own session is returned.
    assert(SmallGraph.sessionFor(spark, SmallGraph.SmallGraphRows) eq spark)
    // Frames rebase child→parent and back; data and schema survive.
    val df = Seq((1L, 2L), (3L, 4L)).toDF("u", "v").localCheckpoint()
    val rebased = SmallGraph.rebase(SmallGraph.rebase(df, child), spark)
    assert(rebased.sparkSession eq spark)
    assert(rebased.as[(Long, Long)].collect().toSet == Set((1L, 2L), (3L, 4L)))
  }
}
