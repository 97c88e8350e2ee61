package graft
import org.apache.spark.sql.SparkSession

import graft.SessionHygiene.dropEntryState
import graft.queries.Catalog

/** Benchmark main. Emits ONE JSON line:
  * {"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...,
  *  "errors":{...}}
  *
  * Hygiene (round-1 verdict): queries run in the FIXED Catalog.all order
  * (not Map iteration order), after a full warmup pass at sf0.001 so
  * JVM/codegen warmup is not charged to whichever query happens to run
  * first; per-query failures are recorded in "errors" and fail the run
  * (non-zero exit) instead of being silently swallowed.
  */
object Bench {
  /** JIT sink for the calibration loop result (see `calibrate`). */
  @volatile private var calSink: Long = 0L

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val warmupDir = sys.env.getOrElse("SPARK_GRAFT_WARMUP_DIR", "/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    SessionHygiene.quietCheckpointTeardownLogs()

    // Optional focus filter: SPARK_GRAFT_ONLY=q1,q2 runs a subset (each
    // query twice under the warmup pass + timed pass as usual).
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").map(_.trim).toSet)
    // SPARK_GRAFT_ORDER_SEED=N permutes entry execution order (seeded,
    // reproducible). Baseline SEEDING runs set it to decorrelate records
    // from fixed-order adjacency: neighboring entries share cached
    // lineage/AQE state, so a min recorded under one fixed order is
    // flattered for entries that happen to follow a cache-warming
    // neighbor, and any later reordering reads as fake drift (the r14
    // doc_containment_profile flag). Unset = the stable catalog order.
    // Parse loudly: a typo'd value must name itself, not die as a raw
    // NumberFormatException stack (same contract as a typo'd
    // SPARK_GRAFT_ONLY below).
    val orderSeed = sys.env.get("SPARK_GRAFT_ORDER_SEED").map { s =>
      try s.trim.toLong catch {
        case _: NumberFormatException =>
          System.err.println(s"SPARK_GRAFT_ORDER_SEED='$s' is not a long")
          spark.stop(); sys.exit(2); 0L
      }
    }
    val baseOrder = Catalog.all.map(e => e.name -> e.build)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    val ordered = orderSeed match {
      case Some(seed) => new scala.util.Random(seed).shuffle(baseOrder)
      case None => baseOrder
    }
    if (ordered.isEmpty) {
      // A typo'd SPARK_GRAFT_ONLY must not produce a vacuous ok:true run.
      System.err.println(
        s"SPARK_GRAFT_ONLY=${only.map(_.mkString(",")).getOrElse("")} matches no catalog entry")
      spark.stop()
      sys.exit(2)
    }

    // Warmup: run everything once at the smallest sf; ignore failures here
    // (they will be reported from the timed pass).
    ordered.foreach { case (_, fn) =>
      try fn(spark, warmupDir).count() catch { case _: Throwable => () }
      dropEntryState(spark) // similarity queries cache intermediates
    }

    // Per-query time = MIN of SPARK_GRAFT_REPEAT (default 2) executions:
    // this environment's per-core throughput fluctuates ±3× over seconds
    // (VM neighbors), so a single sample can triple a query's apparent
    // cost. The min is the least-noisy estimator of the query's true
    // cost under these conditions. Repeats are interleaved ROUND-ROBIN
    // across the whole catalog (pass 1 of everything, then pass 2, ...)
    // so a single multi-second noisy host window cannot own every repeat
    // of one query and inflate its min (round-2 saw a 0.9 s query report
    // 8.7 s exactly this way).
    // Host calibration: this environment's per-core throughput swings up
    // to ±3× between runs (VM neighbors) and has repeatedly inflated
    // whole-catalog totals uniformly (r12 observed 158 → 263 s with zero
    // code change between runs). A FIXED deterministic workload timed in
    // the same process gives readers the scalar to normalize by:
    // cal_1t = min-of-3 seconds for 2e8 xorshift64* steps on one thread;
    // cal_32t = the same work on every worker thread concurrently
    // (oversubscription + frequency behavior under full load). Compare
    // totals across rounds as total/cal_32t, not raw seconds.
    def xorshiftRun(steps: Long): Long = {
      var x = 88172645463325252L; var i = 0L
      while (i < steps) { x ^= x << 13; x ^= x >>> 7; x ^= x << 17; i += 1 }
      x
    }
    def calibrate(threads: Int): Double = {
      (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val ts = (1 to threads).map(_ => new Thread(new Runnable {
          // Publish the result so the JIT cannot dead-code the loop.
          def run(): Unit = { Bench.calSink = xorshiftRun(200000000L) }
        }))
        ts.foreach(_.start()); ts.foreach(_.join())
        (System.nanoTime() - t0) / 1e9
      }.min
    }
    val cal1t = math.rint(calibrate(1) * 1000) / 1000
    // The all-threads scalar is measured THREE times ACROSS the run —
    // start, mid-catalog, end — and the emitted cal_32t is their MEDIAN
    // (r16 verdict #4: a single start-of-run calibration is itself one
    // roll of the host dice; the r16 driver run's start scalar diverged
    // 40% from the record's and made 79 entries read "improved"). The
    // three raw readings are emitted alongside (cal_32t_runs) so a
    // reader can see the run's own regime drift.
    val cal32tRuns = scala.collection.mutable.ArrayBuffer(calibrate(cpus.toInt))
    // In-loop threshold decisions (sub-second stabilizer) need a scalar
    // before the mid/end readings exist — but a SINGLE start reading is
    // itself one roll of the host dice (r17 advice: the r17 run's start
    // read 1.176 vs 0.461/0.547 later, which would have given median-of-3
    // treatment to every entry under ~1.2s raw for the whole run). Take a
    // second start reading and use the MIN of the two for the in-loop
    // threshold only (min is robust to a slow outlier; a fast outlier
    // just narrows the stabilizer, which is safe); the EMITTED cal_32t
    // stays the median of the start/mid/end triple, unchanged basis.
    val cal32tStart = math.min(cal32tRuns.head, calibrate(cpus.toInt))
    // Memory-bandwidth probe: the r12 noisy window showed catalog totals
    // 1.34× up while cal_1t/cal_32t were UNCHANGED — co-tenant pressure
    // lands on the memory subsystem, not the ALUs, and Spark's scan/
    // shuffle/hash workloads are bandwidth-bound. All worker threads
    // stream-sum a shared 1 GB long array (range-partitioned; transient,
    // freed after the probe), min of 3 — the scalar that tracks the
    // inflation cal_1t misses.
    val calMem = {
      val n = 128 << 20 // 128M longs = 1 GB — aggregate far above L3, so
      val arr = new Array[Long](n) // the sum is DRAM-bound, not cache-bound
      var i = 0
      while (i < n) { arr(i) = i * 0x9e3779b97f4a7c15L; i += 1 }
      val th = cpus.toInt
      (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val ts = (0 until th).map(t => new Thread(new Runnable {
          def run(): Unit = {
            var s = 0L
            var pass = 0
            while (pass < 2) { // 2 passes amortize thread start-up
              var j = t * (n / th)
              val end = if (t == th - 1) n else (t + 1) * (n / th)
              while (j < end) { s += arr(j); j += 1 }
              pass += 1
            }
            Bench.calSink = s
          }
        }))
        ts.foreach(_.start()); ts.foreach(_.join())
        math.rint((System.nanoTime() - t0) / 1e6) / 1000
      }.min
    }

    val repeat = sys.env.getOrElse("SPARK_GRAFT_REPEAT", "2").toInt.max(1)
    // Sub-second stabilizer: an entry that finishes in under ~1
    // cal-normalized second is ONE scheduler roll of the dice per pass —
    // the r14-r16 adjudication history is dominated by exactly these
    // entries fluttering x1.5-2.4 with the host window and clearing
    // isolated. For such entries each pass takes the MEDIAN of 3
    // back-to-back executions (a single noisy window can own one
    // execution, not two of three), bounded cost ~30 s over the catalog
    // because only already-cheap entries qualify. Threshold compares
    // cal-normalized seconds so it is host-stable.
    val subSecNorm = 1.0
    // Disagreement re-measure: the round-robin interleave puts an
    // entry's passes minutes apart, so a transient noisy host window
    // inflates SOME passes and not others — pass readings disagreeing
    // by more than this ratio are evidence the entry straddled a window
    // change (the r15 driver run inflated five 1.4-3 s entries x1.5-2.4
    // while every isolated probe read in-band; record-side dispersion
    // cannot absorb what the run itself can detect). Such entries get
    // ONE extra execution after the passes, min'd in — the cost lands
    // only on entries whose own readings demanded it.
    val disagreeRatio = 1.4
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val best = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    val samples = scala.collection.mutable.LinkedHashMap
      .empty[String, scala.collection.mutable.ArrayBuffer[Double]]
    def timeEntry(name: String, fn: (SparkSession, String) =>
        org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try fn(spark, sfDir).count()
      catch { case e: Throwable =>
        errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName).take(200)
      }
      val dt = (System.nanoTime() - t0) / 1e9
      // Drop this run's cached intermediates: repetitions must not read
      // the previous run's cache, and 46+ queries must not accumulate
      // heap pressure that perturbs later timings.
      dropEntryState(spark)
      dt
    }
    val totalUnits = repeat * ordered.size
    var unitsDone = 0
    for (_ <- 1 to repeat; (name, fn) <- ordered) {
      val d1 = timeEntry(name, fn)
      val dt =
        if (d1 / cal32tStart < subSecNorm && !errors.contains(name)) {
          val ds = Seq(d1, timeEntry(name, fn), timeEntry(name, fn)).sorted
          ds(1)
        } else d1
      samples.getOrElseUpdate(name,
        scala.collection.mutable.ArrayBuffer.empty[Double]) += dt
      best(name) = math.min(best.getOrElse(name, Double.MaxValue), dt)
      unitsDone += 1
      if (cal32tRuns.size == 1 && unitsDone * 2 >= totalUnits)
        cal32tRuns += calibrate(cpus.toInt) // mid-run reading
    }
    if (repeat > 1) {
      for ((name, fn) <- ordered if !errors.contains(name)) {
        val ss = samples(name)
        if (ss.nonEmpty && ss.min > 0 && ss.max / ss.min > disagreeRatio)
          best(name) = math.min(best(name), timeEntry(name, fn))
      }
    }
    // SELF-ADJUDICATION (r19, r18 verdict #2): four consecutive rounds
    // burned their adjudication budget on mid-run host-window noise —
    // start-of-run calibrations cannot see a co-tenant burst that lands
    // mid-catalog, and 27-35 entries then read >=2x of the record until
    // someone probes them by hand. So the run probes ITSELF: after the
    // timed loop, re-measure every entry whose in-run reading exceeds
    // ~2x of BASELINES.json median_norm with an isolated min-of-3 under
    // a FRESH calibration, and stamp both readings into the artifact
    // ("probes" + "cal_probe"). tools/baseline_check.py then demotes
    // flags whose probe reads in-band (FLAG-PROBED-CLEAR) and keeps
    // only probe-confirmed regressions. The in-run `queries` map is
    // UNCHANGED — probes ride alongside, never replace the timing.
    // Skipped for subset runs (SPARK_GRAFT_ONLY — already isolated) and
    // when no record exists; SPARK_GRAFT_SELFPROBE=0 disables.
    val probes = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    var calProbe = 0.0
    // Guarded on the record's core basis: BASELINES.json is measured at
    // local[32], so comparing a lower-core run against it would read
    // uniformly >1 (raw seconds grow ~cores-fold while calibrate(cpus)
    // does not oversubscribe) and mass-fire meaningless probes into the
    // driver's core-scaling measurement.
    val selfProbe = only.isEmpty && errors.isEmpty && cpus.toInt == 32 &&
      sys.env.getOrElse("SPARK_GRAFT_SELFPROBE", "1") != "0"
    if (selfProbe) {
      val medianNorm: Map[String, Double] = try {
        val f = new java.io.File("BASELINES.json")
        if (!f.exists()) Map.empty
        else {
          val root = new com.fasterxml.jackson.databind.ObjectMapper().readTree(f)
          val es = root.get("entries")
          val it = es.fieldNames()
          val m = scala.collection.mutable.Map.empty[String, Double]
          while (it.hasNext) {
            val n = it.next()
            val e = es.get(n)
            val norm =
              if (e.has("median_norm")) e.get("median_norm").asDouble()
              else e.get("seconds").asDouble() / e.get("cal_32t").asDouble()
            if (norm > 0) m(n) = norm
          }
          m.toMap
        }
      } catch { case scala.util.control.NonFatal(_) => Map.empty }
      if (medianNorm.nonEmpty) {
        calProbe = math.rint(calibrate(cpus.toInt) * 1000) / 1000
        val calsSeen = (cal32tRuns :+ calProbe).sorted
        val calRun = calsSeen(calsSeen.size / 2)
        val suspects = best.toSeq.flatMap { case (name, sec) =>
          medianNorm.get(name).map(n => (name, (sec / calRun) / n))
        }.filter { case (_, r) => r > 2.0 }.sortBy(-_._2).take(12)
        suspects.foreach { case (name, _) =>
          val f = ordered.collectFirst { case (n, f0) if n == name => f0 }.get
          probes(name) = (1 to 3).map(_ => timeEntry(name, f)).min
        }
      }
    }
    cal32tRuns += calibrate(cpus.toInt) // end-of-run reading
    val cal32t = math.rint(cal32tRuns.sorted.apply(cal32tRuns.size / 2) * 1000) / 1000
    val cal32tRunsJson = cal32tRuns
      .map(v => math.rint(v * 1000) / 1000).mkString("[", ",", "]")
    val results = ordered.map { case (name, _) => name -> best(name) }

    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      } + "\""
    val qs = results.map { case (k, v) => s"${jstr(k)}:$v" }.mkString("{", ",", "}")
    val errs = errors.map { case (k, v) => s"${jstr(k)}:${jstr(v)}" }.mkString("{", ",", "}")
    val total = results.map(_._2).sum

    // The driver keeps only the LAST ~2000 chars of stdout and parses the
    // final JSON line out of it. With 130+ catalog entries the full
    // per-query map (~4 KB) cannot fit, so: the full map goes to
    // BENCH_FULL.json (committed to the repo, judge-readable), and the
    // printed line carries the total plus the slowest entries — the ones
    // that dominate the total — trimmed to fit the tail window.
    val seedField = orderSeed.map(s => s""""order_seed":$s,""").getOrElse("")
    val probesField =
      if (probes.isEmpty) ""
      else {
        val ps = probes.map { case (k, v) =>
          s"${jstr(k)}:${math.rint(v * 1000) / 1000}" }.mkString("{", ",", "}")
        s""""cal_probe":$calProbe,"probes":$ps,"""
      }
    val fullLine =
      s"""{"metric":"total","value":$total,"unit":"sec",$seedField$probesField"cal_1t":$cal1t,"cal_32t":$cal32t,"cal_32t_runs":$cal32tRunsJson,"cal_mem":$calMem,"queries":$qs,"sf":${jstr(sfDir)},"errors":$errs,"ok":${errors.isEmpty}}"""
    // Subset runs (SPARK_GRAFT_ONLY) are local iteration — never let them
    // clobber the committed full-catalog artifact. Seeded-order runs are
    // baseline-seeding inputs, not the canonical artifact: they land in
    // BENCH_FULL_seed<N>.json (uncommitted) so the committed
    // BENCH_FULL.json always reflects the stable catalog order.
    val artifactPath = orderSeed
      .map(s => s"BENCH_FULL_seed$s.json").getOrElse("BENCH_FULL.json")
    if (only.isEmpty) {
      // stdout line below is the contract; a failed artifact write must
      // not kill the run, but it must be VISIBLE — a silently-stale
      // committed BENCH_FULL.json points readers at outdated numbers.
      // NonFatal only: OOM/interrupt propagate.
      try {
        val w = new java.io.PrintWriter(artifactPath, "UTF-8")
        try w.println(fullLine) finally w.close()
      } catch {
        case scala.util.control.NonFatal(e) =>
          System.err.println(s"WARN: $artifactPath not updated (${e.getMessage}); " +
            "the committed artifact is stale — trust the stdout line")
      }
    }

    val slow = results.sortBy(-_._2)
      .map { case (k, v) => s"${jstr(k)}:${math.rint(v * 1000) / 1000}" }
    // The errors map must share the line budget too — full messages live
    // in BENCH_FULL.json; the printed line carries at most 8 errors at
    // 60 chars each, or an unbounded errs would reintroduce the clipped
    // unparseable line on exactly the runs where diagnostics matter.
    val errsCompact = (errors.take(8).map { case (k, v) => s"${jstr(k)}:${jstr(v.take(60))}" } ++
      (if (errors.size > 8) Seq(s""""errors_omitted":${errors.size - 8}""") else Nil))
      .mkString("{", ",", "}")
    // Budget the line at 1800 chars: fits the tail window together with
    // sbt's trailing "[success] ..." line.
    // The printed line carries only the probe COUNT (details live in
    // BENCH_FULL.json's probes map — the line budget belongs to the
    // slowest-queries map the driver reads).
    val probesN = if (probes.isEmpty) "" else s""""probes_n":${probes.size},"""
    val fixed =
      s"""{"metric":"total","value":${math.rint(total * 1000) / 1000},"unit":"sec","n":${results.size},"cal_1t":$cal1t,"cal_32t":$cal32t,"cal_32t_runs":$cal32tRunsJson,"cal_mem":$calMem,$probesN"full":${jstr(artifactPath)},"sf":${jstr(sfDir)},"errors":$errsCompact,"ok":${errors.isEmpty},"queries_omitted":OMIT,"queries":{}}"""
    val room = 1800 - fixed.length
    val kept = scala.collection.mutable.ArrayBuffer.empty[String]
    var used = 0
    for (s <- slow if used + s.length + 1 <= room) { kept += s; used += s.length + 1 }
    println(fixed
      .replace("\"queries\":{}", s""""queries":{${kept.mkString(",")}}""")
      .replace("\"queries_omitted\":OMIT", s""""queries_omitted":${results.size - kept.size}"""))
    spark.stop()
    if (errors.nonEmpty) sys.exit(1)
  }
}
