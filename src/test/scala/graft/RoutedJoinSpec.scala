package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.RoutedJoin
import graft.operators.RoutedJoin.{BroadcastRoute, SaltedRoute, ShuffleRoute}

/** RoutedJoin: every branch of the sketch-driven route choice force-pinned
  * on synthetic frames (the catalog entries exercise each organically on
  * the testdata corpus; these tests keep all branches covered regardless
  * of what the corpus routes to), plus the result-invariance contract —
  * routes trade plan shape, never rows.
  */
class RoutedJoinSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  // Flat fact: 2000 rows over 100 uniform keys; hot fact: 40% on key 1.
  private lazy val flatFact = (1L to 2000L)
    .map(i => (i, i % 100 + 1, i.toDouble / 10)).toDF("event_id", "k", "value")
  private lazy val hotFact = (1L to 2000L)
    .map(i => (i, if (i % 10 < 4) 1L else i % 100 + 1, i.toDouble / 10))
    .toDF("event_id", "k", "value")
  private lazy val dim = (1L to 100L).map(i => (i, s"seg${i % 5}"))
    .toDF("c_custkey", "c_mktsegment")

  test("choose: small dim broadcasts regardless of skew") {
    val st = RoutedJoin.stats(hotFact, "k", col("event_id"), dim)
    assert(RoutedJoin.choose(st) == BroadcastRoute)
  }

  test("choose: large dim + flat fact takes the plain shuffle route") {
    val st = RoutedJoin.stats(flatFact, "k", col("event_id"), dim)
    assert(st.hotMass < 0.2, s"flat fact measured hot: $st")
    assert(RoutedJoin.choose(st, broadcastRowLimit = 10) == ShuffleRoute)
  }

  test("choose: large dim + hot fact salts") {
    val st = RoutedJoin.stats(hotFact, "k", col("event_id"), dim)
    // CM point bound never underestimates the true heaviest mass (~0.4),
    // and the 1/16 sample keeps it in a decision-grade band.
    assert(st.hotMass > 0.2 && st.hotMass < 0.8, s"hot-mass bound off: $st")
    assert(RoutedJoin.choose(st, broadcastRowLimit = 10) == SaltedRoute)
  }

  test("stats: string keys sketch correctly (no silent long-cast nulling)") {
    val sFact = (1L to 2000L)
      .map(i => (i, if (i % 10 < 4) "hot" else s"k${i % 100}", i.toDouble))
      .toDF("event_id", "k", "value")
    val st = RoutedJoin.stats(sFact, "k", col("event_id"), dim)
    assert(st.hotMass > 0.2 && st.hotMass < 0.8,
      s"string hot key not detected: $st")
  }

  test("stats: the CM bound never underestimates the sampled heaviest key (one-sided)") {
    // min_r max_bucket cell(r) >= f_max is the property the salt decision
    // rests on (a router that UNDER-estimates skew ships a hot key to one
    // reducer); check it against the true per-key counts of the SAME
    // deterministic 1/16 sample across several skew shapes.
    val rnd = new scala.util.Random(733)
    for (trial <- 1 to 5) {
      val hotShare = 1 + rnd.nextInt(8) // 10%..80% on key 1
      val fact = (1L to 4000L)
        .map(i => (i, if (i % 10 < hotShare) 1L else i % (10 + rnd.nextInt(400)) + 2,
          i.toDouble))
        .toDF("event_id", "k", "value")
      val st = RoutedJoin.stats(fact, "k", col("event_id"), dim)
      val sampled = fact
        .filter(pmod(xxhash64(col("event_id")), lit(RoutedJoin.SampleMod.toLong)) === 0L)
        .groupBy("k").count().agg(max("count"), sum("count")).head()
      val trueMax = sampled.getLong(0)
      val trueTotal = sampled.getLong(1)
      assert(st.sampledRows == trueTotal, s"trial $trial: sample size drift $st")
      assert(st.hotEst >= trueMax,
        s"trial $trial: CM bound ${st.hotEst} under true sampled max $trueMax")
    }
  }

  test("stats: empty fact sample degrades to broadcast-if-small, shuffle otherwise") {
    val empty = Seq.empty[(Long, Long, Double)].toDF("event_id", "k", "value")
    val st = RoutedJoin.stats(empty, "k", col("event_id"), dim)
    assert(st.sampledRows == 0L && st.hotMass == 0.0)
    assert(RoutedJoin.choose(st) == BroadcastRoute)
    assert(RoutedJoin.choose(st, broadcastRowLimit = 10) == ShuffleRoute)
  }

  test("choose: the byte gate vetoes broadcast for wide rows the row gate would pass") {
    // The production-shaped gate (r14 task #6): a dim can clear any row
    // ceiling and still be unbroadcastable — few rows, fat payloads.
    val fatDim = (1L to 100L).map(i => (i, "x" * 2048)).toDF("c_custkey", "payload")
    val (rows, bytes) = RoutedJoin.dimStats(fatDim)
    assert(rows == 100L && bytes > 100L * 2048L,
      s"byte estimate must at least cover the payload: rows=$rows bytes=$bytes")
    val st = RoutedJoin.stats(hotFact, "k", col("event_id"), fatDim)
    assert(st.dimBytes == bytes, "stats must carry the one-pass byte estimate")
    // Under a 50 KB byte ceiling the 100-row dim must NOT broadcast; the
    // hot fact then salts — the byte gate hands off down the ladder.
    assert(RoutedJoin.choose(st, broadcastByteLimit = 50000L) == SaltedRoute)
    // Same stats, production 10 MB ceiling: broadcast (rows AND bytes ok).
    assert(RoutedJoin.choose(st) == BroadcastRoute)
    // Unmeasured bytes (streamed-cells form) degrade to the row gate.
    assert(RoutedJoin.choose(st.copy(dimBytes = -1L), broadcastByteLimit = 1L)
      == BroadcastRoute)
  }

  test("dimStats counts UTF-8 bytes, not characters (multibyte payloads)") {
    // The r15 advice finding: length(to_json(...)) counts CODEPOINTS, so
    // a CJK payload serializing to 3 bytes/char was estimated at a third
    // of its real size — a dim could pass the 10 MB byte gate at 3x the
    // limit, the wide-row OOM the gate exists to prevent. octet_length
    // must see every byte: a 1024-char CJK string is >= 3072 JSON bytes.
    val cjk = "漢" * 1024 // U+6F22 = 3 bytes in UTF-8
    val wideDim = (1L to 50L).map(i => (i, cjk)).toDF("c_custkey", "payload")
    val (rows, bytes) = RoutedJoin.dimStats(wideDim)
    assert(rows == 50L)
    assert(bytes >= 50L * 1024L * 3, // payload alone, before JSON framing
      s"byte estimate must count UTF-8 bytes (got $bytes; a character " +
        s"count would read ~${50L * 1024L})")
    // And the estimate still errs safe vs an ASCII dim of the same
    // character count: same length() reading, 3x the octet reading.
    val asciiDim = (1L to 50L).map(i => (i, "x" * 1024)).toDF("c_custkey", "payload")
    val (_, asciiBytes) = RoutedJoin.dimStats(asciiDim)
    assert(bytes > asciiBytes * 2,
      s"multibyte payload must read larger than its ASCII twin: $bytes vs $asciiBytes")
  }

  test("all three routes return the identical join result") {
    def agg(route: RoutedJoin.Route, limit: Long, threshold: Double) = {
      val (joined, taken) = RoutedJoin.join(hotFact, "k", col("event_id"),
        dim, "c_custkey", hotMassThreshold = threshold, broadcastRowLimit = limit)
      assert(taken == route, s"expected $route, got $taken")
      joined.groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"), sum(col("value").cast("decimal(18,4)")).as("s"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDecimal(2)))
        .sortBy(_._1).toSeq
    }
    val viaBroadcast = agg(BroadcastRoute, 1000000L, 0.2)
    val viaShuffle = agg(ShuffleRoute, 10L, 0.99)
    val viaSalted = agg(SaltedRoute, 10L, 0.2)
    assert(viaBroadcast == viaShuffle)
    assert(viaBroadcast == viaSalted)
  }

  test("salted plan shuffles on (key, salt); broadcast plan never shuffles the fact") {
    val (salted, r1) = RoutedJoin.join(hotFact, "k", col("event_id"),
      dim, "c_custkey", broadcastRowLimit = 10L)
    assert(r1 == SaltedRoute)
    val sp = salted.queryExecution.executedPlan.toString
    assert(sp.contains("ShuffledHashJoin") && sp.contains("__salt"),
      s"salted route did not plan a salted shuffled hash join\n$sp")
    val (bc, r2) = RoutedJoin.join(hotFact, "k", col("event_id"), dim, "c_custkey")
    assert(r2 == BroadcastRoute)
    val bp = bc.queryExecution.executedPlan.toString
    assert(bp.contains("BroadcastHashJoin") && !bp.contains("ShuffledHashJoin"),
      s"broadcast route planned a shuffle\n$bp")
  }
}
