package graft.streaming

import java.util.concurrent.ConcurrentLinkedQueue
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.streaming.StreamingQueryListener

/** The AdCom regulation band (reference `Reference(40, 65, 30, 85)`,
  * PreAggregateControllerService.java:60,379): keep mean utilization inside
  * [min, max]; minLow/maxHigh are the hard bands that trigger the larger
  * ±200 ms step.
  */
final case class BandReference(min: Int = 40, max: Int = 65, minLow: Int = 30, maxHigh: Int = 85)

/** The banded proportional policy, verbatim from the reference controller
  * (PreAggregateControllerService.computeNextProcTimeIntervalMs, :126-174;
  * steps applied through PreAggregateGlobalState.increment/
  * decrementIntervalMsNew, :46-67; floor MIN_INTERVAL_MS=50, :27):
  *
  *   - any subtask overloaded (≥100 %)            → +200 ms
  *   - mean above band: ≥ maxHigh → +200 ms, else → +100 ms
  *   - mean below band: ≤ minLow  → −200 ms, else → −100 ms (floored at 50)
  *   - inside band                                → no change (None)
  *
  * Pure function — unit-testable without a streaming query.
  */
object AdaptivePolicy {
  val MinIntervalMs = 50L

  def next(currentMs: Long, meanUtilPct: Double, overloaded: Boolean,
      ref: BandReference = BandReference()): Option[Long] = {
    if (overloaded) Some(currentMs + 200)
    else if (meanUtilPct > ref.max) {
      if (meanUtilPct >= ref.maxHigh) Some(currentMs + 200) else Some(currentMs + 100)
    } else if (meanUtilPct < ref.min) {
      val dec = if (meanUtilPct <= ref.minLow) 200 else 100
      Some(math.max(MinIntervalMs, currentMs - dec))
    } else None
  }
}

/** One decision record — the Spark analogue of the reference's 12-field
  * signal string (PreAggregateProcTimeSignalsMonitor.java:132-153).
  */
final case class TriggerDecision(
    batchId: Long,
    utilizationPct: Double,
    inputRowsPerSec: Double,
    processedRowsPerSec: Double,
    batchDurationMs: Long,
    intervalMsBefore: Long,
    intervalMsAfter: Long,
    wallMs: Long = 0L) {

  /** The reference's `|`-delimited signal wire format
    * (PreAggregateProcTimeSignalsMonitor.updateSignals, :132-153:
    * subtask|outPoolUsage stats×8|recs-in/s|recs-out/s|intervalMs).
    * Spark has one driver-side signal stream, so the subtask index is 0
    * and the eight outPoolUsage histogram slots all carry the batch
    * utilization (Spark's scalar analogue of the gauge).
    */
  def asSignalString: String = {
    val u = f"$utilizationPct%.2f"
    (Seq("0") ++ Seq.fill(8)(u) ++
      Seq(f"$inputRowsPerSec%.2f", f"$processedRowsPerSec%.2f", intervalMsBefore.toString))
      .mkString("|")
  }
}

/** Driver-side AdCom controller (SURVEY §2.4 Spark mapping): a
  * `StreamingQueryListener` standing in for the reference's
  * JobManager-side `PreAggregateControllerService` + MQTT signal plumbing
  * (no broker needed — Spark has no JobManager/TaskManager split to
  * bridge).
  *
  * Signal: utilization = batch `triggerExecution` duration / current
  * trigger interval — the micro-batch analogue of `outPoolUsage` (a batch
  * that takes as long as its trigger interval ≙ a full output buffer;
  * SURVEY §4). Overload ≙ utilization ≥ 100 % (the batch missed its
  * cadence).
  *
  * Spark cannot re-arm a running query's trigger mid-flight, so the
  * controller maintains `currentIntervalMs` as the interval the NEXT query
  * (re)start should use — the observable contract is the reference's:
  * flush cadence adapts within [50 ms, ∞) to keep utilization in band.
  * An `onNewInterval` callback lets a harness restart the query or log the
  * walk.
  */
final class AdaptiveTriggerController(
    queryName: String,
    initialIntervalMs: Long = 500L,
    ref: BandReference = BandReference(),
    onNewInterval: Long => Unit = _ => ())
    extends StreamingQueryListener {

  private val interval = new AtomicLong(initialIntervalMs)
  private val decisionLog = new ConcurrentLinkedQueue[TriggerDecision]()
  private val skip = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Ignore the next `n` live progress events. A restart harness calls
    * this when it re-arms the trigger: the first batch(es) after a
    * (re)start carry query cold-start cost plus the backlog accumulated
    * while stopped — catch-up work, not a steady-state utilization signal.
    * (The reference's timer re-registration is free, so its monitor never
    * sees such an artifact; skipping is how the stop/restart analogue
    * preserves the reference's signal semantics.) Synthetic `observe`
    * calls are never skipped.
    */
  def skipNext(n: Int): Unit = skip.addAndGet(n)

  def currentIntervalMs: Long = interval.get()
  def decisions: Seq[TriggerDecision] = {
    val it = decisionLog.iterator()
    val b = Seq.newBuilder[TriggerDecision]
    while (it.hasNext) b += it.next()
    b.result()
  }

  /** Core decision step, also callable directly with synthetic signals. */
  def observe(batchId: Long, batchDurationMs: Long, inputRps: Double, procRps: Double): Unit = {
    val cur = interval.get()
    val util = 100.0 * batchDurationMs / math.max(1L, cur)
    val overloaded = util >= 100.0
    val next = AdaptivePolicy.next(cur, util, overloaded, ref)
    val after = next.getOrElse(cur)
    next.foreach { n =>
      if (interval.compareAndSet(cur, n)) onNewInterval(n)
    }
    decisionLog.add(TriggerDecision(batchId, util, inputRps, procRps, batchDurationMs, cur, after,
      System.currentTimeMillis()))
  }

  override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
  override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
  override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
    val p = e.progress
    if (p.name == queryName) {
      if (skip.getAndUpdate(x => math.max(0, x - 1)) > 0) return
      val dur = Option(p.durationMs.get("triggerExecution")).map(_.longValue()).getOrElse(0L)
      observe(p.batchId, dur, p.inputRowsPerSecond, p.processedRowsPerSecond)
    }
  }
}
