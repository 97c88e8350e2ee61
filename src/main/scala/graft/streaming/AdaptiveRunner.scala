package graft.streaming

import java.util.concurrent.ConcurrentLinkedQueue
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery}

/** Closes the adCombine loop: applies [[AdaptiveTriggerController]]
  * decisions to the RUNNING pipeline, the Spark analogue of the
  * reference operator re-registering its processing-time timer with the
  * new interval on every flush
  * (PreAggregateProcTimeStreamAbstractOperator.java:141-142).
  *
  * Spark cannot mutate a running query's trigger, so the runner performs
  * a graceful stop + restart with the new `Trigger.ProcessingTime`,
  * against the SAME checkpoint: source offsets and keyed state resume
  * where they left off, only the flush cadence changes. The observable
  * contract is the reference's — batch cadence walks the banded policy
  * (±100/±200 ms steps, 50 ms floor) to keep utilization in band while
  * the pipeline keeps processing.
  *
  * `buildWriter` must configure everything EXCEPT the trigger decision
  * input — query name (matching `queryName`), output mode, sink, and a
  * stable `checkpointLocation` — and arm the trigger from the interval it
  * is passed.
  */
final class AdaptiveRunner(
    spark: SparkSession,
    queryName: String,
    buildWriter: Long => DataStreamWriter[Row],
    initialIntervalMs: Long = 500L,
    ref: BandReference = BandReference(),
    pollMs: Long = 25L) {

  /** Interval requested by the controller but not yet armed (-1 = none).
    * Coalescing is deliberate: if the controller steps twice between
    * polls, only the latest interval is armed — same as the reference
    * timer, which only ever has one pending registration.
    */
  private val requested = new AtomicLong(-1L)

  val controller = new AdaptiveTriggerController(
    queryName, initialIntervalMs, ref, n => requested.set(n))

  @volatile private var current: StreamingQuery = _
  @volatile private var armedMs: Long = initialIntervalMs
  @volatile private var alive = false
  private val rearmLog = new ConcurrentLinkedQueue[(Long, Long)]()
  private var pump: Thread = _

  /** Batches to ignore after each (re)start — catch-up work, not signal. */
  private val SettleBatches = 2

  /** The interval the running query's trigger is actually armed with. */
  def armedIntervalMs: Long = armedMs

  /** Every interval applied to the running query, in order. */
  def rearms: Seq[Long] = rearmEvents.map(_._1)

  /** (intervalMs, wallMs) for every applied re-arm, in order. */
  def rearmEvents: Seq[(Long, Long)] = {
    val it = rearmLog.iterator()
    val b = Seq.newBuilder[(Long, Long)]
    while (it.hasNext) b += it.next()
    b.result()
  }

  def query: StreamingQuery = current

  def start(): this.type = {
    spark.streams.addListener(controller)
    controller.skipNext(SettleBatches) // cold-start batches are not signal
    current = buildWriter(initialIntervalMs).start()
    alive = true
    pump = new Thread(() => {
      while (alive) {
        applyPending()
        Thread.sleep(pollMs)
      }
    }, s"adaptive-runner-$queryName")
    pump.setDaemon(true)
    pump.start()
    this
  }

  private def applyPending(): Unit = {
    val n = requested.getAndSet(-1L)
    if (n > 0 && n != armedMs && alive) {
      current.stop()
      current.awaitTermination()
      // The restart's catch-up batch (backlog accumulated while stopped,
      // plus query re-init cost) would read as overload and drive a
      // restart storm; it is restart cost, not utilization signal.
      controller.skipNext(SettleBatches)
      current = buildWriter(n).start()
      armedMs = n
      rearmLog.add((n, System.currentTimeMillis()))
    }
  }

  def stop(): Unit = {
    alive = false
    if (pump != null) pump.join(5000)
    if (current != null) current.stop()
    spark.streams.removeListener(controller)
  }
}
