package graft.combine

import org.apache.spark.sql.{Dataset, Encoder}
import org.apache.spark.sql.expressions.Aggregator

/** Bridges a [[PreAggregateFunction]] onto Spark's typed `Aggregator` so
  * Catalyst plans the two-phase (partial → shuffle → final) aggregation
  * that the reference's `combine`/`adCombine` operator hand-builds
  * (DataStream.java:1403-1436, PreAggregateProcTimeStreamAbstractOperator
  * .java:46-211).
  *
  * `zero`/`reduce`/`merge`/`finish` ≙ empty bundle / `addInput` / the
  * downstream rolling reduce / bundle flush. The buffer is `Option[V]` so
  * the first fold sees `None`, exactly like the reference's nullable value.
  */
final class PreAggAggregator[IN, V](fn: PreAggregateFunction[_, V, IN, _])(
    implicit bufEnc: Encoder[Option[V]], outEnc: Encoder[V])
    extends Aggregator[IN, Option[V], V] {
  override def zero: Option[V] = None
  override def reduce(b: Option[V], in: IN): Option[V] = Some(fn.addInput(b, in))
  override def merge(a: Option[V], b: Option[V]): Option[V] = (a, b) match {
    case (Some(x), Some(y)) => Some(fn.merge(x, y))
    case (Some(_), None) => a
    case (None, _) => b
  }
  override def finish(b: Option[V]): V =
    b.getOrElse(throw new IllegalStateException("finish on empty bundle"))
  override def bufferEncoder: Encoder[Option[V]] = bufEnc
  override def outputEncoder: Encoder[V] = outEnc
}

/** The `combine` surface (reference API: `DataStream.combine(fn, interval)`
  * / `adCombine(fn)`, DataStream.java:1403-1436).
  *
  * In Spark the flush interval is not a property of the batch operator —
  * partial aggregation flushes per task (batch) or per micro-batch
  * (streaming, where trigger interval ≙ bundle interval and
  * [[graft.streaming.AdaptiveTriggerController]] plays the AdCom
  * controller). `combine` therefore takes no interval: callers choose the
  * cadence at the sink (batch action or streaming trigger).
  */
object Combine {

  /** combine → keyBy → rolling-reduce → collect, as one declarative typed
    * aggregation. Works identically on batch and streaming Datasets (for
    * streaming, write with `outputMode("update")` — the retract-stream
    * analogue, SURVEY §2.6).
    */
  def combine[IN, K, V, OUT](ds: Dataset[IN], fn: PreAggregateFunction[K, V, IN, OUT])(
      implicit kEnc: Encoder[K],
      bufEnc: Encoder[Option[V]],
      vEnc: Encoder[V],
      kvEnc: Encoder[(K, V)],
      outEnc: Encoder[OUT]): Dataset[OUT] = {
    val agg = new PreAggAggregator[IN, V](fn)
    ds.groupByKey(fn.key(_))
      .agg(agg.toColumn)
      .map { case (k, v) => fn.collect(k, v) }
  }
}
