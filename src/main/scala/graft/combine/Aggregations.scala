package graft.combine

/** The reference engine's concrete PreAggregateFunctions (the flink-adcom
  * udfs `...PreAggregateFunction.java` family), re-expressed against the shared
  * [[PreAggregateFunction]] contract. Inputs are the tokenizer-map tuples
  * (SURVEY §2.3); outputs pair the key with the aggregate, like the
  * reference's collect over the bundle map.
  */
object Aggregations {

  /** Per-key sum of counts (TaxiRideCountPreAggregateFunction.java:14-27:
    * null → f1, else v + f1; also WordCountPreAggregate.java:238-262).
    */
  final class CountPreAgg[K] extends PreAggregateFunction[K, Long, (K, Long), (K, Long)] {
    def key(in: (K, Long)): K = in._1
    def addInput(v: Option[Long], in: (K, Long)): Long = v.getOrElse(0L) + in._2
    def merge(a: Long, b: Long): Long = a + b
    def collect(k: K, v: Long): (K, Long) = (k, v)
  }

  /** Per-key max (TaxiRideMaxPassengerPreAggregateFunction.java:14-27 +
    * the downstream positional rolling `max(1)`).
    */
  final class MaxPreAgg[K] extends PreAggregateFunction[K, Long, (K, Long), (K, Long)] {
    def key(in: (K, Long)): K = in._1
    def addInput(v: Option[Long], in: (K, Long)): Long = math.max(v.getOrElse(Long.MinValue), in._2)
    def merge(a: Long, b: Long): Long = math.max(a, b)
    def collect(k: K, v: Long): (K, Long) = (k, v)
  }

  /** Per-key (sum, count) → true average
    * (TaxiRidePassengerSumAndCountPreAggregateFunction.java:18-40). The
    * reference reducer's count-reset bug (TaxiRideAveragePassengersReducer,
    * SURVEY §2.5) is deliberately not reproduced: merge keeps counts exact,
    * so the result is the true mean under any flush cadence.
    */
  final class AvgPreAgg[K] extends PreAggregateFunction[K, (Double, Long), (K, Double), (K, Double)] {
    def key(in: (K, Double)): K = in._1
    def addInput(v: Option[(Double, Long)], in: (K, Double)): (Double, Long) = {
      val (s, c) = v.getOrElse((0.0, 0L)); (s + in._2, c + 1)
    }
    def merge(a: (Double, Long), b: (Double, Long)): (Double, Long) = (a._1 + b._1, a._2 + b._2)
    def collect(k: K, v: (Double, Long)): (K, Double) = (k, v._1 / v._2)
  }

  /** Per-key 3-metric average (TaxiRidePassengerDistanceTimeSumAndCount
    * PreAggregateFunction.java:19-47 + TaxiRideAveragePassengersDistanceTime
    * Reducer: (Σf1/Σf4, Σf2/Σf4, Σf3/Σf4)).
    */
  final class Avg3PreAgg[K]
      extends PreAggregateFunction[K, (Double, Double, Double, Long), (K, Double, Double, Double), (K, Double, Double, Double)] {
    def key(in: (K, Double, Double, Double)): K = in._1
    def addInput(v: Option[(Double, Double, Double, Long)], in: (K, Double, Double, Double)): (Double, Double, Double, Long) = {
      val (a, b, c, n) = v.getOrElse((0.0, 0.0, 0.0, 0L))
      (a + in._2, b + in._3, c + in._4, n + 1)
    }
    def merge(a: (Double, Double, Double, Long), b: (Double, Double, Double, Long)): (Double, Double, Double, Long) =
      (a._1 + b._1, a._2 + b._2, a._3 + b._3, a._4 + b._4)
    def collect(k: K, v: (Double, Double, Double, Long)): (K, Double, Double, Double) =
      (k, v._1 / v._4, v._2 / v._4, v._3 / v._4)
  }

  /** Bounded per-key top-N accumulator — the reference's own scale-safe
    * design (TopNPreAggregate.java:214-253: a `Double[topN]` insert-if-
    * greater array, merged pairwise in the reducer :255-311), generalized
    * to (value, id) pairs with a deterministic total order: value desc,
    * id asc. The bundle never exceeds N entries, so the shuffle carries at
    * most N values per key per map partition — this is what replaces the
    * full-sort window plan flagged `weak` in round 1.
    */
  final class TopNPreAgg[K](n: Int)
      extends PreAggregateFunction[K, List[(Double, Long)], (K, Double, Long), (K, List[(Double, Long)])] {
    def key(in: (K, Double, Long)): K = in._1
    private def beats(a: (Double, Long), b: (Double, Long)): Boolean =
      a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)
    /** Insert into the sorted bounded list (desc by value, asc by id). */
    private def insert(buf: List[(Double, Long)], e: (Double, Long)): List[(Double, Long)] = {
      val (better, rest) = buf.span(beats(_, e))
      (better ::: e :: rest).take(n)
    }
    def addInput(v: Option[List[(Double, Long)]], in: (K, Double, Long)): List[(Double, Long)] =
      insert(v.getOrElse(Nil), (in._2, in._3))
    def merge(a: List[(Double, Long)], b: List[(Double, Long)]): List[(Double, Long)] =
      b.foldLeft(a)(insert)
    def collect(k: K, v: List[(Double, Long)]): (K, List[(Double, Long)]) = (k, v)
  }
}
