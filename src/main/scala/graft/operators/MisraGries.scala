package graft.operators

import scala.collection.mutable

/** Misra–Gries frequent-items sketch (Misra & Gries 1982; the
  * "decrement-all" k-counter generalization of Boyer–Moore majority) —
  * the bounded-memory candidate generator for exact distributed heavy
  * hitters (see `token_heavy_hitters` in
  * [[graft.queries.ScaleCatalog]]).
  *
  * Guarantee used by the catalog entry: after one pass over a stream of
  * `n` items with `k = capacity` counters, every item with true count
  * `c(x) > n / (k + 1)` still owns a counter (its counter value is at
  * least `c(x) − n / (k + 1) > 0`). Applied per partition plus an
  * averaging argument, this makes the UNION of per-partition survivors a
  * superset of every item with GLOBAL count above `N / (k + 1)`: if
  * `c(x) > N / (k + 1)` then some partition has
  * `c_p(x) > n_p / (k + 1)`, else summing the per-partition bounds
  * contradicts the global count. A second exact counting pass restricted
  * to the (small) candidate union then yields the EXACT result — the
  * final output is independent of partitioning even though the candidate
  * set is not.
  *
  * Memory is `O(capacity)` regardless of stream length or vocabulary —
  * the property that lets the first pass run map-side over 100 TB
  * without a shuffle. The two-pass shape mirrors the reference's bounded
  * pre-aggregation contract (flink-core/src/main/java/org/apache/flink/
  * api/common/functions/PreAggregateFunction.java:17-37: a bounded
  * per-subtask bundle map flushed downstream for the exact global
  * combine) — here the bundle is lossy-but-guaranteed and the exact
  * combine is the second counting pass.
  */
object MisraGries {

  /** Fold `items` into an EXISTING counter map under the capacity bound —
    * the state-carrying form: folding a stream in chunks with the map
    * carried between calls is identical to one pass over the
    * concatenation, which is what lets a streaming query keep the sketch
    * in keyed state (StreamingQueries.heavyHitterSketch) and a batch
    * mapPartitions run it per split ([[survivors]]).
    */
  def foldInto(
      counters: mutable.HashMap[String, Long],
      items: Iterator[String],
      capacity: Int): mutable.HashMap[String, Long] = {
    require(capacity > 0, "capacity must be positive")
    while (items.hasNext) {
      val x = items.next()
      counters.get(x) match {
        case Some(c) => counters.update(x, c + 1)
        case None if counters.size < capacity => counters.update(x, 1L)
        case None =>
          // Decrement-all step: the arriving item and one unit of every
          // counter annihilate (k+1 distinct items each lose one unit).
          val dead = mutable.ArrayBuffer.empty[String]
          counters.foreachEntry { (key, c) =>
            if (c == 1L) dead += key else counters.update(key, c - 1)
          }
          dead.foreach(counters.remove)
      }
    }
    counters
  }

  /** One pass; returns the surviving candidate items (≤ capacity). */
  def survivors(items: Iterator[String], capacity: Int): Iterator[String] = {
    // Materialize: the map must not escape lazily past the mapPartitions
    // call that owns it.
    foldInto(mutable.HashMap.empty[String, Long], items, capacity)
      .keys.toVector.iterator
  }
}
