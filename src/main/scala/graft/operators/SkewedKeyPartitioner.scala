package graft.operators

import scala.reflect.ClassTag

import org.apache.spark.Partitioner
import org.apache.spark.rdd.RDD

/** Skew simulator: routes the hot key to partition 0, everything else
  * across the remaining partitions — the reference's
  * `SimulateSkewPartition` (WordCountPreAggregate.java:285-298: GUTENBERG
  * → 0, others round-robin). DOCUMENTED DIVERGENCE: the reference
  * round-robins non-hot keys via mutable per-task state; Spark partitioners
  * must be deterministic per key, so non-hot keys hash instead — same
  * skew shape, stable placement.
  *
  * This is the harness that demonstrates what the adaptive combiner earns:
  * partition 0 receives `skewFraction` of all records while partial
  * aggregation collapses them to one bundle entry per key before the
  * shuffle.
  */
final class SkewedKeyPartitioner(override val numPartitions: Int, hotKey: String)
    extends Partitioner {
  require(numPartitions >= 2, "need >= 2 partitions to simulate skew")
  override def getPartition(key: Any): Int = {
    val k = String.valueOf(key)
    if (hotKey.equalsIgnoreCase(k)) 0
    else 1 + math.floorMod(k.hashCode, numPartitions - 1)
  }
}

object SkewedKeyPartitioner {
  /** partitionCustom analogue: skew-partition a keyed RDD. */
  def partition[V: ClassTag](rdd: RDD[(String, V)], numPartitions: Int, hotKey: String): RDD[(String, V)] =
    rdd.partitionBy(new SkewedKeyPartitioner(numPartitions, hotKey))
}
