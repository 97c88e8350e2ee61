package graft.combine

/** The AdCom user contract, mirrored from the reference engine's
  * `PreAggregateFunction` (flink-core/src/main/java/org/apache/flink/api/
  * common/functions/PreAggregateFunction.java:17-37): `addInput` folds one
  * record into the per-key bundle value; `collect` emits the bundle
  * downstream at flush time.
  *
  * Spark needs one extra algebraic ingredient the reference gets implicitly
  * from its downstream rolling reducer: `merge`, combining two bundle
  * values. With it, Catalyst plans the exact dataflow the reference
  * hand-builds (SURVEY §2.4): the map-side partial aggregate IS the
  * pre-shuffle bundle, the exchange IS `keyBy`, the final merge IS the
  * rolling reduce. The algebraic contract the reference relies on —
  * combine(any flush cadence) ∘ final ≡ direct — holds iff `merge` is
  * associative and commutative and `addInput(Some(v), in) ==
  * merge(v, addInput(None, in))`; the ScalaCheck suite asserts it for
  * every implementation here.
  */
trait PreAggregateFunction[K, V, IN, OUT] extends Serializable {

  /** Key extraction — the reference keys combiner output by first tuple
    * field (DataStream.java:1412, KeySelectorUtil.getSelectorForFirstKey).
    */
  def key(input: IN): K

  /** Fold one input into the per-key bundle value; None = first record of
    * the bundle (the reference passes a nullable value,
    * PreAggregateFunction.java:24-28).
    */
  def addInput(value: Option[V], input: IN): V

  /** Merge two bundle values (associative + commutative). */
  def merge(a: V, b: V): V

  /** Emit one output per key at flush time (the reference's `collect` over
    * the whole bundle map, PreAggregateFunction.java:30-36 — here per-entry;
    * the harness supplies the iteration).
    */
  def collect(key: K, value: V): OUT
}
