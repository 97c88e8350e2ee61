package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.{LongType, TimestampType}

/** AS-OF JOIN — the whole-operator Catalyst extension (logical node →
  * planner strategy → physical operator), for the one relational shape
  * Spark's DataFrame API lacks outright: for every left row, the SINGLE
  * right row with the same key and the greatest event time ≤ the left
  * row's time (ties broken by the greatest tie-break value), LEFT OUTER
  * (unmatched left rows keep a null right side). The pandas
  * `merge_asof` / DuckDB `ASOF JOIN` semantic, pinned deterministic.
  *
  * Why a full operator and not a composition: the composed form is a
  * range join (`l.key = r.key AND r.ts <= l.ts`) followed by a
  * ranking-window dedup — the range join EXPLODES to one row per
  * (left, earlier-right) pair before the window throws all but one per
  * left row away (quadratic in rows-per-key), exactly the
  * materialize-then-discard work a dedicated operator avoids. This
  * operator is a sort-merge: both sides hash-partition on the key and
  * sort by (key, ts); one forward-only pointer walk per partition emits
  * each left row exactly once. At 100 TB that is the same cost shape as
  * a sort-merge join — two shuffles, two sorts, linear merge — with
  * ZERO pair blow-up.
  *
  * Types are pinned to the engine's event tables: key and tie-break are
  * LONG, time is TIMESTAMP or LONG (both long-backed at runtime).
  */
case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Expression,
    leftTs: Expression,
    rightKey: Expression,
    rightTs: Expression,
    rightTie: Expression)
    extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override lazy val resolved: Boolean = {
    def longBacked(e: Expression): Boolean =
      e.dataType == LongType || e.dataType == TimestampType
    childrenResolved &&
      Seq(leftKey, leftTs, rightKey, rightTs, rightTie).forall(_.resolved) &&
      longBacked(leftKey) && longBacked(rightKey) &&
      longBacked(leftTs) && longBacked(rightTs) && longBacked(rightTie)
  }

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoinPlan]] as [[AsOfJoinExec]]. Registered through
  * GraftExtensions or `spark.experimental.extraStrategies` (the
  * [[AsOf]] API does the latter automatically).
  */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case j: AsOfJoinPlan =>
      AsOfJoinExec(planLater(j.left), planLater(j.right),
        j.leftKey, j.leftTs, j.rightKey, j.rightTs, j.rightTie) :: Nil
    case _ => Nil
  }
}

/** Physical as-of join: requires both children clustered on the key and
  * sorted by (key, ts [, tie]) — EnsureRequirements inserts the
  * exchanges/sorts — then merges each co-partition with one forward
  * pass. The right pointer never rewinds: left rows arrive in (key, ts)
  * order, so the most-recent-match candidate only ever advances.
  */
case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKey: Expression,
    leftTs: Expression,
    rightKey: Expression,
    rightTs: Expression,
    rightTie: Expression)
    extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKey :: Nil) :: ClusteredDistribution(rightKey :: Nil) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, org.apache.spark.sql.catalyst.expressions.Ascending),
      SortOrder(leftTs, org.apache.spark.sql.catalyst.expressions.Ascending)),
    Seq(SortOrder(rightKey, org.apache.spark.sql.catalyst.expressions.Ascending),
      SortOrder(rightTs, org.apache.spark.sql.catalyst.expressions.Ascending),
      SortOrder(rightTie, org.apache.spark.sql.catalyst.expressions.Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def doExecute(): RDD[InternalRow] = {
    val lk = BindReferences.bindReference(leftKey, left.output)
    val lt = BindReferences.bindReference(leftTs, left.output)
    val rk = BindReferences.bindReference(rightKey, right.output)
    val rt = BindReferences.bindReference(rightTs, right.output)
    val rightWidth = right.output.size
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      new Iterator[InternalRow] {
        private val joiner = new JoinedRow
        private val nullRight = new GenericInternalRow(rightWidth)
        private var rRow: InternalRow = _
        private var rKeyV = 0L
        private var rTsV = 0L
        private var rValid = false
        private var matched: InternalRow = _ // copied: unsafe iterators reuse buffers
        private var matchedKey = 0L
        private var hasMatch = false

        // Null semantics (SQL-consistent): a null key or timestamp can
        // never satisfy the equality/ordering predicate, so null-valued
        // right rows are skipped outright and null-valued left rows emit
        // the null right side. Without the explicit checks, Scala's
        // unboxing of a null eval result silently yields 0L — a WRONG
        // match on key 0 — rather than failing. Nulls sort first under
        // ascending order, so skipping them preserves the forward-only
        // pointer walk.
        private def fetchRight(): Unit = {
          rValid = false
          while (!rValid && rIter.hasNext) {
            rRow = rIter.next()
            val k = rk.eval(rRow)
            val t = rt.eval(rRow)
            if (k != null && t != null) {
              rKeyV = k.asInstanceOf[Long]
              rTsV = t.asInstanceOf[Long]
              rValid = true
            }
          }
        }
        fetchRight()

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val l = lIter.next()
          val lKeyO = lk.eval(l)
          val lTsO = lt.eval(l)
          if (lKeyO == null || lTsO == null) return joiner(l, nullRight)
          val lKeyV = lKeyO.asInstanceOf[Long]
          val lTsV = lTsO.asInstanceOf[Long]
          // Advance the right side through every row at or before
          // (lKeyV, lTsV); the LAST same-key row seen is the match —
          // right ordering (key, ts, tie) makes that the greatest
          // (ts, tie) pair ≤ the left timestamp.
          while (rValid && (rKeyV < lKeyV || (rKeyV == lKeyV && rTsV <= lTsV))) {
            if (rKeyV == lKeyV) {
              matched = rRow.copy()
              matchedKey = lKeyV
              hasMatch = true
            }
            fetchRight()
          }
          val m = if (hasMatch && matchedKey == lKeyV) matched else nullRight
          joiner(l, m)
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** DataFrame-level API: `AsOf.join(purchases, clicks, "p_user", "p_ts",
  * "c_user", "c_ts", "click_id")`. Installs [[AsOfJoinStrategy]] into
  * the session's experimental strategies on first use (idempotent), so
  * it works on any session, extensions-built or not.
  */
object AsOf {
  def join(left: DataFrame, right: DataFrame,
      leftKey: String, leftTs: String,
      rightKey: String, rightTs: String, rightTie: String): DataFrame = {
    val spark = left.sparkSession
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    }
    val lp = left.queryExecution.analyzed
    val rp = right.queryExecution.analyzed
    def attr(p: LogicalPlan, name: String): Attribute =
      p.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"as-of join: no column '$name' in [${p.output.map(_.name).mkString(", ")}]"))
    org.apache.spark.sql.GraftSqlBridge.ofRows(spark,
      AsOfJoinPlan(lp, rp, attr(lp, leftKey), attr(lp, leftTs),
        attr(rp, rightKey), attr(rp, rightTs), attr(rp, rightTie)))
  }

  /** FORWARD as-of: each left row matched to the EARLIEST same-key right
    * row with rightTs ≥ leftTs (ties: smallest rightTie) — "time to next
    * event". Implemented by time reversal over the same exec: the
    * backward join's greatest-(ts, tie)-≤ semantics on NEGATED
    * microsecond timestamps (and negated tie) is exactly
    * smallest-(ts, tie)-≥ on the originals, so one physical operator
    * serves both directions. `leftTs`/`rightTs` must be TIMESTAMP
    * columns; `rightTie` numeric.
    */
  def joinForward(left: DataFrame, right: DataFrame,
      leftKey: String, leftTs: String,
      rightKey: String, rightTs: String, rightTie: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, unix_micros}
    val l2 = left.withColumn("__fwd_lts", -unix_micros(col(leftTs)))
    val r2 = right.withColumn("__fwd_rts", -unix_micros(col(rightTs)))
      .withColumn("__fwd_tie", -col(rightTie))
    join(l2, r2, leftKey, "__fwd_lts", rightKey, "__fwd_rts", "__fwd_tie")
      .drop("__fwd_lts", "__fwd_rts", "__fwd_tie")
  }
}
