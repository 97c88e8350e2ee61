package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
import org.apache.spark.sql.catalyst.plans.logical._

/** Static plan linter — the 100 TB discipline as an executable check.
  *
  * Walks a frame's OPTIMIZED logical plan and reports the patterns that
  * do not survive scale no matter how fast they test at toy sizes:
  *
  *  - `cartesian-join`: an inner/cross join with no condition — all-pairs
  *    work, the canonical scale-killer. Two legitimate shapes are
  *    exempt: a one-row scalar-aggregate side (broadcast totals), and a
  *    side the author EXPLICITLY `broadcast()`-hinted (declared intent
  *    that the side is bounded — the IVF centroid pattern). An
  *    unhinted, unconditioned join is always an accident.
  *  - `global-window`: a window with an EMPTY partition spec — every row
  *    through one task; the single-partition stage OOMs first.
  *  - `repartition-1`: an explicit repartition/coalesce to one partition
  *    — same failure mode, spelled differently.
  *  - `global-sort` (advisory): a global Sort NOT feeding a Limit — a
  *    full range shuffle that is usually presentation, not computation.
  *    Legitimate for bounded outputs, so linters treat it as WARN.
  *
  * Used two ways: ad hoc on a frame under development, and catalog-wide
  * in the suite (PlanSpec) where every entry must be free of the hard
  * findings. Complements the physical-plan string audits: logical nodes
  * expose partition specs and join conditions as typed fields, so the
  * rules cannot be fooled by formatting.
  */
object PlanLint {

  final case class Finding(rule: String, severity: String, detail: String)

  /** One-row-aggregate detector: a scalar subplan (global Aggregate with
    * no grouping) is a legitimate cross-join build side. */
  private def isScalarSubplan(p: LogicalPlan): Boolean = p match {
    case a: Aggregate => a.groupingExpressions.isEmpty
    case u: UnaryNode => isScalarSubplan(u.child)
    case _ => false
  }

  def lint(df: DataFrame): Seq[Finding] = {
    val plan = df.queryExecution.optimizedPlan
    val findings = Seq.newBuilder[Finding]
    plan.foreach { node =>
      node match {
        case j: Join if j.condition.isEmpty &&
          (j.joinType == Inner || j.joinType == Cross) =>
          val hinted = j.hint.leftHint.exists(_.strategy.contains(BROADCAST)) ||
            j.hint.rightHint.exists(_.strategy.contains(BROADCAST))
          if (!hinted && !isScalarSubplan(j.left) && !isScalarSubplan(j.right))
            findings += Finding("cartesian-join", "ERROR",
              s"unconditioned ${j.joinType} join, neither side scalar nor broadcast-hinted")
        case w: Window if w.partitionSpec.isEmpty =>
          findings += Finding("global-window", "ERROR",
            s"window with empty partition spec: ${w.windowExpressions.map(_.name).mkString(",")}")
        case r: Repartition if r.numPartitions == 1 =>
          findings += Finding("repartition-1", "ERROR", "repartition/coalesce to 1")
        // repartition(1, col) / repartitionByRange(1, ...) land on a
        // different node but are the same single-partition funnel.
        case r: RepartitionByExpression if r.optNumPartitions.contains(1) =>
          findings += Finding("repartition-1", "ERROR",
            "repartition/repartitionByRange by expression to 1 partition")
        case _ =>
      }
      ()
    }
    // Advisory: global sorts not feeding a limit. Walk with parent
    // context (foreach above has none).
    def walk(p: LogicalPlan, underLimit: Boolean): Unit = {
      p match {
        case s: Sort if s.global && !underLimit =>
          findings += Finding("global-sort", "WARN",
            "global sort not feeding a limit (presentation-only at scale)")
        case _ =>
      }
      val nextUnder = p.isInstanceOf[GlobalLimit] || p.isInstanceOf[LocalLimit] ||
        (underLimit && !p.isInstanceOf[Join])
      p.children.foreach(walk(_, nextUnder))
    }
    walk(plan, underLimit = false)
    findings.result().distinct
  }

  /** Hard findings only — the set a catalog entry must keep empty. */
  def errors(df: DataFrame): Seq[Finding] = lint(df).filter(_.severity == "ERROR")
}
