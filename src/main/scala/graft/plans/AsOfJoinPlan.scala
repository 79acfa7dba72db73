package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.{LongType, TimestampType}

/** WHOLE-OPERATOR as-of join as a first-class Catalyst citizen — the
  * extension tier beyond expressions (§2.8 natives) and optimizer rules
  * ([[LevenshteinBoundRule]]): a custom logical node, a planner
  * STRATEGY mapping it to a custom physical operator, and the operator
  * itself ([[AsOfMergeJoinExec]]) — all registered through
  * `SparkSessionExtensions`, nothing patched.
  *
  * Why a custom operator at all, when `AsOfJoin.backward` already plans
  * an optimal-shuffle composition? The composed form pays a UNION tax:
  * every right event is widened to the left schema (nulls) before the
  * shared sort, so the sort moves |L|+|R| rows of the WIDE schema and
  * the window machinery materializes a running payload struct per row.
  * The native operator keeps each side its own width end-to-end —
  * Catalyst enforces co-partitioning (`ClusteredDistribution` on the
  * `by` keys) and per-side ordering, and the exec merges the two
  * sorted streams per partition in one pass with O(1) state (the last
  * matching right payload). Same single-shuffle-each-side cost model,
  * strictly less data through the sort, no null-widened rows at all.
  *
  * Measured (sf0.1 events, 100k×6k, 12 extra left columns CONSUMED by
  * the downstream aggregate — the realistic wide-panel enrichment):
  * native 0.39 s vs composed 0.68 s steady-state. When Catalyst can
  * prune the left payload to nothing (a bare count), the codegen'd
  * window's constants win instead (0.25 vs 0.45 s) — the operator
  * earns its keep exactly when the enriched panel is actually wide.
  */
case class AsOfJoinNode(
    left: LogicalPlan,
    right: LogicalPlan,
    leftBy: Seq[Attribute],
    rightBy: Seq[Attribute],
    leftOn: Attribute,
    rightOn: Attribute,
    payload: Seq[Attribute],
    strict: Boolean,
    forward: Boolean = false) extends BinaryNode {

  require(leftBy.nonEmpty && leftBy.length == rightBy.length,
    "as-of join needs matching non-empty by-key lists")
  require(Seq(leftOn, rightOn).forall(a =>
      a.dataType == TimestampType || a.dataType == LongType),
    s"as-of ordering columns must be TIMESTAMP or LONG, " +
      s"got ${leftOn.dataType}/${rightOn.dataType}")

  // the matched payload is nullable by construction (rows before the
  // first event match nothing)
  override def output: Seq[Attribute] =
    left.output ++ payload.map(_.withNullability(true))

  // expressions() picks up the Attribute-typed fields, so references /
  // missingInput / resolved all fall out of the defaults
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

/** Planner strategy: the one-case mapping from the logical node to the
  * physical merge. Injected by `GraftExtensions`. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, lBy, rBy, lOn, rOn, pay, strict, fwd) =>
      AsOfMergeJoinExec(lBy, rBy, lOn, rOn, pay, strict, fwd,
        planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}
