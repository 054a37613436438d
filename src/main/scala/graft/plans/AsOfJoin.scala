package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, Cast, Expression, GenericInternalRow, JoinedRow,
  RowOrdering, SortOrder, UnsafeProjection, UnsafeRow
}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.SQLMetrics
import org.apache.spark.sql.graft.PlanBridge
import org.apache.spark.sql.types.{LongType, TimestampType}

/** As-of join — the canonical whole-operator semantic Spark's built-in
  * operator set cannot express as a single pass (pandas `merge_asof`,
  * kdb `aj`, QuestDB/DuckDB `ASOF JOIN`): for every left row, attach
  * the single right row with the greatest `rightOn <= leftOn`
  * (backward, the default) or the smallest `rightOn >= leftOn`
  * (forward) within the same key group, optionally within a tolerance
  * window.
  *
  * Why a custom plan instead of composition: the composed form (union
  * both streams, running `max(when(is_right, on))` window, re-filter —
  * the q57 construction) shuffles and sorts the CONCATENATION of both
  * inputs and carries every left column through the window operator.
  * This operator plans like a sort-merge join instead: each side
  * exchanges on its own keys and sorts by (keys, on) — at 100 TB both
  * are one shuffle each, exactly what the window composition pays —
  * but the merge itself is a single forward pass holding ONE buffered
  * right row (the current as-of candidate) per partition: O(1) state,
  * no window buffering, no union blow-up, and the right side's
  * non-key columns never travel through a window frame.
  *
  * Left-outer semantics: every left row is emitted; unmatched rows get
  * nulls for the right side. Key equality is null-safe (as-of aligns
  * per time series, so a null key names the "null series", matching
  * groupBy semantics, not SQL join-key semantics). Rows whose `on`
  * value is null never match (no as-of point). Ties on (key, on) pick
  * the physically last right row in sort order — callers that need
  * full determinism under exact-duplicate right timestamps should
  * project the matched `on` value rather than a right-side id column
  * (q109 does), because rows equal on (key, on) are interchangeable
  * only up to their remaining columns.
  *
  * Registered by [[GraftSparkExtensions]] via `injectPlannerStrategy`;
  * constructed from the DataFrame API with [[AsOfJoin.join]].
  */
final case class AsOfJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftOn: Expression,
    rightOn: Expression,
    toleranceUs: Option[Long],
    forward: Boolean = false,
) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

object AsOfJoin {

  /** DataFrame-level as-of join.
    *
    * @param leftOn / rightOn  long-backed ordering columns (bigint or
    *        timestamp; anything else is cast to bigint). For
    *        timestamps the tolerance unit is microseconds.
    * @param toleranceUs  max allowed gap for a match (leftOn − rightOn
    *        backward, rightOn − leftOn forward); matches further away
    *        come back as null (pandas `merge_asof(tolerance=...)`).
    * @param direction  "backward" (default) attaches the LATEST right
    *        row with `rightOn <= leftOn`; "forward" attaches the
    *        EARLIEST right row with `rightOn >= leftOn` (pandas
    *        `merge_asof(direction=...)`; ties on (key, on) pick the
    *        first right row in sort order).
    *
    * Requires the graft extensions to be installed on the session
    * (`spark.sql.extensions=graft.plans.GraftSparkExtensions`,
    * part of graft.util.Tables.sessionConf) — otherwise the planner
    * has no strategy for the node and raises at execution planning.
    */
  def join(
      left: Dataset[_],
      right: Dataset[_],
      leftBy: Seq[String],
      rightBy: Seq[String],
      leftOn: String,
      rightOn: String,
      toleranceUs: Option[Long] = None,
      direction: String = "backward",
  ): DataFrame = {
    require(leftBy.length == rightBy.length, "leftBy/rightBy arity mismatch")
    require(toleranceUs.forall(_ >= 0), "tolerance must be non-negative")
    require(direction == "backward" || direction == "forward",
      s"direction must be backward|forward, got $direction")
    val lPlan = PlanBridge.analyzed(left)
    val rPlan = PlanBridge.analyzed(right)
    val lKeys = leftBy.map(attr(lPlan, _))
    val rKeys = rightBy.map(attr(rPlan, _))
    lKeys.zip(rKeys).foreach { case (l, r) =>
      require(l.dataType == r.dataType,
        s"key type mismatch: ${l.name}:${l.dataType} vs ${r.name}:${r.dataType}")
    }
    val df = PlanBridge.ofRows(
      left.sparkSession,
      AsOfJoin(lPlan, rPlan, lKeys, rKeys,
        asLong(attr(lPlan, leftOn)), asLong(attr(rPlan, rightOn)), toleranceUs,
        forward = direction == "forward"))
    df
  }

  private def attr(plan: LogicalPlan, name: String): Attribute =
    plan.output.find(_.name.equalsIgnoreCase(name)).getOrElse(
      throw new IllegalArgumentException(
        s"column `$name` not in [${plan.output.map(_.name).mkString(", ")}]"))

  private def asLong(e: Expression): Expression = e.dataType match {
    case LongType | TimestampType => e
    case _ => Cast(e, LongType)
  }
}

/** Plans [[AsOfJoin]] as [[AsOfJoinExec]]. The strategy fires only on
  * the custom node, so it composes with (never shadows) Spark's own
  * strategies.
  */
class AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, rk, lo, ro, tol, fwd) =>
      AsOfJoinExec(lk, rk, lo, ro, tol, fwd, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

/** Physical as-of join: sort-merge shape. EnsureRequirements reads the
  * declared requirements exactly as it does for SortMergeJoinExec —
  * both children are co-partitioned on their keys (one Exchange each
  * at most; an already-bucketed child exchanges nothing) and sorted by
  * (keys, on). The merge is then a single forward pass per partition:
  * the right cursor only ever advances, and the only state carried is
  * the latest right row at-or-before the current left row (the as-of
  * candidate), invalidated when the left key changes. No per-key
  * buffering exists anywhere, so a key with a billion right rows costs
  * one UnsafeRow of memory, not a window frame.
  */
final case class AsOfJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftOn: Expression,
    rightOn: Expression,
    toleranceUs: Option[Long],
    forward: Boolean,
    left: SparkPlan,
    right: SparkPlan,
) extends BinaryExecNode {

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"),
    "numMatched" -> SQLMetrics.createMetric(sparkContext, "number of matched left rows"))

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftOn).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightOn).map(SortOrder(_, Ascending)))

  // Rows come out in the left child's (keys, on) order.
  override def outputOrdering: Seq[SortOrder] =
    (leftKeys :+ leftOn).map(SortOrder(_, Ascending))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val numMatched = longMetric("numMatched")
    val lOutput = left.output
    val rOutput = right.output
    val lKeyExprs = leftKeys
    val rKeyExprs = rightKeys
    val lOnExpr = leftOn
    val rOnExpr = rightOn
    val tol = toleranceUs
    val fwd = forward
    val outAttrs = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeyExprs, lOutput)
      val rKeyProj = UnsafeProjection.create(rKeyExprs, rOutput)
      val lOnProj = UnsafeProjection.create(Seq(lOnExpr), lOutput)
      val rOnProj = UnsafeProjection.create(Seq(rOnExpr), rOutput)
      val keyOrdering = RowOrdering.createNaturalAscendingOrdering(lKeyExprs.map(_.dataType))
      val resultProj = UnsafeProjection.create(outAttrs, outAttrs)
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rOutput.length)

      new Iterator[InternalRow] {
        // Right-side cursor: the current lookahead row plus its
        // projected key/on. Valid until the next advance().
        private[this] var rRow: InternalRow = _
        private[this] var rKey: UnsafeRow = _
        private[this] var rOnNull = false
        private[this] var rOnVal = 0L
        private[this] var rAvail = advanceRight()
        // The as-of candidate: a COPY of the latest right row with
        // on <= the current left row's on, for the current left key.
        private[this] var cand: InternalRow = _
        private[this] var candOn = 0L
        // Left key of the previous row, to invalidate the candidate
        // on key change. Copied once per distinct key, not per row.
        private[this] var prevLeftKey: UnsafeRow = _

        private def advanceRight(): Boolean =
          if (rIter.hasNext) {
            rRow = rIter.next()
            rKey = rKeyProj(rRow)
            val onRow = rOnProj(rRow)
            rOnNull = onRow.isNullAt(0)
            rOnVal = if (rOnNull) 0L else onRow.getLong(0)
            true
          } else {
            rRow = null
            false
          }

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val l = lIter.next()
          val lk = lKeyProj(l)
          if (prevLeftKey == null || keyOrdering.compare(lk, prevLeftKey) != 0) {
            cand = null
            prevLeftKey = lk.copy()
          }
          val lOnRow = lOnProj(l)
          val lOnNull = lOnRow.isNullAt(0)
          val lOnVal = if (lOnNull) 0L else lOnRow.getLong(0)
          if (!lOnNull) {
            var done = false
            while (rAvail && !done) {
              val c = keyOrdering.compare(rKey, lk)
              if (c < 0) rAvail = advanceRight()
              else if (c > 0) done = true
              else if (rOnNull) rAvail = advanceRight() // null on: never a match
              else if (fwd) {
                // Forward: park the cursor on the FIRST right row with
                // on >= the left's on. Rows behind it are dead for every
                // later left row too (left is ascending), so consuming
                // them is safe; the qualifying row itself is NOT
                // consumed — it may serve the next left row as well.
                if (rOnVal < lOnVal) rAvail = advanceRight()
                else done = true
              } else if (rOnVal <= lOnVal) {
                cand = rRow.copy() // keep the LATEST qualifying row
                candOn = rOnVal
                rAvail = advanceRight()
              } else done = true
            }
          }
          val matched =
            if (fwd)
              rAvail && !lOnNull && !rOnNull &&
                keyOrdering.compare(rKey, lk) == 0 && rOnVal >= lOnVal &&
                tol.forall(t => rOnVal - lOnVal <= t)
            else
              cand != null && !lOnNull && tol.forall(t => lOnVal - candOn <= t)
          if (matched) numMatched += 1
          numOutputRows += 1
          val r = if (!matched) nullRight else if (fwd) rRow else cand
          resultProj(joined(l, r))
        }
      }
    }
  }
}
