package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Attribute, Expression, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{
  ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** NATIVE as-of join — the deepest tier of the custom-operator ladder
  * (SURVEY §2.3 preference (c)): a whole-operator LogicalPlan + Strategy +
  * SparkPlan, registered through `SparkSessionExtensions`
  * ([[GraftExtensions.inject]]).
  *
  * The composed form ([[graft.operators.Joins.asOfJoin]], reference
  * semantics at `app/models/queries.py`'s event-lookup pattern) unions both
  * sides and forward-fills the payload through a window — one exchange over
  * left+right combined, but every left row carries null-padded payload slots
  * through the shuffle and the window buffers the union. This operator is
  * the join expressed as what it IS: co-partition both sides on the key
  * (the standard ClusteredDistribution contract, same as
  * SortMergeJoinExec), sort each side by (key, ts), and stream a two-pointer
  * merge per partition — no union row inflation, no window state, right
  * rows consumed EXACTLY once, O(1) state per partition (the last matching
  * payload). At 100 TB: two key-hash exchanges (or zero, when both sides
  * are already bucketed by the key — the distribution contract lets
  * EnsureRequirements elide them), in-partition sorts that spill, and a
  * merge whose memory is one buffered right row regardless of skew.
  *
  * Semantics (identical to the composed form, pinned by AsOfNativeSpec's
  * equivalence sweep): for every left row, the payload of the LAST right
  * row with the same key and `rightTs <= leftTs` (same-instant matches);
  * left rows with no prior right row drop (inner as-of). CONTRACT: the
  * right side must be unique per (key, ts) — pre-dedup with a tiebreak
  * ([[graft.operators.Joins.asOfJoinNative]] does) — because relative order
  * among equal (key, ts) rows after a non-stable sort is not deterministic.
  *
  * Determinism at any parallelism: hash co-partitioning routes equal keys
  * together, the in-partition sort and merge are order-deterministic given
  * the (key, ts)-unique right side, and no floating-point accumulation is
  * involved.
  */
case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTs: Expression,
    rightTs: Expression,
    payload: Seq[Attribute],
    forward: Boolean = false) extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ payload
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoinPlan]] as [[AsOfJoinExec]]; injected via
  * `injectPlannerStrategy` in [[GraftExtensions]].
  */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lts, rts, payload, fwd) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lts, rts, payload, fwd) :: Nil
    case _ => Nil
  }
}

/** Physical streaming-merge as-of join. Children arrive co-partitioned on
  * the join key (ClusteredDistribution with requireAllClusterKeys — exactly
  * the shuffled-join contract) and sorted by (key, ts); the merge keeps ONE
  * buffered right row and the last matching payload per key run.
  */
case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTs: Expression,
    rightTs: Expression,
    payload: Seq[Attribute],
    forward: Boolean = false) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ payload

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys, requireAllClusterKeys = true, None) ::
      ClusteredDistribution(rightKeys, requireAllClusterKeys = true, None) :: Nil

  // FORWARD mode ("next event at-or-after") is the time-mirrored merge:
  // sort ts DESCENDING within the key and flip the consume comparison —
  // the last right row consumed before crossing the left ts is then the
  // EARLIEST at-or-after match, symmetric to backward's latest at-or-before.
  private def tsDirection: org.apache.spark.sql.catalyst.expressions.SortDirection =
    if (forward) org.apache.spark.sql.catalyst.expressions.Descending
    else org.apache.spark.sql.catalyst.expressions.Ascending

  private def ordering(keys: Seq[Expression], ts: Expression): Seq[SortOrder] =
    keys.map(SortOrder(_, org.apache.spark.sql.catalyst.expressions.Ascending)) :+
      SortOrder(ts, tsDirection)

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    ordering(leftKeys, leftTs), ordering(rightKeys, rightTs))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] = ordering(leftKeys, leftTs)

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val keyTypes = leftKeys.map(_.dataType)
    val tsType = leftTs.dataType
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      // per-partition state: projections are NOT shared across partitions
      // (UnsafeProjection instances are stateful row buffers)
      val lKeyProj = UnsafeProjection.create(leftKeys, left.output)
      val rKeyProj = UnsafeProjection.create(rightKeys, right.output)
      val lTsProj = UnsafeProjection.create(Seq(leftTs), left.output)
      val rTsProj = UnsafeProjection.create(Seq(rightTs), right.output)
      val payloadProj = UnsafeProjection.create(payload, right.output)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val tsOrd = RowOrdering.createNaturalAscendingOrdering(Seq(tsType))
      val resultProj = UnsafeProjection.create(output, output)
      val joined = new JoinedRow()

      // one-row right lookahead, copied on fetch (sorted-iterator rows are
      // reused mutable buffers)
      var rKey: UnsafeRow = null
      var rTs: UnsafeRow = null
      var rPayload: UnsafeRow = null
      var rValid = false
      def fetchRight(): Unit =
        if (rIter.hasNext) {
          val row = rIter.next()
          rKey = rKeyProj(row).copy()
          rTs = rTsProj(row).copy()
          rPayload = payloadProj(row).copy()
          rValid = true
        } else rValid = false
      fetchRight()

      // last right row consumed for the current key run
      var lastKey: UnsafeRow = null
      var lastPayload: UnsafeRow = null

      lIter.flatMap { lRow =>
        val lKey = lKeyProj(lRow)
        val lTs = lTsProj(lRow)
        // consume right rows that are (a) before this left key — they can
        // never match a later left row either (left keys ascend) — or
        // (b) same key, ts at-or-before (backward) / at-or-after (forward,
        // where ts is sorted descending): each overwrites the buffered match
        def tsConsumable: Boolean =
          if (forward) tsOrd.compare(rTs, lTs) >= 0 else tsOrd.compare(rTs, lTs) <= 0
        var cmp = if (rValid) keyOrd.compare(rKey, lKey) else 1
        while (rValid && (cmp < 0 || (cmp == 0 && tsConsumable))) {
          if (cmp == 0) { lastKey = rKey; lastPayload = rPayload }
          fetchRight()
          cmp = if (rValid) keyOrd.compare(rKey, lKey) else 1
        }
        if (lastPayload != null && keyOrd.compare(lastKey, lKey) == 0)
          Iterator.single(resultProj(joined(lRow, lastPayload)))
        else Iterator.empty
      }
    }
  }
}
