package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Whole-operator Catalyst integration for the backward as-of join
  * (build-contract option (c)): a logical node, a planner strategy, and a
  * physical operator that merges the two key-sorted sides in one pass per
  * partition.
  *
  * Why a native operator when [[graft.operators.AsOfJoin.backward]]
  * already composes it from union + window: the composed plan wraps every
  * left row's payload in a struct, unions both sides through one exchange,
  * and sorts left+right TOGETHER; this operator shuffles each side by its
  * own key, sorts them independently (both exchange + sort are inserted by
  * `EnsureRequirements` from the declared requirements — nothing is
  * hand-scheduled), and streams the merge with O(1) state per key. Same
  * single-shuffle scale shape, less data movement per row, and a worked
  * example of extending the planner. Equivalence with the composed form is
  * pinned in AsOfJoinSpec.
  *
  * Semantics: for each left row, the latest right row with key equal and
  * `rightTime <= leftTime`; ties on (key, time) resolve to the largest
  * payload (the declared right-side ordering), matching the composed
  * form. Rows with null times never participate: null-time right rows
  * never match and null-time left rows match nothing — identical to the
  * composed form, which enforces the same rule explicitly. Null KEYS
  * follow SQL join semantics (null = null is never true): a right row
  * with any null key never matches, and a left row with any null key
  * gets the unmatched null payload — enforced in the merge itself, not
  * just in the DataFrame wrapper, so direct node users get it too.
  */
case class AsOfJoinNode(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    rightPayload: Seq[Attribute]) extends BinaryNode {
  require(leftKeys.length == rightKeys.length &&
    leftKeys.zip(rightKeys).forall { case (a, b) => a.dataType == b.dataType },
    "as-of join key lists must align in length and type")
  require(leftTime.dataType == rightTime.dataType,
    s"as-of time columns must share a type, got ${leftTime.dataType} vs ${rightTime.dataType}")
  // The physical operator sorts the right child by the payload columns to
  // make "latest" total on (key, time) ties; an unorderable payload type
  // (e.g. map) would only fail deep inside the inserted SortExec — fail
  // here instead, at construction, with a readable message.
  require(rightPayload.forall(a => RowOrdering.isOrderable(a.dataType)),
    s"as-of right payload columns must be orderable (they break ties), got " +
      rightPayload.map(a => s"${a.name}: ${a.dataType.simpleString}").mkString(", "))

  override def output: Seq[Attribute] =
    left.output ++ rightPayload.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoinNode]] to [[AsOfJoinExec]]; injected via
  * `GraftExtensions` (config time) or `GraftBridge.addStrategy` (runtime).
  */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case n: AsOfJoinNode =>
      AsOfJoinExec(n.leftKeys, n.rightKeys, n.leftTime, n.rightTime,
        n.rightPayload, planLater(n.left), planLater(n.right)) :: Nil
    case _ => Nil
  }
}

/** Physical backward as-of join: requires both children clustered on the
  * join key and sorted by (key, time[, payload]); EnsureRequirements
  * inserts the exchanges/sorts. Each partition is then a single forward
  * merge — the right cursor only ever advances, and the held match is one
  * row, so memory is O(1) regardless of group size (no per-key
  * buffering, unlike a window over the union).
  */
case class AsOfJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    rightPayload: Seq[Attribute],
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ rightPayload.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  // Right side additionally orders by payload so "latest" is total on
  // (key, time) ties — the merge keeps the last row of a tie group.
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
    ((rightKeys :+ rightTime) ++ rightPayload).map(SortOrder(_, Ascending)))

  override def outputOrdering: Seq[SortOrder] =
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending))

  override def outputPartitioning = left.outputPartitioning

  override lazy val metrics: Map[String, org.apache.spark.sql.execution.metric.SQLMetric] =
    Map(
      "numOutputRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
        .createMetric(sparkContext, "number of output rows"),
      "numMatchedRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
        .createMetric(sparkContext, "number of matched left rows"))

  protected override def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val numMatchedRows = longMetric("numMatchedRows")
    val lOut = left.output
    val rOut = right.output
    val outExprs = output
    val lKeyExprs = leftKeys
    val rKeyExprs = rightKeys
    val ltExpr = leftTime
    val rtExpr = rightTime
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(lKeyExprs.map(_.dataType))
      val timeOrd = RowOrdering.createNaturalAscendingOrdering(Seq(ltExpr.dataType))
      val lKeyProj = UnsafeProjection.create(lKeyExprs, lOut)
      val rKeyProj = UnsafeProjection.create(rKeyExprs, rOut)
      val ltProj = UnsafeProjection.create(Seq(ltExpr), lOut)
      val rtProj = UnsafeProjection.create(Seq(rtExpr), rOut)
      // Bind against a nullable view of the right schema: unmatched left
      // rows pair with an all-null right row, so the projection must
      // null-check every right field even if the child declared it
      // non-nullable (BindReferences takes nullability from the INPUT
      // attribute, not from our nullable output attribute).
      val resultProj = UnsafeProjection.create(outExprs,
        lOut ++ rOut.map(_.withNullability(true)))
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rOut.length)
      val rBuf = rIter.buffered
      var held: InternalRow = null
      var heldKey: InternalRow = null
      val nKeys = lKeyExprs.length
      // SQL join semantics for null keys: null = anything (incl. null) is
      // never true, while the natural ordering used by the merge treats
      // null == null as equal — so null keys must be screened explicitly.
      def anyNullKey(key: InternalRow): Boolean = {
        var i = 0
        while (i < nKeys) { if (key.isNullAt(i)) return true; i += 1 }
        false
      }
      lIter.map { l =>
        val lk = lKeyProj(l)
        val lt = ltProj(l)
        // Null-key left rows match nothing; they also sort first (nulls
        // first), so skipping the scan leaves the right cursor intact.
        var scan = !anyNullKey(lk)
        while (scan && rBuf.hasNext) {
          val rk = rKeyProj(rBuf.head)
          if (anyNullKey(rk)) {
            rBuf.next() // null-key right rows never match anyone: discard
          } else {
            val cmp = keyOrd.compare(rk, lk)
            if (cmp < 0) {
              rBuf.next() // right key behind every remaining left key: discard
            } else if (cmp == 0) {
              val rt = rtProj(rBuf.head)
              if (rt.isNullAt(0)) {
                rBuf.next() // null right time never matches
              } else if (!lt.isNullAt(0) && timeOrd.compare(rt, lt) <= 0) {
                held = rBuf.next().copy() // candidate; later ones overwrite
                heldKey = lk.copy()
              } else {
                scan = false // right ahead in time; stop for this left row
              }
            } else {
              scan = false // right ahead in key space
            }
          }
        }
        val matched = held != null && heldKey != null &&
          !anyNullKey(lk) && keyOrd.compare(heldKey, lk) == 0
        numOutputRows += 1
        if (matched) numMatchedRows += 1
        resultProj(joined(l, if (matched) held else nullRight))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}
