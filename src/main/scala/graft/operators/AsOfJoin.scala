package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join: for each left row, attach the single latest right
  * row whose time is <= the left row's time, per key — the canonical
  * event-attribution / point-in-time-lookup operator that plain equi-joins
  * cannot express and an interval join over-produces for.
  *
  * Spark has no native as-of join, so this composes existing operators
  * (preference (a) of the build contract): tag both sides, union them, and
  * run one `last(_, ignoreNulls)` carry-forward window partitioned by key
  * and ordered by (time, side, payload). That is exactly ONE hash shuffle
  * on the key and an in-partition sort — no per-key driver loop, no
  * time-range cross product, and skew behaves like any keyed aggregation.
  * At 100 TB both inputs stream through the same exchange; nothing is
  * collected or broadcast.
  *
  * Determinism: within a tie on (key, time), right rows order before left
  * rows (side 0 < 1, giving `<=` semantics), and equal-time right rows
  * order by their payload struct, so "latest" is a total order and the
  * result is partition-count independent.
  */
object AsOfJoin {

  /** @param rightPayload right columns to attach (include the right time
    *                     column itself if the caller wants the matched
    *                     timestamp); emitted as `prefix + name`. Left rows
    *                     with no prior right row keep them null (left-join
    *                     semantics).
    */
  def backward(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTime: String,
      rightTime: String,
      rightPayload: Seq[String],
      prefix: String = "asof_"): DataFrame =
    composed(left, right, keyCols, leftTime, rightTime, rightPayload, prefix,
      backwardDir = true)

  /** Forward as-of join: for each left row, the single EARLIEST right row
    * with right.time >= left.time on the same key — the "next event"
    * lookup (first purchase after signup, next maintenance after failure).
    * Mirror of [[backward]]: same one-shuffle union + window, with a
    * [current, following) carry and `first` instead of `last`; ties on
    * (key, time) resolve to the smallest payload. Null-time right rows
    * sort before every left row and therefore never match.
    */
  def forward(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTime: String,
      rightTime: String,
      rightPayload: Seq[String],
      prefix: String = "asof_"): DataFrame =
    composed(left, right, keyCols, leftTime, rightTime, rightPayload, prefix,
      backwardDir = false)

  /** Shared union+window core. Direction is encoded in three mirrored
    * choices: which side sorts first on a time tie (right-before-left
    * gives `<=`, left-before-right gives `>=`), which way the window
    * frame opens, and whether the carry takes the `last` or `first`
    * non-null right payload (so backward ties prefer the MAX payload,
    * forward ties the MIN — both total orders).
    */
  private def composed(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTime: String,
      rightTime: String,
      rightPayload: Seq[String],
      prefix: String,
      backwardDir: Boolean): DataFrame = {
    val lCols = left.columns.toSeq
    val lStructT = left.select(lCols.map(col): _*).schema
    val rStructT = right.select(rightPayload.map(col): _*).schema
    val (lSide, rSide) = if (backwardDir) (1, 0) else (0, 1)
    val lp = left.select(
      keyCols.map(col) ++ Seq(
        col(leftTime).as("_t"), lit(lSide).as("_side"),
        struct(lCols.map(col): _*).as("_l"),
        lit(null).cast(rStructT).as("_r")): _*)
    // Null-time rows never participate in a time comparison: drop
    // null-time rights entirely (without this, a null-time right sorts
    // first and the forward frame of a null-time left — or the backward
    // frame of EVERY left — would swallow it as a phantom match), and
    // null out the carry for null-time lefts below. Null KEYS follow SQL
    // join semantics too (null = null is never true): any-null-key rights
    // are dropped here, which leaves any-null-key lefts alone in their
    // window partition — Window.partitionBy would otherwise group null
    // keys together and hand them phantom matches. Matches the native
    // operator and the property-spec model exactly.
    val rKeep = keyCols.foldLeft(col(rightTime).isNotNull)(
      (acc, k) => acc && col(k).isNotNull)
    val rp = right.filter(rKeep).select(
      keyCols.map(col) ++ Seq(
        col(rightTime).as("_t"), lit(rSide).as("_side"),
        lit(null).cast(lStructT).as("_l"),
        struct(rightPayload.map(col): _*).as("_r")): _*)
    val ordered = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("_t").asc, col("_side").asc, col("_r").asc_nulls_first)
    val w =
      if (backwardDir) ordered.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      else ordered.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val carry =
      if (backwardDir) last(col("_r"), ignoreNulls = true)
      else first(col("_r"), ignoreNulls = true)
    lp.unionByName(rp)
      .withColumn("_match",
        when(col("_t").isNotNull, carry.over(w)).otherwise(lit(null).cast(rStructT)))
      .filter(col("_side") === lSide)
      .select(lCols.map(c => col("_l").getField(c).as(c)) ++
        rightPayload.map(c => col("_match").getField(c).as(prefix + c)): _*)
  }

  /** The same backward as-of join through the native Catalyst operator
    * ([[graft.plans.AsOfJoinExec]]): each side shuffles/sorts by its own
    * key and the partitions merge in one forward pass with O(1) state —
    * no struct wrapping, no union, no window buffering. Registers the
    * planner strategy on first use; result equality with [[backward]] is
    * pinned in AsOfJoinSpec (null-time right rows excluded, which never
    * match in either form on non-degenerate data).
    */
  def backwardNative(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTime: String,
      rightTime: String,
      rightPayload: Seq[String],
      prefix: String = "asof_"): DataFrame = {
    import org.apache.spark.sql.GraftBridge
    val spark = left.sparkSession
    GraftBridge.addStrategy(spark, graft.plans.AsOfJoinStrategy)
    // Fresh aliases give the right side new expression ids, so
    // self-joins (both sides from one relation) stay unambiguous.
    // Null-time and any-null-key rights are filtered for the same SQL
    // semantics as the composed form (the exec also enforces this, so
    // direct AsOfJoinNode users get it too — this filter just prunes
    // before the shuffle).
    val rKeep = keyCols.foldLeft(col(rightTime).isNotNull)(
      (acc, k) => acc && col(k).isNotNull)
    val r = right.filter(rKeep)
      .select(right.columns.map(c => col(c).as(s"_graft_r_$c")): _*)
    val lPlan = GraftBridge.analyzed(left)
    val rPlan = GraftBridge.analyzed(r)
    def attr(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
        name: String) =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"no column $name in ${plan.output.map(_.name)}"))
    val node = graft.plans.AsOfJoinNode(lPlan, rPlan,
      keyCols.map(attr(lPlan, _)),
      keyCols.map(n => attr(rPlan, s"_graft_r_$n")),
      attr(lPlan, leftTime),
      attr(rPlan, s"_graft_r_$rightTime"),
      rightPayload.map(n => attr(rPlan, s"_graft_r_$n")))
    GraftBridge.dataFrame(spark, node)
      .toDF(left.columns ++ rightPayload.map(prefix + _): _*)
  }
}
