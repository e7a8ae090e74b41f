package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-interval (range) join at scale.
  *
  * Spark has no native range-join optimization: `points JOIN intervals ON
  * p BETWEEN s AND e` plans as a (broadcast) nested-loop join — fine when
  * one side broadcasts, quadratic disaster when both sides are large. The
  * standard scale path (what Databricks' range-join hint and DuckDB's IEJoin
  * do natively) buckets the domain: explode each interval into the
  * fixed-width buckets it covers, bucket each point, hash-join on the
  * bucket, then filter exact containment. Join cost becomes
  * O(points + intervals × avgBucketsPerInterval) with full shuffle
  * parallelism on the bucket key.
  *
  * Intervals are inclusive on both ends. Works on any integral domain —
  * cast dates to epoch days, timestamps to epoch seconds, etc.
  */
object RangeJoin {

  /** Bucketed inner range join: rows of `points` paired with every row of
    * `intervals` whose [startCol, endCol] contains pointCol. Column names
    * must be disjoint between the two inputs (enforced).
    *
    * @param bucketWidth domain units per bucket — pick so a typical
    *   interval covers a handful of buckets: too small explodes the
    *   interval side, too large degrades the containment filter's
    *   selectivity (many same-bucket non-matches).
    * @param maxBucketsPerInterval explosion safety valve: an interval
    *   spanning more buckets than this fails the job with a clear message
    *   instead of OOMing or tripping Spark's sequence element cap — the
    *   failure mode of an open-ended sentinel interval (end =
    *   Long.MaxValue) against a small bucketWidth. Raise bucketWidth (or
    *   clamp sentinel ends to the observed domain) rather than this cap.
    */
  private val bucketCol = "_rj_bucket"

  def pointInInterval(
      points: DataFrame,
      intervals: DataFrame,
      pointCol: String,
      startCol: String,
      endCol: String,
      bucketWidth: Long,
      maxBucketsPerInterval: Long = 1L << 16): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    require(maxBucketsPerInterval > 0,
      s"maxBucketsPerInterval must be positive, got $maxBucketsPerInterval")
    require(!points.columns.contains(bucketCol) &&
        !intervals.columns.contains(bucketCol),
      s"column name $bucketCol is reserved by pointInInterval")
    val overlap = points.columns.toSet.intersect(intervals.columns.toSet)
    require(overlap.isEmpty,
      s"points and intervals column names must be disjoint; both define " +
        overlap.toSeq.sorted.mkString(", "))
    val p = points.withColumn(bucketCol, floorDiv(col(pointCol), bucketWidth))
    val iv = explodeToBuckets(intervals, startCol, endCol, bucketWidth,
      maxBucketsPerInterval)
    p.join(iv, bucketCol)
      .filter(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop(bucketCol)
  }

  /** Bucketed inner INTERVAL-OVERLAP join: rows of `left` paired with
    * every row of `right` whose [rStartCol, rEndCol] intersects
    * [lStartCol, lEndCol] (ends inclusive; [[pointInInterval]] is the
    * degenerate left-width-zero case). Both sides explode into the
    * fixed-width buckets they cover and hash-join on the bucket key; a
    * pair sharing several buckets is kept ONLY at the bucket of the
    * later start — a bucket both intervals provably cover — so
    * deduplication is a codegen'd filter, never a distinct shuffle. Cost
    * is the two explode fan-outs plus one hash join with full bucket-key
    * parallelism: the scale shape for large×large temporal overlap joins
    * that Spark would otherwise plan as a nested loop.
    */
  def intervalOverlap(
      left: DataFrame,
      right: DataFrame,
      lStartCol: String,
      lEndCol: String,
      rStartCol: String,
      rEndCol: String,
      bucketWidth: Long,
      maxBucketsPerInterval: Long = 1L << 16): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    require(!left.columns.contains(bucketCol) &&
        !right.columns.contains(bucketCol),
      s"column name $bucketCol is reserved by intervalOverlap")
    val overlap = left.columns.toSet.intersect(right.columns.toSet)
    require(overlap.isEmpty,
      s"left and right column names must be disjoint; both define " +
        overlap.toSeq.sorted.mkString(", "))
    val lb = explodeToBuckets(left, lStartCol, lEndCol, bucketWidth,
      maxBucketsPerInterval)
    val rb = explodeToBuckets(right, rStartCol, rEndCol, bucketWidth,
      maxBucketsPerInterval)
    lb.join(rb, bucketCol)
      .filter(col(bucketCol) === greatest(
        floorDiv(col(lStartCol), bucketWidth),
        floorDiv(col(rStartCol), bucketWidth)))
      .filter(col(lStartCol) <= col(rEndCol) &&
        col(rStartCol) <= col(lEndCol))
      .drop(bucketCol)
  }

  /** Bucketed 2-D point-in-box join (the grid spatial join): rows of
    * `points` paired with every row of `boxes` whose axis-aligned
    * rectangle [x1,x2]×[y1,y2] contains (px, py), ends inclusive. The
    * 2-D generalization of [[pointInInterval]]: each box explodes into
    * the grid cells it covers (two nested bucket sequences), each point
    * buckets into its one cell, and a hash join on the (cellX, cellY)
    * key replaces the nested-loop plan Spark would otherwise choose for
    * a two-sided inequality join — the join cost becomes
    * O(points + boxes × avgCellsPerBox) with full grid-key parallelism.
    *
    * Guards: each axis span is long-exact capped (the 1-D span guard per
    * axis, at most 2^16 cells), and the cell PRODUCT per box is capped
    * by `maxCellsPerBox` — both hard explode-size contracts, failed
    * loudly, never rounded through doubles.
    */
  def pointInBox2D(
      points: DataFrame,
      boxes: DataFrame,
      pxCol: String, pyCol: String,
      x1Col: String, y1Col: String, x2Col: String, y2Col: String,
      cellWidth: Long, cellHeight: Long,
      maxCellsPerBox: Long = 4096L): DataFrame = {
    require(cellWidth > 0 && cellHeight > 0,
      s"cell dims must be positive, got $cellWidth x $cellHeight")
    require(maxCellsPerBox > 0,
      s"maxCellsPerBox must be positive, got $maxCellsPerBox")
    val cellX = "_rj_cx"; val cellY = "_rj_cy"
    val reserved = Seq(cellX, cellY)
    require(reserved.forall(c => !points.columns.contains(c) &&
      !boxes.columns.contains(c)),
      s"column names ${reserved.mkString(", ")} are reserved by pointInBox2D")
    val overlap = points.columns.toSet.intersect(boxes.columns.toSet)
    require(overlap.isEmpty,
      s"points and boxes column names must be disjoint; both define " +
        overlap.toSeq.sorted.mkString(", "))
    // Inverted boxes (x2 < x1 or y2 < y1) contain no point: dropped
    // before the explode, like explodeToBuckets' inverted intervals —
    // a negative axis span would otherwise make sequence() count DOWN.
    // Null corners drop with the same comparisons.
    val validBoxes = boxes.filter(
      col(x2Col) >= col(x1Col) && col(y2Col) >= col(y1Col))
    // per-axis spans (long-exact, axis-capped at 2^16 so the product
    // below cannot overflow), then the product cap
    val x1b = floorDiv(col(x1Col), cellWidth)
    val x2b = floorDiv(col(x2Col), cellWidth)
    val y1b = floorDiv(col(y1Col), cellHeight)
    val y2b = floorDiv(col(y2Col), cellHeight)
    val sx = try_subtract(x2b, x1b)
    val sy = try_subtract(y2b, y1b)
    val axesOk = sx.isNotNull && sy.isNotNull &&
      sx < lit(1L << 16) && sy < lit(1L << 16)
    val cellsOk = axesOk && (sx + 1) * (sy + 1) <= lit(maxCellsPerBox)
    // BOTH axis sequences are assert-gated: correctness must not depend
    // on Catalyst keeping the two Generate nodes in written order — if
    // only the x explode carried the guard, a reordered plan could run
    // the y explode ungated on an over-cap box.
    def guarded(endB: Column): Column = when(
      assert_true(cellsOk,
        concat(lit("RangeJoin: box ["), col(x1Col), lit(","), col(x2Col),
          lit("]x["), col(y1Col), lit(","), col(y2Col),
          lit(s"] covers more than $maxCellsPerBox grid cells at " +
            s"$cellWidth x $cellHeight — raise the cell size or the cap")))
        .isNull,
      endB)
    val b = validBoxes
      .withColumn(cellX, explode(sequence(x1b, guarded(x2b))))
      .withColumn(cellY, explode(sequence(y1b, guarded(y2b))))
    val p = points
      .withColumn(cellX, floorDiv(col(pxCol), cellWidth))
      .withColumn(cellY, floorDiv(col(pyCol), cellHeight))
    p.join(b, Seq(cellX, cellY))
      .filter(col(pxCol) >= col(x1Col) && col(pxCol) <= col(x2Col) &&
        col(pyCol) >= col(y1Col) && col(pyCol) <= col(y2Col))
      .drop(cellX, cellY)
  }

  /** Explode each [startCol, endCol] row into one row per covered bucket,
    * with the span guard: exact LONG arithmetic — `try_subtract` returns
    * NULL when endB - startB exceeds the long range (a sentinel interval
    * spanning ~2^64 buckets; plain `-` would throw ANSI overflow before
    * the guard could explain), and NULL fails the guard like an over-cap
    * span. assert_true yields NULL on success, so the `when` collapses to
    * the end bucket on every valid row and the guard rides the same
    * codegen stage — no extra pass. A double check would be overflow-safe
    * but rounds near 2^53, passing spans just over the cap — exactness
    * matters because the cap is the caller's hard explode-size contract.
    */
  private def explodeToBuckets(df: DataFrame, startCol: String,
      endCol: String, bucketWidth: Long, maxBucketsPerInterval: Long)
      : DataFrame = {
    require(maxBucketsPerInterval > 0,
      s"maxBucketsPerInterval must be positive, got $maxBucketsPerInterval")
    // Inverted intervals (end < start) contain no point, so they emit no
    // buckets — dropped BEFORE the explode. This is not just semantics:
    // a negative span passes the `< cap` guard, and Spark's
    // sequence(hi, lo) counts DOWN, so one inverted sentinel row
    // (end=0, start=10^9) would explode a billion descending buckets
    // that the containment filter then discards one by one. Null
    // endpoints drop with the same comparison.
    val valid = df.filter(col(endCol) >= col(startCol))
    val startB = floorDiv(col(startCol), bucketWidth)
    val endB = floorDiv(col(endCol), bucketWidth)
    val span = try_subtract(endB, startB)
    val spanOk = span.isNotNull && span < lit(maxBucketsPerInterval)
    val guardedEnd = when(
      assert_true(spanOk,
        concat(lit("RangeJoin: interval ["), col(startCol), lit(", "),
          col(endCol), lit(s"] covers more than $maxBucketsPerInterval " +
            s"buckets at bucketWidth=$bucketWidth — open-ended sentinel " +
            "interval? raise bucketWidth or maxBucketsPerInterval"))).isNull,
      endB)
    valid.withColumn(bucketCol, explode(sequence(startB, guardedEnd)))
  }

  /** Floor division rounding toward negative infinity (so bucket
    * boundaries stay aligned across zero), in exact LONG arithmetic:
    * integral `div` (truncating) corrected by one when the remainder is
    * negative. No double rounding (a double quotient is inexact above
    * 2^53 and would collapse adjacent epoch-nano buckets) and no
    * subtract-the-remainder overflow near Long.MinValue.
    */
  private def floorDiv(c: Column, w: Long): Column = {
    val v = c.cast("long")
    call_function("div", v, lit(w)) -
      when(v % w < 0, lit(1L)).otherwise(lit(0L))
  }
}
