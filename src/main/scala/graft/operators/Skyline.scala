package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2-D skyline (Pareto front): rows not dominated by any other row,
  * maximizing both dimensions — q dominates p iff q.x >= p.x, q.y >=
  * p.y, and at least one is strict. Duplicates of a skyline point all
  * survive (neither dominates the other).
  *
  * Exact WITHOUT the classic traps: no all-pairs join (brute dominance
  * is quadratic) and no global sort (the textbook sort-by-x-desc
  * running-max needs one total order). Instead x is grid-bucketed and
  * dominance splits into three disjoint, individually-exact checks:
  *
  *  - same x:        survive iff y == max(y) over that x;
  *  - same bucket,
  *    strictly
  *    greater x:     survive iff y > max(y) over the bucket's
  *                   strictly-greater-x rows (per-bucket window, RANGE
  *                   to 1 PRECEDING on integral x — parallel across
  *                   buckets);
  *  - higher bucket: survive iff y > the running max of higher buckets'
  *                   y-maxima (a BUCKET-COUNT-sized cummax, broadcast
  *                   back) — sound because a higher bucket implies
  *                   strictly greater x.
  *
  * Every fact-sized operation is partitioned by bucket/x; the only
  * single-partition window runs over `buckets` rows. Dimensions must be
  * integral (the RANGE-offset trick and the grid arithmetic are exact
  * only there); nulls are dropped — a null coordinate is off the front.
  */
object Skyline {

  def skyline2D(df: DataFrame, xCol: String, yCol: String,
      buckets: Int = 64): DataFrame = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    val integral = Set("ByteType", "ShortType", "IntegerType", "LongType")
    Seq(xCol, yCol).foreach { c =>
      val t = df.schema(c).dataType.toString
      require(integral.contains(t),
        s"skyline2D needs integral dims, $c is $t")
    }
    val x = col(xCol); val y = col(yCol)
    val input = df.filter(x.isNotNull && y.isNotNull)
    val bounds = input.agg(min(x).cast("long").as("_mnx"),
      max(x).cast("long").as("_mxx"))
    // W = ceil(span / buckets), integer; bucket = (x - min) div W —
    // div-first keeps every step in long range for any input domain
    val t = input.crossJoin(broadcast(bounds))
      .withColumn("_w", greatest(lit(1L),
        expr(s"(_mxx - _mnx + $buckets) div $buckets")))
      .withColumn("_bkt", expr(s"(`$xCol` - _mnx) div _w"))
    val wGreaterX = Window.partitionBy(col("_bkt")).orderBy(x.desc)
      .rangeBetween(Window.unboundedPreceding, -1)
    val wSameX = Window.partitionBy(col("_bkt"), x)
    val bucketMax = t.groupBy(col("_bkt")).agg(max(y).as("_bmax"))
      .withColumn("_above", max(col("_bmax")).over(
        Window.orderBy(col("_bkt").desc)
          .rowsBetween(Window.unboundedPreceding, -1)))
      .select(col("_bkt"), col("_above"))
    t.withColumn("_gx", max(y).over(wGreaterX))
      .withColumn("_eq", max(y).over(wSameX))
      .join(broadcast(bucketMax), "_bkt")
      .filter(y === col("_eq") &&
        (col("_gx").isNull || y > col("_gx")) &&
        (col("_above").isNull || y > col("_above")))
      .select(df.columns.map(col): _*)
  }
}
