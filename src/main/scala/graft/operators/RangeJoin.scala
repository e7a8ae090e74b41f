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
    * must be disjoint between the two inputs.
    *
    * @param bucketWidth domain units per bucket — pick so a typical
    *   interval covers a handful of buckets: too small explodes the
    *   interval side, too large degrades the containment filter's
    *   selectivity (many same-bucket non-matches).
    */
  def pointInInterval(
      points: DataFrame,
      intervals: DataFrame,
      pointCol: String,
      startCol: String,
      endCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    val p = points.withColumn("_bucket", floorDiv(col(pointCol), bucketWidth))
    val iv = intervals
      .withColumn("_bucket", explode(sequence(
        floorDiv(col(startCol), bucketWidth), floorDiv(col(endCol), bucketWidth))))
    p.join(iv, "_bucket")
      .filter(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop("_bucket")
  }

  /** Floor division rounding toward negative infinity (so bucket
    * boundaries stay aligned across zero), in exact integer arithmetic:
    * subtract the non-negative `pmod` remainder first, then divide the
    * exact multiple — no double-rounding hazard near bucket boundaries
    * at large magnitudes.
    */
  private def floorDiv(c: Column, w: Long): Column = {
    val v = c.cast("long")
    ((v - pmod(v, lit(w))) / w).cast("long")
  }
}
