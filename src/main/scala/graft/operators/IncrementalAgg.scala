package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance: fold a delta batch's partial
  * aggregate into a prior rollup instead of recomputing the rollup from
  * the full fact history. At 100 TB the full recompute re-reads the whole
  * fact table every cycle; the merge touches only rollup-sized state plus
  * the delta — the difference between a batch that scales with history
  * and one that scales with the day's arrivals.
  */
object IncrementalAgg {

  /** Merge two rollups over the same keys whose measures are ADDITIVE
    * (counts, decimal-exact sums — anything where merged = prior + delta
    * per key). Derived measures (avg, ratios) must be recomputed from the
    * merged additive state by the caller, exactly like Spark's own
    * partial-aggregation split. The union shuffles only the two rollups;
    * the fact table is never touched.
    *
    * Decimal (not double) sum columns keep the merge bit-identical to the
    * full recompute regardless of how history was split into batches.
    */
  def mergeRollup(prior: DataFrame, delta: DataFrame, keys: Seq[String],
      measures: Seq[String]): DataFrame = {
    require(keys.nonEmpty && measures.nonEmpty, "need keys and measures")
    require(measures.forall(prior.columns.contains) &&
      measures.forall(delta.columns.contains),
      s"measures ${measures.mkString(",")} must exist in both rollups")
    val aggs = measures.map(m => sum(col(m)).as(m))
    prior.unionByName(delta)
      .groupBy(keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
  }
}
