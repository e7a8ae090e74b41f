package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Incrementally maintained EXACT percentiles over an integral metric.
  *
  * The state is a value histogram `(value, cnt)` — additive over
  * disjoint batches, so it merges through the same rollup-merge path as
  * every other incremental aggregate ([[IncrementalAgg.mergeRollup]]):
  * maintenance cost scales with the DELTA plus the value domain, never
  * with fact history. Quantiles then re-derive from state that is
  * domain-sized (token counts, prices-in-cents, latencies-in-ms all
  * have bounded domains), which is why this stays exact where a
  * t-digest/KLL sketch would approximate: for discrete metrics the
  * "sketch" IS the full histogram, and it is already small.
  *
  * Quantile definition (engine-independent integer arithmetic): the
  * p-th percentile is the SMALLEST value whose cumulative count
  * satisfies `cum * 100 >= p * N`. No floating point, no
  * interpolation — bit-identical across engines and batch splits.
  */
object Quantiles {

  /** Additive histogram state of `valueCol` (must be integral-valued;
    * nulls are dropped — a null metric has no place on a CDF).
    */
  def histogramState(df: DataFrame, valueCol: String): DataFrame =
    df.filter(col(valueCol).isNotNull)
      .groupBy(col(valueCol).cast("bigint").as("value"))
      .agg(count(lit(1)).as("cnt"))

  /** Fold a delta batch's histogram into the prior state — counts are
    * additive, so this is rollup-merge, bit-identical to recomputing
    * the histogram over the concatenated history.
    */
  def mergeHistogram(prior: DataFrame, delta: DataFrame): DataFrame =
    IncrementalAgg.mergeRollup(prior, delta, Seq("value"), Seq("cnt"))

  /** Exact percentiles from histogram state. The cumulative window
    * orders DISTINCT VALUES — state-sized, not fact-sized, the same
    * post-aggregation bounded-cardinality shape the quantile length
    * gate uses ([[TrainingData.lengthGate]]); `percentiles` must be in
    * [1, 100]. Output: one row per requested percentile.
    */
  def quantilesFromState(state: DataFrame, percentiles: Seq[Int])
      : DataFrame = {
    require(percentiles.nonEmpty && percentiles.forall(p => p >= 1 && p <= 100),
      s"percentiles must be in [1,100], got ${percentiles.mkString(",")}")
    val cum = state.withColumn("cum",
      sum(col("cnt")).over(Window.orderBy(col("value"))))
    val total = state.agg(sum(col("cnt")).as("n_total"))
    val ps: Column = explode(array(percentiles.distinct.sorted
      .map(p => lit(p)): _*))
    cum.crossJoin(broadcast(total))
      .select(col("value"), col("cum"), col("n_total"), ps.as("pct"))
      .groupBy(col("pct"))
      .agg(min(when(col("cum") * 100 >= col("pct") * col("n_total"),
        col("value"))).as("value"))
  }
}
