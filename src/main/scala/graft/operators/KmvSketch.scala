package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** KMV (k-minimum-values) distinct-count sketch — the MERGEABLE
  * approximate-distinct state whose estimator needs NO logarithm or
  * float: keep the k smallest distinct hash values per group; then
  *
  *   distinct ≈ (k-1) * H div h_k        (H = hash space, h_k = kth min)
  *
  * — one integer division, so engine and oracle agree bit-for-bit
  * (unlike HLL's harmonic-mean float pipeline, which is why
  * q_approx_distinct_parts ships rows-only while this sketch is
  * hash-oracled). Groups with fewer than k distinct hashes report the
  * EXACT count — the sketch degrades to exact, never to noise.
  *
  * State is k·groups rows and merges by "union, keep k smallest" —
  * associative and commutative, so batch splits cannot change the
  * result (spec-pinned), and maintenance folds a delta's state into the
  * prior state without rescanning history.
  *
  * Hashes are the engine-wide md5-hex recipe (first 8 hex chars → 32-bit
  * integer, +1 to keep zero out of the divisor), replayed verbatim by
  * the DuckDB oracle.
  */
object KmvSketch {

  val HashSpace: Long = 1L << 32

  /** h(value) ∈ [1, 2^32] — the md5-prefix integer hash every sampler
    * in the engine shares, shifted off zero.
    */
  def hashCol(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 8), 16, 10).cast("long") + 1

  /** The sketch state: the k smallest DISTINCT hashes of `valueCol` per
    * group, as rows (groupCols..., h). Salted two-phase k-smallest: the
    * first selection partitions by (group, input-partition id) — the
    * salt spreads a hot group across the cluster and bounds every sort —
    * and only the surviving ≤ k·P candidates enter the per-group final
    * selection, so no task ever sorts a hot group's full distinct set
    * (the SkewJoin salting discipline applied to top-k).
    */
  def state(df: DataFrame, groupCols: Seq[String], valueCol: String,
      k: Int): DataFrame = {
    require(k >= 2, s"KMV needs k >= 2, got $k")
    val g = groupCols.map(col)
    val distinctHashes = df.filter(col(valueCol).isNotNull)
      .select(g :+ hashCol(col(valueCol)).as("h"): _*)
      .distinct()
    val local = Window
      .partitionBy((g :+ col("_pid")): _*)
      .orderBy(col("h"))
    val candidates = distinctHashes
      .withColumn("_pid", spark_partition_id())
      .withColumn("_lr", row_number().over(local))
      .filter(col("_lr") <= k).drop("_lr", "_pid")
    val global = Window.partitionBy(g: _*).orderBy(col("h"))
    candidates.withColumn("_r", row_number().over(global))
      .filter(col("_r") <= k).drop("_r")
  }

  /** Fold two sketch states: union, keep each group's k smallest. The
    * inputs are state-sized (k·groups rows each), so the merge never
    * touches fact data.
    */
  def mergeState(a: DataFrame, b: DataFrame, groupCols: Seq[String],
      k: Int): DataFrame = {
    val g = groupCols.map(col)
    val w = Window.partitionBy(g: _*).orderBy(col("h"))
    a.unionByName(b).distinct()
      .withColumn("_r", row_number().over(w))
      .filter(col("_r") <= k).drop("_r")
  }

  /** Distinct-count estimates from sketch state: exact count when the
    * group holds fewer than k hashes, else (k-1)·H div h_k. Output:
    * (groupCols..., est).
    */
  def estimate(state: DataFrame, groupCols: Seq[String], k: Int)
      : DataFrame = {
    val g = groupCols.map(col)
    state.groupBy(g: _*)
      .agg(count(lit(1)).as("_n"), max(col("h")).as("_hk"))
      .withColumn("est",
        when(col("_n") < k, col("_n"))
          .otherwise(expr(s"(${k - 1} * ${HashSpace}) div _hk"))
          .cast("bigint"))
      .select(g :+ col("est"): _*)
  }
}
