package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series primitives over day-grained facts: calendar gap-fill with
  * linear interpolation, and rolling z-score anomaly flagging. Both are
  * pure window/aggregate plans — no driver loops, no state — and both
  * follow the engine's float-parity discipline (decimal-exact sums,
  * identical expression trees, 6-decimal rounded outputs) so they oracle
  * hash-exact cross-engine despite being floating-point math.
  */
object Series {

  /** Fill every missing day in [min(day), max(day)] and linearly
    * interpolate the value column across gaps: an absent day takes
    * `prev + (next - prev) * gapFraction`; days before the first
    * observation backfill from it, days after the last hold it. Output:
    * (day, observed, value) — one row per calendar day.
    *
    * Scale shape: the calendar is generated from ONE aggregated bounds
    * row (`sequence(lo, hi)`), the join is day-keyed, and the prev/next
    * scan is two ordered window passes. For a keyed corpus (one series
    * per entity) the same plan partitions by the key — nothing here is
    * global except the intentionally-global single series.
    */
  def interpolateDaily(df: DataFrame, dayCol: String, valueCol: String)
      : DataFrame = {
    val series = df.select(col(dayCol).as("day"), col(valueCol).as("v"))
    val bounds = series.agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
    val cal = bounds.select(
      explode(sequence(col("lo"), col("hi"), expr("interval 1 day")))
        .as("day"))
    lerped(cal.join(series, Seq("day"), "left"), Seq.empty)
  }

  /** Per-entity [[interpolateDaily]]: each key's own [min(day), max(day)]
    * calendar is filled and interpolated independently — the shape a real
    * pipeline needs (one series per product / user / sensor). Same lerp
    * expression tree as the single-series form (the restriction-to-one-key
    * equivalence is spec-pinned); every window PARTITIONS BY the key, so
    * unlike the intentionally-global single series there is no global
    * sort anywhere: per-key calendars explode from one aggregated bounds
    * row per key, the join is (key, day)-keyed, and the prev/next scans
    * parallelize over keys. Output: (key, day, observed, value).
    */
  def interpolateDailyKeyed(df: DataFrame, keyCol: String, dayCol: String,
      valueCol: String): DataFrame = {
    val series = df.select(col(keyCol).as("key"), col(dayCol).as("day"),
      col(valueCol).as("v"))
    val cal = series.groupBy(col("key"))
      .agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
      .select(col("key"),
        explode(sequence(col("lo"), col("hi"), expr("interval 1 day")))
          .as("day"))
    lerped(cal.join(series, Seq("key", "day"), "left"), Seq(col("key")))
      .withColumnRenamed("key", keyCol)
  }

  /** The shared gap-fill lerp over a (calendar LEFT JOIN series) frame:
    * forward/backward ignore-null window scans partitioned by `part`
    * (empty = the single global series), then
    * `prev + (next - prev) * gapFraction`, interior-gap linear, edge
    * gaps held flat, rounded 6 for the cast ulp.
    */
  private def lerped(j: DataFrame, part: Seq[Column]): DataFrame = {
    val before = Window.partitionBy(part: _*).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val after = Window.partitionBy(part: _*).orderBy(col("day"))
      .rowsBetween(0, Window.unboundedFollowing)
    val prevV = last(col("v"), ignoreNulls = true).over(before)
    val prevD = last(when(col("v").isNotNull, col("day")),
      ignoreNulls = true).over(before)
    val nextV = first(col("v"), ignoreNulls = true).over(after)
    val nextD = first(when(col("v").isNotNull, col("day")),
      ignoreNulls = true).over(after)
    j.select(part ++ Seq(col("day"), col("v"), prevV.as("pv"),
        prevD.as("pd"), nextV.as("nv"), nextD.as("nd")): _*)
      .select(part ++ Seq(col("day"), col("v").isNotNull.as("observed"),
        round(
          when(col("v").isNotNull, col("v"))
            .when(col("pv").isNotNull && col("nv").isNotNull,
              col("pv") + (col("nv") - col("pv")) *
                (datediff(col("day"), col("pd")).cast("double") /
                  datediff(col("nd"), col("pd")).cast("double")))
            .when(col("pv").isNotNull, col("pv"))
            .otherwise(col("nv")), 6).as("value")): _*)
  }

  /** Truncated exponentially-weighted moving average (half-life
    * weights, α = 1/2) over the trailing `windowRows` rows per key:
    * `y_t = Σ_{i=0..W-1} 2^-(i+1) · x_{t-i}`, computed ENTIRELY in
    * integer arithmetic — x scaled to 10^-4 units (exact for the
    * engine's money-like ≤4-decimal values), each lag weighted by the
    * INTEGER 2^(W-1-i), summed as longs, then ONE correctly-rounded
    * double division by 2^W·10^4. Every intermediate is exact, so the
    * result is bit-identical on any partitioning and in any engine —
    * the float-parity discipline applied to the one smoothing
    * recurrence every monitoring pipeline wants. Weights at a series
    * head (fewer than W priors) simply truncate, same as the replay.
    * Bounds: the weights sum to 2^W−1, so |x_q| ≤ Long.MaxValue/(2^W−1)
    * keeps every partial sum within a long — checked EXPLICITLY per
    * value (Spark's default non-ANSI long arithmetic wraps silently, so
    * the guard raises before any wrapped sum can produce a quietly
    * wrong EWMA); for W=16 that admits |x| up to ~1.4·10^10.
    */
  def ewmaHalf(df: DataFrame, keyCol: String, dayCol: String,
      valueCol: String, windowRows: Int = 8): DataFrame = {
    require(windowRows >= 1 && windowRows <= 16,
      s"windowRows in [1,16], got $windowRows")
    val w = Window.partitionBy(col(keyCol)).orderBy(col(dayCol))
    val maxQ = Long.MaxValue / ((1L << windowRows) - 1)
    val xqRaw = round(col(valueCol) * 10000, 0).cast("bigint")
    val xq = when(abs(xqRaw) <= maxQ, xqRaw).otherwise(raise_error(concat(
      lit(s"Series.ewmaHalf: '$valueCol' value "),
      col(valueCol).cast("string"),
      lit(s" exceeds the exact-integer bound (|x·10^4| must be ≤ $maxQ " +
        s"for windowRows=$windowRows)"))).cast("bigint"))
    val total = (0 until windowRows).map { i =>
      coalesce(lag(xq, i).over(w), lit(0L)) *
        lit(1L << (windowRows - 1 - i))
    }.reduce(_ + _)
    df.select(col(keyCol), col(dayCol), col(valueCol).as("value"),
      (total.cast("double") /
        lit(((1L << windowRows) * 10000L).toDouble)).as("ewma"))
  }

  /** Rolling z-score over the trailing `windowRows`-row window per key
    * (ordered by day): flags points more than `threshold` standard
    * deviations from the trailing mean. Mean/variance derive from
    * DECIMAL-exact window sums of x and x² — the one aggregation a
    * distributed engine cannot order — so the doubles that reach the
    * (exactly-rounded IEEE) divide/sqrt chain are bit-identical on any
    * partitioning and in any engine; the emitted z rounds to 6 decimals
    * for the double→decimal cast ulp (the q_event_pagerank caveat), and
    * the anomaly flag compares the ROUNDED z so the boundary is
    * deterministic too.
    */
  def rollingZScore(df: DataFrame, keyCol: String, dayCol: String,
      valueCol: String, windowRows: Int = 7, threshold: Double = 2.0)
      : DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(dayCol))
      .rowsBetween(-(windowRows - 1), 0)
    val x = col(valueCol)
    val n = count(x).over(w).cast("double")
    val s = sum(x.cast("decimal(38,6)")).over(w).cast("double")
    val ss = sum((x * x).cast("decimal(38,6)")).over(w).cast("double")
    val mean = s / n
    val variance = greatest(lit(0.0), ss / n - mean * mean)
    val z = when(sqrt(variance) > 0, round((x - mean) / sqrt(variance), 6))
    df.select(col(keyCol), col(dayCol), x.as("value"),
        n.cast("bigint").as("n_window"), z.as("z"))
      .withColumn("is_anomaly",
        coalesce(abs(col("z")) > threshold, lit(false)))
  }
}
