package graft.streaming

import graft.etl.RetailWarehouse
import graft.operators.Series
import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming anomaly detection as INCREMENTAL MAINTENANCE: each
  * micro-batch folds into the stored per-(key, day) additive rollup
  * (the [[RollupStream]] discipline — decimal-exact, replay-skipped,
  * marker rides the swap), then the rolling z-scores are REDERIVED from
  * that bounded state and published. Scoring is a pure function of the
  * rollup — (keys × days)-sized, not event-sized — so the expensive part
  * of the cycle scales with the day's arrivals and the cheap part with
  * the series length, never with event history; and because the scorer
  * is [[Series.rollingZScore]] itself, the streaming scores are
  * BIT-IDENTICAL to a batch run over the same events no matter how
  * arrivals were sliced (AnomalyStreamSpec pins exactly that).
  *
  * Crash contract: the scores table is derived state — a crash between
  * the state swap and the scores swap leaves scores one batch stale,
  * and the next fold (or an explicit [[rescore]]) repairs them from the
  * durable rollup. Nothing is lost and nothing double-counts.
  */
object AnomalyStream {

  private val rollupKeys = Seq("event_type", "day")
  private val rollupMeasures = Seq("n", "total")

  private def rollupFn(df: DataFrame): DataFrame =
    df.select(col("event_type"), col("ts").cast("date").as("day"),
        col("value"))
      .groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(27,4)")).as("total"))

  /** Start the maintainer over a streaming events frame
    * (event_type, ts, value): stored daily rollup at `statePath`,
    * published z-scores at `scoresPath`.
    */
  def maintainScores(
      events: DataFrame,
      statePath: String,
      scoresPath: String,
      windowRows: Int = 7,
      threshold: Double = 2.0,
      checkpoint: Option[String] = None): StreamingQuery = {
    val writer = events.writeStream.outputMode("append")
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        foldAndScore(batch.toDF(), batchId, statePath, scoresPath,
          windowRows, threshold)
      }
    checkpoint.fold(writer)(writer.option("checkpointLocation", _)).start()
  }

  /** One maintenance step, factored out for crash-recovery tests and
    * manual backfills: fold the batch (replay-safe), then republish the
    * scores from the folded state.
    */
  private[streaming] def foldAndScore(batch: DataFrame, batchId: Long,
      statePath: String, scoresPath: String, windowRows: Int,
      threshold: Double): Unit = {
    foldOnly(batch, batchId, statePath)
    rescore(batch.sparkSession, statePath, scoresPath, windowRows, threshold)
  }

  /** The fold half alone — what a crash leaves behind when it dies
    * before the scores swap; specs drive it directly.
    */
  private[streaming] def foldOnly(batch: DataFrame, batchId: Long,
      statePath: String): Unit =
    RollupStream.foldBatch(batch, batchId, statePath, rollupFn,
      rollupKeys, rollupMeasures)

  /** Recompute and publish the scores table from the stored rollup —
    * idempotent (pure function of state), so it doubles as the repair
    * step after a crash between the two swaps.
    */
  def rescore(spark: SparkSession, statePath: String, scoresPath: String,
      windowRows: Int = 7, threshold: Double = 2.0): Unit = {
    val p = new org.apache.hadoop.fs.Path(statePath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return // nothing folded yet
    val daily = spark.read.parquet(statePath)
      .select(col("event_type"), col("day"),
        col("total").cast("double").as("daily_total"))
    val scores = Series.rollingZScore(daily, "event_type", "day",
      "daily_total", windowRows, threshold)
    RetailWarehouse.writeSwap(scores, scoresPath)
  }
}
