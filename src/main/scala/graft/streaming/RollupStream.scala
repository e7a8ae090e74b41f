package graft.streaming

import graft.etl.RetailWarehouse
import graft.operators.IncrementalAgg
import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming incremental-rollup maintenance: fold each micro-batch's
  * partial aggregate into a stored rollup table — the maintenance loop a
  * 100 TB warehouse actually runs, completing the CDC / rollup /
  * compaction maintenance triangle ([[CdcStream]] is the key-snapshot
  * twin; this is the additive-aggregate one). Each batch costs one
  * aggregation over the batch plus a merge against rollup-sized state
  * ([[graft.operators.IncrementalAgg.mergeRollup]]); the fact history is
  * never re-read, so the cycle scales with the day's arrivals, not with
  * the table.
  *
  * Exactly-once WITHOUT sink transactions: additive folds are NOT
  * idempotent (a replayed batch would double-count — the opposite of
  * [[CdcStream]]'s naturally-idempotent upserts), so every published
  * rollup carries the id of the last batch folded into it
  * (`_applied_batch`, constant per version) and the fold is skipped when
  * the incoming `batchId` is not newer. The marker rides the SAME staged
  * write + swap as the data ([[RetailWarehouse.writeSwap]]), so state and
  * marker can never diverge — a crash either published both (replay is
  * skipped) or neither (replay re-folds). Batch ids are monotone only
  * under a `checkpointLocation`; without one a restart resets them to 0,
  * which the skip would misread as already-applied — pass a checkpoint in
  * any deployment that can restart.
  *
  * Decimal (not double) sum measures keep every fold bit-identical to the
  * single-batch recompute regardless of how arrivals were sliced into
  * micro-batches — RollupStreamSpec pins stream ≡ batch on exactly that.
  */
object RollupStream {

  val batchCol = "_applied_batch"

  /** Start the maintainer: `rollup` reduces any fact slice to its
    * additive rollup (`keys` ++ `measures`, decimal sums / counts);
    * the stored table at `rollupPath` converges to `rollup(all facts)`
    * with `_applied_batch` appended (readers drop it).
    */
  def maintainRollup(
      facts: DataFrame,
      rollupPath: String,
      rollup: DataFrame => DataFrame,
      keys: Seq[String],
      measures: Seq[String],
      checkpoint: Option[String] = None): StreamingQuery = {
    val writer = facts.writeStream.outputMode("append")
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        foldBatch(batch.toDF(), batchId, rollupPath, rollup, keys, measures)
      }
    checkpoint.fold(writer)(writer.option("checkpointLocation", _)).start()
  }

  /** One fold step, factored out so crash-recovery tests (and a manual
    * backfill) can drive it without a streaming query around it.
    */
  private[streaming] def foldBatch(
      batch: DataFrame,
      batchId: Long,
      rollupPath: String,
      rollup: DataFrame => DataFrame,
      keys: Seq[String],
      measures: Seq[String]): Unit = {
    if (batch.isEmpty) return // nothing to fold; marker need not advance
    val spark = batch.sparkSession
    // finish any interrupted swap first: the staged copy (complete by
    // construction) carries the true marker — ignoring it would re-fold
    // a batch that already published
    RetailWarehouse.recoverSwap(spark, rollupPath)
    val p = new org.apache.hadoop.fs.Path(rollupPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val prior = if (fs.exists(p)) Some(spark.read.parquet(rollupPath)) else None
    val applied = prior.flatMap(df =>
      Option(df.agg(max(col(batchCol))).head.get(0)).map(_.asInstanceOf[Long]))
    if (applied.exists(_ >= batchId)) return // at-least-once replay: already folded
    val delta = rollup(batch)
    val merged = prior.map(_.drop(batchCol)) match {
      case Some(pr) => IncrementalAgg.mergeRollup(pr, delta, keys, measures)
      case None => delta
    }
    RetailWarehouse.writeSwap(merged.withColumn(batchCol, lit(batchId)),
      rollupPath)
  }
}
