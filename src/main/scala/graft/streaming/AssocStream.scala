package graft.streaming

import graft.etl.RetailWarehouse
import graft.operators.{Baskets, IncrementalAgg}
import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming association-rule state maintenance — the [[RollupStream]]
  * discipline applied to the basket tier: each micro-batch of WHOLE
  * baskets reduces to its additive count state
  * ([[graft.operators.Baskets.basketState]] — item, pair, and basket
  * counts) and folds into the stored state via
  * [[graft.operators.IncrementalAgg.mergeRollup]]; rules re-derive from
  * rollup-sized state on demand ([[rules]]), so serving cost never
  * touches the fact history.
  *
  * The THREE state tables publish under ONE staged-parent swap, so a
  * reader can never observe items from batch N with pairs from batch
  * N-1 — the same crash-window analysis as
  * [[graft.etl.RetailWarehouse.writeSwap]] (staged copy complete before
  * the target delete begins; [[RetailWarehouse.recoverSwap]] finishes an
  * interrupted rename), with the replay marker (`_applied_batch` on the
  * items table) riding the same atomic rename — additive folds are not
  * idempotent, so a replayed batch id is skipped (RollupStream's
  * exactly-once recipe; pass a checkpoint in any restartable
  * deployment, batch ids reset without one).
  *
  * Soundness requirement inherited from the state's additivity: every
  * micro-batch must contain WHOLE baskets (a basket split across two
  * batches under-counts its cross-batch pairs and double-counts the
  * basket). Batch the stream on the basket boundary — e.g. emit a
  * basket's items only on basket close.
  */
object AssocStream {

  val batchCol = "_applied_batch"

  def maintainBasketState(
      items: DataFrame,
      statePath: String,
      basketCol: String,
      itemCol: String,
      checkpoint: Option[String] = None): StreamingQuery = {
    val writer = items.writeStream.outputMode("append")
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        foldBatch(batch.toDF(), batchId, statePath, basketCol, itemCol)
      }
    checkpoint.fold(writer)(writer.option("checkpointLocation", _)).start()
  }

  /** Rules served from the stored state at the given thresholds. */
  def rules(spark: SparkSession, statePath: String, minItemCount: Int = 2,
      minPairCount: Int = 2, topK: Int = 50): DataFrame = {
    RetailWarehouse.recoverSwap(spark, statePath)
    Baskets.rulesFromState(
      spark.read.parquet(s"$statePath/items").drop(batchCol),
      spark.read.parquet(s"$statePath/pairs"),
      spark.read.parquet(s"$statePath/baskets"),
      minItemCount, minPairCount, topK)
  }

  /** One fold, factored out for crash-recovery tests and backfills. */
  private[streaming] def foldBatch(batch: DataFrame, batchId: Long,
      statePath: String, basketCol: String, itemCol: String): Unit = {
    if (batch.isEmpty) return // nothing to fold; marker need not advance
    val spark = batch.sparkSession
    RetailWarehouse.recoverSwap(spark, statePath)
    val p = new org.apache.hadoop.fs.Path(statePath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val exists = fs.exists(p)
    val applied =
      if (!exists) None
      else Option(spark.read.parquet(s"$statePath/items")
        .agg(max(col(batchCol))).head.get(0)).map(_.asInstanceOf[Long])
    if (applied.exists(_ >= batchId)) return // replay: already folded
    val (di, dp, dn) = Baskets.basketState(batch, basketCol, itemCol)
    val (mi, mp, mn) =
      if (!exists) (di, dp, dn)
      else (
        IncrementalAgg.mergeRollup(
          spark.read.parquet(s"$statePath/items").drop(batchCol), di,
          Seq("item"), Seq("c_item")),
        IncrementalAgg.mergeRollup(
          spark.read.parquet(s"$statePath/pairs"), dp,
          Seq("ia", "ib"), Seq("n_both")),
        IncrementalAgg.mergeRollup(
          spark.read.parquet(s"$statePath/baskets").withColumn("k", lit(1)),
          dn.withColumn("k", lit(1)),
          Seq("k"), Seq("n_baskets")).drop("k"))
    // one staged parent, three parquet children, ONE rename = atomic
    // publish of all three tables + the marker (on items)
    val staged = new org.apache.hadoop.fs.Path(statePath + "._staged")
    if (fs.exists(staged)) fs.delete(staged, true)
    mi.withColumn(batchCol, lit(batchId))
      .write.parquet(s"$staged/items")
    mp.write.parquet(s"$staged/pairs")
    mn.write.parquet(s"$staged/baskets")
    if (fs.exists(p)) fs.delete(p, true)
    fs.rename(staged, p)
  }
}
