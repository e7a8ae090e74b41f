package graft.streaming

import graft.operators.CountMin
import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming count-min sketch maintenance: each micro-batch's token
  * sketch folds into the stored sketch by CELL-WISE ADDITION — the
  * defining mergeability of linear sketches, ridden on the exact same
  * replay-safe fold as [[RollupStream]] (cells are additive counts; the
  * `_applied_batch` marker rides the staged swap). The stored sketch
  * after any number of micro-batches is CELL-FOR-CELL the sketch of the
  * concatenated corpus — not an approximation of it — so estimate
  * quality never degrades with slicing (SketchStreamSpec pins both).
  *
  * This is the 100 TB shape for "frequency stats over an unbounded
  * stream": the state is depth × width cells forever, the per-batch
  * cost is one map-side aggregation of the batch, and history is never
  * reprocessed. Point estimates serve from the stored cells
  * ([[estimatesFromState]]) for any queried token set — the standard
  * CMS serving mode (the sketch cannot enumerate tokens, only answer
  * them).
  */
object SketchStream {

  private val keys = Seq("h", "bucket")
  private val measures = Seq("cnt")

  /** Start the maintainer over a streaming document frame. */
  def maintainSketch(
      docs: DataFrame,
      statePath: String,
      textCol: String = "text",
      depth: Int = 4,
      width: Int = 256,
      checkpoint: Option[String] = None): StreamingQuery = {
    val writer = docs.writeStream.outputMode("append")
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        foldBatch(batch.toDF(), batchId, statePath, textCol, depth, width)
      }
    checkpoint.fold(writer)(writer.option("checkpointLocation", _)).start()
  }

  /** One fold step (factored out for replay/crash tests): the batch's
    * own sketch merges cell-wise into the stored one.
    */
  private[streaming] def foldBatch(batch: DataFrame, batchId: Long,
      statePath: String, textCol: String, depth: Int, width: Int): Unit =
    RollupStream.foldBatch(batch, batchId, statePath,
      b => CountMin.sketch(CountMin.tokens(b, textCol), depth, width),
      keys, measures)

  /** Point estimates for `tokens` (single string column `tok`) against
    * the stored sketch — min over the token's depth cells, exactly
    * [[CountMin.estimates]] over state instead of a freshly built
    * sketch.
    */
  def estimatesFromState(spark: SparkSession, statePath: String,
      tokens: DataFrame, depth: Int, width: Int): DataFrame = {
    val sk = spark.read.parquet(statePath).drop(RollupStream.batchCol)
    CountMin.estimates(sk, tokens, depth, width)
  }
}
