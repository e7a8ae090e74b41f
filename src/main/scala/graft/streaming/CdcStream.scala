package graft.streaming

import graft.etl.RetailWarehouse
import graft.operators.Cdc
import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming CDC apply: maintain a published snapshot table from a change
  * stream. Each micro-batch runs the SAME windowless
  * [[graft.operators.Cdc.applyChanges]] the batch path uses — against the
  * currently-published snapshot — and republishes via staged-write-then-
  * swap, so readers never observe a half-applied batch.
  *
  * Ordering model: `versionCol` totally orders changes WITHIN a
  * micro-batch (the max_by winner); ACROSS batches application order
  * rules. A feed whose versions increase monotonically across batches is
  * therefore exactly equivalent to one batch apply of the whole feed —
  * CdcStreamSpec pins that stream ≡ batch equivalence.
  *
  * Replay safety: re-applying an identical batch is idempotent — U/I set
  * the same values again, D finds the key already absent — so
  * `foreachBatch` at-least-once delivery converges instead of corrupting.
  *
  * Scale: per-batch cost is one aggregation over the batch plus one
  * key-partitioned join against the LIVE snapshot — history never
  * accumulates into the join, which is what makes this the 100 TB
  * replacement for the reference's re-extract-everything refresh cycle.
  */
object CdcStream {

  def maintainSnapshot(
      changes: DataFrame,
      snapshotPath: String,
      keyCol: String,
      versionCol: String = "version",
      opCol: String = "op",
      checkpoint: Option[String] = None): StreamingQuery = {
    val writer = changes.writeStream.outputMode("append")
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        if (!batch.isEmpty) {
          val spark = batch.sparkSession
          // finish any interrupted swap before the exists() probe — a
          // crash mid-swap must not demote this apply to a fresh bootstrap
          RetailWarehouse.recoverSwap(spark, snapshotPath)
          val p = new org.apache.hadoop.fs.Path(snapshotPath)
          val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
          val snapCols = batch.columns
            .filterNot(c => c == opCol || c == versionCol).toSeq
          val snap =
            if (fs.exists(p)) spark.read.parquet(snapshotPath)
            else batch.toDF().select(snapCols.map(col): _*).limit(0)
          val next = Cdc.applyChanges(snap, batch.toDF(), keyCol,
            versionCol, opCol)
          RetailWarehouse.writeSwap(next, snapshotPath)
        }
      }
    checkpoint.fold(writer)(writer.option("checkpointLocation", _)).start()
  }
}
