package graft.streaming

import graft.operators.Similarity
import graft.sources.Snapshots
import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming ANN-index maintenance: every micro-batch of new embeddings
  * is appended to a stored IVF-PQ index
  * ([[graft.operators.Similarity.appendToPqIndex]] — encoded against the
  * index's frozen centroids/codebooks, no retraining), so the index
  * serves queries over everything ingested so far while each batch costs
  * only its own encoding. The replay marker rides a [[Snapshots]]-style
  * manifest property file next to the index, keeping the skip decision
  * crash-consistent with the appended codes the same way
  * [[SnapshotStream]]'s marker rides its manifests.
  *
  * Parquet append is not atomic with the marker here (two events), so
  * the marker is written FIRST: a crash between marker and append can
  * lose one batch's codes but can never double-append them — for an ANN
  * index, missing-until-backfill is recoverable (re-encode the batch);
  * double-encoded vectors would silently corrupt every probe's top-k.
  * PqIndexStreamSpec pins replay-skip and stream ≡ batch equivalence.
  */
object PqIndexStream {

  val batchProp = "appliedBatch"

  /** Start the maintainer over an index previously created by
    * [[Similarity.writePqIndex]] at `indexPath`.
    */
  def maintainIndex(
      stream: DataFrame,
      indexPath: String,
      checkpoint: Option[String] = None): StreamingQuery = {
    val writer = stream.writeStream.outputMode("append")
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        appendBatch(batch.toDF(), batchId, indexPath)
      }
    checkpoint.fold(writer)(writer.option("checkpointLocation", _)).start()
  }

  /** One append step, factored out for replay/crash tests. */
  private[streaming] def appendBatch(batch: DataFrame, batchId: Long,
      indexPath: String): Unit = {
    if (batch.isEmpty) return
    val spark = batch.sparkSession
    val markerTable = s"$indexPath/_ingest"
    val latest = Snapshots.latestVersion(spark, markerTable)
    val applied =
      if (latest == 0) None
      else Snapshots.properties(spark, markerTable, latest)
        .get(batchProp).map(_.toLong)
    if (applied.exists(_ >= batchId)) return // at-least-once replay
    // marker first: a crash after it loses the batch (backfillable) but
    // can never double-append codes
    Snapshots.commit(batch.sparkSession.range(1).toDF("one"), markerTable,
      overwrite = true, properties = Map(batchProp -> batchId.toString))
    Similarity.appendToPqIndex(spark, indexPath, batch)
  }
}
