package graft.streaming

import graft.sources.Snapshots
import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming ingest into a [[graft.sources.Snapshots]] versioned table:
  * each micro-batch becomes one append commit, so the stream's history IS
  * the table's version history — downstream consumers time-travel to any
  * batch boundary and read inter-batch deltas from only the delta files
  * ([[Snapshots.diffAdded]]), with no separate CDC feed.
  *
  * Exactly-once rides the commit protocol itself: the micro-batch id is
  * written as a manifest property (`appliedBatch`), and the manifest
  * create IS the atomic commit point — so "data visible" and "batch
  * recorded" are one event, not two that a crash could split. A replayed
  * batch (at-least-once foreachBatch) sees its id already at-or-below the
  * latest version's marker and skips. Batch ids are monotone only under a
  * `checkpointLocation`; pass one in any deployment that can restart.
  */
object SnapshotStream {

  val batchProp = "appliedBatch"

  /** Start the ingest: every non-empty micro-batch append-commits into
    * `table`, recording per-file stats for `statsCols`. With `audit`
    * set, each batch goes through write-audit-publish
    * ([[Snapshots.commitAudited]]): a rejected batch publishes NO
    * version — it is dropped from the table (and surfaced through
    * `onRejected`, the dead-letter hook), while later batches land
    * normally. The replay marker advances only on PUBLISHED batches, so
    * an immediately-redelivered rejected id re-audits; once a later
    * batch publishes, the rejected id counts as handled (its capture
    * point is the dead-letter hook, not the table).
    */
  def ingest(
      stream: DataFrame,
      table: String,
      statsCols: Seq[String] = Seq.empty,
      checkpoint: Option[String] = None,
      audit: Option[DataFrame => Option[String]] = None,
      onRejected: (Long, String) => Unit = (_, _) => ()): StreamingQuery = {
    val writer = stream.writeStream.outputMode("append")
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        commitBatch(batch.toDF(), batchId, table, statsCols, audit,
          onRejected)
      }
    checkpoint.fold(writer)(writer.option("checkpointLocation", _)).start()
  }

  /** Streaming UPSERT ingest (CDC tail → serving table): every
    * micro-batch lands as ONE atomic merge-on-read upsert
    * ([[Snapshots.upsertMor]]) — older copies of the batch's keys are
    * tombstoned and the new rows appended in the same commit, so a
    * reader ([[Snapshots.readMor]]) always sees exactly the last write
    * per key at some batch boundary, never a between-states mix. Cost
    * per batch is O(batch) — no data file rewrite, the constant-time
    * streaming-upsert shape; run [[Snapshots.compactMor]] periodically.
    * Replay protection is the same manifest-marker discipline as
    * [[ingest]].
    */
  def ingestUpsert(
      stream: DataFrame,
      table: String,
      keyCol: String,
      statsCols: Seq[String] = Seq.empty,
      checkpoint: Option[String] = None): StreamingQuery = {
    val writer = stream.writeStream.outputMode("update")
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        upsertBatch(batch.toDF(), batchId, table, keyCol, statsCols)
      }
    checkpoint.fold(writer)(writer.option("checkpointLocation", _)).start()
  }

  private[streaming] def upsertBatch(batch: DataFrame, batchId: Long,
      table: String, keyCol: String, statsCols: Seq[String]): Unit = {
    if (batch.isEmpty) return
    val spark = batch.sparkSession
    val applied = Snapshots.versions(spark, table).flatMap(v =>
      Snapshots.properties(spark, table, v).get(batchProp).map(_.toLong))
    if (applied.nonEmpty && applied.max >= batchId) return // replay: done
    Snapshots.upsertMor(spark, table, batch, keyCol, statsCols = statsCols,
      properties = Map(batchProp -> batchId.toString))
  }

  /** One commit step, factored out so replay/crash tests (and manual
    * backfills) can drive it without a streaming query around it.
    */
  private[streaming] def commitBatch(batch: DataFrame, batchId: Long,
      table: String, statsCols: Seq[String],
      audit: Option[DataFrame => Option[String]] = None,
      onRejected: (Long, String) => Unit = (_, _) => ()): Unit = {
    if (batch.isEmpty) return // no version for an empty batch
    val spark = batch.sparkSession
    // scan ALL retained versions for the marker, not just the latest: an
    // interleaved maintenance commit (compaction, rollback) would hide it
    // and a replayed batch would re-ingest
    val applied = Snapshots.versions(spark, table).flatMap(v =>
      Snapshots.properties(spark, table, v).get(batchProp).map(_.toLong))
    if (applied.nonEmpty && applied.max >= batchId) return // replay: done
    val props = Map(batchProp -> batchId.toString)
    audit match {
      case None =>
        Snapshots.commit(batch, table, statsCols = statsCols,
          properties = props)
      case Some(a) =>
        Snapshots.commitAudited(batch, table, a, statsCols = statsCols,
          properties = props) match {
          case Left(reason) => onRejected(batchId, reason)
          case Right(_) => ()
        }
    }
  }
}
