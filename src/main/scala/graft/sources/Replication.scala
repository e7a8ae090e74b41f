package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Incremental table replication driven by the CHANGE DATA FEED — the
  * downstream-consumer half of [[Snapshots.changes]]: keep a target
  * versioned table equal to a source one by applying only the source's
  * row-level deltas, version by version, never rescanning the source.
  * The cross-region mirror / dev-fork-follow / downstream-warehouse-feed
  * shape: at 100 TB the per-sync cost is the changed rows, full stop.
  *
  * Exactly-once: every applied source version is recorded as a manifest
  * property ([[SyncProp]]) ON THE SAME atomic commit that applies it —
  * the SnapshotStream marker discipline — so a crash mid-sync resumes at
  * the first unapplied version and a replayed sync applies nothing.
  * Each version is applied with the write shape that produced it:
  * inserts-only → append commit; deletes-only → [[Snapshots.deleteWhere]]
  * tombstone; both → [[Snapshots.upsertMor]] (the pair nets to the same
  * atomic last-write-per-key); feed-empty versions (compaction) apply
  * nothing. The target must be sync-owned: interleaving foreign commits
  * breaks the mirror invariant (loudly, at the next readMor compare, not
  * silently).
  *
  * `hook(v)` is a deterministic crash seam, called after source version
  * `v` has been applied.
  */
object Replication {

  /** Manifest property on target commits: the source version that
    * commit replicated.
    */
  val SyncProp = "graft.sync.src"

  /** Highest source version already applied to `dst` (0 = none). */
  def syncedVersion(spark: SparkSession, dst: String): Int =
    Snapshots.versions(spark, dst).reverse.iterator
      .flatMap(v => Snapshots.properties(spark, dst, v).get(SyncProp))
      .map(_.toInt)
      .nextOption()
      .getOrElse(0)

  /** Apply every source version newer than the target's sync marker.
    * Returns the source versions applied (possibly empty).
    */
  def sync(spark: SparkSession, src: String, dst: String, keyCol: String,
      hook: Int => Unit = _ => ()): Seq[Int] = {
    val from = syncedVersion(spark, dst)
    val vs = Snapshots.versions(spark, src).filter(_ > from)
    vs.foreach { v =>
      val feed = Snapshots.changes(spark, src, prevOf(spark, src, v), v)
      val ins = feed.filter(col("_change_type") === "insert")
        .drop("_change_type", "_commit_version")
      val delKeys = feed.filter(col("_change_type") === "delete")
        .select(col(keyCol)).distinct()
      val mark = Map(SyncProp -> v.toString)
      val hasIns = !ins.isEmpty
      val hasDel = !delKeys.isEmpty
      if (hasIns && hasDel) {
        // a mixed version replays as ONE atomic upsert, which masks
        // exactly the inserted keys — sound only if the version's
        // deletes are covered by its inserts (what upsertMor produces);
        // a hand-built manifest violating that must fail loudly, not
        // half-apply
        val extra = delKeys.join(ins.select(col(keyCol)).distinct(),
          Seq(keyCol), "left_anti")
        require(extra.isEmpty, s"Replication.sync: source version $v " +
          s"deletes keys it does not re-insert — not replayable as one " +
          "atomic upsert")
        Snapshots.upsertMor(spark, dst, ins, keyCol, properties = mark)
      }
      else if (hasIns)
        Snapshots.commit(ins, dst, statsCols = Seq(keyCol),
          properties = mark)
      else if (hasDel)
        Snapshots.deleteWhere(spark, dst, delKeys, keyCol,
          properties = mark)
      // feed-empty version (e.g. compaction): nothing to commit; the
      // marker stays behind, and re-deriving this version's empty feed
      // on the next sync costs manifest reads only
      hook(v)
    }
    vs
  }

  private def prevOf(spark: SparkSession, src: String, v: Int): Int =
    Snapshots.versions(spark, src).filter(_ < v).lastOption.getOrElse(0)
}
