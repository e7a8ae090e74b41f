package graft.plans

import graft.operators.IncrementalAgg
import graft.sources.Snapshots
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally refreshed materialized views over VERSIONED fact tables
  * — the missing link between [[MaterializedViews]] (transparent rewrite,
  * but full rebuild on every data change) and
  * [[graft.operators.IncrementalAgg]] (delta folding, but no query
  * rewrite): `refresh` folds ONLY the fact versions appended since the
  * last refresh into the stored rollup, then registers the result so the
  * optimizer answers matching aggregates from it. At 100 TB the refresh
  * cost is the day's appended files plus rollup-sized state — the fact
  * history is never rescanned.
  *
  * Freshness is exact, not best-effort: the registration pins the fact
  * VERSION's file set ([[MaterializedViews.MvDef.factFiles]]), so a scan
  * of any other version — time travel, or the latest after a new append
  * but before the next refresh — simply doesn't rewrite and computes
  * from the fact. A stale MV can never answer a fresh query.
  *
  * Non-append commits (overwrite, compaction, copy-on-write merge,
  * merge-on-read tombstones) break delta-additivity; refresh detects
  * them via [[Snapshots.diffAdded]]'s lineage check and falls back to a
  * full rebuild from the current content — correct for every commit
  * shape, incremental for the common append-only one.
  *
  * Layout: `mvRoot/r<factVersion>/` holds the rollup refreshed to that
  * fact version; `mvRoot/_meta` ("<factVersion>\t<dirName>") points at
  * the current one and is swapped via temp-file rename after the rollup
  * dir is complete, so a crash mid-refresh leaves the previous
  * registration consistent.
  */
object SnapshotMv {

  final case class SnapshotMvDef(
      factTable: String,
      mvRoot: String,
      keys: Seq[String],
      countCol: String,
      sums: Seq[MaterializedViews.MvSum])

  private def metaPath(mvRoot: String) = new Path(mvRoot, "_meta")

  private def readMeta(spark: SparkSession, mvRoot: String)
      : Option[(Int, String)] = {
    val p = metaPath(mvRoot)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return None
    val in = fs.open(p)
    val text =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
      finally in.close()
    val Array(v, dir) = text.split("\t", 2)
    Some((v.toInt, dir))
  }

  private def writeMeta(spark: SparkSession, mvRoot: String, v: Int,
      dir: String): Unit = {
    val p = metaPath(mvRoot)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new Path(mvRoot, s"_meta.tmp${System.nanoTime()}")
    val out = fs.create(tmp, true)
    try out.write(s"$v\t$dir".getBytes("UTF-8")) finally out.close()
    if (fs.exists(p)) fs.delete(p, false)
    require(fs.rename(tmp, p), s"SnapshotMv: meta swap failed at $mvRoot")
  }

  private def aggregate(fact: DataFrame, mv: SnapshotMvDef): DataFrame = {
    val aggs = count(lit(1)).as(mv.countCol) +: mv.sums.map { s =>
      val src = s.castTo.fold(col(s.src))(t => col(s.src).cast(t))
      sum(src).as(s.mvCol)
    }
    fact.groupBy(mv.keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Bring the rollup up to the fact's latest version (delta fold when
    * the lineage is append-only, full rebuild otherwise; no-op when
    * already current) and (re-)register it for transparent rewrite.
    * Returns the fact version the MV now represents.
    */
  def refresh(spark: SparkSession, mv: SnapshotMvDef): Int = {
    val latest = Snapshots.latestVersion(spark, mv.factTable)
    require(latest > 0,
      s"SnapshotMv.refresh: ${mv.factTable} has no committed version")
    val measures = mv.countCol +: mv.sums.map(_.mvCol)
    val meta = readMeta(spark, mv.mvRoot)
    val currentDir = meta match {
      case Some((last, dir)) if last == latest => dir // already current
      case prior =>
        val rollup = prior match {
          case Some((last, dir)) =>
            try {
              val delta = Snapshots.diffAdded(spark, mv.factTable, last, latest)
              IncrementalAgg.mergeRollup(
                spark.read.parquet(s"${mv.mvRoot}/$dir"),
                aggregate(delta, mv), mv.keys, measures)
            } catch {
              case _: IllegalArgumentException => // non-append lineage
                aggregate(Snapshots.readMor(spark, mv.factTable), mv)
            }
          case None =>
            aggregate(Snapshots.readMor(spark, mv.factTable), mv)
        }
        val dirName = s"r$latest"
        rollup.write.mode("overwrite").parquet(s"${mv.mvRoot}/$dirName")
        writeMeta(spark, mv.mvRoot, latest, dirName)
        dirName
    }
    val files = Snapshots.manifest(spark, mv.factTable, latest)
      .map { e =>
        val p = e.path
        if (new Path(p).isAbsolute) MaterializedViews.norm(p)
        else MaterializedViews.norm(s"${mv.factTable}/$p")
      }.toSet
    MaterializedViews.register(spark, MaterializedViews.MvDef(
      mv.factTable, s"${mv.mvRoot}/$currentDir", mv.keys,
      Some(mv.countCol), mv.sums, factFiles = Some(files)))
    latest
  }
}
