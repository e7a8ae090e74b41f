package graft.sources

import graft.etl.RetailWarehouse
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Storage-layout maintenance for parquet table directories — the chores
  * a 100 TB lakehouse runs continuously: compacting the small files a
  * streaming ingest (e.g. [[graft.streaming.CdcStream]]) accretes, and
  * overwriting only the partitions an incremental batch touched.
  */
object Maintenance {

  /** File count and total bytes of a table directory (recursive, parquet
    * files only) — driver-side fs metadata, no Spark job.
    */
  def layoutStats(spark: SparkSession, path: String): (Long, Long) = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(p, true)
    var files = 0L
    var bytes = 0L
    while (it.hasNext) {
      val s = it.next()
      if (s.getPath.getName.endsWith(".parquet")) { files += 1; bytes += s.getLen }
    }
    (files, bytes)
  }

  /** Rewrite `path` into ~`targetBytes`-sized files (small-file
    * compaction). The new file count comes from the CURRENT on-disk
    * bytes — fs metadata, no Spark job — and the rewrite republishes
    * through the staged-write-then-swap, so concurrent readers see either
    * the old layout or the new one, never a mix. Returns the file count
    * before compaction (read the stats again for the after-count).
    *
    * Content is preserved row-for-row (q_compact pins it against the
    * DuckDB oracle); only the file layout changes. At scale this is the
    * job that keeps scan task counts proportional to data size instead of
    * to ingest-batch count.
    */
  def compact(spark: SparkSession, path: String,
      targetBytes: Long = 128L << 20): Long = {
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
    val (files, bytes) = layoutStats(spark, path)
    val nOut = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
    val df = spark.read.parquet(path)
    RetailWarehouse.writeSwap(df.repartition(nOut), path)
    files
  }

  /** Overwrite ONLY the partitions present in `df` (dynamic partition
    * overwrite): an incremental batch that carries three dates rewrites
    * three directories and leaves every other partition byte-untouched —
    * vs. the reference's full-table replace every run. Static mode (the
    * Spark default) would silently DROP the untouched partitions, so the
    * mode is forced per-write here rather than trusted to session config.
    */
  def overwritePartitions(df: DataFrame, path: String,
      partitionCols: Seq[String]): Unit = {
    require(partitionCols.nonEmpty, "need at least one partition column")
    df.write
      .option("partitionOverwriteMode", "dynamic")
      .mode("overwrite")
      .partitionBy(partitionCols: _*)
      .parquet(path)
  }
}
