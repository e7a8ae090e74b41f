package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.SparkSession

/** Parquet footer metadata reads — index-sizing inputs that must NOT cost
  * a Spark job. A `df.count()` at plan-build time launches an eager scan
  * job per dataset; the footer already carries the exact row count, so
  * sizing decisions (ANN plane width, bucket counts) read it driver-side
  * in milliseconds. Works through the Hadoop FileSystem API, so the same
  * code paths serve local files and a distributed store.
  */
object ParquetMeta {

  /** All `.parquet` files under `path` (or `path` itself when it is a
    * file), listed RECURSIVELY: a partitioned table keeps its files under
    * key=value subdirectories — a top-level-only listing would silently
    * return nothing and downstream consumers (row-count sizing, row-group
    * pruning audits) would see an empty table with no signal. Shared by
    * every footer reader here so none can regress to top-level-only.
    */
  private def parquetFiles(fs: org.apache.hadoop.fs.FileSystem, p: Path)
      : Seq[org.apache.hadoop.fs.FileStatus] = {
    val status = fs.getFileStatus(p)
    if (status.isDirectory) {
      val it = fs.listFiles(p, true)
      val buf = scala.collection.mutable.ArrayBuffer
        .empty[org.apache.hadoop.fs.FileStatus]
      while (it.hasNext) {
        val s = it.next()
        if (s.getPath.getName.endsWith(".parquet")) buf += s
      }
      buf.toSeq
    } else Seq(status)
  }

  /** Exact total row count of a parquet file or directory-of-files, from
    * footers only (sums per-row-group counts; parquet footers are exact,
    * not estimates). No Spark job is launched — asserted by
    * SimilaritySpec's listener test.
    */
  def rowCount(spark: SparkSession, path: String): Long = {
    val conf = spark.sessionState.newHadoopConf()
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    parquetFiles(fs, p).map { s =>
      val r = ParquetFileReader.open(HadoopInputFile.fromStatus(s, conf))
      try r.getRecordCount finally r.close()
    }.sum
  }

  /** Per-row-group [min, max] ranges of integral columns, from footers
    * only (again no Spark job). This is exactly the information a scan's
    * row-group skipping consults — reading it back lets a layout decision
    * (sort key, Z-order clustering) be VERIFIED against the statistics a
    * predicate would actually prune on, instead of trusted.
    */
  def rowGroupRanges(spark: SparkSession, path: String, cols: Seq[String])
      : Seq[Map[String, (Long, Long)]] = {
    val conf = spark.sessionState.newHadoopConf()
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    parquetFiles(fs, p).flatMap { s =>
      val r = ParquetFileReader.open(HadoopInputFile.fromStatus(s, conf))
      try {
        import scala.jdk.CollectionConverters._
        r.getFooter.getBlocks.asScala.toSeq.map { block =>
          block.getColumns.asScala
            .filter(c => cols.contains(c.getPath.toDotString))
            .map { c =>
              val st = c.getStatistics
              def asLong(v: Any): Long = v match {
                case i: java.lang.Integer => i.longValue()
                case l: java.lang.Long => l.longValue()
                case other => sys.error(
                  s"rowGroupRanges: non-integral stats ${other.getClass}")
              }
              c.getPath.toDotString ->
                (asLong(st.genericGetMin), asLong(st.genericGetMax))
            }.toMap
        }
      } finally r.close()
    }
  }

  /** Row count + FILE-level [min, max] of integral columns for one
    * parquet file, from its footer only (row-group ranges folded to a
    * single per-file envelope). This is the granule a manifest-based
    * table ([[Snapshots]]) records per data file so a reader can skip
    * whole files driver-side — the Iceberg/Delta data-skipping shape.
    * Columns with absent/empty statistics are omitted from the map, so
    * a file with unknown ranges is never wrongly skipped.
    */
  def fileStats(conf: org.apache.hadoop.conf.Configuration,
      status: org.apache.hadoop.fs.FileStatus, cols: Seq[String])
      : (Long, Map[String, (Long, Long)]) = {
    val r = ParquetFileReader.open(HadoopInputFile.fromStatus(status, conf))
    try {
      import scala.jdk.CollectionConverters._
      def asLong(v: Any): Long = v match {
        case i: java.lang.Integer => i.longValue()
        case l: java.lang.Long => l.longValue()
        case other => sys.error(s"fileStats: non-integral stats ${other.getClass}")
      }
      val perGroup = r.getFooter.getBlocks.asScala.toSeq.flatMap { block =>
        block.getColumns.asScala
          .filter(c => cols.contains(c.getPath.toDotString))
          .flatMap { c =>
            Option(c.getStatistics).filterNot(_.isEmpty).map { st =>
              c.getPath.toDotString ->
                (asLong(st.genericGetMin), asLong(st.genericGetMax))
            }
          }
      }
      // a column must have stats in EVERY row group to get a file envelope
      val nGroups = r.getFooter.getBlocks.size()
      val ranges = perGroup.groupBy(_._1).collect {
        case (col, vs) if vs.size == nGroups =>
          col -> (vs.map(_._2._1).min, vs.map(_._2._2).max)
      }.toMap
      (r.getRecordCount, ranges)
    } finally r.close()
  }
}
