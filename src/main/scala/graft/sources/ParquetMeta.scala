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
  /** Byte-wise unsigned UTF-8 comparison — the order Spark's UTF8String,
    * DuckDB, and parquet's UTF8 statistics all use. Java's
    * `String.compareTo` (UTF-16 code units) disagrees above the BMP, so
    * envelope folding and pruning must NOT use it.
    */
  private[graft] def u8Less(a: String, b: String): Boolean = {
    val x = a.getBytes("UTF-8"); val y = b.getBytes("UTF-8")
    var i = 0
    val n = math.min(x.length, y.length)
    while (i < n) {
      val c = (x(i) & 0xff) - (y(i) & 0xff)
      if (c != 0) return c < 0
      i += 1
    }
    x.length < y.length
  }

  /** File-level [min, max] of STRING (UTF8 binary) columns from the
    * footer — the text twin of [[fileStats]]. A column must carry stats
    * in every row group to get an envelope (absent → omitted, never
    * wrongly skipped); per-group envelopes fold under byte-wise UTF-8
    * order ([[u8Less]]), matching the order engines compare strings
    * with, and any writer-side stat truncation only widens envelopes, so
    * pruning stays sound.
    */
  def fileStrStats(conf: org.apache.hadoop.conf.Configuration,
      status: org.apache.hadoop.fs.FileStatus, cols: Seq[String])
      : Map[String, (String, String)] = {
    if (cols.isEmpty) return Map.empty
    val r = ParquetFileReader.open(HadoopInputFile.fromStatus(status, conf))
    try {
      import scala.jdk.CollectionConverters._
      def asStr(v: Any): Option[String] = v match {
        case b: org.apache.parquet.io.api.Binary =>
          Some(new String(b.getBytes, "UTF-8"))
        case _ => None
      }
      val perGroup = r.getFooter.getBlocks.asScala.toSeq.flatMap { block =>
        block.getColumns.asScala
          .filter(c => cols.contains(c.getPath.toDotString))
          .flatMap { c =>
            Option(c.getStatistics).filterNot(_.isEmpty).flatMap { st =>
              for {
                mn <- asStr(st.genericGetMin)
                mx <- asStr(st.genericGetMax)
              } yield c.getPath.toDotString -> (mn, mx)
            }
          }
      }
      val nGroups = r.getFooter.getBlocks.size()
      perGroup.groupBy(_._1).collect {
        case (col, vs) if vs.size == nGroups =>
          col -> (vs.map(_._2._1).reduce((a, b) => if (u8Less(a, b)) a else b),
            vs.map(_._2._2).reduce((a, b) => if (u8Less(a, b)) b else a))
      }.toMap
    } finally r.close()
  }

  def fileStats(conf: org.apache.hadoop.conf.Configuration,
      status: org.apache.hadoop.fs.FileStatus, cols: Seq[String])
      : (Long, Map[String, (Long, Long)]) = {
    val r = ParquetFileReader.open(HadoopInputFile.fromStatus(status, conf))
    try {
      import scala.jdk.CollectionConverters._
      import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
      def asLong(v: Any): Long = v match {
        case i: java.lang.Integer => i.longValue()
        case l: java.lang.Long => l.longValue()
        case other => sys.error(s"fileStats: non-integral stats ${other.getClass}")
      }
      // INT32/INT64 physical columns only: this is what makes the long
      // envelope tier cover DATE (INT32 epoch-day) and TIMESTAMP_MICROS
      // (INT64 epoch-micros) columns for free — both are stored in
      // exactly the ordered integral domain Catalyst compares their
      // literals in — while an INT96 legacy timestamp (Binary stats,
      // deprecated and unordered) or any other physical type records no
      // envelope instead of failing the commit
      def integralPhysical(
          c: org.apache.parquet.column.statistics.Statistics[_]): Boolean =
        c.`type`().getPrimitiveTypeName match {
          case PrimitiveTypeName.INT32 | PrimitiveTypeName.INT64 => true
          case _ => false
        }
      val perGroup = r.getFooter.getBlocks.asScala.toSeq.flatMap { block =>
        block.getColumns.asScala
          .filter(c => cols.contains(c.getPath.toDotString))
          .flatMap { c =>
            Option(c.getStatistics).filterNot(_.isEmpty)
              .filter(integralPhysical).map { st =>
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
