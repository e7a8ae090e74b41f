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

  /** Exact total row count of a parquet file or directory-of-files, from
    * footers only (sums per-row-group counts; parquet footers are exact,
    * not estimates). No Spark job is launched — asserted by
    * SimilaritySpec's listener test.
    */
  def rowCount(spark: SparkSession, path: String): Long = {
    val conf = spark.sessionState.newHadoopConf()
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val status = fs.getFileStatus(p)
    val files =
      if (status.isDirectory)
        fs.listStatus(p).filter(s => s.isFile &&
          s.getPath.getName.endsWith(".parquet")).toSeq
      else Seq(status)
    files.map { s =>
      val r = ParquetFileReader.open(HadoopInputFile.fromStatus(s, conf))
      try r.getRecordCount finally r.close()
    }.sum
  }
}
