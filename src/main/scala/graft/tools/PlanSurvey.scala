package graft.tools

import org.apache.spark.sql.SparkSession

/** One-line plan-shape summary for EVERY catalog query: exchange count,
  * scan count, join strategies, whether any subtree is duplicated — the
  * round-18 optimization checklist generator. Output: TSV on stdout
  * (`name  exchanges  bcast  scans  smj  shj  bnlj  cartesian  window1p`).
  *
  *   SPARK_GRAFT_SF_DIR=... runMain graft.tools.PlanSurvey [out.tsv]
  */
object PlanSurvey {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sb = new StringBuilder
    sb.append("name\texchanges\tbcast\tscans\tsmj\tshj\tbnlj\twindow1p\n")
    for ((name, fn) <- graft.SparkEntry.queries.toSeq.sortBy(_._1)) {
      val line = try {
        val df = fn(spark, sfDir)
        val p = df.queryExecution.executedPlan.toString
        def c(pat: String) = pat.r.findAllIn(p).length
        s"$name\t${c("Exchange ")}\t${c("BroadcastExchange")}\t" +
          s"${c("Scan parquet|Scan csv|Scan json")}\t${c("SortMergeJoin")}\t" +
          s"${c("ShuffledHashJoin")}\t${c("BroadcastNestedLoopJoin")}\t" +
          s"${c("Window \\[")}\n"
      } catch { case e: Throwable => s"$name\tERR\t${e.getClass.getSimpleName}\n" }
      sb.append(line)
      print(line)
    }
    args.headOption.foreach { out =>
      java.nio.file.Files.write(java.nio.file.Paths.get(out),
        sb.toString.getBytes("UTF-8"))
    }
    spark.stop()
  }
}
