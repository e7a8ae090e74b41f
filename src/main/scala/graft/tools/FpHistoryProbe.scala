package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: localize SESSION-HISTORY-dependent fingerprint drift — the
  * class where a query's normalized plan text changes depending on what
  * ran before it in the same session. Usage:
  *
  *   runMain graft.tools.FpHistoryProbe <target> <out> [pre1,pre2,...]
  *
  * Writes the target's normalized plan (what [[graft.PlanFingerprint]]
  * hashes) to `<out>` after first CONSTRUCTING AND RUNNING the `pre`
  * queries — diff two outputs with different prefixes to see exactly
  * which token the history leaks into.
  */
object FpHistoryProbe {
  def main(args: Array[String]): Unit = {
    val target = args(0); val out = args(1)
    val pre = args.lift(2).map(_.split(",").toSeq).getOrElse(Nil)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      // untruncated scan metadata: required for stable plan
      // fingerprints (see PlanFingerprint.of — the 100-char cut moves
      // with the JVM-global exprId width)
      .config("spark.sql.maxMetadataStringLength", "100000")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    pre.foreach { p =>
      spark.sharedState.cacheManager.clearCache()
      graft.SparkEntry.queries(p)(spark, sfDir).count()
    }
    spark.sharedState.cacheManager.clearCache()
    val df = graft.SparkEntry.queries(target)(spark, sfDir)
    val norm = graft.PlanFingerprint.normalize(
      df.queryExecution.executedPlan.toString)
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      norm.getBytes("UTF-8"))
    println(s"[probe] $target after ${pre.size} pre-queries -> $out " +
      s"fp=${graft.PlanFingerprint.of(df).take(8)}")
    spark.stop()
  }
}
