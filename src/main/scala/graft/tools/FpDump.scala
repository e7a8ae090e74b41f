package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: write one catalog query's NORMALIZED physical-plan text
  * (exactly what [[graft.PlanFingerprint]] hashes) for each of three
  * consecutive constructions in one session — `diff` the outputs to
  * localize a fingerprint flap to its text (round-14 found the
  * truncated-INSET class this way).
  */
object FpDump {
  def main(args: Array[String]): Unit = {
    val name = args(0); val out = args(1)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      // untruncated scan metadata: required for stable plan
      // fingerprints (see PlanFingerprint.of — the 100-char cut moves
      // with the JVM-global exprId width)
      .config("spark.sql.maxMetadataStringLength", "100000")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    (1 to 3).foreach { i =>
      spark.sharedState.cacheManager.clearCache()
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      val norm = graft.PlanFingerprint.normalize(
        df.queryExecution.executedPlan.toString)
      java.nio.file.Files.write(java.nio.file.Paths.get(s"$out.$i"),
        norm.getBytes("UTF-8"))
      df.count()
    }
    spark.stop()
  }
}
