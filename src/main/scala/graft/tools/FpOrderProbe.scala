package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool for ORDER-dependent fingerprint flaps: dump one query's
  * normalized plan text before and after running a set of other catalog
  * queries in the same session (cache cleared in between, exactly like
  * the bench), so a `diff` localizes what the earlier queries leak into
  * the later plan.
  *
  *   runMain graft.tools.FpOrderProbe <victim> <out> <warmup1> [warmup2 ...]
  */
object FpOrderProbe {
  def main(args: Array[String]): Unit = {
    val victim = args(0); val out = args(1); val warmups = args.drop(2)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.maxMetadataStringLength", "100000")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def dump(tag: String): Unit = {
      spark.sharedState.cacheManager.clearCache()
      val df = graft.SparkEntry.queries(victim)(spark, sfDir)
      val norm = graft.PlanFingerprint.normalize(
        df.queryExecution.executedPlan.toString)
      java.nio.file.Files.write(java.nio.file.Paths.get(s"$out.$tag"),
        norm.getBytes("UTF-8"))
      println(s"[fpop] $victim ($tag) fp=" +
        graft.PlanFingerprint.of(df).take(8))
    }
    dump("cold")
    for (w <- warmups) {
      spark.sharedState.cacheManager.clearCache()
      val df = graft.SparkEntry.queries(w)(spark, sfDir)
      df.write.format("noop").mode("overwrite").save()
      println(s"[fpop] ran $w")
    }
    dump("warm")
    spark.stop()
  }
}
