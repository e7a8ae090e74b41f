package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump the formatted plan of one catalog query (round-12 scratch). */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q_corpus_prep_full")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
        jobs.incrementAndGet()
    })
    if (args.contains("--run")) {
      (1 to 3).foreach { i =>
        spark.sharedState.cacheManager.clearCache()
        Thread.sleep(300); jobs.set(0)
        val t0 = System.nanoTime()
        val n = graft.SparkEntry.queries(name)(spark, sfDir).count()
        val secs = (System.nanoTime() - t0) / 1e9
        Thread.sleep(300)
        println(f"[run] $name%-26s iter$i n=$n%-8d $secs%.2f s jobs=${jobs.get}")
      }
    } else {
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.executedPlan.toString
      println("[plan-begin]")
      println(plan.linesIterator.take(400).mkString("\n"))
      println("[plan-end]")
      println("exchanges=" + "Exchange".r.findAllIn(plan).length)
    }
    spark.stop()
  }
}
