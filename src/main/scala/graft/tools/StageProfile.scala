package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Empirical per-stage profile for named catalog queries — the local
  * stand-in for the Spark UI's Stages tab (guide §1.1: decide whether
  * time goes to shuffle read/write, compute, or scheduling before
  * touching anything). Runs each query once through the noop sink and
  * prints every stage's wall duration, summed task time, input bytes,
  * and shuffle read/write bytes, slowest first.
  *
  *   SPARK_GRAFT_SF_DIR=... runMain graft.tools.StageProfile <q_a> <q_b> ...
  */
object StageProfile {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: StageProfile <q>...")
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

    final case class St(id: Int, name: String, wallMs: Long, taskMs: Long,
        inMB: Double, srMB: Double, swMB: Double, nTasks: Int)
    val stages = scala.collection.mutable.ArrayBuffer.empty[St]
    val listener = new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        val m = si.taskMetrics
        val wall = (for (a <- si.completionTime; b <- si.submissionTime)
          yield a - b).getOrElse(-1L)
        stages.synchronized {
          stages += St(si.stageId, si.name.takeWhile(_ != '\n').take(90),
            wall, m.executorRunTime,
            m.inputMetrics.bytesRead / 1e6,
            m.shuffleReadMetrics.totalBytesRead / 1e6,
            m.shuffleWriteMetrics.bytesWritten / 1e6, si.numTasks)
        }
      }
      override def onJobStart(e: SparkListenerJobStart): Unit = ()
    }
    spark.sparkContext.addSparkListener(listener)

    for (n <- args) {
      stages.synchronized(stages.clear())
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.setJobDescription(s"profile: $n")
      val t0 = System.nanoTime()
      val df = graft.SparkEntry.queries(n)(spark, sfDir)
      val t1 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val t2 = System.nanoTime()
      Thread.sleep(300) // let the listener bus drain
      println(f"%n=== $n build=${(t1 - t0) / 1e6}%.0fms query=${(t2 - t1) / 1e6}%.0fms stages=${stages.size} ===")
      println(f"${"stage"}%6s ${"wall_ms"}%8s ${"task_ms"}%8s ${"in_MB"}%8s ${"shR_MB"}%8s ${"shW_MB"}%8s ${"tasks"}%6s  name")
      for (s <- stages.synchronized(stages.sortBy(-_.wallMs)).take(25))
        println(f"${s.id}%6d ${s.wallMs}%8d ${s.taskMs}%8d ${s.inMB}%8.1f ${s.srMB}%8.1f ${s.swMB}%8.1f ${s.nTasks}%6d  ${s.name}")
      val totWall = stages.synchronized(stages.map(_.wallMs.max(0)).sum)
      println(f"[profile] $n sum_stage_wall=${totWall}ms n_stages=${stages.size}")
    }
    spark.stop()
  }
}
