package graft.tools

import org.apache.spark.sql.SparkSession

/** Write `.explain("formatted")` output for named catalog queries to
  * files — the round's plan-evidence artifact
  * (`plans/r<N>/<query>_<suffix>.txt`). Usage:
  *
  *   runMain graft.tools.ExplainDump <outDir> <suffix> <q_a> <q_b> ...
  *
  * Dumps the STATICALLY planned tree (same stage [[graft.PlanFingerprint]]
  * hashes), at the bench's session shape (local[$SPARK_GRAFT_CPUS],
  * shuffle partitions = cpus, AQE on) over `$SPARK_GRAFT_SF_DIR`.
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: ExplainDump <outDir> <suffix> <q>...")
    val outDir = java.nio.file.Paths.get(args(0))
    val suffix = args(1)
    val names = args.drop(2)
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
    java.nio.file.Files.createDirectories(outDir)
    for (n <- names) {
      val df = graft.SparkEntry.queries(n)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val exchanges = "Exchange".r.findAllIn(plan).length
      val header = s"== $n ($suffix) sf=$sfDir cpus=$cpus exchanges=$exchanges ==\n"
      java.nio.file.Files.write(outDir.resolve(s"${n}_$suffix.txt"),
        (header + plan).getBytes("UTF-8"))
      println(s"[explain] $n -> ${outDir.resolve(s"${n}_$suffix.txt")} (exchanges=$exchanges)")
    }
    spark.stop()
  }
}
