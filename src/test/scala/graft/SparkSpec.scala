package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One shared local session per suite (lazy, UTC, small shuffle width). */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName(getClass.getSimpleName)
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.warehouse.dir",
      s"${System.getProperty("java.io.tmpdir")}/graft-test-warehouse")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  def sf001 = "/root/testdata/sf0.001"

  /** Physical-plan string for shape assertions. `execute = true` runs the
    * query first so AQE finalizes the plan (broadcast decisions, coalesced
    * shuffles); false returns the initial plan.
    */
  def executedPlan(df: org.apache.spark.sql.DataFrame,
      execute: Boolean = true): String = {
    if (execute) df.collect()
    df.queryExecution.executedPlan.toString
  }
}
