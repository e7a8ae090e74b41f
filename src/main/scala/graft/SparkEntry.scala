package graft

import graft.analytics.{CoreQueries, EventQueries, ExtendedQueries, MiningQueries, NorthStarQueries, PipelineQueries, Q, Scd2Queries, SnapshotQueries}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The full operator catalog lives in `graft.analytics.*`; each entry is a
  * [[graft.analytics.Q]] pairing the Spark query with its DuckDB oracle
  * SQL (where ANSI-expressible; approx/hash-specific ops get the driver's
  * rows-only check).
  */
object SparkEntry {

  val catalog: Seq[Q] =
    CoreQueries.all ++ Scd2Queries.all ++ EventQueries.all ++
      NorthStarQueries.all ++ ExtendedQueries.all ++ PipelineQueries.all ++
      SnapshotQueries.all ++ MiningQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    CoreQueries.starMonthlySegment.run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    catalog.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted entries → driver rows-only check.
    */
  def oracleSql: Map[String, String] =
    catalog.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
