package graft.plans

import graft.sources.{Branches, Partitioning, Snapshots}
import org.apache.spark.sql.{GraftBridge, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** SQL TABLE-VALUED metadata functions over graft tables — the Iceberg
  * `db.table.history` / Delta `DESCRIBE HISTORY` inspection surface,
  * expressed through Spark's own table-function registry so plain SQL
  * can introspect a table with zero graft imports:
  *
  * {{{
  *   SELECT version, n_rows FROM graft_history('/path/to/t')
  *   SELECT partition, n_rows FROM graft_partitions('/path/to/t')
  *   SELECT path, rows, seq   FROM graft_files('/path/to/t')
  *   SELECT name, version     FROM graft_tags('/path/to/t')
  * }}}
  *
  * Every function answers from MANIFEST METADATA ONLY (versions, file
  * entries, refs — no data file is opened), resolved at PLAN time into
  * a local relation, so the calls cost milliseconds at any table size
  * and compose with the rest of the query (joins, filters,
  * aggregates). `graft_files` takes an optional second argument to
  * list a historical version's files. Registered alongside the DML
  * rules by [[SqlDml.enable]] / `GraftExtensions`-style injection.
  */
object MetaTables {

  /** (name, plan-builder) for every metadata function. */
  val functions: Seq[(String, Seq[Expression] => LogicalPlan)] = {
    def tvf(name: String)(build: (SparkSession, Seq[Expression]) => LogicalPlan)
        : (String, Seq[Expression] => LogicalPlan) =
      name -> { (args: Seq[Expression]) =>
        val spark = SparkSession.getActiveSession.getOrElse(
          throw new IllegalStateException(s"$name: no active session"))
        build(spark, args)
      }
    Seq(
    tvf("graft_history") { (spark, args) =>
      plan(Snapshots.history(spark, pathArg("graft_history", args, 1)))
    },
    tvf("graft_partitions") { (spark, args) =>
      plan(Partitioning.partitions(spark,
        pathArg("graft_partitions", args, 1)))
    },
    tvf("graft_tags") { (spark, args) =>
      val table = pathArg("graft_tags", args, 1)
      val spark2 = spark
      import spark2.implicits._
      plan(Branches.tags(spark, table).toDF("name", "version"))
    },
    tvf("graft_files") { (spark, args) =>
      val table = pathArg("graft_files", args, maxArgs = 2)
      val v = args.lift(1).map(e => evalLiteral("graft_files", e).toString
        .toInt).getOrElse(Snapshots.latestVersion(spark, table))
      val spark2 = spark
      import spark2.implicits._
      plan(Snapshots.manifest(spark, table, v).map { e =>
        (e.path, e.rows, e.seq,
          e.stats.keys.toSeq.sorted.mkString(","),
          e.blooms.keys.toSeq.sorted.mkString(","),
          e.strStats.keys.toSeq.sorted.mkString(","))
      }.toDF("path", "rows", "seq", "stats_cols", "bloom_cols",
        "str_stats_cols"))
    },
    // the one non-metadata function: the CHANGE DATA FEED as a relation
    // (Delta's table_changes) — row-level insert/delete deltas between
    // two versions, derived manifest-delta-scaled by Snapshots.changes
    tvf("graft_changes") { (spark, args) =>
      require(args.size == 3,
        "graft_changes(path, fromVersion, toVersion)")
      val table = evalLiteral("graft_changes", args(0)).toString
      def num(i: Int) = evalLiteral("graft_changes", args(i)) match {
        case n: java.lang.Number => n.intValue()
        case other => throw new IllegalArgumentException(
          s"graft_changes: version arguments must be integers, got $other")
      }
      plan(Snapshots.changes(spark, table, num(1), num(2)))
    })
  }

  /** Config-time registration (extensions on a fresh session). */
  def install(ext: SparkSessionExtensions): Unit =
    functions.foreach { case (name, builder) =>
      ext.injectTableFunction((FunctionIdentifier(name),
        new ExpressionInfo(MetaTables.getClass.getName, name), builder))
    }

  /** Runtime registration — cloned session states copy the parent's
    * registries instead of re-applying extensions, so the sibling path
    * registers directly.
    */
  def registerRuntime(spark: SparkSession): Unit =
    functions.foreach { case (name, builder) =>
      GraftBridge.registerTableFunction(spark, name, builder)
    }

  private def plan(df: org.apache.spark.sql.DataFrame): LogicalPlan =
    GraftBridge.analyzed(df)

  private def evalLiteral(fn: String, e: Expression): Any = {
    require(e.foldable, s"$fn: arguments must be literals, got $e")
    e.eval() match {
      case s: org.apache.spark.unsafe.types.UTF8String => s.toString
      case other => other
    }
  }

  private def pathArg(fn: String, args: Seq[Expression],
      maxArgs: Int): String = {
    require(args.nonEmpty && args.size <= maxArgs,
      s"$fn: expected 1${if (maxArgs > 1) s"..$maxArgs" else ""} " +
        s"argument(s), got ${args.size}")
    evalLiteral(fn, args.head).toString
  }
}
