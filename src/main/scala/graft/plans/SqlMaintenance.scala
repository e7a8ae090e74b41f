package graft.plans

import graft.sources.{Partitioning, Snapshots}
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedProcedure
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{Call, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand

/** SQL surface for the snapshot tier's MAINTENANCE operations — the
  * Iceberg-procedure-shaped `CALL` statements a table operator runs
  * from plain SQL, with no graft imports:
  *
  * {{{
  *   CALL graft_compact('/path/to/t')            -- compactVersion
  *   CALL graft_compact('/path/to/t', 1048576)   --   (target bytes)
  *   CALL graft_compact(path => '/t',
  *                      where => 'k < 100')      -- compactWhere: rewrite
  *                                               -- only envelope-matching
  *                                               -- files, carry the rest
  *   CALL graft_compact_mor('/path/to/t')        -- fold MOR tombstones
  *   CALL graft_rewrite_layout('/path/to/t')     -- restore partition layout
  *   CALL graft_vacuum('/path/to/t', 3)          -- reclaim old versions
  *   CALL graft_remove_orphans('/path/to/t', 0)  -- unreferenced files
  *   CALL graft_build_segment_index('/path/to/t')
  * }}}
  *
  * Spark 4 parses `CALL` into a [[Call]] over an [[UnresolvedProcedure]];
  * [[GraftCallRule]] (Hints batch — it must beat procedure resolution,
  * which would refuse against the v1 session catalog) rewrites a
  * graft-named procedure into a [[GraftMaintainCommand]], a
  * `LeafRunnableCommand` that performs the operation when the statement
  * EXECUTES — so `EXPLAIN CALL graft_compact(...)` plans and displays
  * the command without touching the table. Each call returns one
  * `(op, result)` row: the new-version/file-count style summary the
  * underlying API returns, so scripts can assert on it.
  */
object SqlMaintenance {

  /** op name (lower case) → (argument doc, runner(spark, path, optional
    * numeric second argument) → result). Every op takes the table PATH
    * first; the optional second argument is the op's single tunable.
    */
  private[plans] val ops: Map[String, (String, (SparkSession, String,
      Option[Long]) => Long)] = Map(
    "graft_compact" -> (("(path [, target_bytes])",
      (s, t, n) => Snapshots.compactVersion(s, t,
        n.getOrElse(128L << 20)).toLong)),
    "graft_compact_mor" -> (("(path [, target_bytes])",
      (s, t, n) => Snapshots.compactMor(s, t,
        n.getOrElse(128L << 20)).toLong)),
    "graft_rewrite_layout" -> (("(path)",
      (s, t, n) => {
        require(n.isEmpty, "graft_rewrite_layout takes only the path")
        Partitioning.rewriteLayout(s, t).toLong
      })),
    // the SQL surface REQUIRES keep_last: the API default (1 = reclaim
    // every non-latest unpinned version) is the most destructive
    // setting, too sharp for a no-argument statement an operator can
    // fire by accident
    "graft_vacuum" -> (("(path, keep_last)",
      (s, t, n) => Snapshots.vacuum(s, t,
        n.getOrElse(throw new IllegalArgumentException(
          "CALL graft_vacuum(path, keep_last): keep_last is required " +
            "on the SQL surface — the API default (1) reclaims every " +
            "non-latest version")).toInt).size.toLong)),
    "graft_remove_orphans" -> (("(path [, older_than_ms])",
      (s, t, n) => Snapshots.removeOrphans(s, t,
        n.getOrElse(3600L * 1000)).size.toLong)),
    "graft_build_segment_index" -> (("(path [, seg_size])",
      (s, t, n) => Snapshots.buildSegmentIndex(s, t,
        segSize = n.getOrElse(128L).toInt).toLong)))

  private def evalLiteral(fn: String, e: Expression): Any = {
    require(e.foldable, s"$fn: arguments must be literals, got $e")
    e.eval() match {
      case s: org.apache.spark.unsafe.types.UTF8String => s.toString
      case other => other
    }
  }

  private[plans] def command(name: String, args0: Seq[Expression])
      : GraftMaintainCommand = {
    import org.apache.spark.sql.catalyst.expressions.NamedArgumentExpression
    val (doc, _) = ops(name)
    // named arguments (`CALL graft_compact(path => '/t')`) normalize to
    // the positional order: `path` first, then the op's single tunable
    // (any name — target_bytes/keep_last/... — maps to position 2).
    // graft_compact additionally takes `where => '<predicate>'` — the
    // predicate-scoped OPTIMIZE shape — as a NAMED argument only
    val named = args0.collect {
      case NamedArgumentExpression(n, v) => (n.toLowerCase, v) }
    val (whereArg, rest0) = named.partition(_._1 == "where")
    require(whereArg.isEmpty || name == "graft_compact",
      s"CALL $name$doc: `where` is only supported by graft_compact")
    val where = whereArg.headOption.map(w =>
      evalLiteral(name, w._2).toString)
    val args =
      if (named.isEmpty) args0
      else {
        require(named.size == args0.size,
          s"CALL $name$doc: mix of named and positional arguments")
        val (paths, rest) = rest0.partition(_._1 == "path")
        require(paths.size == 1 && rest.size <= 1,
          s"CALL $name$doc: expected `path` plus at most one tunable, " +
            s"got ${named.map(_._1).mkString(", ")}")
        paths.map(_._2) ++ rest.map(_._2)
      }
    require(args.nonEmpty && args.size <= 2, s"CALL $name$doc")
    val path = evalLiteral(name, args.head).toString
    val num = args.lift(1).map(e => evalLiteral(name, e) match {
      // integral only: 1.9 silently becoming keep_last=1 (or 0.5 →
      // target_bytes=0) is exactly the truncation surprise to refuse
      case n @ (_: java.lang.Long | _: java.lang.Integer |
                _: java.lang.Short | _: java.lang.Byte) =>
        n.asInstanceOf[java.lang.Number].longValue()
      case d: java.math.BigDecimal if d.stripTrailingZeros.scale <= 0 =>
        d.longValueExact()
      case d: org.apache.spark.sql.types.Decimal if d.toBigDecimal.isWhole =>
        d.toLong
      case other => throw new IllegalArgumentException(
        s"CALL $name$doc: second argument must be an integral number, " +
          s"got $other")
    })
    GraftMaintainCommand(name, path, num, where)
  }
}

/** One maintenance call, run at statement EXECUTION (never at plan /
  * EXPLAIN time). Returns one `(op, result)` row.
  */
final case class GraftMaintainCommand(op: String, table: String,
    num: Option[Long], where: Option[String] = None)
    extends LeafRunnableCommand {
  override val output: Seq[Attribute] = Seq(
    AttributeReference("op", org.apache.spark.sql.types.StringType,
      nullable = false)(),
    AttributeReference("result", org.apache.spark.sql.types.LongType,
      nullable = false)())
  override def run(spark: SparkSession): Seq[Row] = {
    val result = where match {
      case Some(pred) =>
        // predicate-scoped compaction: rewrite only the files whose
        // envelope may intersect the predicate; result = new version
        Snapshots.compactWhere(spark, table,
          org.apache.spark.sql.functions.expr(pred),
          num.getOrElse(128L << 20)).version.toLong
      case None =>
        val (_, runner) = SqlMaintenance.ops(op)
        runner(spark, table, num)
    }
    Seq(Row(op, result))
  }
}

/** Hints-batch rule: `CALL graft_*(...)` → [[GraftMaintainCommand]].
  * Non-graft procedures pass through to Spark's own resolution.
  */
final class GraftCallRule(session: SparkSession) extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperators {
      case Call(UnresolvedProcedure(Seq(name)), args, _)
          if SqlMaintenance.ops.contains(name.toLowerCase) =>
        SqlMaintenance.command(name.toLowerCase, args)
    }
}
