package graft.plans

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.ExprId
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Column-level lineage, derived from the ANALYZED logical plan — the
  * governance question ("which physical columns feed this report
  * column?") answered from the same tree the optimizer consumes, so it
  * is correct by construction for any DataFrame the engine can run, and
  * costs zero execution (the plan is walked on the driver; no job).
  *
  * Tracks DIRECT (data-flow) lineage: an output column's sources are the
  * scan columns whose VALUES flow into it through
  * projections/aggregates/windows/generates/unions. Filter and join
  * predicates influence which ROWS appear, not which columns' bytes, and
  * are deliberately out of scope (the standard direct/indirect lineage
  * split). Outputs fed by no scan column (literals, `count(*)`) report
  * an empty source.
  */
object Lineage {

  private type SourceMap = Map[ExprId, Set[(String, String)]]

  private def tableName(lr: LogicalRelation): Option[String] =
    lr.relation match {
      case h: HadoopFsRelation => h.location.rootPaths.headOption.map { p =>
        val n = p.getName
        if (n.contains('.')) n.substring(0, n.lastIndexOf('.')) else n
      }
      case _ => None
    }

  private def sources(plan: LogicalPlan): SourceMap = plan match {
    case lr: LogicalRelation =>
      val t = tableName(lr).getOrElse(return Map.empty)
      lr.output.map(a => a.exprId -> Set(t -> a.name)).toMap
    case Project(pl, child) =>
      val m = sources(child)
      m ++ pl.map(ne => ne.toAttribute.exprId ->
        ne.references.toSeq.flatMap(r => m.getOrElse(r.exprId, Set.empty)).toSet)
    case Aggregate(_, aggs, child, _) =>
      val m = sources(child)
      m ++ aggs.map(ne => ne.toAttribute.exprId ->
        ne.references.toSeq.flatMap(r => m.getOrElse(r.exprId, Set.empty)).toSet)
    case w: Window =>
      val m = sources(w.child)
      m ++ w.windowExpressions.map(ne => ne.toAttribute.exprId ->
        ne.references.toSeq.flatMap(r => m.getOrElse(r.exprId, Set.empty)).toSet)
    case g: Generate =>
      val m = sources(g.child)
      val gen = g.generator.references.toSeq
        .flatMap(r => m.getOrElse(r.exprId, Set.empty)).toSet
      m ++ g.generatorOutput.map(_.exprId -> gen)
    case e: Expand =>
      val m = sources(e.child)
      // output(i) unions the refs of every projection's i-th expression
      // (rollup/cube route each grouping set through here)
      e.output.zipWithIndex.map { case (a, i) =>
        a.exprId -> e.projections
          .flatMap(p => p(i).references.toSeq
            .flatMap(r => m.getOrElse(r.exprId, Set.empty))).toSet
      }.toMap ++ m
    case u: Union =>
      val ms = u.children.map(sources)
      val merged = ms.fold(Map.empty: SourceMap)(_ ++ _)
      merged ++ u.output.zipWithIndex.map { case (a, i) =>
        a.exprId -> u.children.zip(ms)
          .flatMap { case (c, m) => m.getOrElse(c.output(i).exprId, Set.empty) }
          .toSet
      }
    case other =>
      // pass-through operators (Filter/Sort/Join/Limit/Distinct/
      // SubqueryAlias/…) expose child attributes unchanged; leaves
      // without a file source (LocalRelation/Range/RDD) contribute none
      other.children.map(sources).fold(Map.empty: SourceMap)(_ ++ _)
  }

  /** (output column, source table, source column) rows for `df`,
    * deterministically sorted; outputs with no scan source get one
    * ("", "") row so every output column is present.
    */
  def columnLineage(df: DataFrame): Seq[(String, String, String)] = {
    val plan = df.queryExecution.analyzed
    val m = sources(plan)
    plan.output.flatMap { a =>
      val srcs = m.getOrElse(a.exprId, Set.empty)
      if (srcs.isEmpty) Seq((a.name, "", ""))
      else srcs.toSeq.sorted.map { case (t, c) => (a.name, t, c) }
    }.sortBy(identity)
  }

  /** [[columnLineage]] as a DataFrame (out_col, src_table, src_col). */
  def lineageDf(spark: SparkSession, df: DataFrame): DataFrame = {
    val rows = columnLineage(df).map { case (o, t, c) => Row(o, t, c) }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      StructType(Seq(StructField("out_col", StringType, nullable = false),
        StructField("src_table", StringType, nullable = false),
        StructField("src_col", StringType, nullable = false))))
  }
}
