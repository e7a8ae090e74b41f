package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality auditing: evaluate a set of row-level
  * constraints in ONE aggregation pass (map-side partial counts, one
  * scalar row shuffled) and emit a per-check report — the pre-load
  * validation step a warehouse pipeline runs before publishing a batch.
  *
  * Null semantics: a constraint that evaluates to null (e.g. a range
  * check on a null value) counts as a VIOLATION (`IS NOT TRUE`), so null
  * data cannot silently pass a check that never looked at it.
  */
object DataQuality {

  /** K-anonymity suppression: rows whose quasi-identifier combination is
    * suppressed get those columns replaced by `mask` (cast to string
    * either way, so the output schema is uniform) — the release rule a
    * training-data or analytics publication gate applies so no published
    * group is smaller than k.
    *
    * Suppression set: every cell under k — PLUS, whenever any such cell
    * exists, the further smallest cells (deterministic (count, values)
    * order) until the merged "(suppressed)" bucket itself holds ≥ k rows.
    * Without the extension the residual bucket can be smaller than k and
    * leak exactly the small-group fact the gate exists to hide. When the
    * WHOLE input is under k everything is suppressed into one bucket
    * (nothing finer is publishable). The cell ordering is a
    * cell-cardinality-sized sort (a dimension build, not a data one);
    * the data-sized work is one group count + one mask join.
    *
    * The suppression order is an UNPARTITIONED window, i.e. a
    * single-task sort sized by the QUASI-CELL count — correct for
    * release gates, whose publishable dimensions are bounded, but not
    * for near-unique quasi tuples (user ids, timestamps), where the
    * cell inventory approaches the row count. `maxCells` enforces that
    * contract BEFORE the window exists: the cell count is validated
    * driver-side (one scalar aggregation job at call time — this method
    * is eager), so the pathological case fails loudly in the count pass
    * and the single-task sort is never even planned. Coarsen the quasi
    * columns (bucket timestamps, drop identifiers) or raise `maxCells`
    * deliberately.
    */
  def kAnonymize(df: org.apache.spark.sql.DataFrame, quasiCols: Seq[String],
      k: Long, mask: String = "(suppressed)",
      maxCells: Long = 1000000L)
      : org.apache.spark.sql.DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier column")
    require(quasiCols.forall(df.columns.contains),
      s"quasi columns ${quasiCols.filterNot(df.columns.contains).mkString(",")} absent")
    require(k >= 1, s"k must be >= 1, got $k")
    import org.apache.spark.sql.expressions.Window
    val cells = df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("_cnt"))
    // smallest-first, ties broken on the (string-cast) quasi values so
    // the order — and therefore the suppression set — is deterministic
    // and engine-replayable
    // guard FIRST, driver-side: a near-unique quasi tuple makes the
    // cell inventory corpus-sized, and the suppression window below is
    // a single-task sort over it — the executor would OOM in that sort
    // before any in-plan raise_error projection above the window ever
    // evaluated. One scalar-row aggregation (map-side partial counts)
    // establishes the bound before the window is planned at all.
    val stats = cells
      .agg(max(when(col("_cnt") < k, 1).otherwise(0)).as("_any"),
        count(lit(1)).as("_ncells"))
      .collect()(0)
    val nCells = stats.getLong(1)
    require(nCells <= maxCells,
      s"kAnonymize: $nCells quasi-identifier cells exceed " +
        s"maxCells=$maxCells — the suppression order is a single-task " +
        "sort sized by the cell count; coarsen the quasi columns or " +
        "raise maxCells")
    val anyUnder = !stats.isNullAt(0) && stats.getInt(0) == 1
    val ord = Window.orderBy(
      col("_cnt") +: quasiCols.map(c => col(c).cast("string")): _*)
    val cumBefore = coalesce(sum(col("_cnt"))
      .over(ord.rowsBetween(Window.unboundedPreceding, -1)), lit(0L))
    val flagged = cells
      .withColumn("_supp",
        lit(anyUnder) && (col("_cnt") < k || cumBefore < k))
      .select(quasiCols.map(col) :+ col("_supp"): _*)
    df.join(flagged, quasiCols, "left")
      .select(df.columns.toSeq.map { c =>
        if (quasiCols.contains(c))
          when(col("_supp"), lit(mask)).otherwise(col(c).cast("string")).as(c)
        else col(c)
      }: _*)
  }

  /** L-diversity audit — k-anonymity's companion gate: a group that is
    * large enough (k-anonymous) can still leak its members' SENSITIVE
    * attribute if every member shares one value ("all customers in this
    * cell have negative balance"). Per quasi-identifier cell this reports
    * row count, the number of DISTINCT sensitive values, and whether the
    * cell meets diversity `l` — the release check run after suppression.
    *
    * One group-by over (quasi, sensitive) then one over quasi: the
    * distinct count is computed as an exact two-level aggregation
    * (partial-agg friendly, no count_distinct expansion in the wide
    * pass), which is the shape that scales.
    */
  def lDiversity(df: DataFrame, quasiCols: Seq[String],
      sensitiveCol: Column, l: Long): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier column")
    require(l >= 1, s"l must be >= 1, got $l")
    val fine = df.groupBy(quasiCols.map(col) :+ sensitiveCol.as("_sens"): _*)
      .agg(count(lit(1)).as("_n"))
    fine.groupBy(quasiCols.map(col): _*)
      .agg(sum(col("_n")).as("n_rows"),
        count(lit(1)).as("n_sensitive_values"))
      .withColumn("is_diverse", col("n_sensitive_values") >= l)
  }

  final case class Check(name: String, constraint: Column)

  /** One row per check: (check_name, n_violations, n_rows). The single
    * `agg` keeps this one pass over the data however many checks run;
    * the per-check explode happens on the one-row aggregate.
    */
  def audit(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "audit needs at least one check")
    // count(when(...)) not sum(when(...)): sum over ZERO rows is null,
    // which would report null violations on an empty input; count is 0.
    val aggs = count(lit(1)).as("n_rows") +:
      checks.map(c => count(when(!(c.constraint <=> true), lit(1))).as(s"_v_${c.name}"))
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(checks.map(c =>
          struct(lit(c.name).as("check_name"), col(s"_v_${c.name}").as("n_violations"))): _*))
        .as("_c"), col("n_rows"))
      .select(col("_c.check_name"), col("_c.n_violations"), col("n_rows"))
  }

  /** Single-pass per-column profile: null count and exact distinct count
    * for each named column, plus the row count — the discovery step that
    * precedes writing [[audit]] checks.
    *
    * Shape: UNION of per-column two-level aggregates — for each column,
    * a column-pruned scan → groupBy(value) partial counts → one scalar
    * fold — in the caller's declared column ORDER. Deliberately NOT one
    * `agg` with N `count_distinct`s: Spark's RewriteDistinctAggregates
    * plans that as an Expand whose per-column group ids come from
    * hash-map iteration over expression ids — session-history-dependent,
    * so the SAME query fingerprints differently across sessions (the one
    * plan-drift source in 237 baselined queries) — and its Expand
    * duplicates every row once per column with ALL grouping columns
    * carried. Here each branch scans exactly one parquet column (total
    * IO = one scan of the profiled columns), partial aggregation
    * collapses low-cardinality columns map-side, the branches run
    * concurrently, and the plan is order-stable by construction.
    *
    * The "one scan of the profiled columns" claim holds when the input
    * is a (possibly column-pruned) SCAN; any computed input — filters,
    * joins, expressions — would re-execute once per profiled column, so
    * such inputs are persisted (column-pruned) before the fan-out: one
    * upstream execution, N cache reads.
    */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    require(cols.distinct.size == cols.size,
      s"profile columns must be distinct, got duplicates: " +
        cols.diff(cols.distinct).distinct.mkString(", "))
    import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference}
    import org.apache.spark.sql.catalyst.plans.logical.{LeafNode, Project, SubqueryAlias}
    def isScan(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
        : Boolean = p match {
      case _: LeafNode => true
      // prune/rename-only projections keep the scan fast path (an Alias
      // over a bare attribute is still a column-pruned scan)
      case pr: Project if pr.projectList.forall {
            case _: AttributeReference => true
            case a: Alias => a.child.isInstanceOf[AttributeReference]
            case _ => false
          } =>
        isScan(pr.child)
      case a: SubqueryAlias => isScan(a.child)
      case _ => false
    }
    val scan = isScan(df.queryExecution.analyzed)
    // positional aliases on the persisted projection: a dotted path like
    // `meta.lang` extracts to a field NAMED `lang`, so re-selecting the
    // original path off the projection would fail to resolve
    val src =
      if (scan) df
      else df.select(cols.zipWithIndex.map { case (c, i) =>
          col(c).as(s"_pc_$i")
        }: _*)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val union = cols.zipWithIndex.map { case (c, i) =>
      val value = if (scan) col(c) else col(s"_pc_$i")
      // agg over the empty grouped frame still yields one row (sum of
      // nothing coalesced to 0), so an EMPTY input reports one all-zeros
      // row per column — the contract the single-agg form gave for free
      src.select(value.as("_value")).groupBy(col("_value"))
        .agg(count(lit(1)).as("_n"))
        .agg(
          coalesce(sum(when(col("_value").isNull, col("_n"))
            .otherwise(lit(0L))), lit(0L)).as("n_nulls"),
          count(when(col("_value").isNotNull, lit(1))).as("n_distinct"),
          coalesce(sum(col("_n")), lit(0L)).as("n_rows"))
        .select(lit(c).as("column_name"), col("n_nulls"),
          col("n_distinct"), col("n_rows"))
    }.reduce(_.unionByName(_))
    if (scan) union
    else {
      // the persist exists only to share the upstream computation across
      // the per-column fan-out; the result is one tiny row per column, so
      // materialize eagerly and release the cache — a lazily-returned
      // frame would pin the cached input for the session's lifetime, and
      // the release must survive a failing job too (finally), or the
      // failure path leaks the exact pin this block exists to close
      val rows =
        try union.collect().toIndexedSeq
        finally src.unpersist()
      df.sparkSession.createDataFrame(
        df.sparkSession.sparkContext.parallelize(rows, 1), union.schema)
    }
  }

  /** Gate form: fail fast (throw) if any check has violations — the
    * behavior a scheduled load wants instead of silently publishing.
    */
  def enforce(df: DataFrame, checks: Seq[Check]): Unit = {
    val bad = audit(df, checks).filter(col("n_violations") > 0)
      .collect().map(r => s"${r.getString(0)}=${r.getLong(1)}")
    if (bad.nonEmpty)
      throw new IllegalStateException(s"data-quality violations: ${bad.mkString(", ")}")
  }
}
