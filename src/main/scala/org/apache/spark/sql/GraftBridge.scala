package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark's `private[sql]` Column↔Expression converters —
  * Spark 4 hid them behind the api/classic split, and extension libraries
  * providing native Catalyst expressions (as this one does for
  * `cosine_similarity`) need exactly this hop. Nothing else in the engine
  * reaches into Spark internals.
  */
object GraftBridge {
  def column(e: Expression): Column =
    classic.ExpressionUtils.column(e)

  def expression(c: Column): Expression =
    classic.ExpressionUtils.expression(c)

  /** Runtime TABLE function registration on a live session — needed on
    * cloned session states, whose registries copy the parent's instead
    * of re-applying extensions.
    */
  def registerTableFunction(spark: SparkSession, name: String,
      builder: Seq[Expression] =>
        org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Unit =
    spark.asInstanceOf[classic.SparkSession].sessionState
      .tableFunctionRegistry
      .createOrReplaceTempFunction(name, builder, "built-in")

  /** Runtime function registration on a live session (the config-time
    * path is `spark.sql.extensions=graft.GraftExtensions`).
    */
  def registerFunction(spark: SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[classic.SparkSession].sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "built-in")

  /** Wrap a custom logical plan as a DataFrame (`Dataset.ofRows` is
    * `private[sql]`) — needed to offer custom operators like the native
    * as-of join through the DataFrame API.
    */
  def dataFrame(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Re-wrap already-materialized internal rows as a standalone batch
    * DataFrame — the streaming-sink pattern: the frame handed to
    * `Sink.addBatch` is bound to the incremental plan and must not be
    * re-planned by the commit path.
    */
  def internalDataFrame(spark: SparkSession,
      rdd: org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow],
      schema: org.apache.spark.sql.types.StructType,
      isStreaming: Boolean = false): DataFrame =
    spark.asInstanceOf[classic.SparkSession]
      .internalCreateDataFrame(rdd, schema, isStreaming)

  /** A SIBLING session: same SparkContext and SharedState (so the same
    * external catalog and cached data), the parent's session state
    * CLONED (temp views and conf carry over), but with `f`'s
    * [[SparkSessionExtensions]] injections applied — the only way to
    * add ANALYZER rules to a live application, since `spark.sql.
    * extensions` is consumed at session build time and
    * `newSession()`/`cloneSession()` reuse the parent's extensions
    * object. The parent session is untouched.
    */
  def siblingSessionWithExtensions(spark: SparkSession,
      f: SparkSessionExtensions => Unit): SparkSession = {
    val cs = spark.asInstanceOf[classic.SparkSession]
    val ext = new SparkSessionExtensions
    f(ext)
    // the 6-arg constructor (context, sharedState, parentSessionState,
    // extensions, options, jobTags) is class-private — exactly what
    // cloneSession() calls, minus the ability to swap extensions; reach
    // it reflectively (same classloader, no module boundary: Spark jars
    // live on the plain classpath)
    val ctor = classOf[classic.SparkSession].getDeclaredConstructors
      .find(_.getParameterCount == 6)
      .getOrElse(throw new IllegalStateException(
        "classic.SparkSession: no 6-arg constructor — Spark version drift"))
    ctor.setAccessible(true)
    ctor.newInstance(cs.sparkContext, Some(cs.sharedState),
      Some(cs.sessionState), ext, Map.empty, Map.empty)
      .asInstanceOf[classic.SparkSession]
  }

  /** The analyzed logical plan of a DataFrame (resolved attributes). */
  def analyzed(df: DataFrame): org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.queryExecution.analyzed

  /** Idempotently add an OPTIMIZER rule to a live session — the shared
    * append discipline for the registration-scoped rule family (MetaAgg,
    * DimFilePrune): `extraOptimizations` is a plain var on the shared
    * session, so the contains-then-append must be atomic or two threads
    * enabling concurrently can lose each other's rule.
    */
  def addOptimization(spark: SparkSession,
      rule: org.apache.spark.sql.catalyst.rules.Rule[
        org.apache.spark.sql.catalyst.plans.logical.LogicalPlan]): Unit = {
    val exp = spark.experimental
    exp.synchronized {
      if (!exp.extraOptimizations.contains(rule))
        exp.extraOptimizations = exp.extraOptimizations :+ rule
    }
  }

  /** Idempotently add a planner strategy to a live session (the
    * config-time path is `GraftExtensions.injectPlannerStrategy`).
    */
  def addStrategy(spark: SparkSession,
      strategy: org.apache.spark.sql.execution.SparkStrategy): Unit = {
    val exp = spark.asInstanceOf[classic.SparkSession].experimental
    // extraStrategies is a plain var on the shared session: the
    // contains-then-append must be atomic or two threads planning
    // concurrently can lose each other's strategy (or double-append).
    exp.synchronized {
      if (!exp.extraStrategies.contains(strategy))
        exp.extraStrategies = exp.extraStrategies :+ strategy
    }
  }
}
