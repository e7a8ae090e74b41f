package graft

import graft.functions.{CosineSimilarityExpr, HilbertDExpr, SignBucketExpr, ZValueExpr, ZValueNExpr}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL-surface registration for the engine's native expressions, via the
  * standard `SparkSessionExtensions` hook:
  *
  * {{{
  *   SparkSession.builder()
  *     .config("spark.sql.extensions", "graft.GraftExtensions")
  *     ...
  *   spark.sql("SELECT cosine_similarity(a.embedding, b.embedding) ...")
  * }}}
  *
  * `sign_bucket(vec, k, dim, seed)` builds its hyperplanes from the
  * literal arguments so pure SQL users get the same deterministic planes
  * as the Scala API.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import GraftExtensions._

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("cosine_similarity"),
      new ExpressionInfo(classOf[CosineSimilarityExpr].getName, "cosine_similarity"),
      cosineBuilder))
    ext.injectFunction((
      FunctionIdentifier("sign_bucket"),
      new ExpressionInfo(classOf[SignBucketExpr].getName, "sign_bucket"),
      signBucketBuilder))
    ext.injectFunction((
      FunctionIdentifier("z_value"),
      new ExpressionInfo(classOf[ZValueNExpr].getName, "z_value"),
      zValueBuilder))
    ext.injectFunction((
      FunctionIdentifier("hilbert_d"),
      new ExpressionInfo(classOf[HilbertDExpr].getName, "hilbert_d"),
      hilbertBuilder))
    // Whole-operator extension: plans graft.plans.AsOfJoinNode to its
    // native physical merge (see AsOfJoin.backwardNative for runtime use).
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
  }
}

object GraftExtensions {
  private def lit2long(e: Expression, what: String): Long = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v.toLong
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Long, _) => v
    case _ => throw new IllegalArgumentException(s"$what must be an integer literal")
  }

  val cosineBuilder: Seq[Expression] => Expression = { children =>
    require(children.length == 2, "cosine_similarity(a, b)")
    CosineSimilarityExpr(children(0), children(1))
  }

  val signBucketBuilder: Seq[Expression] => Expression = { children =>
    require(children.length == 4, "sign_bucket(vec, numPlanes, dim, seed)")
    val k = lit2long(children(1), "numPlanes").toInt
    val dim = lit2long(children(2), "dim").toInt
    val seed = lit2long(children(3), "seed")
    SignBucketExpr(children(0),
      functions.VectorFunctions.hyperplanes(k, dim, seed).map(_.toArray).toArray)
  }

  /** `z_value(a, b, ...)`: 2 columns take the fixed-stride binary
    * interleave, 3+ the variadic round-robin curve — the same dispatch
    * the Scala API exposes as zValue/zValueN.
    */
  val zValueBuilder: Seq[Expression] => Expression = { children =>
    require(children.length >= 2, "z_value(col1, col2, ...)")
    if (children.length == 2) ZValueExpr(children(0), children(1))
    else ZValueNExpr(children)
  }

  /** `hilbert_d(x, y)` or `hilbert_d(x, y, bits)` — bits must be an
    * integer literal (it sizes the generated loop), default 16.
    */
  val hilbertBuilder: Seq[Expression] => Expression = { children =>
    require(children.length == 2 || children.length == 3,
      "hilbert_d(x, y[, bits])")
    val bits = if (children.length == 3)
      lit2long(children(2), "bits").toInt else 16
    HilbertDExpr(children(0), children(1), bits)
  }

  /** Register the functions on an already-running session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    org.apache.spark.sql.GraftBridge.registerFunction(spark, "cosine_similarity", cosineBuilder)
    org.apache.spark.sql.GraftBridge.registerFunction(spark, "sign_bucket", signBucketBuilder)
    org.apache.spark.sql.GraftBridge.registerFunction(spark, "z_value", zValueBuilder)
    org.apache.spark.sql.GraftBridge.registerFunction(spark, "hilbert_d", hilbertBuilder)
  }
}
