package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression for cosine similarity over two
  * `array<float>` (or `array<double>` — each side independently) columns,
  * with whole-stage codegen (`doGenCode` emits a single fused loop over
  * the primitive arrays — no per-element lambda dispatch, no boxing, no
  * intermediate zipped array). Double sides exist for trained IVF
  * centroids, whose per-dimension means are exact doubles that a float
  * round-trip would corrupt.
  *
  * This is the perf path for brute-force similarity scans: the
  * higher-order-function formulation in [[VectorFunctions.cosineSimilarity]]
  * allocates a zipped array and interprets three lambdas per row; this
  * expression reads both arrays once. Semantics are identical (double
  * accumulation, 0.0 for zero-norm inputs); equivalence is pinned by
  * SimilaritySpec.
  */
case class CosineSimilarityExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"cosine_similarity expects array<float>/array<double> arguments, got " +
        s"${left.dataType.sql} and ${right.dataType.sql}")
  }

  private def isDouble(dt: DataType): Boolean = dt match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  // Mismatched dimensions yield null (not a silently-truncated prefix
  // cosine) — the same answer the zip_with HOF formulation gives, so the
  // SimilaritySpec equivalence holds on malformed inputs too.
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    def doubles(v: Any, dt: DataType): Array[Double] =
      if (isDouble(dt)) v.asInstanceOf[ArrayData].toDoubleArray()
      else v.asInstanceOf[ArrayData].toFloatArray().map(_.toDouble)
    val x = doubles(a, left.dataType)
    val y = doubles(b, right.dataType)
    if (x.length != y.length) return null
    val n = x.length
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      val xi = x(i); val yi = y(i)
      dot += xi * yi; nx += xi * xi; ny += yi * yi
      i += 1
    }
    val den = math.sqrt(nx) * math.sqrt(ny)
    if (den == 0.0) 0.0 else dot / den
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      val den = ctx.freshName("den")
      def get(arr: String, side: Expression, idx: String): String =
        if (isDouble(side.dataType)) s"$arr.getDouble($idx)"
        else s"(double) $arr.getFloat($idx)"
      s"""
        if ($a.numElements() != $b.numElements()) {
          ${ev.isNull} = true;
        } else {
          int $n = $a.numElements();
          double $dot = 0.0; double $nx = 0.0; double $ny = 0.0;
          for (int $i = 0; $i < $n; $i++) {
            double $xi = ${get(a, left, i)};
            double $yi = ${get(b, right, i)};
            $dot += $xi * $yi; $nx += $xi * $xi; $ny += $yi * $yi;
          }
          double $den = java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny);
          ${ev.value} = ($den == 0.0) ? 0.0 : $dot / $den;
        }
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "cosine_similarity"
}

object CosineExpression {
  import org.apache.spark.sql.GraftBridge

  /** Column API over the native expression. */
  def cosine(a: Column, b: Column): Column =
    GraftBridge.column(
      CosineSimilarityExpr(GraftBridge.expression(a), GraftBridge.expression(b)))
}
