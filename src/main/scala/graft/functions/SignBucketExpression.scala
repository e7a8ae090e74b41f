package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DataTypes, FloatType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native random-hyperplane LSH sketch: all `k` sign bits of the
  * projections of an `array<float>` vector onto fixed hyperplanes,
  * computed in ONE pass over the vector (the HOF formulation runs one
  * interpreted aggregate per plane). Output is the "0101…" bucket string
  * used as the ANN partition key.
  *
  * The plane matrix is a literal baked into the generated code via a
  * codegen reference — identical plan on index build and probe, no
  * broadcast needed.
  */
case class SignBucketExpr(child: Expression, planes: Array[Array[Double]])
    extends UnaryExpression {

  override def dataType: DataType = StringType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"sign_bucket expects array<float>, got ${other.sql}")
    }

  private def compute(v: ArrayData): UTF8String = {
    val x = v.toFloatArray()
    val sb = new java.lang.StringBuilder(planes.length)
    var p = 0
    while (p < planes.length) {
      val w = planes(p)
      val n = math.min(x.length, w.length)
      var acc = 0.0
      var i = 0
      while (i < n) { acc += x(i) * w(i); i += 1 }
      sb.append(if (acc >= 0) '1' else '0')
      p += 1
    }
    UTF8String.fromString(sb.toString)
  }

  override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("planes", planes, "double[][]")
    nullSafeCodeGen(ctx, ev, v => {
      val p = ctx.freshName("p"); val i = ctx.freshName("i")
      val n = ctx.freshName("n"); val acc = ctx.freshName("acc")
      val w = ctx.freshName("w"); val sb = ctx.freshName("sb")
      s"""
        java.lang.StringBuilder $sb = new java.lang.StringBuilder($planesRef.length);
        for (int $p = 0; $p < $planesRef.length; $p++) {
          double[] $w = $planesRef[$p];
          int $n = java.lang.Math.min($v.numElements(), $w.length);
          double $acc = 0.0;
          for (int $i = 0; $i < $n; $i++) {
            $acc += ((double) $v.getFloat($i)) * $w[$i];
          }
          $sb.append($acc >= 0 ? '1' : '0');
        }
        ${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString($sb.toString());
      """
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "sign_bucket"
}

object SignBucketExpression {
  import org.apache.spark.sql.GraftBridge
  def signBucket(v: Column, planes: Seq[Seq[Double]]): Column =
    GraftBridge.column(
      SignBucketExpr(GraftBridge.expression(v), planes.map(_.toArray).toArray))
}
