package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** Native Z-order (Morton) curve value of two integral columns: the low
  * 31 bits of each input bit-interleaved into one 62-bit long (`a` on
  * even positions, `b` on odd). Sorting a table by this value clusters
  * rows that are close in BOTH dimensions into the same parquet row
  * groups, so min/max row-group stats prune a two-dimensional box
  * predicate — the multi-column layout trick the single-column sort the
  * reference's warehouse write produces cannot give (either dimension
  * sorted means the other is shuffled through every row group).
  *
  * The spread is the classic five shift-mask steps — straight-line long
  * arithmetic in one codegen'd expression, replayed operation-for-
  * operation by the DuckDB oracle (exact BIGINT ops in both engines).
  */
case class ZValueExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (IntegerType | LongType, IntegerType | LongType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"z_value expects two integral columns, got ${l.sql}, ${r.sql}")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    ZOrderExpression.interleave(
      ZOrderExpression.toLong(a), ZOrderExpression.toLong(b))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val sa = ctx.freshName("sa"); val sb = ctx.freshName("sb")
      def spread(in: String, out: String): String =
        s"""
          long $out = ((long) $in) & 0x7FFFFFFFL;
          $out = ($out | ($out << 16)) & 0x0000FFFF0000FFFFL;
          $out = ($out | ($out << 8))  & 0x00FF00FF00FF00FFL;
          $out = ($out | ($out << 4))  & 0x0F0F0F0F0F0F0F0FL;
          $out = ($out | ($out << 2))  & 0x3333333333333333L;
          $out = ($out | ($out << 1))  & 0x5555555555555555L;
        """
      s"""
        ${spread(a, sa)}
        ${spread(b, sb)}
        ${ev.value} = $sa | ($sb << 1);
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "z_value"
}

object ZOrderExpression {
  import org.apache.spark.sql.GraftBridge

  private[graft] def toLong(v: Any): Long = v match {
    case i: java.lang.Integer => i.longValue()
    case l: java.lang.Long => l.longValue()
  }

  /** Interpreted reference used by both eval paths and the specs. */
  private[graft] def interleave(a: Long, b: Long): Long =
    spread(a) | (spread(b) << 1)

  private def spread(v: Long): Long = {
    var x = v & 0x7FFFFFFFL
    x = (x | (x << 16)) & 0x0000FFFF0000FFFFL
    x = (x | (x << 8)) & 0x00FF00FF00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0F0F0F0F0FL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  def zValue(a: Column, b: Column): Column =
    GraftBridge.column(ZValueExpr(
      GraftBridge.expression(a), GraftBridge.expression(b)))
}
