package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** Native Hilbert-curve index of two integral columns: the distance along
  * the order-`bits` Hilbert curve of the point `(x, y)` (both masked to
  * the low `bits` bits). The alternative 2-D clustering key to Z-order
  * ([[ZValueExpr]]): the Hilbert curve never jumps — every consecutive
  * pair of indexes is a grid-neighbor (HilbertSpec pins this), where the
  * Morton curve teleports across the plane at every power-of-two
  * boundary. That stronger locality packs a 2-D box predicate into
  * FEWER parquet row groups at the same sort cost, which is why large
  * lakehouse layout jobs offer both and prefer Hilbert for read-heavy
  * tables; the engine does the same.
  *
  * Implementation is the classic xy→d walk (Hilbert 1891 via the
  * bit-twiddling form): `bits` iterations of quadrant extraction +
  * reflect/swap rotation — straight-line long arithmetic in one
  * codegen'd expression. The oracle replays the SAME recurrence as
  * generated chained `* REPLACE` CTEs ([[HilbertExpression.hilbertSqlCtes]]
  * shares the step emitter), exact BIGINT ops in both engines.
  */
case class HilbertDExpr(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {
  require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")

  override def dataType: DataType = LongType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (IntegerType | LongType, IntegerType | LongType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"hilbert_d expects two integral columns, got ${l.sql}, ${r.sql}")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    HilbertExpression.hilbertD(ZOrderExpression.toLong(a),
      ZOrderExpression.toLong(b), bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val x = ctx.freshName("hx"); val y = ctx.freshName("hy")
      val s = ctx.freshName("hs"); val rx = ctx.freshName("rx")
      val ry = ctx.freshName("ry"); val t = ctx.freshName("ht")
      val d = ctx.freshName("hd")
      val mask = (1L << bits) - 1
      // accumulate into a local (nullSafeCodeGen pre-initializes ev.value
      // to the type's default, which is NOT zero)
      s"""
        long $x = ((long) $a) & ${mask}L;
        long $y = ((long) $b) & ${mask}L;
        long $d = 0L;
        for (long $s = ${1L << (bits - 1)}L; $s > 0; $s >>= 1) {
          long $rx = (($x & $s) > 0) ? 1L : 0L;
          long $ry = (($y & $s) > 0) ? 1L : 0L;
          $d += $s * $s * ((3L * $rx) ^ $ry);
          if ($ry == 0) {
            long $t = ($rx == 1) ? ($s - 1 - $y) : $y;
            $y = ($rx == 1) ? ($s - 1 - $x) : $x;
            $x = $t;
          }
        }
        ${ev.value} = $d;
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "hilbert_d"
}

object HilbertExpression {
  import org.apache.spark.sql.GraftBridge

  /** Interpreted reference shared by the eval path, the specs, and the
    * oracle generator's documentation: quadrant walk from the top bit
    * down, reflect+swap rotation on the lower half.
    */
  private[graft] def hilbertD(xIn: Long, yIn: Long, bits: Int): Long = {
    val mask = (1L << bits) - 1
    var x = xIn & mask
    var y = yIn & mask
    var d = 0L
    var s = 1L << (bits - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0) {
        val t = if (rx == 1) s - 1 - y else y
        y = if (rx == 1) s - 1 - x else x
        x = t
      }
      s >>= 1
    }
    d
  }

  def hilbert(a: Column, b: Column, bits: Int = 16): Column =
    GraftBridge.column(HilbertDExpr(
      GraftBridge.expression(a), GraftBridge.expression(b), bits))

  /** DuckDB replay of [[HilbertDExpr]]: a chain of `bits` step CTEs, each
    * one `SELECT * REPLACE` computing (hd, hx, hy) from the previous
    * step's values — the exact recurrence of [[hilbertD]] unrolled, all
    * BIGINT. `h0` seeds from `srcCte`; the final CTE is `h<bits>` with
    * the curve index in `hd`. The d-increment CASE enumerates
    * (3·rx) XOR ry: (0,0)→0, (0,1)→1, (1,1)→2, (1,0)→3.
    */
  def hilbertSqlCtes(srcCte: String, xExpr: String, yExpr: String,
      bits: Int, carryCols: Seq[String]): String = {
    val mask = (1L << bits) - 1
    val seed =
      s"""h0 AS (SELECT ${carryCols.mkString(", ")},
            (CAST($xExpr AS BIGINT) & $mask) AS hx,
            (CAST($yExpr AS BIGINT) & $mask) AS hy,
            CAST(0 AS BIGINT) AS hd
          FROM $srcCte)"""
    val steps = (0 until bits).map { k =>
      val s = 1L << (bits - 1 - k)
      s"""h${k + 1} AS (SELECT * REPLACE (
            hd + $s * $s * (CASE
              WHEN (hx & $s) = 0 AND (hy & $s) = 0 THEN 0
              WHEN (hx & $s) = 0 THEN 1
              WHEN (hy & $s) > 0 THEN 2
              ELSE 3 END) AS hd,
            CASE WHEN (hy & $s) = 0 THEN
              (CASE WHEN (hx & $s) > 0 THEN $s - 1 - hy ELSE hy END)
              ELSE hx END AS hx,
            CASE WHEN (hy & $s) = 0 THEN
              (CASE WHEN (hx & $s) > 0 THEN $s - 1 - hx ELSE hx END)
              ELSE hy END AS hy)
          FROM h$k)"""
    }
    (seed +: steps).mkString(",\n          ")
  }
}
