package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
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

/** N-ary Z-order (Morton) value: the low `62 / N` bits of each of the N
  * integral children bit-interleaved round-robin (child c's bit i lands
  * at position `i * N + c`). Real layout jobs cluster 3–4 dimensions
  * (date × customer × product); the two-column [[ZValueExpr]] is the
  * N = 2 special case of this ordering — bit-for-bit, asserted by
  * ZOrderSpec — kept separate only because its fixed-stride shift-mask
  * spread is a few instructions cheaper.
  *
  * The per-child budget `62 / N` splits the sign-free 62 usable bits of
  * the long result evenly: 31/31 at N = 2, 20 each (60 used) at N = 3,
  * 15 each at N = 4. Codegen emits one straight-line nested loop over
  * primitive longs — no boxing, no arrays of objects — and the same
  * arithmetic replays in DuckDB as an unrolled `|`-of-shifted-bits
  * expression ([[zValueNSql]] generates it, so engine and oracle share
  * one definition of the curve).
  */
case class ZValueNExpr(children: Seq[Expression]) extends Expression {
  private val n = children.size
  private val bits = 62 / n
  private val mask = (1L << bits) - 1

  override def dataType: DataType = LongType
  override def nullable: Boolean = children.exists(_.nullable)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (n < 2 || n > 31)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"z_value_n expects 2 to 31 columns, got $n")
    else if (children.forall(c =>
        c.dataType == IntegerType || c.dataType == LongType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"z_value_n expects integral columns, got " +
          children.map(_.dataType.sql).mkString(", "))

  override def eval(input: InternalRow): Any = {
    val vs = new Array[Long](n)
    var c = 0
    while (c < n) {
      val v = children(c).eval(input)
      if (v == null) return null
      vs(c) = ZOrderExpression.toLong(v)
      c += 1
    }
    ZOrderExpression.interleaveN(vs, bits)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val evals = children.map(_.genCode(ctx))
    val vs = ctx.freshName("vs")
    val ci = ctx.freshName("c")
    val bi = ctx.freshName("i")
    val v = ctx.freshName("v")
    // children evaluate unconditionally (pure column reads — no side
    // effects to guard), then one nested loop interleaves; any null child
    // nulls the result before the loop runs
    val childAssigns = evals.zipWithIndex.map { case (e, idx) =>
      s"""
        ${e.code}
        if (${e.isNull}) { ${ev.isNull} = true; }
        else { $vs[$idx] = (long) ${e.value}; }
      """
    }.mkString("\n")
    ev.copy(code = code"""
      boolean ${ev.isNull} = false;
      long ${ev.value} = 0L;
      long[] $vs = new long[$n];
      $childAssigns
      if (!${ev.isNull}) {
        for (int $ci = 0; $ci < $n; $ci++) {
          long $v = $vs[$ci] & ${mask}L;
          for (int $bi = 0; $bi < $bits; $bi++) {
            ${ev.value} |= (($v >> $bi) & 1L) << ($bi * $n + $ci);
          }
        }
      }
    """)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)
  override def prettyName: String = "z_value_n"
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

  /** Interpreted N-ary reference shared by [[ZValueNExpr]]'s eval path
    * and the specs: child c's bit i → result position `i * n + c`.
    */
  private[graft] def interleaveN(vs: Array[Long], bits: Int): Long = {
    val n = vs.length
    var z = 0L
    var c = 0
    while (c < n) {
      val v = vs(c) & ((1L << bits) - 1)
      var i = 0
      while (i < bits) {
        z |= ((v >> i) & 1L) << (i * n + c)
        i += 1
      }
      c += 1
    }
    z
  }

  def zValue(a: Column, b: Column): Column =
    GraftBridge.column(ZValueExpr(
      GraftBridge.expression(a), GraftBridge.expression(b)))

  def zValueN(cols: Column*): Column =
    GraftBridge.column(ZValueNExpr(cols.map(GraftBridge.expression)))

  /** The DuckDB replay of [[ZValueNExpr]] over the given (already
    * BIGINT-safe) SQL column expressions — an unrolled `|` of shifted
    * bits, exact BIGINT arithmetic, generated from the same (n, bits)
    * parameters the engine derives, so oracle and engine cannot drift.
    */
  def zValueNSql(cols: Seq[String]): String = {
    val n = cols.size
    val bits = 62 / n
    val mask = (1L << bits) - 1
    // every term fully parenthesized: DuckDB's bitwise |, &, << share one
    // precedence level left-associatively, so a bare `a << p | b << q`
    // parses as `((a << p) | b) << q` and overflows
    cols.zipWithIndex.flatMap { case (c, ci) =>
      (0 until bits).map { i =>
        s"(((((CAST($c AS BIGINT)) & $mask) >> $i) & 1) << ${i * n + ci})"
      }
    }.mkString("(", " | ", ")")
  }
}
