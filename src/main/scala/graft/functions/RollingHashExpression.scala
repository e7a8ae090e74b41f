package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native polynomial rolling-hash fingerprint over a string column:
  * `h = fold(7, h*31 + codepoint) mod (2^31-1)` — the same recurrence as
  * [[TextFunctions.rollingHashFingerprint]] (HOF) and the DuckDB
  * `list_reduce` oracle, but one codegen'd loop over the string's code
  * points instead of a per-character split array + interpreted lambda.
  */
case class RollingHashExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"rolling_hash expects string, got ${other.sql}")
    }

  @inline private def step(acc: Long, cp: Int): Long =
    (acc * 31 + cp) % 2147483647L

  override def nullSafeEval(v: Any): Any = {
    val s = v.asInstanceOf[UTF8String].toString
    var acc = 7L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      acc = step(acc, cp)
      i += Character.charCount(cp)
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val s = ctx.freshName("s"); val i = ctx.freshName("i")
      val acc = ctx.freshName("acc"); val cp = ctx.freshName("cp")
      s"""
        java.lang.String $s = $v.toString();
        long $acc = 7L;
        for (int $i = 0; $i < $s.length(); ) {
          int $cp = $s.codePointAt($i);
          $acc = ($acc * 31L + $cp) % 2147483647L;
          $i += java.lang.Character.charCount($cp);
        }
        ${ev.value} = $acc;
      """
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "rolling_hash"
}

object RollingHashExpression {
  import org.apache.spark.sql.GraftBridge
  def rollingHash(c: Column): Column =
    GraftBridge.column(RollingHashExpr(GraftBridge.expression(c)))
}
