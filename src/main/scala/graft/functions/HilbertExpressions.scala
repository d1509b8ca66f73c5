package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Hilbert-curve index of a 2-D point — the better-locality alternative
  * to the Morton code in [[graft.ops.Layout]]: consecutive Hilbert
  * indices are ALWAYS adjacent cells (Morton jumps at power-of-two
  * boundaries), so range-partitioned files cover tighter spatial tiles
  * and multi-dimensional min/max pruning discards more files.
  *
  * Implemented as a native codegen'd expression: the bit-twiddling loop
  * (classic xy2d — rotate quadrant state while descending `bits`
  * levels) runs inside WholeStageCodegen as a plain Java loop, no UDF
  * boxing; per-row cost is O(bits). Inputs are truncated to the low
  * `bits` bits (same contract as [[graft.ops.Layout.zValue2]]).
  */
case class HilbertIndex2(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType &&
        bits >= 1 && bits <= 31) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hilbert_index2 expects (bigint, bigint) and bits in [1,31], got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString}, $bits)")

  override def nullSafeEval(xv: Any, yv: Any): Any =
    HilbertIndex2.xy2d(xv.asInstanceOf[Long], yv.asInstanceOf[Long], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (xs, ys) => {
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      val rx = ctx.freshName("rx"); val ry = ctx.freshName("ry")
      val s = ctx.freshName("s"); val t = ctx.freshName("t")
      val acc = ctx.freshName("hd")
      val mask = (1L << bits) - 1
      s"""
         |long $x = $xs & ${mask}L;
         |long $y = $ys & ${mask}L;
         |long $acc = 0L;
         |for (long $s = 1L << ${bits - 1}; $s > 0; $s >>= 1) {
         |  long $rx = (($x & $s) > 0) ? 1L : 0L;
         |  long $ry = (($y & $s) > 0) ? 1L : 0L;
         |  $acc += $s * $s * ((3L * $rx) ^ $ry);
         |  if ($ry == 0L) {
         |    if ($rx == 1L) { $x = $s - 1 - $x; $y = $s - 1 - $y; }
         |    long $t = $x; $x = $y; $y = $t;
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "hilbert_index2"
}

object HilbertIndex2 {
  /** Reference implementation (identical to the generated Java). */
  def xy2d(x0: Long, y0: Long, bits: Int): Long = {
    val mask = (1L << bits) - 1
    var x = x0 & mask; var y = y0 & mask
    var d = 0L
    var s = 1L << (bits - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0L) {
        if (rx == 1L) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  /** Column-API form (casts int inputs to bigint). */
  def hilbert(x: Column, y: Column, bits: Int = 16): Column =
    GraftSqlBridge.column(HilbertIndex2(
      GraftSqlBridge.expression(x.cast("long")),
      GraftSqlBridge.expression(y.cast("long")), bits))
}
