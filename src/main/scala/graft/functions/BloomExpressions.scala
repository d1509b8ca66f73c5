package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Native membership probe against a driver-built
  * [[org.apache.spark.util.sketch.BloomFilter]] (Spark's own sketch
  * library — the same structure its runtime row-level filtering
  * injects). The filter object rides the serialized plan to every task
  * (a bloom of 10M keys at 1% FPP is ~12 MB — model-sized, not
  * data-sized) and the probe participates in whole-stage codegen, so a
  * 100 TB fact scan pays two hash functions per row, not a UDF call.
  *
  * NO false negatives (bloom guarantee) — a downstream equi-join keeps
  * the result exact; the filter only deletes shuffle traffic.
  */
case class BloomMightContainLong(child: Expression, bloom: BloomFilter)
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain expects a bigint key, got ${child.dataType.simpleString}")

  override def nullSafeEval(v: Any): Any =
    bloom.mightContainLong(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloom", bloom, classOf[BloomFilter].getName)
    defineCodeGen(ctx, ev, c => s"$ref.mightContainLong($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "bloom_might_contain"
}

object BloomExpressions {
  /** Column-API probe; casts the key to bigint so int keys work too. */
  def mightContain(key: Column, bloom: BloomFilter): Column =
    GraftSqlBridge.column(BloomMightContainLong(
      GraftSqlBridge.expression(key.cast("long")), bloom))
}
