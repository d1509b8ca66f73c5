package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Static kernel for [[SortedSumD]] — a plain static call keeps the
  * generated code a one-liner (the JaroWinkler registration pattern)
  * while the loop itself JITs tight.
  *
  * Returns a boxed Double so a null ELEMENT can poison the result to
  * null, exactly like the `aggregate` fold it replaces (`acc + null`
  * is null in Spark SQL).
  */
object SortedFold {
  def sumOrNull(a: ArrayData): java.lang.Double = {
    val n = a.numElements()
    val buf = new Array[Double](n)
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null
      buf(i) = a.getDouble(i)
      i += 1
    }
    java.util.Arrays.sort(buf)
    var s = 0.0
    i = 0
    while (i < n) { s += buf(i); i += 1 }
    s
  }
}

/** Native, codegen-participating form of the engine's DETERMINISTIC
  * float-sum idiom `aggregate(array_sort(xs), 0.0, _ + _)` (sort the
  * doubles ascending, then fold left-to-right — an IEEE addition order
  * that is a pure function of the multiset, replayable bit-for-bit by
  * DuckDB's `list_sum(list_sort(...))`).
  *
  * Why native: Spark's higher-order functions (`aggregate`,
  * `array_sort` with a lambda-bound comparator context) evaluate the
  * lambda INTERPRETED per element — on per-group folds over thousands
  * of elements that interpreter round trip dominates the aggregation
  * stage. This expression emits one static call inside whole-stage
  * codegen; semantics are IDENTICAL (null element poisons to null,
  * empty array sums to 0.0), so swapping it into an oracle-gated query
  * cannot change a single bit of output.
  */
case class SortedSumD(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"sorted_sum_d expects array<double>, got ${other.simpleString}")
    }

  override def nullable: Boolean = true

  override def nullSafeEval(a: Any): Any =
    SortedFold.sumOrNull(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("r")
      s"""
         |java.lang.Double $r = graft.functions.SortedFold.sumOrNull($c);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r.doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)

  override def prettyName: String = "sorted_sum_d"
}

object SortedSumD {
  /** Column-API entry point: the drop-in replacement for
    * `aggregate(array_sort(c), lit(0.0), _ + _)`. */
  def sortedSum(c: Column): Column =
    GraftSqlBridge.column(SortedSumD(
      GraftSqlBridge.expression(c.cast("array<double>"))))
}

/** Static kernel for [[RepeatSumD]]: the left fold 0.0 + v + v + …
  * (n terms) in IEEE order — exactly what [[SortedFold.sumOrNull]]
  * computes over n copies of one value (sorting n equal doubles is the
  * identity), without materializing the n-element array. */
object RepeatFold {
  def sum(v: Double, n: Long): Double = {
    var s = 0.0
    var i = 0L
    while (i < n) { s += v; i += 1 }
    s
  }
}

/** Constant-space form of `sorted_sum_d(array_repeat(v, n))` for
  * n >= 1 — the dsirLogWeights level-1 fold over a lam-homogeneous
  * count group (r15; verdict r14 item 7): `array_repeat` materialized
  * an n-element array PER ROW, and n is a per-(doc, subbucket) token
  * count with no bound — one adversarial document putting millions of
  * tokens in one subbucket would build a multi-MB array in a single
  * row. This expression runs the identical IEEE addition sequence in
  * an O(1)-space codegen loop, so the output is bit-for-bit the old
  * fold's on every input. Null-intolerant (either input null → null);
  * the composed form's n-null / n <= 0 edge semantics live in the
  * [[RepeatSumD.repeatSum]] Column wrapper.
  */
case class RepeatSumD(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (DoubleType, org.apache.spark.sql.types.LongType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"repeat_sum_d expects (double, bigint), got $other")
    }

  override def nullSafeEval(v: Any, n: Any): Any =
    RepeatFold.sum(v.asInstanceOf[Double], n.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (v, n) =>
      s"graft.functions.RepeatFold.sum($v, $n)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "repeat_sum_d"
}

object RepeatSumD {
  /** Column-API entry point: bit-identical, constant-space drop-in for
    * `sortedSum(array_repeat(v, n))` with a long count. Edge semantics
    * of the composed form are replicated here: n null → null; n <= 0
    * → 0.0 even for null v (array_repeat yields an EMPTY array for
    * zero and negative counts, and the empty fold is 0.0); v null with
    * n >= 1 → null (a null element poisons sorted_sum_d). */
  def repeatSum(v: Column, n: Column): Column = {
    import org.apache.spark.sql.functions.{lit, when}
    val nn = n.cast("long")
    when(nn.isNull, lit(null).cast("double"))
      .when(nn <= 0L, lit(0.0d))
      .otherwise(GraftSqlBridge.column(RepeatSumD(
        GraftSqlBridge.expression(v.cast("double")),
        GraftSqlBridge.expression(nn))))
  }
}
