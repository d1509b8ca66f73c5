package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for Jaro–Winkler similarity — the fuzzy
  * record-linkage scorer Spark lacks as a built-in (it only ships
  * `levenshtein`). Semantics pinned to DuckDB's
  * `jaro_winkler_similarity` (verified value-by-value in the q102
  * oracle): standard Jaro with match window ⌊max(|a|,|b|)/2⌋−1,
  * transpositions = half the out-of-order matches, Winkler prefix boost
  * (≤4 chars, scale 0.1) applied only when jaro > 0.7, and empty
  * strings scoring 0 (including empty-vs-empty, DuckDB's convention).
  *
  * Operates on UTF-8 bytes (= characters for the ASCII corpus this
  * engine normalizes to). Participates in whole-stage codegen: the
  * generated code makes one static call into [[JaroWinkler.compute]] —
  * primitive arguments, no boxing, no virtual dispatch — so pair
  * verification after blocking runs at join-probe speed.
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType == StringType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"jaro_winkler expects string inputs, got " +
        s"${children.map(_.dataType.simpleString).mkString(", ")}")

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.compute(
      a.asInstanceOf[UTF8String].getBytes,
      b.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.JaroWinkler$$.MODULE$$.compute(" +
        s"$a.getBytes(), $b.getBytes());")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "jaro_winkler"
}

object JaroWinkler {
  /** DuckDB-compatible Jaro–Winkler over raw bytes. */
  def compute(s1: Array[Byte], s2: Array[Byte]): Double = {
    val len1 = s1.length
    val len2 = s2.length
    if (len1 == 0 || len2 == 0) return 0.0
    val window = math.max(math.max(len1, len2) / 2 - 1, 0)
    val m1 = new Array[Boolean](len1)
    val m2 = new Array[Boolean](len2)
    var matches = 0
    var i = 0
    while (i < len1) {
      val lo = math.max(0, i - window)
      val hi = math.min(len2 - 1, i + window)
      var j = lo
      var done = false
      while (j <= hi && !done) {
        if (!m2(j) && s2(j) == s1(i)) {
          m1(i) = true; m2(j) = true; matches += 1; done = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    // transpositions: walk both matched subsequences in order
    var t = 0
    var k = 0
    i = 0
    while (i < len1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1(i) != s2(k)) t += 1
        k += 1
      }
      i += 1
    }
    val m = matches.toDouble
    val jaro = (m / len1 + m / len2 + (m - t / 2.0) / m) / 3.0
    if (jaro <= 0.7) return jaro
    var prefix = 0
    val maxPrefix = math.min(4, math.min(len1, len2))
    while (prefix < maxPrefix && s1(prefix) == s2(prefix)) prefix += 1
    jaro + prefix * 0.1 * (1.0 - jaro)
  }
}

object StringExpressions {
  /** Column-API entry point. */
  def jaroWinkler(a: Column, b: Column): Column =
    GraftSqlBridge.column(JaroWinkler(
      GraftSqlBridge.expression(a),
      GraftSqlBridge.expression(b)))
}
