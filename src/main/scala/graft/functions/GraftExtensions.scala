package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point — registers the engine's native
  * Catalyst expressions for SQL use, so
  * `spark.sql("SELECT dot_product_d(a, b) ...")` works next to the
  * Column API. Enable with either
  * `.withExtensions(new GraftExtensions)` or
  * `.config("spark.sql.extensions", "graft.functions.GraftExtensions")`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.dotProductD)
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
  }
}

object GraftExtensions {
  val dotProductD: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("dot_product_d"),
    new ExpressionInfo(classOf[DotProductD].getName, "dot_product_d"),
    (children: Seq[Expression]) => DotProductD(children(0), children(1)))

  /** Register on an already-built session (extensions bind at session
    * construction; this is the post-hoc path for shared sessions). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      dotProductD._1, dotProductD._2, dotProductD._3)
}
