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
    GraftExtensions.all.foreach(ext.injectFunction)
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    ext.injectOptimizerRule(_ => graft.plans.RangeJoinRewrite)
  }
}

object GraftExtensions {
  private type FnDef =
    (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  val dotProductD: FnDef = (
    FunctionIdentifier("dot_product_d"),
    new ExpressionInfo(classOf[DotProductD].getName, "dot_product_d"),
    (children: Seq[Expression]) => {
      if (children.size != 2)
        throw new IllegalArgumentException(
          s"Function dot_product_d requires 2 arguments, got ${children.size}")
      DotProductD(children(0), children(1))
    })

  /** Lift a Column-composition into a SQL function: the children parsed
    * from SQL are wrapped as Columns, fed through the same composition
    * the DataFrame API uses, and unwrapped — one implementation, two
    * surfaces, analyzer resolves the result as usual. Arity is checked
    * up front so a wrong argument count surfaces as an analysis-time
    * error, not an IndexOutOfBounds from inside the builder. */
  private def columnFn(name: String, arity: Int)(
      f: Seq[org.apache.spark.sql.Column]
      => org.apache.spark.sql.Column): FnDef = (
    FunctionIdentifier(name),
    new ExpressionInfo("graft.functions.GraftExtensions", name),
    (children: Seq[Expression]) => {
      if (children.size != arity)
        throw new IllegalArgumentException(
          s"Function $name requires $arity argument(s), got ${children.size}")
      org.apache.spark.sql.GraftSqlBridge.expressionEager(
        f(children.map(org.apache.spark.sql.GraftSqlBridge.column)))
    })

  import graft.engine.{TextFunctions => TF}
  import graft.ops.{Similarity, TextAnalysis => TA}

  /** Every engine scalar as a SQL function — a SQL-only user gets the
    * full text/metadata/similarity surface without touching the Scala
    * API. */
  /** hilbert_index2(x, y, bits): bits must be a foldable int literal —
    * it parameterizes the generated code, not a per-row input. */
  val hilbertIndex2: FnDef = (
    FunctionIdentifier("hilbert_index2"),
    new ExpressionInfo(classOf[HilbertIndex2].getName, "hilbert_index2"),
    (children: Seq[Expression]) => {
      if (children.size != 3)
        throw new IllegalArgumentException(
          s"Function hilbert_index2 requires 3 arguments, got ${children.size}")
      val bits = children(2) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
        case _ => throw new IllegalArgumentException(
          "hilbert_index2: bits must be an integer literal")
      }
      HilbertIndex2(children(0), children(1), bits)
    })

  val jaroWinkler: FnDef = (
    FunctionIdentifier("jaro_winkler"),
    new ExpressionInfo(classOf[JaroWinkler].getName, "jaro_winkler"),
    (children: Seq[Expression]) => {
      if (children.size != 2)
        throw new IllegalArgumentException(
          s"Function jaro_winkler requires 2 arguments, got ${children.size}")
      JaroWinkler(children(0), children(1))
    })

  val sortedSumD: FnDef = (
    FunctionIdentifier("sorted_sum_d"),
    new ExpressionInfo(classOf[SortedSumD].getName, "sorted_sum_d"),
    (children: Seq[Expression]) => {
      if (children.size != 1)
        throw new IllegalArgumentException(
          s"Function sorted_sum_d requires 1 argument, got ${children.size}")
      SortedSumD(children(0))
    })

  val htmlToText: FnDef = (
    FunctionIdentifier("html_to_text"),
    new ExpressionInfo(classOf[HtmlToTextExpr].getName, "html_to_text"),
    (children: Seq[Expression]) => {
      if (children.size != 1)
        throw new IllegalArgumentException(
          s"Function html_to_text requires 1 argument, got ${children.size}")
      HtmlToTextExpr(children(0))
    })

  val all: Seq[FnDef] = Seq(
    dotProductD,
    sortedSumD,
    hilbertIndex2,
    jaroWinkler,
    htmlToText,
    columnFn("graft_normalize_text", 1)(cs => TF.normalizeText(cs(0))),
    columnFn("graft_md5hash48", 1)(cs => TF.md5Hash48(cs(0))),
    columnFn("graft_document_date", 1)(cs => TF.extractDocumentDate(cs(0))),
    // `graft_author` is mode-switched by a SQL-visible session conf,
    // read at RESOLUTION time (the builder runs during analysis of each
    // statement, so `SET spark.graft.author.legacySemantics=false`
    // takes effect for the next statement): legacy=true (default) pins
    // the reference's verified quirks — ASCII-only word class and the
    // split-"dr" truncation (exo_2.py:166-201) — while false selects
    // the accent-aware, truncation-free rule (SURVEY.md §7.4's
    // faithful-vs-sane decision, surfaced to SQL users).
    columnFn("graft_author", 1)(cs => {
      val legacy = org.apache.spark.sql.internal.SQLConf.get
        .getConfString("spark.graft.author.legacySemantics", "true")
        .toBoolean
      if (legacy) TF.extractAuthor(cs(0)) else TF.extractAuthorSane(cs(0))
    }),
    columnFn("graft_zero_pad_id", 1)(cs => TF.zeroPadId(cs(0))),
    columnFn("graft_quality_score", 1)(cs => TA.qualityScore(cs(0))),
    columnFn("graft_lang_id", 1)(cs => TA.langId(cs(0))),
    columnFn("graft_fingerprint48", 1)(cs => TA.fingerprint48(cs(0))),
    columnFn("graft_cosine", 2)(cs => Similarity.cosine(cs(0), cs(1))))

  /** Register on an already-built session (extensions bind at session
    * construction; this is the post-hoc path for shared sessions). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    all.foreach { fn =>
      spark.sessionState.functionRegistry
        .registerFunction(fn._1, fn._2, fn._3)
    }
}
