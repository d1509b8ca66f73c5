package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GraftExtensions

/** SQL registration of the native expressions via SparkSessionExtensions
  * (post-hoc `register` here: suites share one JVM-wide session, and
  * extensions only bind at construction). */
class ExtensionsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    GraftExtensions.register(s)
    s
  }

  test("dot_product_d is callable from SQL") {
    val got = spark.sql(
      "SELECT dot_product_d(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
      .head().getDouble(0)
    assert(got === 11.0)
  }

  test("the full scalar surface is callable from SQL and agrees with " +
    "the Column API") {
    import org.apache.spark.sql.functions._
    val r = spark.sql(
      """SELECT
           graft_normalize_text('  Un   Deux ') AS nt,
           graft_author('avis du dr martin fin') AS au,
           CAST(graft_document_date(
             'ne le 01/01/1940 vu le 15/06/2001') AS STRING) AS dd,
           graft_zero_pad_id(7) AS zp,
           graft_lang_id('the cat and the dog of a house') AS lang,
           round(graft_cosine(array(1.0D, 0.0D), array(1.0D, 0.0D)), 4)
             AS cos,
           graft_md5hash48('abc') AS h48
      """).head()
    assert(r.getString(0) === "un deux")
    assert(r.getString(1) === "Dr Martin Fin") // rule takes up to 2 words
    assert(r.getString(2) === "2001-06-15")
    assert(r.getString(3) === "00035868") // 7*5124 zero-padded
    assert(r.getString(4) === "en")
    assert(r.getDouble(5) === 1.0)
    // parity with the Column-API value of the same function
    val viaColumn = spark.range(1)
      .select(graft.engine.TextFunctions.md5Hash48(lit("abc")))
      .head().getLong(0)
    assert(r.getLong(6) === viaColumn)
  }

  test("dot_product_d rejects non-array inputs at analysis time") {
    val e = intercept[Exception] {
      spark.sql("SELECT dot_product_d(1, 2)").collect()
    }
    assert(e.getMessage.toLowerCase.contains("array"))
  }
}
