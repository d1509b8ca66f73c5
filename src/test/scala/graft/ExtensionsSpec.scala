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

  test("dot_product_d rejects non-array inputs at analysis time") {
    val e = intercept[Exception] {
      spark.sql("SELECT dot_product_d(1, 2)").collect()
    }
    assert(e.getMessage.toLowerCase.contains("array"))
  }
}
