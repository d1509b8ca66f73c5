package graft

import java.io.ByteArrayOutputStream
import java.nio.file.{Files, Paths}
import java.util.zip.{ZipEntry, ZipOutputStream}

import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

/** DataSourceV2 connector: registration by short name, parallel
  * multi-workbook scan, by-name header drift, and column pruning
  * reaching the scan. */
class XlsxV2Spec extends SparkSpec {
  import spark.implicits._

  private def zip(entries: (String, String)*): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val zos = new ZipOutputStream(bos)
    entries.foreach { case (name, content) =>
      zos.putNextEntry(new ZipEntry(name))
      zos.write(content.getBytes("UTF-8"))
      zos.closeEntry()
    }
    zos.close()
    bos.toByteArray
  }

  private def sheet(header: Seq[String], rows: Seq[Seq[String]]): String = {
    def cell(r: Int, c: Int, v: String) = {
      val ref = s"${('A' + c).toChar}${r + 1}"
      if (v == null) "" else s"""<c r="$ref" t="inlineStr"><is><t>$v</t></is></c>"""
    }
    val all = header +: rows
    val body = all.zipWithIndex.map { case (r, i) =>
      s"""<row r="${i + 1}">${r.zipWithIndex.map { case (v, j) => cell(i, j, v) }.mkString}</row>"""
    }.mkString
    s"""<?xml version="1.0"?><worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>$body</sheetData></worksheet>"""
  }

  private def workbook(dir: String, name: String, header: Seq[String],
                       rows: Seq[Seq[String]]): Unit =
    Files.write(Paths.get(dir, name),
      zip("xl/worksheets/sheet1.xml" -> sheet(header, rows)))

  private lazy val dir: String = {
    val d = Files.createTempDirectory("xlsxv2").toString
    workbook(d, "a.xlsx", Seq("ID", "NAME", "CITY"),
      Seq(Seq("1", "ada", "lyon"), Seq("2", "bob", "nice")))
    // drifted header: extra leading column, NAME/ID shifted, no CITY
    workbook(d, "b.xlsx", Seq("EXTRA", "ID", "NAME"),
      Seq(Seq("x", "3", "eve")))
    d
  }

  test("short-name registration + multi-file scan with by-name drift " +
    "resolution (one partition per workbook)") {
    val df = spark.read.format("graft-xlsx").load(dir)
    assert(df.schema.fieldNames.toSeq === Seq("ID", "NAME", "CITY"))
    val got = df.orderBy("ID")
      .as[(String, String, Option[String])].collect().toSeq
    assert(got === Seq(
      ("1", "ada", Some("lyon")),
      ("2", "bob", Some("nice")),
      ("3", "eve", None))) // b.xlsx has no CITY; ID/NAME found by name
    assert(df.rdd.getNumPartitions === 2)
  }

  test("column pruning reaches the scan: required schema is the " +
    "projected subset") {
    val df = spark.read.format("graft-xlsx").load(dir).select("NAME")
    val scan = df.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec => b
    }.getOrElse(fail("no BatchScanExec in the plan"))
    assert(scan.scan.readSchema().fieldNames.toSeq === Seq("NAME"))
    assert(df.as[String].collect().sorted.toSeq === Seq("ada", "bob", "eve"))
  }

  test("user-supplied schema narrows the table without inference") {
    val df = spark.read.format("graft-xlsx")
      .schema("NAME string, CITY string").load(dir)
    val got = df.where(col("CITY").isNotNull).orderBy("NAME")
      .as[(String, String)].collect().toSeq
    assert(got === Seq(("ada", "lyon"), ("bob", "nice")))
  }

  test("write path: distributed append writes one workbook per " +
    "partition and round-trips through the same connector") {
    val out = Files.createTempDirectory("xlsxw").toString + "/tbl"
    val df = (1 to 50).map(i => (s"id$i", s"v$i", if (i % 7 == 0) null
      else s"x$i")).toDF("ID", "VAL", "OPT")
    df.repartition(4).write.format("graft-xlsx").mode("append").save(out)
    val files = new java.io.File(out).listFiles()
      .filter(_.getName.endsWith(".xlsx"))
    assert(files.length >= 2 && files.forall(!_.getName.startsWith(".")))
    val back = spark.read.format("graft-xlsx").load(out)
    assert(back.columns.toSeq === Seq("ID", "VAL", "OPT"))
    assert(back.orderBy("ID").collect().toSeq ===
      df.orderBy("ID").collect().toSeq) // nulls + values bit-identical
    // a second append ADDS workbooks
    Seq(("extra", "e", "e")).toDF("ID", "VAL", "OPT")
      .coalesce(1).write.format("graft-xlsx").mode("append").save(out)
    assert(spark.read.format("graft-xlsx").load(out).count() === 51)
  }

  test("write path: overwrite truncates previously-live workbooks; " +
    "XML-special characters survive the round-trip") {
    val out = Files.createTempDirectory("xlsxw2").toString + "/tbl"
    (1 to 10).map(i => (s"a$i", "old")).toDF("K", "V")
      .write.format("graft-xlsx").mode("append").save(out)
    Seq(("k<&>\"", "new & <improved>")).toDF("K", "V")
      .coalesce(1).write.format("graft-xlsx").mode("overwrite").save(out)
    val back = spark.read.format("graft-xlsx").load(out)
      .as[(String, String)].collect().toSeq
    assert(back === Seq(("k<&>\"", "new & <improved>")))
  }

  test("write path: non-string columns are rejected with a clear error") {
    val out = Files.createTempDirectory("xlsxw3").toString + "/tbl"
    val e = intercept[Exception] {
      Seq((1, "a")).toDF("N", "S")
        .write.format("graft-xlsx").mode("append").save(out)
    }
    assert(e.getMessage.contains("cast it to string"))
  }
}
