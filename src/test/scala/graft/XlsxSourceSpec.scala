package graft

import java.io.ByteArrayOutputStream
import java.util.zip.{ZipEntry, ZipOutputStream}

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.XlsxSource

/** S1 XLSX parsing against synthetic workbooks covering cell-form
  * variety (the real reference export is covered by DemoEtl). */
class XlsxSourceSpec extends AnyFunSuite {

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

  private val sharedStrings =
    """<?xml version="1.0"?>
      |<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
      | <si><t>ID</t></si>
      | <si><t>NAME</t></si>
      | <si><r><t>ri</t></r><r><t>ch</t></r></si>
      |</sst>""".stripMargin

  // row 2: shared-string + inline + numeric; row 3: sparse (B skipped),
  // rich-text shared string in C
  private val sheetXml =
    """<?xml version="1.0"?>
      |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
      | <sheetData>
      |  <row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c><c r="C1" t="inlineStr"><is><t>EXTRA</t></is></c></row>
      |  <row r="2"><c r="A2"><v>007</v></c><c r="B2" t="inlineStr"><is><t>inline</t></is></c><c r="C2"><v>3.5</v></c></row>
      |  <row r="3"><c r="A3"><v>8</v></c><c r="C3" t="s"><v>2</v></c></row>
      | </sheetData>
      |</worksheet>""".stripMargin

  test("cell forms: shared strings, rich-text runs, inline strings, " +
    "numerics, and sparse rows (skipped cells become null)") {
    val bytes = zip(
      "xl/sharedStrings.xml" -> sharedStrings,
      "xl/worksheets/sheet1.xml" -> sheetXml)
    val (header, rows) = XlsxSource.parseRows(bytes)
    assert(header === Seq("ID", "NAME", "EXTRA"))
    assert(rows === Seq(
      Seq("007", "inline", "3.5"),
      Seq("8", null, "rich"))) // B3 skipped -> null; C3 rich-text joined
  }

  test("non-standard sheet part names fall back to ordered worksheet " +
    "entries") {
    val bytes = zip(
      "xl/sharedStrings.xml" -> sharedStrings,
      "xl/worksheets/data_part_07.xml" -> sheetXml)
    val (header, rows) = XlsxSource.parseRows(bytes)
    assert(header === Seq("ID", "NAME", "EXTRA") && rows.size === 2)
  }

  test("missing worksheet -> empty result, not a crash") {
    val bytes = zip("xl/sharedStrings.xml" -> sharedStrings)
    assert(XlsxSource.parseRows(bytes) === ((Nil, Nil)))
  }
}
