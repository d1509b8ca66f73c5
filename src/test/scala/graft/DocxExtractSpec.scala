package graft

import java.io.ByteArrayOutputStream
import java.nio.file.{Files, Paths}
import java.util.zip.{ZipEntry, ZipOutputStream}

import graft.sources.DocxExtract

/** S6 DOCX extraction: synthetic minimal documents plus golden checks
  * against the reference corpus' real files (read-only at
  * /root/reference/fichiers source — FIXTURES.md §1.2). */
class DocxExtractSpec extends SparkSpec {

  private val W =
    "xmlns:w=\"http://schemas.openxmlformats.org/wordprocessingml/2006/main\""

  private def docx(bodyXml: String): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val zos = new ZipOutputStream(bos)
    zos.putNextEntry(new ZipEntry("word/document.xml"))
    zos.write(
      s"""<?xml version="1.0" encoding="UTF-8"?>
         |<w:document $W><w:body>$bodyXml</w:body></w:document>"""
        .stripMargin.getBytes("UTF-8"))
    zos.closeEntry(); zos.close()
    bos.toByteArray
  }

  private def p(text: String) = s"<w:p><w:r><w:t>$text</w:t></w:r></w:p>"

  test("paragraphs in body order, joined by newline") {
    val bytes = docx(p("ligne un") + p("ligne deux"))
    assert(DocxExtract.extractText(bytes) === "ligne un\nligne deux")
  }

  test("textboxes come FIRST and are deduped by exact run text") {
    val body =
      s"""<w:p><w:r><w:drawing><w:txbxContent>
         |${p("Service Fruitologie")}${p("Service Fruitologie")}${p("Pr Pastabolo")}
         |</w:txbxContent></w:drawing></w:r></w:p>""".stripMargin + p("corps")
    val got = DocxExtract.extractText(docx(body))
    assert(got.startsWith("Service Fruitologie\nPr Pastabolo"))
    // the nested textbox runs are NOT double-counted in the body paragraph
    assert(got.linesIterator.count(_ == "Service Fruitologie") === 1)
  }

  test("table cells (trimmed, empty skipped) before paragraphs") {
    val body =
      s"""<w:tbl><w:tr>
         |<w:tc>${p(" cell A ")}</w:tc><w:tc>${p("")}</w:tc>
         |</w:tr></w:tbl>""".stripMargin + p("apres")
    assert(DocxExtract.extractText(docx(body)) === "cell A\napres")
  }

  test("garbage bytes -> empty string (reference error contract)") {
    assert(DocxExtract.extractText("not a zip".getBytes) === "")
    assert(DocxExtract.extractText(Array.emptyByteArray) === "")
  }

  private def refDoc(name: String): Array[Byte] =
    Files.readAllBytes(Paths.get("/root/reference/fichiers source", name))

  test("golden: 17073168_12345.docx — txbxContent service header is " +
    "extracted (the file that exercises textboxes, FIXTURES.md §1.2)") {
    val txt = DocxExtract.extractText(refDoc("17073168_12345.docx"))
    assert(txt.nonEmpty)
    assert(txt.toLowerCase.contains("pastabolo"))
    assert(txt.contains("21/10/2018"))
  }

  test("golden: 00230580_321654.docx — hospitalization report dates " +
    "present; date rule would pick 12/05/2018") {
    val txt = DocxExtract.extractText(refDoc("00230580_321654.docx"))
    assert(txt.contains("01/01/1940") || txt.contains("12/05/2018"))
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val picked = Seq(txt).toDF("t")
      .select(graft.engine.TextFunctions.extractDocumentDate(col("t"))
        .cast("string")).head().getString(0)
    assert(picked === "2018-05-12")
  }

  test("golden: all 3 reference DOCX files extract non-empty text") {
    val names = Seq("00230580_321654.docx", "17068044_89787.docx",
      "17073168_12345.docx")
    names.foreach { n =>
      assert(DocxExtract.extractText(refDoc(n)).trim.nonEmpty, n)
    }
  }
}
