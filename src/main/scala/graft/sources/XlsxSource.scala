package graft.sources

import java.io.ByteArrayInputStream
import java.util.zip.ZipInputStream

import scala.collection.mutable
import scala.xml.{Node, XML}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Native XLSX reader (reference S1, `exo_1.py:17-38`) — an .xlsx is a
  * zip of XML parts; this parses `xl/sharedStrings.xml` plus a worksheet
  * and yields every cell as STRING (the reference forces
  * `HOSPITAL_PATIENT_ID` to str to keep leading zeros; exporting dates as
  * text is the upstream contract — SURVEY.md §1.2, so all-string is the
  * faithful schema; typed casts happen downstream).
  *
  * Scale shape: `parseRows` is a pure bytes→rows function, so a corpus of
  * many workbooks distributes as `binaryFile scan → flatMap(parseRows)`
  * on executors; `read` is the convenience single-file driver-side form
  * (one workbook is dimension-sized by definition).
  */
object XlsxSource {

  /** Parse one worksheet of one workbook. Returns (header, dataRows);
    * empty cells are null. `sheetIndex` is 1-based. */
  def parseRows(bytes: Array[Byte], sheetIndex: Int = 1)
      : (Seq[String], Seq[Seq[String]]) = {
    var shared = IndexedSeq.empty[String]
    var sheet: Option[Node] = None
    val fallbacks = mutable.ArrayBuffer.empty[(String, Array[Byte])]
    val target = s"xl/worksheets/sheet$sheetIndex.xml"
    val zin = new ZipInputStream(new ByteArrayInputStream(bytes))
    try {
      Iterator.continually(zin.getNextEntry).takeWhile(_ != null).foreach { e =>
        if (e.getName == "xl/sharedStrings.xml")
          shared = (load(zin) \\ "si")
            .map(si => decodeEscapes((si \\ "t").map(_.text).mkString))
            .toIndexedSeq
        else if (e.getName == target) sheet = Some(load(zin))
        else if (sheet.isEmpty &&
          e.getName.startsWith("xl/worksheets/") &&
          e.getName.endsWith(".xml"))
          // writers are free to name sheet parts arbitrarily (the mapping
          // lives in workbook.xml.rels); keep RAW bytes as ordered
          // fallbacks — only the one actually selected is DOM-parsed,
          // and nothing is buffered once the target entry has been seen
          fallbacks += e.getName -> zin.readAllBytes()
      }
    } finally zin.close()
    if (sheet.isEmpty)
      sheet = fallbacks.sortBy(_._1).drop(sheetIndex - 1).headOption
        .map(b => XML.load(new ByteArrayInputStream(b._2)))

    sheet match {
      case None => (Nil, Nil)
      case Some(ws) =>
        val rows = (ws \\ "row").map { r =>
          val cells = mutable.ArrayBuffer.empty[String]
          (r \ "c").foreach { c =>
            val colIdx = colIndex((c \ "@r").text)
            while (cells.size < colIdx) cells += null
            val t = (c \ "@t").text
            val v = t match {
              case "s" => (c \ "v").headOption.map(v => shared(v.text.toInt))
              case "inlineStr" =>
                Some(decodeEscapes((c \\ "t").map(_.text).mkString))
              case _ => (c \ "v").headOption.map(_.text)
            }
            cells += v.orNull
          }
          cells.toSeq
        }
        val header = rows.headOption.getOrElse(Nil).map(s =>
          Option(s).getOrElse("")).toSeq
        val width = header.size
        val data = rows.drop(1).map(r => r.padTo(width, null).take(width))
        (header, data)
    }
  }

  /** Single-workbook convenience: header row → column names, every column
    * StringType (faithful to the reference's all-text export). */
  def read(spark: SparkSession, path: String, sheetIndex: Int = 1): DataFrame = {
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
    val (header, data) = parseRows(bytes, sheetIndex)
    val schema = StructType(header.map(h => StructField(h, StringType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(data.map(Row.fromSeq), 4), schema)
  }

  /** ECMA-376 §18.4 escape decode: Excel writes XML-1.0-illegal
    * characters as `_xHHHH_` (and a literal `_` that would start such a
    * pattern as `_x005F_`); real workbooks carry these for control
    * characters that leaked into source systems. Single left-to-right
    * pass, so `_x005F_x0041_` decodes to the literal `_x0041_` —
    * exactly the inverse of [[XlsxWriter.escape]]. Non-hex or
    * unterminated patterns pass through unchanged. */
  private[sources] def decodeEscapes(s: String): String = {
    if (s.indexOf("_x") < 0 && s.indexOf("_X") < 0) return s
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '_' && i + 6 < s.length &&
          (s.charAt(i + 1) == 'x' || s.charAt(i + 1) == 'X') &&
          (2 to 5).forall(k => Character.digit(s.charAt(i + k), 16) >= 0) &&
          s.charAt(i + 6) == '_') {
        sb.append(Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar)
        i += 7
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** "A1" → 0, "B2" → 1, "AA5" → 26 ... (column letters only). */
  private def colIndex(ref: String): Int = {
    val letters = ref.takeWhile(_.isLetter)
    letters.foldLeft(0)((acc, ch) => acc * 26 + (ch - 'A' + 1)) - 1
  }

  /** 0 → "A", 25 → "Z", 26 → "AA" — inverse of [[colIndex]]. */
  private[sources] def colLetters(i: Int): String = {
    var n = i + 1
    val sb = new StringBuilder
    while (n > 0) {
      val r = (n - 1) % 26
      sb.insert(0, ('A' + r).toChar)
      n = (n - 1) / 26
    }
    sb.toString
  }

  private def xmlEscape(s: String): String =
    s.flatMap {
      case '&' => "&amp;"
      case '<' => "&lt;"
      case '>' => "&gt;"
      case '"' => "&quot;"
      case c => c.toString
    }

  /** Serialize (header, rows) as a minimal single-sheet .xlsx — the
    * write half of the S1 surface. Cells are written as `inlineStr`
    * (self-contained; no sharedStrings part), nulls as omitted cells —
    * both shapes [[parseRows]] already reads, so write→read round-trips
    * bit-for-bit on the string payload. One workbook is dimension-sized
    * by contract (the reference's export shape), so building it in
    * memory per partition is the intended granularity. */
  def writeBytes(header: Seq[String], rows: Iterator[Seq[String]]): Array[Byte] = {
    val bout = new java.io.ByteArrayOutputStream()
    val z = new java.util.zip.ZipOutputStream(bout)
    def part(name: String, body: String): Unit = {
      z.putNextEntry(new java.util.zip.ZipEntry(name))
      z.write(body.getBytes("UTF-8"))
      z.closeEntry()
    }
    val decl = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>"""
    part("[Content_Types].xml", decl +
      """<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">""" +
      """<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>""" +
      """<Default Extension="xml" ContentType="application/xml"/>""" +
      """<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>""" +
      """<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>""" +
      """</Types>""")
    part("_rels/.rels", decl +
      """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
      """<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>""" +
      """</Relationships>""")
    part("xl/workbook.xml", decl +
      """<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">""" +
      """<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets>""" +
      """</workbook>""")
    part("xl/_rels/workbook.xml.rels", decl +
      """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
      """<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>""" +
      """</Relationships>""")
    z.putNextEntry(new java.util.zip.ZipEntry("xl/worksheets/sheet1.xml"))
    z.write((decl +
      """<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>""")
      .getBytes("UTF-8"))
    var rowIdx = 1
    def writeRow(cells: Seq[String]): Unit = {
      val sb = new StringBuilder(s"""<row r="$rowIdx">""")
      cells.zipWithIndex.foreach { case (v, i) =>
        if (v != null)
          sb.append(s"""<c r="${colLetters(i)}$rowIdx" t="inlineStr">""")
            .append("<is><t>").append(xmlEscape(v)).append("</t></is></c>")
      }
      sb.append("</row>")
      z.write(sb.toString.getBytes("UTF-8"))
      rowIdx += 1
    }
    writeRow(header)
    rows.foreach(writeRow)
    z.write("</sheetData></worksheet>".getBytes("UTF-8"))
    z.closeEntry()
    z.close()
    bout.toByteArray
  }

  private def load(zin: ZipInputStream): Node =
    XML.load(new java.io.InputStreamReader(
      new java.io.FilterInputStream(zin) {
        override def close(): Unit = ()
      }, "UTF-8"))
}
