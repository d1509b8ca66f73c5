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
          shared = (load(zin) \\ "si").map(si => (si \\ "t").map(_.text).mkString)
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
              case "inlineStr" => Some((c \\ "t").map(_.text).mkString)
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

  /** "A1" → 0, "B2" → 1, "AA5" → 26 ... (column letters only). */
  private def colIndex(ref: String): Int = {
    val letters = ref.takeWhile(_.isLetter)
    letters.foldLeft(0)((acc, ch) => acc * 26 + (ch - 'A' + 1)) - 1
  }

  private def load(zin: ZipInputStream): Node =
    XML.load(new java.io.InputStreamReader(
      new java.io.FilterInputStream(zin) {
        override def close(): Unit = ()
      }, "UTF-8"))
}
