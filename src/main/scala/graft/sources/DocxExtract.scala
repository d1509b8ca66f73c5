package graft.sources

import java.io.ByteArrayInputStream
import java.util.zip.ZipInputStream

import scala.collection.mutable
import scala.xml.{Node, XML}

/** DOCX text extraction (reference S6, `exo_2.py:59-133`) from raw bytes —
  * a DOCX is a zip with the body at `word/document.xml`; no external
  * libraries needed (JDK zip + scala-xml).
  *
  * Extraction order mirrors the reference exactly:
  *   1. text-box runs (`w:txbxContent` → `w:p` → `w:t`), de-duplicated by
  *      exact run text through a global seen-set,
  *   2. body tables, row-major, each non-empty cell's text (paragraphs
  *      within a cell joined by newline, then trimmed),
  *   3. body paragraphs (direct runs only — nested text-box content is
  *      NOT double-counted, matching python-docx `paragraph.text`),
  * all joined by newline. Any parse failure yields "" (the reference
  * logs and returns "" — `exo_2.py:131-133`).
  */
object DocxExtract {

  def extractText(bytes: Array[Byte]): String =
    try {
      documentXml(bytes) match {
        case None => ""
        case Some(root) =>
          val parts = mutable.ArrayBuffer.empty[String]
          val tb = textboxText(root)
          if (tb.nonEmpty) parts += tb
          val body = (root \ "body").headOption.getOrElse(root)
          body.child.foreach {
            case tbl: Node if tbl.label == "tbl" =>
              for {
                row <- tbl \ "tr"
                cell <- row \ "tc"
              } {
                val cellText = (cell \ "p").map(paragraphText).mkString("\n").trim
                if (cellText.nonEmpty) parts += cellText
              }
            case p: Node if p.label == "p" => parts += paragraphText(p)
            case _ =>
          }
          parts.mkString("\n")
      }
    } catch { case scala.util.control.NonFatal(_) => "" }

  /** Reference rule 1: every `w:t` under every `w:p` of every
    * `w:txbxContent`, deduped by exact text, newline-joined. */
  private def textboxText(root: Node): String = {
    val seen = mutable.LinkedHashSet.empty[String]
    for {
      box <- root \\ "txbxContent"
      p <- box \\ "p"
      t <- p \\ "t"
      txt = t.text
      if txt.nonEmpty
    } seen += txt
    seen.mkString("\n")
  }

  /** python-docx `paragraph.text`: direct runs (and hyperlink runs) only —
    * excludes runs nested in drawings/text boxes. */
  private def paragraphText(p: Node): String = {
    val direct = (p \ "r").flatMap(r => r \ "t").map(_.text)
    val hyper = (p \ "hyperlink").flatMap(h => h \ "r").flatMap(r => r \ "t").map(_.text)
    (direct ++ hyper).mkString
  }

  private def documentXml(bytes: Array[Byte]): Option[Node] = {
    val zin = new ZipInputStream(new ByteArrayInputStream(bytes))
    try {
      Iterator.continually(zin.getNextEntry)
        .takeWhile(_ != null)
        .collectFirst {
          case e if e.getName == "word/document.xml" =>
            XML.load(new java.io.InputStreamReader(
              new java.io.FilterInputStream(zin) {
                override def close(): Unit = () // keep the zip stream open
              }, "UTF-8"))
        }
    } finally zin.close()
  }
}
