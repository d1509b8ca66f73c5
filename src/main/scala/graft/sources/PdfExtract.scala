package graft.sources

import java.util.zip.Inflater

import scala.collection.mutable
import scala.util.matching.Regex

/** Minimal PDF text extraction (reference S5, `exo_2.py:38-56`) sufficient
  * for real-world "print to PDF" documents: FlateDecode streams, object
  * streams (`/Type /ObjStm`), Type0/Identity-H CID fonts decoded through
  * their `/ToUnicode` CMaps (bfchar + bfrange), and the text-showing
  * operators (Tj, TJ, ', ") of page content streams. The reference corpus
  * is Skia/Chrome print output whose glyph ids are meaningless without the
  * CMaps — naive `(...) Tj` scraping yields nothing (FIXTURES.md §1.2).
  *
  * Newlines are emitted at text-positioning ops (Td, TD, T-star, Tm), which
  * approximates PyMuPDF's per-line layout closely enough for the regex
  * metadata rules. Any failure yields "" (the reference's error contract).
  */
object PdfExtract {

  private case class PdfObj(dict: String, stream: Option[Array[Byte]])

  def extractText(bytes: Array[Byte]): String =
    try {
      val objs = parseObjects(bytes)
      val pages = pageOrder(objs)
      val sb = new StringBuilder
      pages.foreach { pageNum =>
        val page = objs(pageNum)
        val fonts = fontMaps(page.dict, objs)
        contentStreams(page.dict, objs).foreach { cs =>
          decodeContent(cs, fonts, sb)
        }
        if (sb.nonEmpty && sb.last != '\n') sb.append('\n')
      }
      sb.toString
    } catch { case scala.util.control.NonFatal(_) => "" }

  // ---- object layer ----------------------------------------------------

  private val ObjRe: Regex = "(?s)(\\d+) 0 obj(.*?)endobj".r

  private def parseObjects(bytes: Array[Byte]): mutable.Map[Int, PdfObj] = {
    val raw = new String(bytes, "ISO-8859-1")
    val objs = mutable.Map.empty[Int, PdfObj]
    for (m <- ObjRe.findAllMatchIn(raw)) {
      val num = m.group(1).toInt
      val body = m.group(2)
      val streamIdx = body.indexOf("stream")
      val dict = if (streamIdx >= 0) body.substring(0, streamIdx) else body
      val stream = extractStream(body).map { s =>
        if (dict.contains("/FlateDecode")) inflate(s) else s
      }
      objs(num) = PdfObj(dict, stream)
    }
    // expand compressed object streams: header = N pairs "objnum offset",
    // object bodies start at /First
    objs.values.filter(_.dict.contains("/ObjStm")).toSeq.foreach { o =>
      o.stream.foreach { data =>
        val first = intKey(o.dict, "First").getOrElse(0)
        val header = new String(data, 0, first, "ISO-8859-1").trim
        val nums = header.split("\\s+").filter(_.nonEmpty).map(_.toInt)
        val body = data.drop(first)
        val pairs = nums.grouped(2).collect { case Array(n, off) => (n, off) }.toSeq
        pairs.zipWithIndex.foreach { case ((n, off), i) =>
          val end = if (i + 1 < pairs.size) pairs(i + 1)._2 else body.length
          objs(n) = PdfObj(
            new String(body, off, end - off, "ISO-8859-1"), None)
        }
      }
    }
    objs
  }

  private def extractStream(body: String): Option[Array[Byte]] = {
    val i = body.indexOf("stream")
    if (i < 0) return None
    var start = i + "stream".length
    if (start < body.length && body.charAt(start) == '\r') start += 1
    if (start < body.length && body.charAt(start) == '\n') start += 1
    val end = body.lastIndexOf("endstream")
    if (end <= start) None
    else Some(body.substring(start, end).getBytes("ISO-8859-1"))
  }

  private def inflate(data: Array[Byte]): Array[Byte] = {
    val inf = new Inflater()
    inf.setInput(data)
    val out = new java.io.ByteArrayOutputStream(data.length * 4)
    val buf = new Array[Byte](8192)
    while (!inf.finished() && !inf.needsInput()) {
      val n = inf.inflate(buf)
      if (n == 0 && !inf.finished()) return out.toByteArray // corrupt tail
      out.write(buf, 0, n)
    }
    inf.end()
    out.toByteArray
  }

  private def intKey(dict: String, key: String): Option[Int] =
    ("/" + key + "\\s+(\\d+)").r.findFirstMatchIn(dict).map(_.group(1).toInt)

  private def refKey(dict: String, key: String): Option[Int] =
    ("/" + key + "\\s+(\\d+) 0 R").r.findFirstMatchIn(dict).map(_.group(1).toInt)

  // ---- document structure ---------------------------------------------

  // `/Type/Page` and `/Type /Page` both occur in the wild (xref-stream
  // writers tend to omit the space); `Page\b` will not match "Pages"
  private val PageRe: Regex = "/Type\\s*/Page\\b".r
  private val PagesRe: Regex = "/Type\\s*/Pages\\b".r
  private val CatalogRe: Regex = "/Type\\s*/Catalog\\b".r

  private def kidsOf(dict: String): Seq[Int] =
    "(\\d+) 0 R".r.findAllMatchIn(
      "/Kids\\s*\\[(.*?)\\]".r.findFirstMatchIn(dict)
        .map(_.group(1)).getOrElse(""))
      .map(_.group(1).toInt).toSeq

  /** Pages in document order: DFS through the page tree from the
    * catalog's /Pages root, expanding NESTED /Pages nodes (multi-level
    * Kids trees are how large documents balance the tree). Falls back to
    * flat Kids order, then object-number order. */
  private def pageOrder(objs: mutable.Map[Int, PdfObj]): Seq[Int] = {
    val seen = mutable.Set.empty[Int]
    def dfs(n: Int): Seq[Int] =
      if (!seen.add(n)) Nil // cycle guard
      else objs.get(n) match {
        case Some(o) if PagesRe.findFirstIn(o.dict).isDefined =>
          kidsOf(o.dict).flatMap(dfs)
        case Some(o) if PageRe.findFirstIn(o.dict).isDefined => Seq(n)
        case _ => Nil
      }
    val fromTree = objs.values
      .find(o => CatalogRe.findFirstIn(o.dict).isDefined)
      .flatMap(o => refKey(o.dict, "Pages"))
      .map(dfs).getOrElse(Nil)
    if (fromTree.nonEmpty) fromTree.distinct
    else {
      val pageNums = objs.collect {
        case (n, o) if PageRe.findFirstIn(o.dict).isDefined => n
      }.toSet
      val kids = objs.values
        .filter(o => PagesRe.findFirstIn(o.dict).isDefined)
        .flatMap(o => kidsOf(o.dict))
        .filter(pageNums.contains).toSeq
      if (kids.nonEmpty) kids.distinct else pageNums.toSeq.sorted
    }
  }

  private def contentStreams(pageDict: String,
                             objs: mutable.Map[Int, PdfObj]): Seq[Array[Byte]] = {
    val refs = refKey(pageDict, "Contents").map(Seq(_)).getOrElse {
      "/Contents\\s*\\[(.*?)\\]".r.findFirstMatchIn(pageDict)
        .map(m => "(\\d+) 0 R".r.findAllMatchIn(m.group(1))
          .map(_.group(1).toInt).toSeq)
        .getOrElse(Nil)
    }
    refs.flatMap(objs.get).flatMap(_.stream)
  }

  /** Per-font-name decoded maps for the page: fontName → (code → text,
    * bytesPerCode). */
  private def fontMaps(pageDict: String, objs: mutable.Map[Int, PdfObj])
      : Map[String, (Map[Int, String], Int)] = {
    val resDict = refKey(pageDict, "Resources")
      .flatMap(objs.get).map(_.dict).getOrElse(pageDict)
    val fontBlock = "/Font\\s*<<(.*?)>>".r.findFirstMatchIn(resDict)
      .map(_.group(1)).getOrElse("")
    "/(\\w+)\\s+(\\d+) 0 R".r.findAllMatchIn(fontBlock).map { m =>
      val name = m.group(1)
      val fontObj = objs.get(m.group(2).toInt)
      val dict = fontObj.map(_.dict).getOrElse("")
      val twoByte = dict.contains("/Type0") || dict.contains("/Identity-H")
      val cmap = refKey(dict, "ToUnicode").flatMap(objs.get).flatMap(_.stream)
        .map(s => parseCMap(new String(s, "ISO-8859-1")))
        .getOrElse(Map.empty[Int, String])
      name -> (cmap, if (twoByte) 2 else 1)
    }.toMap
  }

  // ---- ToUnicode CMap --------------------------------------------------

  private[sources] def parseCMap(text: String): Map[Int, String] = {
    val map = mutable.Map.empty[Int, String]
    def hexToInt(h: String) = Integer.parseInt(h, 16)
    def hexToStr(h: String): String = {
      // UTF-16BE code units, 4 hex digits each
      h.grouped(4).map(u => Integer.parseInt(u, 16).toChar).mkString
    }
    for (block <- "(?s)beginbfchar(.*?)endbfchar".r
           .findAllMatchIn(text).map(_.group(1))) {
      val toks = "<([0-9A-Fa-f]+)>".r.findAllMatchIn(block)
        .map(_.group(1)).toSeq
      toks.grouped(2).foreach {
        case Seq(src, dst) => map(hexToInt(src)) = hexToStr(dst)
        case _ =>
      }
    }
    for (block <- "(?s)beginbfrange(.*?)endbfrange".r
           .findAllMatchIn(text).map(_.group(1))) {
      // triples: <lo> <hi> <start>   OR   <lo> <hi> [ <d0> <d1> ... ]
      val item = "<([0-9A-Fa-f]+)>|\\[(.*?)\\]".r
      val toks = item.findAllMatchIn(block).toSeq
      var i = 0
      while (i + 2 < toks.size + 1 && i + 2 <= toks.size) {
        (toks.lift(i), toks.lift(i + 1), toks.lift(i + 2)) match {
          case (Some(lo), Some(hi), Some(third))
              if lo.group(1) != null && hi.group(1) != null =>
            val loI = hexToInt(lo.group(1)); val hiI = hexToInt(hi.group(1))
            if (third.group(2) != null) { // array form
              val dsts = "<([0-9A-Fa-f]+)>".r.findAllMatchIn(third.group(2))
                .map(_.group(1)).toSeq
              for ((d, k) <- dsts.zipWithIndex if loI + k <= hiI)
                map(loI + k) = hexToStr(d)
            } else {
              val start = hexToInt(third.group(1))
              for (c <- loI to hiI)
                map(c) = hexToStr(
                  (start + c - loI).toHexString.reverse.padTo(4, '0')
                    .reverse.mkString)
            }
          case _ =>
        }
        i += 3
      }
    }
    map.toMap
  }

  // ---- content stream decoding ----------------------------------------

  private sealed trait TextItem
  private final case class StrItem(bytes: Array[Byte]) extends TextItem
  private final case class KernItem(v: Double) extends TextItem

  /** TJ kern adjustments at-or-below this (thousandths of an em, i.e.
    * glyph-space units) render as an inter-word gap — the heuristic
    * PyMuPDF-class extractors use; smaller magnitudes are letter-fitting
    * kerns inside a word. */
  private val SpaceKern = -180.0

  private def decodeContent(content: Array[Byte],
                            fonts: Map[String, (Map[Int, String], Int)],
                            sb: StringBuilder): Unit = {
    val s = new String(content, "ISO-8859-1")
    var font: (Map[Int, String], Int) = (Map.empty, 1)
    var i = 0
    val n = s.length
    val pending = mutable.ArrayBuffer.empty[TextItem]
    var lastName: String = null
    var inArray = false
    val NumRe: Regex = "[-+]?(?:\\d+\\.?\\d*|\\.\\d+)".r

    def emit(items: Seq[TextItem]): Unit = {
      val (cmap, width) = font
      items.foreach {
        case KernItem(v) =>
          // kerning-aware spacing: a big negative adjustment is a space
          if (v <= SpaceKern && sb.nonEmpty && !sb.last.isWhitespace)
            sb.append(' ')
        case StrItem(b) =>
          var j = 0
          while (j + width <= b.length) {
            val code = if (width == 2)
              ((b(j) & 0xff) << 8) | (b(j + 1) & 0xff)
            else b(j) & 0xff
            sb.append(cmap.getOrElse(code,
              if (width == 1) (code.toChar).toString else ""))
            j += width
          }
      }
    }
    def newline(): Unit =
      if (sb.nonEmpty && sb.last != '\n') sb.append('\n')

    while (i < n) {
      val c = s.charAt(i)
      c match {
        case '(' =>
          val (bytes, next) = literalString(s, i)
          pending += StrItem(bytes); i = next
        case '<' if i + 1 < n && s.charAt(i + 1) != '<' =>
          val end = s.indexOf('>', i)
          val hex = s.substring(i + 1, if (end < 0) n else end)
            .filterNot(_.isWhitespace)
          val padded = if (hex.length % 2 == 1) hex + "0" else hex
          pending += StrItem(padded.grouped(2)
            .map(h => Integer.parseInt(h, 16).toByte).toArray)
          i = (if (end < 0) n else end) + 1
        case '/' =>
          val m = "/([A-Za-z0-9]+)".r.findPrefixMatchOf(s.substring(i))
          lastName = m.map(_.group(1)).orNull
          i += 1 + (if (lastName == null) 0 else lastName.length)
        case '[' => inArray = true; i += 1
        case ']' => inArray = false; i += 1
        case ch if inArray && (ch.isDigit || ch == '-' || ch == '+' || ch == '.') =>
          // numbers INSIDE a TJ array are kern adjustments; numbers
          // elsewhere (coordinates) are skipped by the default case
          val m = NumRe.findPrefixMatchOf(s.substring(i))
          m.foreach(mm => pending += KernItem(mm.matched.toDouble))
          i += m.map(_.matched.length).getOrElse(1)
        case ch if ch.isLetter || ch == '\'' || ch == '"' || ch == '*' =>
          val m = "[A-Za-z'\"*]+".r.findPrefixMatchOf(s.substring(i))
          val op = m.map(_.matched).getOrElse(ch.toString)
          op match {
            case "Tf" => fonts.get(lastName).foreach(f => font = f)
            case "Tj" | "TJ" => emit(pending.toSeq); pending.clear()
            case "'" | "\"" =>
              newline(); emit(pending.toSeq); pending.clear()
            case "Td" | "TD" | "T*" | "Tm" => newline(); pending.clear()
            case "BT" | "ET" => pending.clear()
            case _ => pending.clear()
          }
          i += op.length
        case _ => i += 1
      }
    }
  }

  /** PDF literal string with escapes and balanced parens → raw bytes. */
  private def literalString(s: String, start: Int): (Array[Byte], Int) = {
    val out = new java.io.ByteArrayOutputStream()
    var i = start + 1
    var depth = 1
    while (i < s.length && depth > 0) {
      s.charAt(i) match {
        case '\\' if i + 1 < s.length =>
          s.charAt(i + 1) match {
            case 'n' => out.write('\n'); i += 2
            case 'r' => out.write('\r'); i += 2
            case 't' => out.write('\t'); i += 2
            case 'b' => out.write('\b'); i += 2
            case 'f' => out.write('\f'); i += 2
            case d if d >= '0' && d <= '7' =>
              val oct = s.substring(i + 1, math.min(i + 4, s.length))
                .takeWhile(ch => ch >= '0' && ch <= '7')
              out.write(Integer.parseInt(oct, 8)); i += 1 + oct.length
            case other => out.write(other); i += 2
          }
        case '(' => depth += 1; out.write('('); i += 1
        case ')' =>
          depth -= 1; if (depth > 0) out.write(')'); i += 1
        case ch => out.write(ch); i += 1
      }
    }
    (out.toByteArray, i)
  }
}
