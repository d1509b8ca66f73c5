package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.PdfExtract

/** S5 PDF extraction goldens against the real reference corpus (Skia
  * CID-font PDFs; planted content per FIXTURES.md §1.2). */
class PdfExtractSpec extends AnyFunSuite {

  private def ref(name: String): String =
    PdfExtract.extractText(Files.readAllBytes(
      Paths.get("/root/reference/fichiers source", name)))

  test("12907356_009988.pdf: fruitologie consultation 29/10/2018") {
    val t = ref("12907356_009988.pdf")
    assert(t.contains("29/10/2018"))
  }

  test("15259272_135409.pdf: birth 12/12/2012, consult 01/02/2003, dr mozza") {
    val t = ref("15259272_135409.pdf").toLowerCase
    assert(t.contains("12/12/2012") && t.contains("01/02/2003"))
    assert(t.contains("mozza"))
  }

  test("12558924_090879.pdf: chained Dr Pierre/Vincent/Hassan/Strauss") {
    val t = ref("12558924_090879.pdf").toLowerCase
    assert(t.contains("pierre") && t.contains("strauss"))
    assert(t.contains("06/10/1999") && t.contains("17/10/2011"))
  }

  test("12856116_789456.pdf: accented Dr Pêche survives decoding") {
    val t = ref("12856116_789456.pdf").toLowerCase
    assert(t.contains("pêche") && t.contains("abricot"))
  }

  test("15172164_897653.pdf: year-2001 boundary dates present") {
    val t = ref("15172164_897653.pdf")
    assert(t.contains("05/01/1993") && t.contains("17/01/2001"))
  }

  test("all 12 reference PDFs extract non-empty text") {
    val dir = Paths.get("/root/reference/fichiers source")
    val pdfs = Files.list(dir).iterator()
    var n = 0
    pdfs.forEachRemaining { p =>
      if (p.toString.endsWith(".pdf")) {
        n += 1
        val t = PdfExtract.extractText(Files.readAllBytes(p))
        assert(t.trim.nonEmpty, s"empty extraction: $p")
      }
    }
    assert(n === 12)
  }

  test("garbage bytes -> empty string") {
    assert(PdfExtract.extractText("not a pdf".getBytes) === "")
  }
}
