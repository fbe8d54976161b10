package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** package-private parser internals: cases reachable only through real-world
  * container quirks (tagged-PDF dictionaries, astral XML entities).
  */
class BinaryInternalsSpec extends AnyFunSuite {

  test("PDF content streams: <<…>> dictionaries skipped, not misread as hex strings") {
    // marked-content props, the shape Word/LaTeX emit in tagged PDFs
    assert(PdfParser.textOfStream("/P <</MCID 0>> BDC (Hello) Tj EMC") == "Hello")
    // nested dict, then a REAL hex string must still decode
    assert(PdfParser.textOfStream("<</A <</B 1>>>> BDC <4869> Tj") == "Hi")
    // a non-hex single-< token must not crash the walker
    assert(PdfParser.textOfStream("<zz> (ok) Tj") == "ok")
  }

  test("Ooxml.unescape: astral-plane refs become surrogate pairs; uppercase hex prefix") {
    assert(Ooxml.unescape("&#128512;") == new String(Character.toChars(128512)))
    assert(Ooxml.unescape("&#x1F600;") == new String(Character.toChars(0x1f600)))
    assert(Ooxml.unescape("&#X41;") == "A")
    assert(Ooxml.unescape("a &amp; b") == "a & b")
  }
}
