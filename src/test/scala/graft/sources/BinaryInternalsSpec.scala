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

  test("PDF text matrix: Tm column jumps break lines, horizontal Td does not — pypdf's order") {
    // two-column page, column-major stream, positioned ONLY with Tm (no
    // Td): the naive every-Td-breaks walk emits this as ONE line; tracking
    // the matrix's y breaks at every vertical move, including the jump
    // back UP to the second column's top
    val twoCol =
      "BT /F1 12 Tf " +
        "1 0 0 1 72 720 Tm (Left one) Tj " +
        "1 0 0 1 72 704 Tm (Left two) Tj " +
        "1 0 0 1 300 720 Tm (Right one) Tj " +
        "1 0 0 1 300 704 Tm (Right two) Tj ET"
    assert(PdfParser.textOfStream(twoCol) == "Left one\nLeft two\nRight one\nRight two")
    // kerned words on one visual line: Td with ty=0 must NOT split
    assert(PdfParser.textOfStream(
      "BT 72 720 Td (Hello) Tj 40 0 Td (world) Tj 0 -16 Td (next) Tj ET")
      == "Helloworld\nnext")
    // same y via Tm keeps one line too (left+right cell of one table row)
    assert(PdfParser.textOfStream(
      "BT 1 0 0 1 72 700 Tm (cell a) Tj 1 0 0 1 300 700 Tm (cell b) Tj ET")
      == "cell acell b")
    // T* honors TL; TD records leading for subsequent T*
    assert(PdfParser.textOfStream("BT 14 TL 72 720 Td (a) Tj T* (b) Tj ET") == "a\nb")
    assert(PdfParser.textOfStream("BT 0 -16 TD (a) Tj T* (b) Tj ET") == "a\nb")
    // ' and " imply a line advance before showing
    assert(PdfParser.textOfStream("BT 72 720 Td (a) Tj (b) ' ET") == "a\nb")
  }

  test("PDF extractor end-to-end: a Tm-positioned two-column page reads column-major, not as one line") {
    def stream(lines: Seq[String]): String = {
      val data = lines.mkString("\n") + "\n"
      s"<< /Length ${data.length} >>\nstream\n${data}endstream"
    }
    val objs: Seq[String] = Seq(
      "<< /Type /Catalog /Pages 2 0 R >>",
      "<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
      "<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] /Contents 4 0 R >>",
      stream(Seq("BT", "/F1 12 Tf",
        "1 0 0 1 72 720 Tm", "(Column one line one.) Tj",
        "1 0 0 1 72 704 Tm", "(Column one line two.) Tj",
        "1 0 0 1 306 720 Tm", "(Column two line one.) Tj",
        "1 0 0 1 306 704 Tm", "(Column two line two.) Tj", "ET")),
    )
    val sb = new StringBuilder("%PDF-1.4\n")
    val offsets = objs.zipWithIndex.map { case (o, i) =>
      val off = sb.length; sb.append(s"${i + 1} 0 obj\n$o\nendobj\n"); off
    }
    val xrefOff = sb.length
    sb.append(s"xref\n0 ${objs.length + 1}\n").append("0000000000 65535 f \n")
    offsets.foreach(o => sb.append(f"$o%010d 00000 n \n"))
    sb.append(s"trailer\n<< /Size ${objs.length + 1} /Root 1 0 R >>\nstartxref\n$xrefOff\n%%EOF\n")
    val (text, meta) = new PdfExtractor().extract(
      sb.toString.getBytes(java.nio.charset.StandardCharsets.US_ASCII), "twocol.pdf")
    assert(text == "Column one line one.\nColumn one line two.\nColumn two line one.\nColumn two line two.")
    assert(meta("page_count") == "1")
  }

  test("ToUnicode CMap parsing: bfchar, bfrange offset + array forms, code width") {
    val (two, m) = PdfParser.parseToUnicode(
      """begincmap
        |1 begincodespacerange
        |<0000> <FFFF>
        |endcodespacerange
        |2 beginbfchar
        |<0003> <0041>
        |<0004> <00660069>
        |endbfchar
        |2 beginbfrange
        |<0010> <0012> <0061>
        |<0020> <0021> [<005A> <0079>]
        |endbfrange
        |endcmap""".stripMargin)
    assert(two, "4-hex codespace means 2-byte codes")
    assert(m(3) == "A" && m(4) == "fi", "bfchar: single and multi-unit targets")
    assert(m(0x10) == "a" && m(0x11) == "b" && m(0x12) == "c", "bfrange increments last unit")
    assert(m(0x20) == "Z" && m(0x21) == "y", "bfrange array form maps per code")
    val (one, m1) = PdfParser.parseToUnicode("1 beginbfchar\n<41> <0042>\nendbfchar")
    assert(!one && m1(0x41) == "B", "2-hex sources stay single-byte")
  }

  test("glyph names: AGL subset, uniXXXX algorithmic form, unknown -> None") {
    assert(PdfParser.glyphToUnicode("eacute").contains("é"))
    assert(PdfParser.glyphToUnicode("space").contains(" "))
    assert(PdfParser.glyphToUnicode("uni20AC").contains("€"))
    assert(PdfParser.glyphToUnicode("u1F600").contains(new String(Character.toChars(0x1F600))))
    assert(PdfParser.glyphToUnicode("g42").isEmpty)
  }

  test("Differences + WinAnsi base: overridden codes remap, others follow the base, gaps stay literal") {
    val t = PdfParser.singleByteTable(Some("WinAnsiEncoding"), Some("65 /eacute /egrave 129 /g42")).get
    assert(t(65) == "é" && t(66) == "è", "differences run sequentially from the start code")
    assert(t(0x93) == "“", "WinAnsi 0x93 is the left curly quote (cp1252)")
    assert(t(67) == "C", "codes outside the differences keep the base encoding")
    // unknown glyph name over a cp1252-undefined byte -> entry stays null
    // -> literal byte at decode time
    assert(t(0x81) == null)
    val d = new PdfParser.FontDecoder(false, Map.empty, Some(t))
    assert(d.decode("CafA") == "Café")
  }

  test("Tf switches decoders mid-stream; Identity-H reads 2-byte codes") {
    val cid = new PdfParser.FontDecoder(true, Map(3 -> "H", 4 -> "i"), None)
    val fonts = Map("F1" -> cid, "F2" -> PdfParser.FontDecoder.Identity)
    val cs = "BT /F1 12 Tf 72 720 Td <00030004> Tj /F2 9 Tf ( plain) Tj ET"
    assert(PdfParser.textOfStream(cs, fonts) == "Hi plain")
    // unmapped 2-byte code falls back to its UTF-16 code point
    assert(cid.decode(new String(Array('\u0000', 'A'))) == "A")
  }

  test("rotated text (zero-diagonal Tm): vertical columns split where a y-only tracker merges") {
    val cs = "BT /F1 12 Tf " +
      "0 1 -1 0 300 100 Tm (Vertical one) Tj " +
      "0 1 -1 0 316 100 Tm (Vertical two) Tj ET"
    assert(PdfParser.textOfStream(cs) == "Vertical one\nVertical two")
    // movement ALONG the rotated baseline (y shifts, x fixed) stays one line
    val along = "BT 0 1 -1 0 300 100 Tm (seg a) Tj 0 1 -1 0 300 150 Tm (seg b) Tj ET"
    assert(PdfParser.textOfStream(along) == "seg aseg b")
  }

  test("CID fixture end-to-end: glyph-index strings come back as prose, rotated page splits") {
    val (text, meta) = new PdfExtractor().extract(graft.FixtureGen.cidPdfBytes, "cid.pdf")
    assert(text ==
      "Subset fonts decode\nCID text reads fine\n\nVertical one\nVertical two", s"got: $text")
    assert(meta("page_count") == "2")
    assert(meta("title") == "CID Fixture" && meta("author") == "Graft Team")
  }

  test("Form XObjects: Do splices the form's text with its own resources; nesting recurses; cycles are cut") {
    def stream(lines: Seq[String], extra: String = ""): String = {
      val data = lines.mkString("\n") + "\n"
      s"<< /Length ${data.length}$extra >>\nstream\n${data}endstream"
    }
    val objs: Seq[String] = Seq(
      "<< /Type /Catalog /Pages 2 0 R >>",
      "<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
      "<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
        "/Resources << /XObject << /Fm1 5 0 R >> >> /Contents 4 0 R >>",
      stream(Seq("BT", "72 720 Td", "(Before form.) Tj", "ET",
        "/Fm1 Do",
        "BT", "72 600 Td", "(After form.) Tj", "ET")),
      stream(Seq("BT", "10 10 Td", "(Inside form.) Tj", "ET", "/Fm2 Do"),
        " /Type /XObject /Subtype /Form /Resources << /XObject << /Fm2 6 0 R >> >>"),
      // the nested form references Fm1 — a CYCLE that must cut, not recurse
      stream(Seq("BT", "5 5 Td", "(Deep.) Tj", "ET", "/Fm1 Do"),
        " /Type /XObject /Subtype /Form /Resources << /XObject << /Fm1 5 0 R >> >>"),
    )
    val sb = new StringBuilder("%PDF-1.4\n")
    val offsets = objs.zipWithIndex.map { case (o, i) =>
      val off = sb.length; sb.append(s"${i + 1} 0 obj\n$o\nendobj\n"); off
    }
    val xrefOff = sb.length
    sb.append(s"xref\n0 ${objs.length + 1}\n").append("0000000000 65535 f \n")
    offsets.foreach(o => sb.append(f"$o%010d 00000 n \n"))
    sb.append(s"trailer\n<< /Size ${objs.length + 1} /Root 1 0 R >>\nstartxref\n$xrefOff\n%%EOF\n")
    val (text, _) = new PdfExtractor().extract(
      sb.toString.getBytes(java.nio.charset.StandardCharsets.US_ASCII), "form.pdf")
    assert(text == "Before form.\nInside form.\nDeep.\nAfter form.", s"got: $text")
  }

  test("FlateDecode'd /ToUnicode CMap: the font decoder defilters the stream before parsing") {
    // real exporters compress the CMap; the decoder must read it through
    // the same filter chain as any content stream
    val cmap =
      "begincmap\n1 begincodespacerange\n<0000> <FFFF>\nendcodespacerange\n" +
        "2 beginbfchar\n<0003> <0048>\n<0004> <0069>\nendbfchar\nendcmap\n"
    val d = new java.util.zip.Deflater()
    d.setInput(cmap.getBytes(java.nio.charset.StandardCharsets.US_ASCII)); d.finish()
    val buf = new Array[Byte](4096)
    val n = d.deflate(buf)
    val compressed = new String(buf, 0, n, java.nio.charset.StandardCharsets.ISO_8859_1)
    val objs = Map(
      9 -> (s"<< /Length $n /Filter /FlateDecode >>\nstream\n${compressed}endstream"))
    val fontBody = "<< /Type /Font /Subtype /Type0 /Encoding /Identity-H /ToUnicode 9 0 R >>"
    val dec = PdfParser.fontDecoder(fontBody, objs,
      num => PdfParser.streamData(objs(num)))
    assert(dec.twoByte)
    assert(dec.decode(new String(Array('\u0000', '\u0003', '\u0000', '\u0004'))) == "Hi")
  }

  test("Ooxml.unescape: astral-plane refs become surrogate pairs; uppercase hex prefix") {
    assert(Ooxml.unescape("&#128512;") == new String(Character.toChars(128512)))
    assert(Ooxml.unescape("&#x1F600;") == new String(Character.toChars(0x1f600)))
    assert(Ooxml.unescape("&#X41;") == "A")
    assert(Ooxml.unescape("a &amp; b") == "a & b")
  }
}
