package graft.sources

import java.nio.charset.StandardCharsets.ISO_8859_1
import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** [[FontPrograms]] — embedded-font-program decoding for PDF simple fonts
  * with no /ToUnicode, /Differences or base encoding (the pypdf fallback,
  * reference backend/extractors/pdf_extractor.py:16-40). Synthetic fonts
  * are built byte-by-byte here so each table format is pinned exactly;
  * the committed fixture (tools/make_pdffont_fixture.py) covers the
  * end-to-end walker path for all three program families.
  */
class FontProgramsSpec extends AnyFunSuite {

  private def u16(v: Int): Array[Byte]  = Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def u32(v: Int): Array[Byte]  = Array((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
  private def cat(bs: Array[Byte]*): Array[Byte] = bs.flatten.toArray

  /** sfnt wrapper: version + table directory + bodies at computed offsets. */
  private def sfnt(version: Array[Byte], tables: (String, Array[Byte])*): Array[Byte] = {
    val dirLen = 12 + 16 * tables.length
    var off    = dirLen
    val dir = tables.map { case (tag, body) =>
      val rec = cat(tag.getBytes(ISO_8859_1), u32(0), u32(off), u32(body.length))
      off += body.length
      rec
    }
    cat((Seq(version, u16(tables.length), u16(16), u16(2), u16(0)) ++ dir ++ tables.map(_._2)): _*)
  }

  /** post 2.0: standard-Mac indices (< 258) or custom pascal names. */
  private def post2(indices: Seq[Int], customNames: Seq[String]): Array[Byte] =
    cat((Seq(u32(0x00020000), u32(0), u16(0), u16(0), u32(0), u32(0), u32(0), u32(0), u32(0),
      u16(indices.length)) ++ indices.map(u16) ++
      customNames.map(n => cat(Array(n.length.toByte), n.getBytes(ISO_8859_1)))): _*)

  private def cmapWrap(platform: Int, encoding: Int, sub: Array[Byte]): Array[Byte] =
    cat(u16(0), u16(1), u16(platform), u16(encoding), u32(12), sub)

  private def cmap6(first: Int, glyphs: Seq[Int]): Array[Byte] =
    cat((Seq(u16(6), u16(10 + 2 * glyphs.length), u16(0), u16(first), u16(glyphs.length)) ++
      glyphs.map(u16)): _*)

  test("TrueType: cmap format 4 with idRangeOffset glyph array + post 2.0 custom names") {
    // one data segment (codes 65..68 -> glyphs 5..8 via the glyph-id
    // array, ro = 4 skips the two idRangeOffset slots) + 0xffff terminator
    val fmt4 = cat(
      u16(4), u16(40), u16(0), u16(4), u16(4), u16(1), u16(0),
      u16(68), u16(0xffff), u16(0),            // endCodes + reservedPad
      u16(65), u16(0xffff),                    // startCodes
      u16(0), u16(1),                          // idDelta
      u16(4), u16(0),                          // idRangeOffset
      u16(5), u16(6), u16(7), u16(8))          // glyphIdArray
    // glyphs 5..8 -> custom names z, e, d, uni0058 (the algorithmic form)
    val post = post2(Seq(0, 0, 0, 0, 0, 258, 259, 260, 261), Seq("z", "e", "d", "uni0058"))
    val t = FontPrograms.table(sfnt(u32(0x00010000), "cmap" -> cmapWrap(1, 0, fmt4), "post" -> post)).get
    assert((65 to 68).map(t(_)).mkString == "zedX")
    assert(t(64) == null && t(69) == null)
  }

  test("TrueType: cmap format 4 idDelta arithmetic (no glyph array) + post 1.0 standard order") {
    // codes 97..99 -> glyphs code-64 (delta -64 mod 2^16) = 33..35; post
    // 1.0 means glyph id IS the standard-Mac index: 33..35 = '>','?','@'
    val fmt4 = cat(
      u16(4), u16(32), u16(0), u16(4), u16(4), u16(1), u16(0),
      u16(99), u16(0xffff), u16(0),
      u16(97), u16(0xffff),
      u16(65472), u16(1),
      u16(0), u16(0))
    val post = u32(0x00010000)
    val t = FontPrograms.table(sfnt(u32(0x00010000), "cmap" -> cmapWrap(1, 0, fmt4), "post" -> post)).get
    assert((97 to 99).map(t(_)).mkString == ">?@")
  }

  test("TrueType: MS-symbol (3,0) cmap parks byte codes at 0xF0xx") {
    val sub  = cmap6(0xf041, Seq(1, 2))
    val post = post2(Seq(0, 'k' - 29, 'w' - 29), Seq.empty)
    val t = FontPrograms.table(sfnt(u32(0x00010000), "cmap" -> cmapWrap(3, 0, sub), "post" -> post)).get
    assert(t(0x41) == "k" && t(0x42) == "w")
  }

  test("TrueType: Unicode-only (3,1) cmap — covered codes decode as themselves") {
    val fmt4 = cat(
      u16(4), u16(32), u16(0), u16(4), u16(4), u16(1), u16(0),
      u16(0x43), u16(0xffff), u16(0),
      u16(0x41), u16(0xffff),
      u16(1), u16(1),
      u16(0), u16(0))
    val t = FontPrograms.table(sfnt(u32(0x00010000), "cmap" -> cmapWrap(3, 1, fmt4))).get
    assert(t(0x41) == "A" && t(0x42) == "B" && t(0x43) == "C" && t(0x44) == null)
  }

  /** Minimal CFF with explicit encoding/charset bodies at computed offsets. */
  private def cff(nGlyphs: Int, encoding: Array[Byte], charset: Array[Byte],
                  strings: Seq[String]): Array[Byte] = {
    val nameIdx = cat(u16(1), Array(1.toByte), Array(1.toByte, 2.toByte), "G".getBytes(ISO_8859_1))
    val strIdx =
      if (strings.isEmpty) u16(0)
      else {
        val offs = strings.scanLeft(1)(_ + _.length)
        cat((Seq(u16(strings.length), Array(1.toByte)) ++ offs.map(o => Array(o.toByte)) ++
          strings.map(_.getBytes(ISO_8859_1))): _*)
      }
    def dict(encOff: Int, csOff: Int, chOff: Int): Array[Byte] =
      cat(Array(29.toByte), u32(chOff), Array(17.toByte),
        Array(29.toByte), u32(csOff), Array(15.toByte),
        Array(29.toByte), u32(encOff), Array(16.toByte))
    val dictLen = dict(0, 0, 0).length
    val topIdx0 = cat(u16(1), Array(1.toByte), Array(1.toByte, (1 + dictLen).toByte))
    val header  = Array[Byte](1, 0, 4, 2)
    val base    = header.length + nameIdx.length + topIdx0.length + dictLen + strIdx.length
    val encOff  = base
    val csOff   = encOff + encoding.length
    val chOff   = csOff + charset.length
    val charstr = cat((Seq(u16(nGlyphs), Array(1.toByte)) ++
      (1 to nGlyphs + 1).map(i => Array(i.toByte)) ++
      Seq(Array.fill(nGlyphs)(0x0e.toByte))): _*)
    cat(header, nameIdx, topIdx0, dict(encOff, csOff, chOff), strIdx, encoding, charset, charstr)
  }

  test("CFF: format-1 encoding/charset ranges + custom String INDEX names (SID >= 391)") {
    // glyphs 1..3: SIDs 391..393 (one charset range) -> custom names
    // uni0041/uni0042/space; codes 97..99 (one encoding range)
    val enc = Array(1.toByte, 1.toByte, 97.toByte, 2.toByte)
    val cs  = cat(Array(1.toByte), u16(391), Array(2.toByte))
    val t = FontPrograms.table(cff(4, enc, cs, Seq("uni0041", "uni0042", "space"))).get
    assert(t(97) == "A" && t(98) == "B" && t(99) == " " && t(100) == null)
  }

  test("CFF: charset format 2 (u16 range counts) resolves SIDs like format 1") {
    // one format-2 range: first SID 66 ('a' is SID 66? no — SID 66 is
    // ascii 97 via sid = ord-31), nLeft 2 -> glyphs 1..3 = SIDs 66,67,68
    // = 'a','b','c'; encoding format 0 codes 97..99
    val enc = cat(Array(0.toByte, 3.toByte), Array(97.toByte, 98.toByte, 99.toByte))
    val cs  = cat(Array(2.toByte), u16(66), u16(2))
    val t = FontPrograms.table(cff(4, enc, cs, Seq.empty)).get
    assert(t(97) == "a" && t(98) == "b" && t(99) == "c")
  }

  test("CFF: standard encoding (offset 0 semantics need no encoding body) inside an OTTO sfnt") {
    // encodingOff = 0 -> Standard Encoding: code IS the Adobe order; the
    // CFF rides in an OpenType 'CFF ' table to cover the OTTO unwrap
    def dict0(csOff: Int, chOff: Int): Array[Byte] =
      cat(Array(29.toByte), u32(chOff), Array(17.toByte),
        Array(29.toByte), u32(csOff), Array(15.toByte),
        Array(28.toByte), u16(0), Array(16.toByte))
    val nameIdx = cat(u16(1), Array(1.toByte), Array(1.toByte, 2.toByte), "G".getBytes(ISO_8859_1))
    val dictLen = dict0(0, 0).length
    val topIdx0 = cat(u16(1), Array(1.toByte), Array(1.toByte, (1 + dictLen).toByte))
    val header  = Array[Byte](1, 0, 4, 2)
    val csOff   = header.length + nameIdx.length + topIdx0.length + dictLen + 2 // + empty String INDEX
    val charset = cat(Array(0.toByte), u16(1), u16(2))
    val charstr = cat(u16(3), Array(1.toByte), Array(1.toByte, 2.toByte, 3.toByte, 4.toByte),
      Array.fill(3)(0x0e.toByte))
    val body = cat(header, nameIdx, topIdx0, dict0(csOff, csOff + charset.length),
      u16(0), charset, charstr)
    val t = FontPrograms.table(sfnt("OTTO".getBytes(ISO_8859_1), "CFF " -> body)).get
    assert(t('A') == "A" && t('z') == "z" && t(0x27) == "’") // Adobe: 0x27 = quoteright
  }

  test("Type1: PFB segment headers stripped, dup/put encoding vector read from cleartext") {
    val clear = ("%!PS-AdobeFont-1.0: T 001\n/Encoding 256 array\n" +
      "0 1 255 {1 index exch /.notdef put} for\n" +
      "dup 65 /g put\ndup 66 /space put\ndup 67 /uni0021 put\n" +
      "readonly def\neexec\n").getBytes(ISO_8859_1)
    val binary = Array.fill(16)(0xab.toByte)
    def seg(kind: Int, data: Array[Byte]): Array[Byte] =
      cat(Array(0x80.toByte, kind.toByte,
        (data.length & 0xff).toByte, ((data.length >> 8) & 0xff).toByte,
        ((data.length >> 16) & 0xff).toByte, ((data.length >> 24) & 0xff).toByte), data)
    val pfb = cat(seg(1, clear), seg(2, binary), Array(0x80.toByte, 3.toByte))
    val t = FontPrograms.table(pfb).get
    assert(t(65) == "g" && t(66) == " " && t(67) == "!" && t(68) == null)
  }

  test("Type1: StandardEncoding shorthand fills the printable-ASCII span with Adobe quirks") {
    val prog = ("%!PS-AdobeFont-1.0: T 001\n/Encoding StandardEncoding def\n" +
      "currentdict end\neexec\n").getBytes(ISO_8859_1)
    val t = FontPrograms.table(prog).get
    assert(t('A') == "A" && t('5') == "5" && t(' ') == " ")
    assert(t(0x27) == "’" && t(0x60) == "‘") // quoteright / quoteleft
  }

  test("degrades to None, never throws: garbage, truncated sfnt, programs with nothing mappable") {
    assert(FontPrograms.table(Array.empty[Byte]).isEmpty)
    assert(FontPrograms.table("not a font at all".getBytes(ISO_8859_1)).isEmpty)
    // sfnt claiming a cmap beyond EOF
    val lying = cat(u32(0x00010000), u16(1), u16(16), u16(2), u16(0),
      "cmap".getBytes(ISO_8859_1), u32(0), u32(999999), u32(4))
    assert(FontPrograms.table(lying).isEmpty)
    // TrueType with a byte-code cmap but NO post table -> nothing mappable
    assert(FontPrograms.table(sfnt(u32(0x00010000), "cmap" -> cmapWrap(1, 0, cmap6(65, Seq(1))))).isEmpty)
    // Type1 cleartext with no /Encoding at all
    assert(FontPrograms.table("%!PS-AdobeFont-1.0 nothing here\neexec\n".getBytes(ISO_8859_1)).isEmpty)
  }

  test("fontDecoder priority: a usable /ToUnicode wins over the embedded program") {
    val cmapStream = ("begincodespacerange <00> <ff> endcodespacerange\n" +
      "beginbfchar <41> <0051> endbfchar").getBytes(ISO_8859_1)
    val prog = ("%!PS-AdobeFont-1.0: T 001\n/Encoding 256 array\n" +
      "dup 65 /g put\nreadonly def\neexec\n").getBytes(ISO_8859_1)
    val objs = Map(3 -> "<< /FontFile 4 0 R >>")
    def streamOf(n: Int): Option[Array[Byte]] =
      n match { case 2 => Some(cmapStream); case 4 => Some(prog); case _ => None }
    val withTU = PdfParser.fontDecoder(
      "<< /Subtype /Type1 /ToUnicode 2 0 R /FontDescriptor 3 0 R >>", objs, streamOf)
    assert(withTU.decode("A") == "Q") // ToUnicode, not the program's 'g'
    val without = PdfParser.fontDecoder(
      "<< /Subtype /Type1 /FontDescriptor 3 0 R >>", objs, streamOf)
    assert(without.decode("A") == "g")
  }

  test("AGL algorithm: suffix strip, underscore ligatures, multi-group uni, u-forms, surrogate rejection") {
    def g(n: String) = PdfParser.glyphToUnicode(n)
    assert(g("A.sc") == Some("A"))
    assert(g("o.sc.alt") == Some("o")) // strip at the FIRST period
    assert(g("f_i") == Some("fi"))
    assert(g("f_f_i") == Some("ffi"))
    assert(g("uni0048") == Some("H"))
    assert(g("uni00480065") == Some("He")) // multi-group, not truncated to the first
    assert(g("u0067") == Some("g"))
    assert(g("u1D11E") == Some("𝄞")) // beyond-BMP u-form
    assert(g("uni_0041.x").isEmpty) // malformed stays unmapped
    assert(g("uniD800").isEmpty)  // surrogate scalar rejected
    assert(g(".notdef").isEmpty)  // leading period: no base name
    assert(g("g42").isEmpty)      // bare subset name: literal-byte fallback upstream
    assert(g("f_i.liga") == Some("fi")) // suffix strips before the split
  }

  test("glyph table: Greek, math-operator and AFII Cyrillic names resolve (the pypdf-table parity set)") {
    def g(n: String) = PdfParser.glyphToUnicode(n)
    assert(g("alpha") == Some("α") && g("Omega") == Some("Ω") && g("pi") == Some("π"))
    assert(g("sigma1") == Some("ς")) // final sigma's AGLFN name
    assert(g("mu") == Some("µ"))     // AGL double-mapping quirk: micro sign wins
    assert(g("summation") == Some("∑") && g("lessequal") == Some("≤") && g("arrowright") == Some("→"))
    assert(g("minus") == Some("−"))  // U+2212, not hyphen-minus
    // AFII: the sequence interleaves Ё/ё, so spot-check around the insert
    assert(g("afii10017") == Some("А") && g("afii10022") == Some("Е"))
    assert(g("afii10023") == Some("Ё") && g("afii10024") == Some("Ж"))
    assert(g("afii10049") == Some("Я") && g("afii10065") == Some("а") && g("afii10097") == Some("я"))
    assert(g("afii10071") == Some("ё") && g("afii10103") == Some("і") && g("afii61352") == Some("№"))
    // suffix/ligature algorithm composes with the new table entries
    assert(g("alpha.sc") == Some("α") && g("afii10017.alt") == Some("А"))
  }

  test("end-to-end non-AGL fixture: scrambled codes decode through the glyph-name algorithm alone") {
    val pdf = Files.readAllBytes(Paths.get("fixtures/office/fontnonagl/fontnonagl.pdf"))
    val (text, meta) = new PdfExtractor().extract(pdf, "fontnonagl.pdf")
    assert(text == "The fix test good\nJVM clef 𝄞 Q")
    assert(meta("page_count") == "1")
    assert(meta("title") == "NonAGL Glyph Names")
  }

  test("end-to-end fixture: all three embedded-font families decode through the walker") {
    val pdf = Files.readAllBytes(Paths.get("fixtures/office/fontprog/fontprog.pdf"))
    val (text, meta) = new PdfExtractor().extract(pdf, "fontprog.pdf")
    assert(text ==
      "graft reads the font program\ntype one encoding vector\n\n" +
        "stone age cmap tables\n\ncompact font format")
    assert(meta("page_count") == "3")
    assert(meta("title") == "Font Program Manual")
    assert(meta("author") == "Graft Type Dept")
  }
}
