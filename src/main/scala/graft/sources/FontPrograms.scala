package graft.sources

/** Embedded-font-program decoding for PDF simple fonts that carry NO
  * usable /ToUnicode CMap, /Differences array or named base encoding —
  * the last place character identity can live. pypdf (the reference's
  * extractor, backend/extractors/pdf_extractor.py:16-40) consults the
  * embedded font file in exactly this situation; published PDFs with
  * subset fonts (the `/ABCDEF+Name` pattern) hit it constantly. Three
  * program flavors, matched by magic bytes rather than by which /FontFile
  * key referenced them (real producers mislabel):
  *
  *  - TrueType (`00 01 00 00` or `true`): character codes map to glyph
  *    ids through the `cmap` table — a (1,0)/(3,0) byte-code subtable
  *    (formats 0, 4, 6), with the MS-symbol `F0xx` convention — and
  *    glyph ids map to names through `post` (format 2.0 custom names,
  *    format 1.0 standard Macintosh order), then names to text through
  *    the Adobe Glyph List ([[PdfParser.glyphToUnicode]]). A font
  *    exposing only a Unicode (3,1)/(0,x) subtable maps a code iff the
  *    cmap covers it, in which case the code IS its Unicode.
  *  - CFF / Type1C (`01 00` header, or an `OTTO` sfnt whose `CFF ` table
  *    holds one): code → glyph through the Encoding structure (format
  *    0/1, or the Standard Encoding when the offset is 0), glyph → SID
  *    through the charset (formats 0/1/2), SID → name through the
  *    standard strings (SID ≤ 390) or the font's String INDEX, name →
  *    text through the AGL.
  *  - Type1 (`%!PS` / PFB `80 01` segments): the /Encoding vector lives
  *    in CLEARTEXT PostScript before eexec — `dup <code> /<name> put`
  *    entries, or the StandardEncoding shorthand.
  *
  * Documented subset (same contract as the AGL subset): of the two
  * standard name orders only the ASCII span is materialized — Macintosh
  * `post` indices 3–96 and CFF SIDs 1–95, which cover the codes real
  * subset fonts take from the standard tables; accented standard indices
  * resolve only via the font's own custom names. Unmappable codes fall
  * back to the literal byte, never to U+FFFD.
  */
private[sources] object FontPrograms {

  private def u8(b: Array[Byte], i: Int): Int  = b(i) & 0xff
  private def u16(b: Array[Byte], i: Int): Int = ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
  private def u32(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) | ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)
  private def tag(b: Array[Byte], i: Int): String =
    new String(b.slice(i, i + 4), java.nio.charset.StandardCharsets.ISO_8859_1)

  /** Adobe order: the printable-ASCII span of the standard glyph names,
    * codes 32..126 — StandardEncoding maps code c to name AsciiAdobe(c-32)
    * and the CFF standard strings put the same names at SIDs 1..95.
    * Adobe's typographic quirk: 0x27 is quoteright, 0x60 quoteleft.
    */
  private val AsciiAdobe: Array[String] = asciiNames("quoteright", "quoteleft")

  /** Macintosh order quirk: 0x27 is quotesingle, 0x60 grave. `post`
    * standard indices 3..96 are these names in code order.
    */
  private val AsciiMac: Array[String] = asciiNames("quotesingle", "grave")

  private def asciiNames(n27: String, n60: String): Array[String] = {
    val base = Array(
      "space", "exclam", "quotedbl", "numbersign", "dollar", "percent", "ampersand", n27,
      "parenleft", "parenright", "asterisk", "plus", "comma", "hyphen", "period", "slash") ++
      Array("zero", "one", "two", "three", "four", "five", "six", "seven", "eight", "nine") ++
      Array("colon", "semicolon", "less", "equal", "greater", "question", "at") ++
      ('A' to 'Z').map(_.toString) ++
      Array("bracketleft", "backslash", "bracketright", "asciicircum", "underscore", n60) ++
      ('a' to 'z').map(_.toString) ++
      Array("braceleft", "bar", "braceright", "asciitilde")
    base
  }

  private def macGlyphName(i: Int): Option[String] =
    if (i == 0) Some(".notdef")
    else if (i >= 3 && i <= 96) Some(AsciiMac(i - 3))
    else None // accented span of the 258 standard names: subset

  private def standardStringName(sid: Int): Option[String] =
    if (sid == 0) Some(".notdef")
    else if (sid >= 1 && sid <= 95) Some(AsciiAdobe(sid - 1))
    else None // SIDs 96..390: subset (see scaladoc)

  private def aglText(name: String): Option[String] = PdfParser.glyphToUnicode(name)

  /** Magic-dispatched entry point: a 256-entry code→text table (null =
    * unmapped, falls back to the literal byte), or None when the bytes
    * are no parseable font program. Never throws — a truncated or alien
    * font program must degrade to the literal-byte behavior, not kill
    * the document.
    */
  def table(font: Array[Byte]): Option[Array[String]] =
    try {
      if (font.length < 4) None
      else if ((font(0) & 0xff) == 0x80) type1Table(stripPfb(font))
      else if (font(0) == '%') type1Table(font)
      else if (tag(font, 0) == "OTTO") sfntCffTable(font)
      else if (u32(font, 0) == 0x00010000 || tag(font, 0) == "true") trueTypeTable(font)
      else if ((font(0) & 0xff) == 1 && (font(1) & 0xff) == 0 && font.length > 4 &&
        (font(2) & 0xff) >= 4) cffTable(font)
      else None
    } catch { case _: Exception => None }

  // ---------------------------------------------------------------- sfnt

  private def sfntTables(font: Array[Byte]): Map[String, (Int, Int)] = {
    val n = u16(font, 4)
    (0 until n).map { k =>
      val rec = 12 + 16 * k
      tag(font, rec) -> (u32(font, rec + 8), u32(font, rec + 12))
    }.toMap
  }

  /** An OpenType-CFF (`OTTO`) font is an sfnt wrapper whose `CFF ` table
    * holds the actual CFF — unwrap and recurse.
    */
  private def sfntCffTable(font: Array[Byte]): Option[Array[String]] =
    sfntTables(font).get("CFF ").flatMap { case (off, len) =>
      cffTable(font.slice(off, off + len))
    }

  private def trueTypeTable(font: Array[Byte]): Option[Array[String]] = {
    val tables = sfntTables(font)
    tables.get("cmap").flatMap { case (cmapOff, _) =>
      val nSub = u16(font, cmapOff + 2)
      val subs = (0 until nSub).map { k =>
        val rec = cmapOff + 4 + 8 * k
        (u16(font, rec), u16(font, rec + 2), cmapOff + u32(font, rec + 4))
      }
      // byte-code subtables carry the font's own code assignment; the MS
      // symbol (3,0) and Macintosh (1,0) platforms are the two the PDF
      // spec (§9.6.6.4) names for simple TrueType fonts
      val byteCode = subs.find(s => s._1 == 3 && s._2 == 0)
        .orElse(subs.find(s => s._1 == 1 && s._2 == 0))
      val unicode = subs.find(s => s._1 == 3 && s._2 == 1)
        .orElse(subs.find(_._1 == 0))
      val glyphName: Int => Option[String] = postNames(font, tables.get("post"))
      byteCode match {
        case Some((_, _, off)) =>
          val lookup = cmapLookup(font, off)
          val t = new Array[String](256)
          var mapped = false
          for (code <- 0 until 256) {
            // MS symbol cmaps park byte codes at 0xF000+code
            val g = lookup(code).orElse(lookup(0xf000 | code)).filter(_ != 0)
            for (gi <- g; nm <- glyphName(gi); txt <- aglText(nm)) { t(code) = txt; mapped = true }
          }
          if (mapped) Some(t) else None
        case None => unicode.map { case (_, _, off) =>
          // no byte-code table: a code is decodable iff the Unicode cmap
          // covers it, and then the code is its own Unicode value
          val lookup = cmapLookup(font, off)
          val t = new Array[String](256)
          for (code <- 32 until 256 if lookup(code).exists(_ != 0)) t(code) = code.toChar.toString
          t
        }
      }
    }
  }

  /** code→glyph lookup over one cmap subtable (formats 0, 4, 6). */
  private def cmapLookup(font: Array[Byte], off: Int): Int => Option[Int] =
    u16(font, off) match {
      case 0 => c => if (c < 256) Some(u8(font, off + 6 + c)) else None
      case 6 =>
        val first = u16(font, off + 6)
        val count = u16(font, off + 8)
        c => if (c >= first && c < first + count) Some(u16(font, off + 10 + 2 * (c - first))) else None
      case 4 =>
        val segX2 = u16(font, off + 6)
        val endBase   = off + 14
        val startBase = endBase + segX2 + 2
        val deltaBase = startBase + segX2
        val rangeBase = deltaBase + segX2
        c => {
          var seg = 0
          var res: Option[Int] = None
          while (seg * 2 < segX2 && res.isEmpty) {
            val end = u16(font, endBase + 2 * seg)
            if (c <= end) {
              val start = u16(font, startBase + 2 * seg)
              res =
                if (c < start) Some(0)
                else {
                  val ro = u16(font, rangeBase + 2 * seg)
                  if (ro == 0) Some((c + u16(font, deltaBase + 2 * seg)) & 0xffff)
                  else {
                    val gi = u16(font, rangeBase + 2 * seg + ro + 2 * (c - start))
                    Some(if (gi == 0) 0 else (gi + u16(font, deltaBase + 2 * seg)) & 0xffff)
                  }
                }
            }
            seg += 1
          }
          res
        }
      case _ => _ => None
    }

  /** glyph→name through `post`: format 2.0 (custom Pascal-string names,
    * indices < 258 referencing the standard Macintosh order) or format
    * 1.0 (pure standard order). Format 3.0 carries no names.
    */
  private def postNames(font: Array[Byte], post: Option[(Int, Int)]): Int => Option[String] =
    post match {
      case Some((off, _)) if u32(font, off) == 0x00020000 =>
        val n = u16(font, off + 32)
        val names = scala.collection.mutable.ArrayBuffer.empty[String]
        var p = off + 34 + 2 * n
        while (p < font.length && names.length < n && u8(font, p) + p + 1 <= font.length) {
          val len = u8(font, p)
          names += new String(font, p + 1, len, java.nio.charset.StandardCharsets.ISO_8859_1)
          p += 1 + len
        }
        gi =>
          if (gi >= n) None
          else {
            val idx = u16(font, off + 34 + 2 * gi)
            if (idx < 258) macGlyphName(idx)
            else names.lift(idx - 258)
          }
      case Some((off, _)) if u32(font, off) == 0x00010000 => gi => macGlyphName(gi)
      case _                                              => _ => None
    }

  // ----------------------------------------------------------------- CFF

  /** One CFF INDEX: (items, offset just past the INDEX). Empty INDEX is
    * the 2-byte count=0 form.
    */
  private def cffIndex(b: Array[Byte], off: Int): (Vector[Array[Byte]], Int) = {
    val count = u16(b, off)
    if (count == 0) (Vector.empty, off + 2)
    else {
      val offSize = u8(b, off + 2)
      def offAt(i: Int): Int = {
        var v = 0
        var k = 0
        while (k < offSize) { v = (v << 8) | u8(b, off + 3 + i * offSize + k); k += 1 }
        v
      }
      val dataBase = off + 3 + (count + 1) * offSize - 1
      val items = (0 until count).map(i => b.slice(dataBase + offAt(i), dataBase + offAt(i + 1))).toVector
      (items, dataBase + offAt(count))
    }
  }

  /** Top DICT: operator → operands (only integer operands are kept;
    * reals are parsed past but dropped — the three offsets this reader
    * needs are integers by construction).
    */
  private def cffDict(d: Array[Byte]): Map[Int, Vector[Long]] = {
    val out = scala.collection.mutable.Map.empty[Int, Vector[Long]]
    val operands = scala.collection.mutable.ArrayBuffer.empty[Long]
    var i = 0
    while (i < d.length) {
      val b0 = u8(d, i)
      if (b0 <= 21) { // operator (12 = escape prefix)
        val op = if (b0 == 12) { i += 1; 1200 + u8(d, i) } else b0
        out(op) = operands.toVector
        operands.clear()
        i += 1
      } else if (b0 >= 32 && b0 <= 246) { operands += (b0 - 139).toLong; i += 1 }
      else if (b0 >= 247 && b0 <= 250) { operands += ((b0 - 247) * 256 + u8(d, i + 1) + 108).toLong; i += 2 }
      else if (b0 >= 251 && b0 <= 254) { operands += (-(b0 - 251) * 256 - u8(d, i + 1) - 108).toLong; i += 2 }
      else if (b0 == 28) { operands += u16(d, i + 1).toShort.toLong; i += 3 }
      else if (b0 == 29) { operands += u32(d, i + 1).toLong; i += 5 }
      else if (b0 == 30) { // real: nibbles until 0xf terminator
        i += 1
        var done = false
        while (i < d.length && !done) {
          val n = u8(d, i); i += 1
          if ((n & 0x0f) == 0x0f || (n >> 4) == 0x0f) done = true
        }
        operands += 0L
      } else i += 1
    }
    out.toMap
  }

  private def cffTable(font: Array[Byte]): Option[Array[String]] = {
    val hdrSize = u8(font, 2)
    val (_, afterNames)   = cffIndex(font, hdrSize)
    val (topDicts, afterTop) = cffIndex(font, afterNames)
    val (strings, _)      = cffIndex(font, afterTop)
    if (topDicts.isEmpty) return None
    val dict = cffDict(topDicts.head)
    val charStringsOff = dict.get(17).flatMap(_.headOption).map(_.toInt).getOrElse(return None)
    val nGlyphs = u16(font, charStringsOff)
    val charsetOff  = dict.get(15).flatMap(_.headOption).map(_.toInt).getOrElse(0)
    val encodingOff = dict.get(16).flatMap(_.headOption).map(_.toInt).getOrElse(0)

    // glyph → SID. Offsets 0/1/2 are the predefined charsets; ISOAdobe
    // (0) is SID = glyph id, the two expert charsets are out of subset.
    val sidOf: Int => Int =
      if (charsetOff == 0) gi => gi
      else if (charsetOff == 1 || charsetOff == 2) return None
      else u8(font, charsetOff) match {
        case 0 => gi => if (gi == 0) 0 else u16(font, charsetOff + 1 + 2 * (gi - 1))
        case f if f == 1 || f == 2 =>
          // ranges of consecutive SIDs; expand to a glyph-indexed array
          val sids = new Array[Int](nGlyphs)
          var gi = 1
          var p  = charsetOff + 1
          while (gi < nGlyphs) {
            val first = u16(font, p)
            val nLeft = if (f == 1) u8(font, p + 2) else u16(font, p + 2)
            p += (if (f == 1) 3 else 4)
            var k = 0
            while (k <= nLeft && gi < nGlyphs) { sids(gi) = first + k; gi += 1; k += 1 }
          }
          g => if (g < nGlyphs) sids(g) else 0
        case _ => return None
      }

    def nameOf(sid: Int): Option[String] =
      standardStringName(sid).orElse(
        if (sid >= 391) strings.lift(sid - 391)
          .map(b => new String(b, java.nio.charset.StandardCharsets.ISO_8859_1))
        else None)

    val t = new Array[String](256)
    var mapped = false
    if (encodingOff == 0) {
      // Standard Encoding: code → SID directly (ASCII span, see scaladoc)
      for (code <- 32 to 126; nm <- standardStringName(code - 31); txt <- aglText(nm)) {
        t(code) = txt; mapped = true
      }
    } else if (encodingOff == 1) return None // Expert Encoding: out of subset
    else u8(font, encodingOff) & 0x7f match {
      case 0 =>
        val nCodes = u8(font, encodingOff + 1)
        for (i <- 1 to math.min(nCodes, nGlyphs - 1)) {
          val code = u8(font, encodingOff + 1 + i)
          for (nm <- nameOf(sidOf(i)); txt <- aglText(nm) if code < 256) {
            t(code) = txt; mapped = true
          }
        }
      case 1 =>
        val nRanges = u8(font, encodingOff + 1)
        var gi = 1
        for (r <- 0 until nRanges) {
          val first = u8(font, encodingOff + 2 + 2 * r)
          val nLeft = u8(font, encodingOff + 3 + 2 * r)
          var k = 0
          while (k <= nLeft && gi < nGlyphs) {
            val code = first + k
            for (nm <- nameOf(sidOf(gi)); txt <- aglText(nm) if code < 256) {
              t(code) = txt; mapped = true
            }
            gi += 1; k += 1
          }
        }
      case _ => return None
    }
    if (mapped) Some(t) else None
  }

  // --------------------------------------------------------------- Type1

  /** PFB segment headers (0x80 0x01/0x02 + LE length) interleave the
    * actual font bytes; concatenate the segment payloads.
    */
  private def stripPfb(b: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var i = 0
    while (i + 6 <= b.length && (b(i) & 0xff) == 0x80 && (b(i + 1) & 0xff) != 3) {
      val len = (b(i + 2) & 0xff) | ((b(i + 3) & 0xff) << 8) |
        ((b(i + 4) & 0xff) << 16) | ((b(i + 5) & 0xff) << 24)
      out.write(b, i + 6, math.min(len, b.length - i - 6))
      i += 6 + len
    }
    out.toByteArray
  }

  /** The /Encoding vector sits in the cleartext portion before eexec:
    * either the StandardEncoding shorthand or explicit `dup code /name
    * put` entries.
    */
  private def type1Table(b: Array[Byte]): Option[Array[String]] = {
    val s0 = new String(b, java.nio.charset.StandardCharsets.ISO_8859_1)
    val s  = s0.indexOf("eexec") match { case -1 => s0; case i => s0.substring(0, i) }
    if (!s.contains("/Encoding")) None
    else if ("/Encoding\\s+StandardEncoding".r.findFirstIn(s).isDefined) {
      val t = new Array[String](256)
      for (code <- 32 to 126; nm = AsciiAdobe(code - 32); txt <- aglText(nm)) t(code) = txt
      Some(t)
    } else {
      val t = new Array[String](256)
      var mapped = false
      for (m <- "dup\\s+(\\d+)\\s*/([A-Za-z0-9._]+)\\s+put".r.findAllMatchIn(s)) {
        val code = m.group(1).toInt
        if (code < 256) aglText(m.group(2)).foreach { txt => t(code) = txt; mapped = true }
      }
      if (mapped) Some(t) else None
    }
  }
}
