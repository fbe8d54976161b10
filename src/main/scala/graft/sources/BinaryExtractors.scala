package graft.sources

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.charset.StandardCharsets
import java.util.zip.{Inflater, ZipInputStream}

import scala.collection.mutable

/** Pure-JVM parsers backing the binary-format extractors (SURVEY §2.1
  * S2/S3/S4 + the real S5): ZIP container reading via `java.util.zip`,
  * OOXML text pulls via targeted regexes, and a minimal PDF object/stream
  * walker with FlateDecode support. No external libraries — the goal is the
  * reference's *text rendering contract*, not a full rasterizer:
  *
  *  - PDF  (pdf_extractor.py:16-40): per-page text, pages joined "\n\n",
  *    `page_count`/`title`/`author` metadata.
  *  - DOCX (docx_extractor.py:16-27 via docx2txt): paragraph texts joined
  *    by blank lines, headers before body before footers, final strip.
  *  - PPTX (pptx_extractor.py:26-57): per-slide shape texts joined "\n",
  *    non-empty slides joined "\n\n", `slide_count`/core-props metadata.
  *  - XLSX (xlsx_extractor.py:28-74): "Sheet: <name>" header, " | "-joined
  *    non-null cells per row, 20-dash separator, all parts joined "\n".
  *
  * Declared deviations (fixture-invisible, documented here once): regex XML
  * pulls assume well-formed OOXML (no CDATA). PDF text extraction DOES
  * track the text matrix for line ordering since round 9 (`Tm`/`Td`/`TD`/
  * `T*`/`TL` vertical-position tracking — multi-column Tm-positioned pages
  * read column-major like pypdf). String DECODING covers /ToUnicode CMaps,
  * /Differences arrays, 2-byte Identity-H CID strings (round 10) AND — when
  * none of those exist — the embedded font program itself (round 11,
  * [[FontPrograms]]: TrueType cmap/post, CFF charset/encoding/strings,
  * Type1 cleartext /Encoding, pypdf's last-resort path); the remaining
  * deviation is a subset font whose program carries only non-standard
  * glyph names outside the AGL subset (e.g. bare /g42 names mapping
  * through a glyf-level reordering), which falls back to literal bytes.
  * Form XObjects render at their `Do`
  * site as their own text block (round 10) — the form's internal line
  * structure is kept but its matrix is not threaded into the page's
  * (placement is document order, a deviation only for forms overlaid
  * mid-line). (PPTX slide order follows presentation.xml rels since
  * round 8 — no longer a deviation.)
  */
private[sources] object Ooxml {

  /** All non-directory ZIP entries, in archive order. Handles STORED and
    * DEFLATED methods (ZipInputStream inflates transparently).
    */
  def entries(content: Array[Byte]): Vector[(String, Array[Byte])] = {
    val zis = new ZipInputStream(new ByteArrayInputStream(content))
    val out = Vector.newBuilder[(String, Array[Byte])]
    val buf = new Array[Byte](8192)
    try {
      var e = zis.getNextEntry
      if (e == null) throw new IllegalArgumentException("not a ZIP container")
      while (e != null) {
        if (!e.isDirectory) {
          val bos = new ByteArrayOutputStream()
          var n = zis.read(buf)
          while (n > 0) { bos.write(buf, 0, n); n = zis.read(buf) }
          out += ((e.getName, bos.toByteArray))
        }
        e = zis.getNextEntry
      }
    } finally zis.close()
    out.result()
  }

  def entryText(entries: Vector[(String, Array[Byte])], name: String): Option[String] =
    entries.collectFirst { case (n, b) if n == name => new String(b, StandardCharsets.UTF_8) }

  /** Contents of every `<tag ...>...</tag>` block, document order. */
  def blocks(xml: String, tag: String): Vector[String] =
    s"(?s)<$tag(?:\\s[^>]*)?>(.*?)</$tag>".r.findAllMatchIn(xml).map(_.group(1)).toVector

  def unescape(s: String): String = {
    if (s.indexOf('&') < 0) return s
    "&(lt|gt|amp|quot|apos|#(?:[0-9]+|[xX][0-9a-fA-F]+));".r.replaceAllIn(s, m =>
      scala.util.matching.Regex.quoteReplacement(m.group(1) match {
        case "lt" => "<"
        case "gt" => ">"
        case "amp" => "&"
        case "quot" => "\""
        case "apos" => "'"
        // Character.toChars, not toChar: supplementary-plane refs (emoji
        // &#128512;) need the surrogate pair, not the truncated low 16 bits
        case n if n.startsWith("#x") || n.startsWith("#X") =>
          new String(Character.toChars(Integer.parseInt(n.drop(2), 16)))
        case n => new String(Character.toChars(Integer.parseInt(n.drop(1))))
      }))
  }

  /** (title, author) from docProps/core.xml, when present and non-empty. */
  def coreProps(entries: Vector[(String, Array[Byte])]): (Option[String], Option[String]) =
    entryText(entries, "docProps/core.xml").fold((Option.empty[String], Option.empty[String])) { xml =>
      def f(tag: String) = blocks(xml, tag).headOption.map(unescape).filter(_.nonEmpty)
      (f("dc:title"), f("dc:creator"))
    }
}

private[graft] object PdfParser {

  /** Byte-preserving single-byte view: offsets and round-trips are exact. */
  private def latin1(b: Array[Byte]): String = new String(b, StandardCharsets.ISO_8859_1)

  private val ObjHeader = """(\d+)\s+\d+\s+obj""".r

  /** Object number → body text (dict + any stream payload, latin-1). Scans
    * sequentially so stream payloads containing "N 0 obj" bytes can't spawn
    * phantom objects; stream ends are located via /Length when present.
    */
  private def objects(s: String): Map[Int, String] = {
    val out = mutable.Map.empty[Int, String]
    var from = 0
    ObjHeader.findAllMatchIn(s).foreach { m =>
      if (m.start >= from) {
        val bodyStart = m.end
        val streamIdx = s.indexOf("stream", bodyStart)
        val endobjIdx = s.indexOf("endobj", bodyStart)
        val end =
          if (streamIdx >= 0 && (endobjIdx < 0 || streamIdx < endobjIdx)) {
            val dict = s.substring(bodyStart, streamIdx)
            var dataStart = streamIdx + "stream".length
            if (dataStart < s.length && s.charAt(dataStart) == '\r') dataStart += 1
            if (dataStart < s.length && s.charAt(dataStart) == '\n') dataStart += 1
            val es = """/Length\s+(\d+)\b""".r.findFirstMatchIn(dict)
              .map(l => s.indexOf("endstream", dataStart + l.group(1).toInt))
              .filter(_ >= 0)
              .getOrElse(s.indexOf("endstream", dataStart))
            val eo = if (es >= 0) s.indexOf("endobj", es) else endobjIdx
            if (eo < 0) s.length else eo
          } else if (endobjIdx >= 0) endobjIdx
          else s.length
        out(m.group(1).toInt) = s.substring(bodyStart, end)
        from = end
      }
    }
    out.toMap
  }

  private def ref(body: String, key: String): Option[Int] =
    (s"""/$key\\s+(\\d+)\\s+\\d+\\s+R""").r.findFirstMatchIn(body).map(_.group(1).toInt)

  private def refList(body: String, key: String): Seq[Int] =
    (s"""/$key\\s*\\[([^\\]]*)\\]""").r.findFirstMatchIn(body).map { m =>
      """(\d+)\s+\d+\s+R""".r.findAllMatchIn(m.group(1)).map(_.group(1).toInt).toSeq
    }.getOrElse(ref(body, key).toSeq)

  private def isType(body: String, t: String): Boolean =
    (s"""/Type\\s*/$t(?![A-Za-z])""").r.findFirstIn(body).isDefined

  /** Page object numbers in tree order (catalog → /Pages → /Kids, nested
    * /Pages recursed); falls back to file-order /Type /Page objects when
    * the catalog chain is broken.
    */
  private def pageOrder(objs: Map[Int, String], rawS: String): Seq[Int] = {
    def walk(n: Int, seen: Set[Int]): Seq[Int] = objs.get(n) match {
      case _ if seen(n) => Nil // cyclic /Kids guard
      case Some(b) if isType(b, "Pages") => refList(b, "Kids").flatMap(walk(_, seen + n))
      case Some(b) if isType(b, "Page") => Seq(n)
      case _ => Nil
    }
    val viaCatalog = for {
      rootM <- """/Root\s+(\d+)\s+\d+\s+R""".r.findFirstMatchIn(rawS)
      cat <- objs.get(rootM.group(1).toInt)
      pages <- ref(cat, "Pages")
    } yield walk(pages, Set.empty)
    viaCatalog.filter(_.nonEmpty).getOrElse(
      objs.toSeq.sortBy(_._1).collect { case (n, b) if isType(b, "Page") => n })
  }

  private def intKey(body: String, key: String): Option[Int] =
    (s"""/$key\\s+(\\d+)""").r.findFirstMatchIn(body).map(_.group(1).toInt)

  private def intList(body: String, key: String): Seq[Int] =
    (s"""/$key\\s*\\[([^\\]]*)\\]""").r.findFirstMatchIn(body)
      .map(m => """\d+""".r.findAllIn(m.group(1)).map(_.toInt).toSeq).getOrElse(Nil)

  /** Type-2 cross-reference entries (objNum → (objStmNum, idxInStream))
    * from the PDF 1.5+ xref STREAM chain (ISO 32000-1 §7.5.8): follow the
    * last `startxref` to a /Type/XRef stream, decode its /W-packed
    * big-endian rows over the /Index ranges, then walk /Prev. The first
    * section to define an object wins (latest update is authoritative —
    * pypdf reads the same chain, backend/extractors/pdf_extractor.py:16-40
    * via its xref machinery). Xref streams are never encrypted
    * (§7.5.8.2), so no decrypt hook. A /Prev pointing at a classic `xref`
    * table ends the walk — the sequential scanner already covers
    * uncompressed objects.
    */
  private[graft] def xrefType2(s: String, objs: Map[Int, String]): Map[Int, (Int, Int)] = {
    val out  = mutable.Map.empty[Int, (Int, Int)]
    val seen = mutable.Set.empty[Int]
    var off = """startxref\s+(\d+)""".r.findAllMatchIn(s)
      .map(_.group(1).toInt).toSeq.lastOption.getOrElse(-1)
    val headerAt = java.util.regex.Pattern.compile("""\s*(\d+)\s+\d+\s+obj""")
    while (off >= 0 && off < s.length && seen.add(off)) {
      val m = headerAt.matcher(s)
      m.region(off, math.min(off + 48, s.length))
      off = -1
      if (m.lookingAt()) {
        objs.get(m.group(1).toInt).filter(isType(_, "XRef")).foreach { body =>
          streamData(body).foreach { data =>
            val w = intList(body, "W")
            if (w.length == 3 && w.sum > 0) {
              val idx0  = intList(body, "Index")
              val pairs = if (idx0.length >= 2) idx0 else Seq(0, intKey(body, "Size").getOrElse(0))
              val row   = w.sum
              var pos   = 0
              pairs.grouped(2).foreach {
                case Seq(first, count) =>
                  var i = 0
                  while (i < count && pos + row <= data.length) {
                    def field(k: Int): Long = {
                      var v = 0L
                      var j = pos + w.take(k).sum
                      val to = j + w(k)
                      while (j < to) { v = (v << 8) | (data(j) & 0xffL); j += 1 }
                      v
                    }
                    // w1 = 0 ⇒ implicit type 1 (§7.5.8.3)
                    if ((if (w(0) == 0) 1L else field(0)) == 2L) {
                      val num = first + i
                      if (!out.contains(num)) out(num) = (field(1).toInt, field(2).toInt)
                    }
                    pos += row; i += 1
                  }
                case _ => ()
              }
            }
          }
          off = intKey(body, "Prev").getOrElse(-1)
        }
      }
    }
    out.toMap
  }

  /** Members of one /ObjStm (§7.5.7) as (idxInStream, objNum, body): the
    * decoded stream opens with /N pairs of "objNum byteOffset", member
    * data starts at /First + offset and runs to the next member. Members
    * carry no obj/endobj framing — this is exactly why the sequential
    * scanner can't see them. Strings inside members are already plaintext
    * after the stream-level decrypt (objects inside an object stream are
    * not re-encrypted individually).
    */
  private def objStmMembers(
      body: String,
      decrypt: Array[Byte] => Array[Byte],
      onSkip: () => Unit,
  ): Vector[(Int, Int, String)] = {
    val parsed = for {
      n     <- intKey(body, "N")
      first <- intKey(body, "First")
      data  <- streamData(body, onSkip, decrypt)
    } yield {
      val txt = latin1(data)
      val pairs = """(\d+)\s+(\d+)""".r
        .findAllMatchIn(txt.substring(0, math.min(first, txt.length)))
        .take(n).map(m => (m.group(1).toInt, m.group(2).toInt)).toVector
      pairs.zipWithIndex.map { case ((num, o), idx) =>
        val start = math.min(first.toLong + o, txt.length.toLong).toInt
        val end =
          if (idx + 1 < pairs.length) math.min(first.toLong + pairs(idx + 1)._2, txt.length.toLong).toInt
          else txt.length
        (idx, num, txt.substring(start, math.max(start, end)))
      }
    }
    parsed.getOrElse(Vector.empty)
  }

  /** Overlay /ObjStm members onto the scanned top-level object map — the
    * PDF 1.5+ path: post-2005 writers store page dicts, /Info and the
    * catalog compressed inside object streams, where they are invisible
    * to the `N 0 obj` scan. Precedence:
    *  - an xref type-2 entry naming (stream, idx) is authoritative — that
    *    member replaces any scanned (stale, superseded-by-update) body;
    *  - without xref info, members only fill gaps (a scanned top-level
    *    definition wins, matching the scanner's latest-wins policy).
    */
  private def expandObjectStreams(
      top: Map[Int, String],
      s: String,
      decryptFor: Int => Array[Byte] => Array[Byte],
      onSkip: () => Unit,
  ): Map[Int, String] = {
    val stms = top.iterator.filter { case (_, b) => isType(b, "ObjStm") }.toVector
    if (stms.isEmpty) return top
    val type2 = xrefType2(s, top)
    val members = stms.flatMap { case (stmNum, body) =>
      objStmMembers(body, decryptFor(stmNum), onSkip)
        .map { case (idx, num, b) => (num, stmNum, idx, b) }
    }
    val auth = members.collect {
      case (num, sn, ix, b) if type2.get(num).contains((sn, ix)) => num -> b
    }.toMap
    val gaps = members.iterator
      .filterNot { case (num, _, _, _) => top.contains(num) || auth.contains(num) }
      .map { case (num, _, _, b) => num -> b }
      .toMap
    top ++ gaps ++ auth
  }

  /** Filter names from a stream dict, pipeline order: either a single
    * `/Filter /Name` or an array `/Filter [/A /B]` (applied left to right,
    * PDF 32000-1 §7.4).
    */
  private[graft] def filterNames(dict: String): Seq[String] =
    """/Filter\s*(?:\[([^\]]*)\]|/([A-Za-z0-9]+))""".r.findFirstMatchIn(dict).map { m =>
      Option(m.group(2)).map(Seq(_)).getOrElse(
        """/([A-Za-z0-9]+)""".r.findAllMatchIn(m.group(1)).map(_.group(1)).toSeq)
    }.getOrElse(Nil)

  /** Per-filter decode parameters (aligned with [[filterNames]]): either a
    * single `/DecodeParms <<...>>` or an array mixing dicts and `null`.
    * Only Predictor/Colors/BitsPerComponent/Columns are read — the PNG/TIFF
    * predictor set of §7.4.4.4.
    */
  private[graft] def decodeParms(dict: String, nFilters: Int): Seq[Map[String, Int]] = {
    val m = """/(?:DecodeParms|DP)\s*(\[)?""".r.findFirstMatchIn(dict)
    def dictAt(from: Int): Option[(Map[String, Int], Int)] = {
      val open = dict.indexOf("<<", from)
      if (open < 0) None
      else {
        val close = dict.indexOf(">>", open)
        if (close < 0) None
        else {
          val body = dict.substring(open + 2, close)
          val kv = """/(Predictor|Colors|BitsPerComponent|Columns)\s+(\d+)""".r
            .findAllMatchIn(body).map(x => x.group(1) -> x.group(2).toInt).toMap
          Some((kv, close + 2))
        }
      }
    }
    m match {
      case None => Seq.fill(nFilters)(Map.empty)
      case Some(mm) if mm.group(1) == null => // single dict applies to filter 0
        (dictAt(mm.end).map(_._1).getOrElse(Map.empty[String, Int]) +: Seq.fill(nFilters - 1)(Map.empty[String, Int])).take(nFilters)
      case Some(mm) => // array: null or <<…>> per filter, in order
        val end = dict.indexOf(']', mm.end)
        var pos = mm.end
        val out = Seq.newBuilder[Map[String, Int]]
        for (_ <- 0 until nFilters) {
          val nextNull = dict.indexOf("null", pos)
          val nextDict = dict.indexOf("<<", pos)
          if (nextDict >= 0 && (nextDict < end || end < 0) && (nextNull < 0 || nextDict < nextNull)) {
            dictAt(nextDict) match {
              case Some((kv, after)) => out += kv; pos = after
              case None              => out += Map.empty
            }
          } else if (nextNull >= 0 && (nextNull < end || end < 0)) { out += Map.empty; pos = nextNull + 4 }
          else out += Map.empty
        }
        out.result()
    }
  }

  /** Undo a declared predictor (§7.4.4.4) after Flate/LZW: 2 = TIFF
    * horizontal differencing; 10–15 = PNG row filters (each row prefixed by
    * its filter type: None/Sub/Up/Average/Paeth).
    */
  private[graft] def applyPredictor(data: Array[Byte], parms: Map[String, Int]): Array[Byte] = {
    val predictor = parms.getOrElse("Predictor", 1)
    if (predictor <= 1) return data
    val colors  = parms.getOrElse("Colors", 1)
    val bpc     = parms.getOrElse("BitsPerComponent", 8)
    val columns = parms.getOrElse("Columns", 1)
    val bpp     = math.max(1, colors * bpc / 8) // bytes per pixel (≥8-bit path)
    val rowLen  = (columns * colors * bpc + 7) / 8
    if (predictor == 2) { // TIFF: add left neighbor (8-bit components only)
      val out = data.clone()
      var r = 0
      while (r + rowLen <= out.length) {
        var i = bpp
        while (i < rowLen) { out(r + i) = (out(r + i) + out(r + i - bpp)).toByte; i += 1 }
        r += rowLen
      }
      out
    } else { // PNG: rows of (1 + rowLen), first byte = filter type
      val stride = rowLen + 1
      val nRows  = data.length / stride
      val out    = new Array[Byte](nRows * rowLen)
      val prev   = new Array[Byte](rowLen)
      var r = 0
      while (r < nRows) {
        val ft  = data(r * stride) & 0xff
        val row = java.util.Arrays.copyOfRange(data, r * stride + 1, r * stride + 1 + rowLen)
        var i = 0
        while (i < rowLen) {
          val a = if (i >= bpp) out(r * rowLen + i - bpp) & 0xff else 0 // left
          val b = prev(i) & 0xff                                       // up
          val c = if (i >= bpp) prev(i - bpp) & 0xff else 0            // up-left
          val x = row(i) & 0xff
          val rec = ft match {
            case 0 => x
            case 1 => x + a
            case 2 => x + b
            case 3 => x + (a + b) / 2
            case 4 => // Paeth
              val p  = a + b - c
              val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
              x + (if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c)
            case _ => x
          }
          out(r * rowLen + i) = rec.toByte
          i += 1
        }
        System.arraycopy(out, r * rowLen, prev, 0, rowLen)
        r += 1
      }
      out
    }
  }

  /** Run the declared filter pipeline, applying each Flate/LZW stage's
    * predictor. None = an unsupported filter (DCTDecode and friends — image
    * codecs with no text behind them) OR a stage that fails to decode
    * (corrupt data, or an encryption revision the handler doesn't support —
    * the bytes are then noise to every filter); the caller counts both so
    * text loss is visible in metadata instead of silent, and garbage never
    * reaches the text-operator parser.
    */
  private def decodeFilters(data: Array[Byte], filters: Seq[String], parms: Seq[Map[String, Int]]): Option[Array[Byte]] =
    filters.zipWithIndex.foldLeft(Option(data)) {
      case (Some(d), (f, i)) =>
        val p = if (i < parms.length) parms(i) else Map.empty[String, Int]
        try f match {
          case "FlateDecode"     => Some(applyPredictor(inflate(d), p))
          case "ASCIIHexDecode"  => Some(asciiHexDecode(d))
          case "ASCII85Decode"   => Some(ascii85Decode(d))
          case "LZWDecode"       => Some(applyPredictor(lzwDecode(d), p))
          case "RunLengthDecode" => Some(runLengthDecode(d))
          case _                 => None
        } catch { case scala.util.control.NonFatal(_) => None }
      case (None, _) => None
    }

  /** Stream payload bytes run through `decrypt` (identity for unencrypted
    * documents — encryption wraps the STORED bytes, outside the filter
    * pipeline) and then the declared /Filter pipeline; None (with `onSkip`
    * fired) when a filter is unsupported.
    */
  private[sources] def streamData(
      body: String,
      onSkip: () => Unit = () => (),
      decrypt: Array[Byte] => Array[Byte] = identity,
  ): Option[Array[Byte]] = {
    val i = body.indexOf("stream")
    if (i < 0) return None
    val dict = body.substring(0, i)
    var start = i + "stream".length
    if (start < body.length && body.charAt(start) == '\r') start += 1
    if (start < body.length && body.charAt(start) == '\n') start += 1
    val end = """/Length\s+(\d+)\b""".r.findFirstMatchIn(dict)
      .map(l => body.indexOf("endstream", start + l.group(1).toInt))
      .filter(_ >= 0)
      .getOrElse(body.indexOf("endstream", start))
    if (end < start) return None
    val raw = decrypt(body.substring(start, end).stripSuffix("\n").stripSuffix("\r")
      .getBytes(StandardCharsets.ISO_8859_1))
    val names   = filterNames(dict)
    val decoded = decodeFilters(raw, names, decodeParms(dict, names.length))
    if (decoded.isEmpty) onSkip()
    decoded
  }

  /** ASCIIHexDecode (§7.4.2): hex pairs, whitespace ignored, `>` is EOD,
    * odd final digit padded with 0.
    */
  private[graft] def asciiHexDecode(data: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    var hi  = -1
    var i   = 0
    var done = false
    while (i < data.length && !done) {
      val c = data(i).toChar
      if (c == '>') done = true
      else if (!c.isWhitespace) {
        val d = Character.digit(c, 16)
        if (d < 0) throw new IllegalArgumentException(s"bad hex char '$c' in ASCIIHexDecode")
        if (hi < 0) hi = d else { out.write((hi << 4) | d); hi = -1 }
      }
      i += 1
    }
    if (hi >= 0) out.write(hi << 4) // odd count: last digit + implied 0
    out.toByteArray
  }

  /** ASCII85Decode (§7.4.3): 5 chars → 4 bytes base-85, `z` = four zero
    * bytes, `~>` is EOD; a final partial group of n chars yields n−1 bytes
    * (pad with 'u' = 84, drop the pad bytes).
    */
  private[graft] def ascii85Decode(data: Array[Byte]): Array[Byte] = {
    val out   = new ByteArrayOutputStream()
    val group = new Array[Int](5)
    var g     = 0
    var i     = 0
    var done  = false
    def flush(n: Int): Unit = { // n = chars present (2..5) → n-1 bytes
      var j = n; while (j < 5) { group(j) = 84; j += 1 }
      var v = 0L
      var k = 0; while (k < 5) { v = v * 85 + group(k); k += 1 }
      val bytes = Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
        ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
      out.write(bytes, 0, n - 1)
    }
    while (i < data.length && !done) {
      val c = data(i).toChar
      if (c == '~') done = true
      else if (c == 'z' && g == 0) out.write(Array[Byte](0, 0, 0, 0), 0, 4)
      else if (!c.isWhitespace) {
        if (c < '!' || c > 'u') throw new IllegalArgumentException(s"bad char '$c' in ASCII85Decode")
        group(g) = c - '!'; g += 1
        if (g == 5) { flush(5); g = 0 }
      }
      i += 1
    }
    if (g == 1) throw new IllegalArgumentException("lone trailing char in ASCII85Decode")
    if (g > 1) flush(g)
    out.toByteArray
  }

  /** LZWDecode (§7.4.4): 9-bit codes growing to 12, 256 = clear table,
    * 257 = EOD. PDF's default EarlyChange=1 widens one code early, matching
    * what every writer emits.
    */
  private[graft] def lzwDecode(data: Array[Byte]): Array[Byte] = {
    val out   = new ByteArrayOutputStream()
    var table = mutable.ArrayBuffer.tabulate(258)(i => if (i < 256) Array(i.toByte) else Array.emptyByteArray)
    var width = 9
    var prev: Array[Byte] = null
    var acc  = 0L
    var bits = 0
    var i    = 0
    var done = false
    while (i < data.length && !done) {
      acc = (acc << 8) | (data(i) & 0xffL); bits += 8
      while (bits >= width && !done) {
        val code = ((acc >> (bits - width)) & ((1L << width) - 1)).toInt
        bits -= width
        if (code == 256) {
          table = mutable.ArrayBuffer.tabulate(258)(j => if (j < 256) Array(j.toByte) else Array.emptyByteArray)
          width = 9; prev = null
        } else if (code == 257) done = true
        else {
          val entry =
            if (code < table.length) table(code)
            else if (prev != null && code == table.length) prev :+ prev(0)
            else throw new IllegalArgumentException(s"bad LZW code $code")
          out.write(entry, 0, entry.length)
          if (prev != null) table += (prev :+ entry(0))
          // EarlyChange=1: widen when the NEXT code would not fit
          if (table.length + 1 >= (1 << width) && width < 12) width += 1
          prev = entry
        }
      }
      i += 1
    }
    out.toByteArray
  }

  /** RunLengthDecode (§7.4.5): L ≤ 127 → copy L+1 literal bytes; L ≥ 129 →
    * repeat next byte 257−L times; 128 = EOD.
    */
  private[graft] def runLengthDecode(data: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    var i   = 0
    var done = false
    while (i < data.length && !done) {
      val l = data(i) & 0xff
      if (l == 128) done = true
      else if (l <= 127) {
        val n = math.min(l + 1, data.length - i - 1)
        out.write(data, i + 1, n); i += 1 + n
      } else {
        if (i + 1 < data.length) {
          val b = data(i + 1)
          var k = 0; while (k < 257 - l) { out.write(b); k += 1 }
        }
        i += 2
      }
    }
    out.toByteArray
  }

  private def inflate(data: Array[Byte]): Array[Byte] = {
    val inf = new Inflater()
    inf.setInput(data)
    val out = new ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!inf.finished()) {
      val n = inf.inflate(buf)
      if (n == 0 && (inf.needsInput() || inf.needsDictionary()))
        throw new IllegalArgumentException("truncated FlateDecode stream")
      out.write(buf, 0, n)
    }
    inf.end()
    out.toByteArray
  }

  // ---- Standard security handler (encrypted PDFs, §7.6.2-3) --------------
  // pypdf reads RC4-encrypted documents transparently (the VERDICT-noted
  // gap); this implements the R=2/R=3 standard handler for the EMPTY user
  // password — the ubiquitous "owner-locked but readable" case. Strings
  // and streams are encrypted per object with an MD5-derived key; document
  // structure stays plaintext, so the object walker runs unchanged and
  // decryption slots in between the stream bytes and the filter pipeline.

  /** RC4 (the handler's cipher for V ≤ 2). */
  private[graft] def rc4(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
    val s = Array.tabulate(256)(_.toByte)
    var j = 0
    var i = 0
    while (i < 256) {
      j = (j + (s(i) & 0xff) + (key(i % key.length) & 0xff)) & 0xff
      val t = s(i); s(i) = s(j); s(j) = t
      i += 1
    }
    val out = new Array[Byte](data.length)
    var x = 0; var y = 0; var k = 0
    while (k < data.length) {
      x = (x + 1) & 0xff
      y = (y + (s(x) & 0xff)) & 0xff
      val t = s(x); s(x) = s(y); s(y) = t
      out(k) = (data(k) ^ s(((s(x) & 0xff) + (s(y) & 0xff)) & 0xff)).toByte
      k += 1
    }
    out
  }

  /** The spec's 32-byte password pad (Algorithm 2 step a). */
  private[graft] val PasswordPad: Array[Byte] = Array(
    0x28, 0xbf, 0x4e, 0x5e, 0x4e, 0x75, 0x8a, 0x41, 0x64, 0x00, 0x4e, 0x56,
    0xff, 0xfa, 0x01, 0x08, 0x2e, 0x2e, 0x00, 0xb6, 0xd0, 0x68, 0x3e, 0x80,
    0x2f, 0x0c, 0xa9, 0xfe, 0x64, 0x53, 0x69, 0x7a).map(_.toByte)

  /** Algorithm 2 file key for the empty user password: MD5(pad ‖ O ‖ P(LE32)
    * ‖ ID₀ [‖ FFFFFFFF when R≥4 with /EncryptMetadata false]), truncated to
    * 5 bytes for R=2 or Length/8 for R≥3 with the 50-round MD5
    * strengthening loop.
    */
  private[graft] def fileKey(
      o: Array[Byte], p: Int, id0: Array[Byte], r: Int, lengthBits: Int,
      encryptMetadata: Boolean = true,
  ): Array[Byte] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.update(PasswordPad)
    md.update(o, 0, math.min(32, o.length))
    md.update(Array(p, p >> 8, p >> 16, p >> 24).map(x => (x & 0xff).toByte))
    md.update(id0)
    if (r >= 4 && !encryptMetadata) md.update(Array.fill(4)(0xff.toByte))
    var h      = md.digest()
    val keyLen = if (r == 2) 5 else math.max(5, lengthBits / 8)
    if (r >= 3) {
      var i = 0
      while (i < 50) {
        val m2 = java.security.MessageDigest.getInstance("MD5")
        m2.update(h, 0, keyLen)
        h = m2.digest()
        i += 1
      }
    }
    h.take(keyLen)
  }

  /** ISO 32000-2 §7.6.4.3.4 Algorithm 2.B password hash (R=6), or the plain
    * SHA-256 of the deprecated R=5 revision (Adobe ExtensionLevel 3). `udata`
    * is the full 48-byte /U value when hashing an OWNER password, empty for a
    * user password. The R=6 hardening loop re-encrypts (pwd ‖ K ‖ udata)×64
    * with AES-128-CBC keyed from K and re-hashes with SHA-256/384/512 chosen
    * by the first cipher block mod 3, for ≥64 rounds until the last cipher
    * byte ≤ rounds−32.
    */
  private[graft] def hash2B(
      password: Array[Byte], salt: Array[Byte], udata: Array[Byte], r: Int,
  ): Array[Byte] = {
    val first = java.security.MessageDigest.getInstance("SHA-256")
    first.update(password); first.update(salt); first.update(udata)
    var k = first.digest()
    if (r == 5) return k
    var round = 0
    var done  = false
    while (!done) {
      val block = password ++ k ++ udata
      val k1    = new Array[Byte](block.length * 64)
      var i = 0
      while (i < 64) { System.arraycopy(block, 0, k1, i * block.length, block.length); i += 1 }
      val c = javax.crypto.Cipher.getInstance("AES/CBC/NoPadding")
      c.init(javax.crypto.Cipher.ENCRYPT_MODE,
        new javax.crypto.spec.SecretKeySpec(k, 0, 16, "AES"),
        new javax.crypto.spec.IvParameterSpec(k, 16, 16))
      val e   = c.doFinal(k1)
      val alg = (0 until 16).map(e(_) & 0xff).sum % 3 match {
        case 0 => "SHA-256"; case 1 => "SHA-384"; case _ => "SHA-512"
      }
      k = java.security.MessageDigest.getInstance(alg).digest(e)
      round += 1
      done = round >= 64 && (e(e.length - 1) & 0xff) <= round - 32
    }
    k.take(32)
  }

  /** AES-CBC without padding; None when the provider rejects the inputs
    * (wrong key/data length) — used for the /UE‖/OE file-key unwrap whose
    * payload is exactly two blocks with a zero IV (Algorithm 8.2/9.2).
    */
  private def aesCbcNoPad(
      encrypt: Boolean, key: Array[Byte], iv: Array[Byte], data: Array[Byte],
  ): Option[Array[Byte]] =
    try {
      val c = javax.crypto.Cipher.getInstance("AES/CBC/NoPadding")
      c.init(
        if (encrypt) javax.crypto.Cipher.ENCRYPT_MODE else javax.crypto.Cipher.DECRYPT_MODE,
        new javax.crypto.spec.SecretKeySpec(key, "AES"),
        new javax.crypto.spec.IvParameterSpec(iv))
      Some(c.doFinal(data))
    } catch { case _: java.security.GeneralSecurityException => None }

  /** Per-object decryption (Algorithm 1): object key = MD5(fileKey ‖
    * objnum(LE24) ‖ gen(LE16) [‖ "sAlT" for AESV2]) truncated to
    * min(len+5, 16). RC4 applies it as a stream cipher; AESV2 payloads are
    * IV(16) ‖ AES-128-CBC ciphertext with PKCS#7 padding. A malformed AES
    * payload (bad length or padding) decrypts to EMPTY, never garbage —
    * the downstream filter pipeline then counts the stream as skipped.
    * With `v5` (AESV3, R5/R6) there is no per-object derivation: the 32-byte
    * file key is used directly for every string and stream (§7.6.3.3 note 2).
    */
  private[graft] final case class Decryptor(
      key: Array[Byte], aes: Boolean = false, v5: Boolean = false,
  ) {
    def decrypt(objNum: Int, gen: Int, data: Array[Byte]): Array[Byte] = {
      val objKey = if (v5) key else {
        val md = java.security.MessageDigest.getInstance("MD5")
        md.update(key)
        md.update(Array(
          (objNum & 0xff).toByte, ((objNum >> 8) & 0xff).toByte, ((objNum >> 16) & 0xff).toByte,
          (gen & 0xff).toByte, ((gen >> 8) & 0xff).toByte))
        if (aes) md.update(Array(0x73.toByte, 0x41.toByte, 0x6c.toByte, 0x54.toByte))
        md.digest().take(math.min(key.length + 5, 16))
      }
      if (!aes) rc4(objKey, data)
      else if (data.length < 32 || data.length % 16 != 0) Array.emptyByteArray
      else
        try {
          val c = javax.crypto.Cipher.getInstance("AES/CBC/NoPadding")
          c.init(javax.crypto.Cipher.DECRYPT_MODE,
            new javax.crypto.spec.SecretKeySpec(objKey, "AES"),
            new javax.crypto.spec.IvParameterSpec(data, 0, 16))
          val out = c.doFinal(data, 16, data.length - 16)
          val pad = if (out.isEmpty) 0 else out(out.length - 1) & 0xff
          if (pad >= 1 && pad <= 16 && pad <= out.length) out.dropRight(pad)
          else Array.emptyByteArray
        } catch { case _: java.security.GeneralSecurityException => Array.emptyByteArray }
    }
  }

  private def hexBytes(h: String): Array[Byte] = {
    val clean  = h.filterNot(_.isWhitespace)
    val padded = if (clean.length % 2 == 1) clean + "0" else clean
    padded.grouped(2).map(x => Integer.parseInt(x, 16).toByte).toArray
  }

  /** A 32-byte-ish string value for `key` from an Encrypt dict: literal or
    * hex form.
    */
  private def dictString(body: String, key: String): Option[Array[Byte]] =
    (s"""/$key\\s*\\(""").r.findFirstMatchIn(body)
      .map(m => literal(body, m.end)._1.toCharArray.map(_.toByte))
      .orElse((s"""/$key\\s*<([0-9A-Fa-f\\s]*)>""").r.findFirstMatchIn(body)
        .map(m => hexBytes(m.group(1))))

  /** AESV3 (V5, R5/R6) [[Decryptor]]: validate the EMPTY user password
    * against /U's validation salt (Algorithm 11), unwrap the 32-byte file
    * key from /UE with the key-salt hash (Algorithm 8.2); when the user
    * check fails, retry as the empty OWNER password against /O‖/OE with the
    * full /U as `udata` (Algorithms 12, 9.2). None when neither empty
    * password validates — a genuinely password-protected document.
    */
  private def decryptorV5(body: String, r: Int): Option[Decryptor] = {
    val none = Array.emptyByteArray
    def unwrap(entry: Array[Byte], wrapped: Array[Byte], udata: Array[Byte]) = {
      val vSalt = entry.slice(32, 40)
      val kSalt = entry.slice(40, 48)
      if (!java.util.Arrays.equals(hash2B(none, vSalt, udata, r), entry.take(32))) None
      else aesCbcNoPad(encrypt = false, hash2B(none, kSalt, udata, r),
        new Array[Byte](16), wrapped.take(32))
    }
    for {
      u   <- dictString(body, "U")
      ue  <- dictString(body, "UE")
      if u.length >= 48 && ue.length >= 32
      key <- unwrap(u, ue, none).orElse(for {
        o  <- dictString(body, "O")
        oe <- dictString(body, "OE")
        if o.length >= 48 && oe.length >= 32
        k  <- unwrap(o, oe, u.take(48))
      } yield k)
    } yield Decryptor(key, aes = true, v5 = true)
  }

  /** The document [[Decryptor]], when the trailer names a Standard-handler
    * /Encrypt dict this walker supports: V ≤ 2 / R 2–3 (RC4), V4 / R4 with
    * a /StdCF crypt filter of /CFM /V2 (RC4) or /AESV2 (AES-128-CBC), and
    * V5 / R5–6 with /AESV3 (AES-256-CBC, empty user or owner password),
    * honouring /EncryptMetadata false. None for unencrypted documents;
    * unsupported combinations (custom handlers, non-empty passwords) also
    * return None — their streams then fail to decode and surface in
    * `skipped_filters`.
    */
  private def decryptorOf(s: String, objs: Map[Int, String]): Option[Decryptor] =
    for {
      em   <- """/Encrypt\s+(\d+)\s+\d+\s+R""".r.findFirstMatchIn(s)
      body <- objs.get(em.group(1).toInt)
      if body.contains("/Standard")
      r <- """/R\s+(\d+)""".r.findFirstMatchIn(body).map(_.group(1).toInt)
      v   = """/V\s+(\d+)""".r.findFirstMatchIn(body).map(_.group(1).toInt).getOrElse(0)
      cfm = """/CFM\s*/(\w+)""".r.findFirstMatchIn(body).map(_.group(1))
      dec <-
        if (r == 5 || r == 6) {
          if (v == 5 && cfm.getOrElse("AESV3") == "AESV3") decryptorV5(body, r) else None
        } else
          for {
            aes <-
              if (r == 2 || r == 3) Some(false)
              else if (r == 4 && v == 4 && cfm.contains("AESV2")) Some(true)
              else if (r == 4 && v == 4 && cfm.contains("V2")) Some(false)
              else None
            p <- """/P\s+(-?\d+)""".r.findFirstMatchIn(body).map(_.group(1).toInt)
            o <- dictString(body, "O")
            id0 = """/ID\s*\[\s*<([0-9A-Fa-f\s]*)>""".r.findFirstMatchIn(s)
              .map(m => hexBytes(m.group(1))).getOrElse(Array.emptyByteArray)
            // crypt-filter dicts give /Length in BYTES (a spec wart pypdf
            // also normalizes); values ≤ 32 are scaled up
            bitsRaw = """/Length\s+(\d+)""".r.findFirstMatchIn(body).map(_.group(1).toInt)
              .getOrElse(if (v >= 4) 128 else 40)
            bits    = if (bitsRaw <= 32) bitsRaw * 8 else bitsRaw
            encMeta = """/EncryptMetadata\s+false""".r.findFirstMatchIn(body).isEmpty
          } yield Decryptor(fileKey(o, p, id0, r, bits, encMeta), aes)
    } yield dec

  /** PDF literal string starting after '(': escapes, octal, balanced parens. */
  private def literal(s: String, start: Int): (String, Int) = {
    val sb = new StringBuilder
    var depth = 1
    var i = start
    while (i < s.length && depth > 0) {
      s.charAt(i) match {
        case '\\' if i + 1 < s.length =>
          s.charAt(i + 1) match {
            case 'n' => sb.append('\n'); i += 2
            case 'r' => sb.append('\r'); i += 2
            case 't' => sb.append('\t'); i += 2
            case 'b' => sb.append('\b'); i += 2
            case 'f' => sb.append('\f'); i += 2
            case '\n' => i += 2 // line continuation
            case '\r' => i += 2; if (i < s.length && s.charAt(i) == '\n') i += 1
            case d if d >= '0' && d <= '7' =>
              var j = i + 1; var v = 0
              while (j < s.length && j < i + 4 && s.charAt(j) >= '0' && s.charAt(j) <= '7') {
                v = v * 8 + (s.charAt(j) - '0'); j += 1
              }
              sb.append(v.toChar); i = j
            case c => sb.append(c); i += 2
          }
        case '(' => depth += 1; sb.append('('); i += 1
        case ')' => depth -= 1; if (depth > 0) sb.append(')'); i += 1
        case c => sb.append(c); i += 1
      }
    }
    (sb.toString, i)
  }

  // ---------------------------------------------------------------------
  // Font-aware show-string decoding (PDF 32000 §9.6-9.10) — round 10.
  // pypdf resolves the bytes of a show string through the font's
  // /ToUnicode CMap (pypdf/_cmap.py, reached via pdf_extractor.py:16-40)
  // or its /Encoding (/Differences over a base encoding); Identity-H
  // Type0 fonts consume 2-byte CIDs. Without this, any subset-font PDF
  // (LaTeX, Word exports) emits garbled glyph indices where the
  // reference emits prose.
  // ---------------------------------------------------------------------

  /** Per-font decoder: /ToUnicode entries win, then /Differences + base
    * encoding, then the literal byte (the legacy fallback — kept so a
    * font with NO usable tables degrades to pre-round-10 behavior
    * instead of dropping text). `twoByte` fonts (Type0/Identity-H)
    * consume 16-bit codes; unmapped 2-byte codes fall back to the code
    * point itself (the UTF-16BE reading of the raw bytes).
    */
  private[sources] final class FontDecoder(
      val twoByte: Boolean,
      cmap: Map[Int, String],
      single: Option[Array[String]]) {
    def decode(raw: String): String =
      if (!twoByte && cmap.isEmpty && single.isEmpty) raw
      else {
        val out = new StringBuilder(raw.length)
        var i = 0
        while (i < raw.length) {
          if (twoByte && i + 1 < raw.length) {
            val code = ((raw.charAt(i) & 0xff) << 8) | (raw.charAt(i + 1) & 0xff)
            out ++= cmap.getOrElse(code, code.toChar.toString)
            i += 2
          } else {
            val code = raw.charAt(i) & 0xff
            out ++= cmap.get(code)
              .orElse(single.flatMap(t => Option(t(code))))
              .getOrElse(raw.charAt(i).toString)
            i += 1
          }
        }
        out.toString
      }
  }

  private[sources] object FontDecoder {
    /** Bytes pass through untouched (latin-1 reading) — unknown fonts. */
    val Identity = new FontDecoder(false, Map.empty, None)
  }

  /** Adobe-glyph-list subset covering the names /Differences arrays use
    * in practice (ASCII names, Latin-1 accents, typographic punctuation,
    * f-ligatures, the full Greek alphabet, the TeX-derived math operator
    * names, and the AFII Cyrillic set) plus the algorithmic
    * uniXXXX/uXXXX/suffix/ligature forms in [[glyphToUnicode]]. Unknown
    * glyph names (e.g. bare subset names like /g42) return None and the
    * byte falls back to its base-encoding/literal value.
    */
  private val GlyphNames: Map[String, String] = {
    val b = Map.newBuilder[String, String]
    for (c <- ('A' to 'Z') ++ ('a' to 'z')) b += c.toString -> c.toString
    Seq("zero", "one", "two", "three", "four", "five", "six", "seven", "eight", "nine")
      .zipWithIndex.foreach { case (n, i) => b += n -> i.toString }
    b ++= Seq(
      "space" -> " ", "exclam" -> "!", "quotedbl" -> "\"", "numbersign" -> "#",
      "dollar" -> "$", "percent" -> "%", "ampersand" -> "&", "quotesingle" -> "'",
      "parenleft" -> "(", "parenright" -> ")", "asterisk" -> "*", "plus" -> "+",
      "comma" -> ",", "hyphen" -> "-", "period" -> ".", "slash" -> "/",
      "colon" -> ":", "semicolon" -> ";", "less" -> "<", "equal" -> "=",
      "greater" -> ">", "question" -> "?", "at" -> "@", "bracketleft" -> "[",
      "backslash" -> "\\", "bracketright" -> "]", "asciicircum" -> "^",
      "underscore" -> "_", "grave" -> "`", "braceleft" -> "{", "bar" -> "|",
      "braceright" -> "}", "asciitilde" -> "~",
      "quoteleft" -> "‘", "quoteright" -> "’",
      "quotedblleft" -> "“", "quotedblright" -> "”",
      "endash" -> "–", "emdash" -> "—", "bullet" -> "•",
      "ellipsis" -> "…", "fi" -> "ﬁ", "fl" -> "ﬂ",
      "dagger" -> "†", "daggerdbl" -> "‡", "trademark" -> "™",
      "copyright" -> "©", "registered" -> "®", "degree" -> "°",
      "sterling" -> "£", "euro" -> "€", "yen" -> "¥",
      "cent" -> "¢", "section" -> "§", "paragraph" -> "¶",
      "germandbls" -> "ß", "ae" -> "æ", "AE" -> "Æ",
      "oe" -> "œ", "OE" -> "Œ", "oslash" -> "ø", "Oslash" -> "Ø",
      "aring" -> "å", "Aring" -> "Å", "agrave" -> "à",
      "aacute" -> "á", "acircumflex" -> "â", "atilde" -> "ã",
      "adieresis" -> "ä", "egrave" -> "è", "eacute" -> "é",
      "ecircumflex" -> "ê", "edieresis" -> "ë", "igrave" -> "ì",
      "iacute" -> "í", "icircumflex" -> "î", "idieresis" -> "ï",
      "ograve" -> "ò", "oacute" -> "ó", "ocircumflex" -> "ô",
      "otilde" -> "õ", "odieresis" -> "ö", "ugrave" -> "ù",
      "uacute" -> "ú", "ucircumflex" -> "û", "udieresis" -> "ü",
      "ccedilla" -> "ç", "Ccedilla" -> "Ç", "ntilde" -> "ñ",
      "Ntilde" -> "Ñ", "yacute" -> "ý", "ydieresis" -> "ÿ",
      "Agrave" -> "À", "Aacute" -> "Á", "Eacute" -> "É",
      "Egrave" -> "È", "Odieresis" -> "Ö", "Udieresis" -> "Ü",
      "exclamdown" -> "¡", "questiondown" -> "¿", "mu" -> "µ",
      "multiply" -> "×", "divide" -> "÷", "plusminus" -> "±",
      "onehalf" -> "½", "onequarter" -> "¼", "threequarters" -> "¾",
    )
    // Greek (AGLFN names — math/physics PDFs carry these constantly).
    // AGL quirk: lowercase "mu" is MICRO SIGN above (Latin-1 set); the
    // Greek letter mu's AGLFN name is also "mu", but the Latin-1 entry
    // wins for table-compat with the original AGLFN double mapping.
    val greekLower = Seq(
      "alpha" -> 'α', "beta" -> 'β', "gamma" -> 'γ', "delta" -> 'δ',
      "epsilon" -> 'ε', "zeta" -> 'ζ', "eta" -> 'η', "theta" -> 'θ',
      "iota" -> 'ι', "kappa" -> 'κ', "lambda" -> 'λ',
      "nu" -> 'ν', "xi" -> 'ξ', "omicron" -> 'ο', "pi" -> 'π',
      "rho" -> 'ρ', "sigma" -> 'σ', "sigma1" -> 'ς', "tau" -> 'τ',
      "upsilon" -> 'υ', "phi" -> 'φ', "phi1" -> 'ϕ', "chi" -> 'χ',
      "psi" -> 'ψ', "omega" -> 'ω')
    val greekUpper = Seq(
      "Alpha" -> 'Α', "Beta" -> 'Β', "Gamma" -> 'Γ', "Delta" -> 'Δ',
      "Epsilon" -> 'Ε', "Zeta" -> 'Ζ', "Eta" -> 'Η', "Theta" -> 'Θ',
      "Iota" -> 'Ι', "Kappa" -> 'Κ', "Lambda" -> 'Λ', "Mu" -> 'Μ',
      "Nu" -> 'Ν', "Xi" -> 'Ξ', "Omicron" -> 'Ο', "Pi" -> 'Π',
      "Rho" -> 'Ρ', "Sigma" -> 'Σ', "Tau" -> 'Τ', "Upsilon" -> 'Υ',
      "Phi" -> 'Φ', "Chi" -> 'Χ', "Psi" -> 'Ψ', "Omega" -> 'Ω')
    for ((n, c) <- greekLower ++ greekUpper) b += n -> c.toString
    // math operators the TeX-derived fonts name (AGLFN)
    b ++= Seq(
      "minus" -> "−", "periodcentered" -> "·", "dotmath" -> "⋅",
      "approxequal" -> "≈", "notequal" -> "≠", "lessequal" -> "≤",
      "greaterequal" -> "≥", "infinity" -> "∞", "partialdiff" -> "∂",
      "summation" -> "∑", "product" -> "∏", "integral" -> "∫",
      "radical" -> "√", "proportional" -> "∝", "element" -> "∈",
      "arrowright" -> "→", "arrowleft" -> "←", "arrowup" -> "↑",
      "arrowdown" -> "↓", "arrowboth" -> "↔", "gradient" -> "∇",
      "intersection" -> "∩", "union" -> "∪", "emptyset" -> "∅",
      "lozenge" -> "◊", "perpendicular" -> "⊥", "therefore" -> "∴",
      "angle" -> "∠", "asteriskmath" -> "∗", "equivalence" -> "≡",
      "propersubset" -> "⊂", "propersuperset" -> "⊃",
      "logicaland" -> "∧", "logicalor" -> "∨", "logicalnot" -> "¬",
      "universal" -> "∀", "existential" -> "∃", "suchthat" -> "∋",
      "congruent" -> "≅", "circleplus" -> "⊕", "circlemultiply" -> "⊗")
    // Cyrillic AFII names (the legacy Adobe/AFII double mapping pypdf's
    // tables carry). The AFII sequence interleaves Ё after Е (and ё
    // after е), so it is NOT a contiguous Unicode run — spell it out:
    // afii10017..10049 and afii10065..10097.
    val ruUpper = "АБВГДЕЁЖЗИЙКЛМНОПРСТУФХЦЧШЩЪЫЬЭЮЯ"
    val ruLower = "абвгдеёжзийклмнопрстуфхцчшщъыьэюя"
    for (i <- 0 until 33) {
      b += s"afii${10017 + i}" -> ruUpper(i).toString
      b += s"afii${10065 + i}" -> ruLower(i).toString
    }
    b ++= Seq(
      "afii10050" -> "Ґ", "afii10098" -> "ґ",
      "afii10051" -> "Ђ", "afii10099" -> "ђ",
      "afii10052" -> "Ѓ", "afii10100" -> "ѓ",
      "afii10053" -> "Є", "afii10101" -> "є",
      "afii10054" -> "Ѕ", "afii10102" -> "ѕ",
      "afii10055" -> "І", "afii10103" -> "і",
      "afii10056" -> "Ї", "afii10104" -> "ї",
      "afii10057" -> "Ј", "afii10105" -> "ј",
      "afii10058" -> "Љ", "afii10106" -> "љ",
      "afii10059" -> "Њ", "afii10107" -> "њ",
      "afii10060" -> "Ћ", "afii10108" -> "ћ",
      "afii10061" -> "Ќ", "afii10109" -> "ќ",
      "afii10062" -> "Ў", "afii10110" -> "ў",
      "afii10145" -> "Џ", "afii10193" -> "џ",
      "afii61352" -> "№")
    b.result()
  }

  /** The published Adobe Glyph List ALGORITHM ("Unicode values for glyph
    * names" — what pypdf's glyph tables implement for the reference,
    * backend/extractors/pdf_extractor.py:16-40), not just a table lookup:
    *  1. strip everything from the FIRST period (the suffix convention —
    *     `A.sc`, `o.sc.alt` → `A`, `o`); a leading period (`.notdef`)
    *     leaves no base name, hence no mapping;
    *  2. split the remainder on `_` into ligature components (`f_i` →
    *     "fi");
    *  3. map each component through the name table, through `uni` + one
    *     or MORE 4-hex-digit groups (each a non-surrogate BMP scalar —
    *     `uni00480065` → "He"), or through `u` + 4–6 hex digits (any
    *     plane); concatenate the component texts.
    * A name with no resolvable component returns None and the byte falls
    * back to its base-encoding/literal value.
    */
  private[sources] def glyphToUnicode(name: String): Option[String] = {
    def component(c: String): Option[String] =
      GlyphNames.get(c).orElse {
        val body = c.drop(if (c.startsWith("uni")) 3 else 1)
        if (c.startsWith("uni") && body.nonEmpty && body.length % 4 == 0 &&
          body.forall(ch => Character.digit(ch, 16) >= 0)) {
          val cps = body.grouped(4).map(Integer.parseInt(_, 16)).toSeq
          if (cps.exists(cp => cp >= 0xD800 && cp <= 0xDFFF)) None
          else Some(cps.map(_.toChar).mkString)
        } else if (c.startsWith("u") && body.length >= 4 && body.length <= 6 &&
          body.forall(ch => Character.digit(ch, 16) >= 0)) {
          val cp = Integer.parseInt(body, 16)
          if ((cp >= 0xD800 && cp <= 0xDFFF) || cp > 0x10FFFF) None
          else Some(new String(Character.toChars(cp)))
        } else None
      }
    val base = name.indexOf('.') match {
      case -1 => name
      case 0  => "" // .notdef and friends carry no base name
      case i  => name.substring(0, i)
    }
    val texts = base.split('_').iterator.filter(_.nonEmpty).flatMap(component).toSeq
    if (texts.isEmpty) None else Some(texts.mkString)
  }

  /** Parse a /ToUnicode CMap stream (§9.10.3): `beginbfchar` pairs,
    * `beginbfrange` triples (destination string OR per-code array),
    * `begincodespacerange` deciding code width. Returns (twoByteCodes,
    * code → unicode string).
    */
  private[sources] def parseToUnicode(cmap: String): (Boolean, Map[Int, String]) = {
    val out = mutable.Map.empty[Int, String]
    var two = false
    def utf16(hex: String): String = {
      val h = if (hex.length % 2 == 1) hex + "0" else hex
      val bytes = h.grouped(2).map(x => Integer.parseInt(x, 16).toByte).toArray
      new String(bytes, StandardCharsets.UTF_16BE)
    }
    val hexTok = "<([0-9A-Fa-f]+)>".r
    for (m <- "(?s)begincodespacerange(.*?)endcodespacerange".r.findAllMatchIn(cmap))
      hexTok.findAllMatchIn(m.group(1)).foreach(t => if (t.group(1).length >= 4) two = true)
    for (m <- "(?s)beginbfchar(.*?)endbfchar".r.findAllMatchIn(cmap))
      hexTok.findAllMatchIn(m.group(1)).map(_.group(1)).grouped(2).foreach {
        case Seq(src, dst) =>
          if (src.length >= 4) two = true
          out(Integer.parseInt(src, 16)) = utf16(dst)
        case _ => ()
      }
    for (m <- "(?s)beginbfrange(.*?)endbfrange".r.findAllMatchIn(cmap)) {
      val toks = "<[0-9A-Fa-f]+>|\\[|\\]".r.findAllIn(m.group(1)).toVector
      def hexOf(t: String) = t.substring(1, t.length - 1)
      var i = 0
      while (i + 2 < toks.length) {
        if (!toks(i).startsWith("<") || !toks(i + 1).startsWith("<")) {
          i = toks.length // malformed tail — stop
        } else {
          val lo = Integer.parseInt(hexOf(toks(i)), 16)
          val hi = math.min(Integer.parseInt(hexOf(toks(i + 1)), 16), lo + 65535)
          if (hexOf(toks(i)).length >= 4) two = true
          if (toks(i + 2) == "[") {
            var j = i + 3; var c = lo
            while (j < toks.length && toks(j) != "]") {
              if (c <= hi && toks(j).startsWith("<")) out(c) = utf16(hexOf(toks(j)))
              c += 1; j += 1
            }
            i = j + 1
          } else {
            val dst = utf16(hexOf(toks(i + 2)))
            // the offset increments the FINAL UTF-16 code unit (§9.10.3)
            var c = lo
            while (c <= hi) {
              out(c) =
                if (dst.isEmpty) dst
                else dst.dropRight(1) + (dst.last + (c - lo)).toChar
              c += 1
            }
            i += 3
          }
        }
      }
    }
    (two, out.toMap)
  }

  /** 256-entry byte → unicode table for a base encoding plus an optional
    * /Differences override list. Entries left null fall back to the
    * literal byte at decode time. WinAnsi is windows-1252, MacRoman is
    * x-MacRoman — both JRE-standard charsets; undefined code points stay
    * null rather than becoming U+FFFD.
    */
  private[sources] def singleByteTable(
      baseName: Option[String],
      differences: Option[String]): Option[Array[String]] =
    if (baseName.isEmpty && differences.isEmpty) None
    else {
      val t = new Array[String](256)
      val cs = baseName.collect {
        case "WinAnsiEncoding"  => java.nio.charset.Charset.forName("windows-1252")
        case "MacRomanEncoding" => java.nio.charset.Charset.forName("x-MacRoman")
      }
      cs.foreach { c =>
        var b = 0
        while (b < 256) {
          val s = new String(Array(b.toByte), c)
          if (s.length == 1 && s.charAt(0) != '�') t(b) = s
          b += 1
        }
      }
      differences.foreach { d =>
        var code = 0
        "(\\d+)|/([A-Za-z0-9._]+)".r.findAllMatchIn(d).foreach { m =>
          if (m.group(1) != null) code = m.group(1).toInt
          else {
            if (code >= 0 && code < 256) glyphToUnicode(m.group(2)).foreach(t(code) = _)
            code += 1
          }
        }
      }
      Some(t)
    }

  /** Inner content of the balanced `<<…>>` starting at `start`. */
  private def balancedInner(s: String, start: Int): String = {
    var depth = 0
    var j = start
    while (j < s.length) {
      if (j + 1 < s.length && s.charAt(j) == '<' && s.charAt(j + 1) == '<') { depth += 1; j += 2 }
      else if (j + 1 < s.length && s.charAt(j) == '>' && s.charAt(j + 1) == '>') {
        depth -= 1; j += 2
        if (depth == 0) return s.substring(start + 2, j - 2)
      } else j += 1
    }
    s.substring(math.min(start + 2, s.length))
  }

  /** `/Key <<…>>` inline dict or `/Key N 0 R` indirect dict content. */
  private def dictValue(body: String, key: String, objs: Map[Int, String]): Option[String] =
    (s"/$key\\s*<<").r.findFirstMatchIn(body).map(m => balancedInner(body, m.end - 2))
      .orElse(ref(body, key).flatMap(objs.get))

  /** Build the decoder for one font object. `streamOf` resolves an
    * indirect stream (decrypted + defiltered) — the /ToUnicode CMap.
    */
  private[sources] def fontDecoder(
      body: String,
      objs: Map[Int, String],
      streamOf: Int => Option[Array[Byte]]): FontDecoder = {
    val toUni = ref(body, "ToUnicode").flatMap(streamOf).map(b => parseToUnicode(latin1(b)))
    val encName = "/Encoding\\s*/([A-Za-z0-9-]+)".r.findFirstMatchIn(body).map(_.group(1))
    val isType0 = "/Subtype\\s*/Type0(?![A-Za-z])".r.findFirstIn(body).isDefined
    val identityCid = isType0 || encName.exists(n => n == "Identity-H" || n == "Identity-V")
    val encBody = dictValue(body, "Encoding", objs).filter(_.contains("/Differences"))
    val baseName = encBody.flatMap(e =>
      "/BaseEncoding\\s*/([A-Za-z0-9-]+)".r.findFirstMatchIn(e).map(_.group(1)))
      .orElse(encName)
    val diffs = encBody.flatMap(e =>
      "(?s)/Differences\\s*\\[(.*?)\\]".r.findFirstMatchIn(e).map(_.group(1)))
    val single = if (identityCid) None else singleByteTable(baseName, diffs)
    val (cmapTwo, cmap) = toUni.getOrElse((false, Map.empty[Int, String]))
    val two = cmapTwo || identityCid
    // Round 11: when NOTHING above could name the characters (no
    // ToUnicode, no Differences, no base encoding, not a CID font), read
    // the embedded font program itself — pypdf's remaining trick for
    // subset fonts ([[FontPrograms]]). Weakest priority by construction:
    // it is only consulted when every declared source is absent.
    val fromProgram: Option[Array[String]] =
      if (two || cmap.nonEmpty || single.isDefined) None
      else
        ref(body, "FontDescriptor").flatMap(objs.get).flatMap { desc =>
          Seq("FontFile2", "FontFile3", "FontFile").view
            .flatMap(k => ref(desc, k))
            .flatMap(streamOf)
            .flatMap(FontPrograms.table)
            .headOption
        }
    if (!two && cmap.isEmpty && single.isEmpty && fromProgram.isEmpty) FontDecoder.Identity
    else new FontDecoder(two, cmap, single.orElse(fromProgram))
  }

  /** Text of one content stream: `Tj`/`'`/`"`/`TJ` show pending strings.
    * Line breaks follow the TEXT MATRIX, the way pypdf's simple path
    * decides them (pdf_extractor.py:16-40 delegates to pypdf, which
    * tracks Tm/Td and breaks on vertical movement): the walker maintains
    * the text-space y cursor — `Tm` sets it from its f operand, `Td`/`TD`
    * translate it by ty, `T*`/`'`/`"` move down one leading (`TL`, or the
    * -ty a `TD` records) — and a newline is emitted AT SHOW TIME whenever
    * the cursor's y differs from the y of the previous show. So a
    * horizontal `Td tx 0` (kerned words on one line) no longer splits the
    * line, and a multi-column page whose stream jumps columns with `Tm`
    * (no Td at all) breaks exactly where the y changes — including the
    * jump back up to the second column's top. Positioning before the
    * first show never emits a leading newline. Round 10 tracks the FULL
    * matrix: the break cursor is the pen coordinate perpendicular to the
    * writing direction (a, b), so rotated text (a 90° Tm with zero
    * diagonal moves x, not y) splits lines where a y-only tracker would
    * merge every line. Show strings decode through the `Tf`-selected
    * font's [[FontDecoder]] (ToUnicode CMap / Differences / Identity-H).
    */
  private[sources] def textOfStream(
      cs: String,
      fonts: Map[String, FontDecoder] = Map.empty,
      forms: Map[String, String] = Map.empty): String = {
    val sb = new StringBuilder
    val pending = mutable.ArrayBuffer.empty[String]
    val nums    = mutable.ArrayBuffer.empty[Double]
    // Full text line matrix [a b c d e f] (§9.4.2): `Tm` replaces it,
    // `Td`/`TD`/`T*` translate it in TEXT space. Line breaks key on the
    // pen coordinate PERPENDICULAR to the writing direction (a, b): for
    // identity-rotation matrices that reduces to "y changed" (the
    // round-9 behavior), while a 90°-rotated matrix (zero diagonal —
    // vertical text) moves x not y and keys on x, so rotated columns
    // still split instead of merging into one line.
    var ma = 1.0; var mb = 0.0; var mc = 0.0; var md = 1.0; var me = 0.0; var mf = 0.0
    var lastPerp = Double.NaN
    var leading  = 0.0
    var lastName = ""
    var decoder  = FontDecoder.Identity
    var i = 0
    def perp: Double = {
      val hyp = math.hypot(ma, mb)
      if (hyp == 0.0) mf else (ma * mf - mb * me) / hyp
    }
    def translate(tx: Double, ty: Double): Unit = {
      me += tx * ma + ty * mc
      mf += tx * mb + ty * md
    }
    def breakLine(): Unit =
      if (sb.nonEmpty && sb.charAt(sb.length - 1) != '\n') sb.append('\n')
    def nextLine(): Unit = translate(0.0, -(if (leading != 0.0) leading else 1.0))
    def show(): Unit = {
      val p = perp
      if (!lastPerp.isNaN && p != lastPerp) breakLine()
      pending.foreach(sb ++= _); pending.clear()
      lastPerp = p
    }
    while (i < cs.length) {
      cs.charAt(i) match {
        case '(' =>
          val (str, next) = literal(cs, i + 1)
          pending += decoder.decode(str); i = next
        case '/' =>
          // name operand (the `/F1` of `/F1 12 Tf`) — remembered for Tf
          var j = i + 1
          while (j < cs.length && { val c = cs.charAt(j)
            c.isLetterOrDigit || c == '.' || c == '_' || c == '+' || c == '-' }) j += 1
          lastName = cs.substring(i + 1, j)
          i = j
        case '<' if i + 1 < cs.length && cs.charAt(i + 1) == '<' =>
          // dictionary (e.g. marked-content props '/P <</MCID 0>> BDC'):
          // skip the balanced <<…>> whole, or the inner '<' would be
          // misread as a hex string and crash on the first non-hex char
          var depth = 0
          var j     = i
          while (j < cs.length && (depth > 0 || j == i)) {
            if (j + 1 < cs.length && cs.charAt(j) == '<' && cs.charAt(j + 1) == '<') { depth += 1; j += 2 }
            else if (j + 1 < cs.length && cs.charAt(j) == '>' && cs.charAt(j + 1) == '>') { depth -= 1; j += 2 }
            else j += 1
          }
          i = j
        case '<' =>
          val end = cs.indexOf('>', i)
          if (end < 0) i = cs.length
          else {
            val hexs = cs.substring(i + 1, end).filterNot(_.isWhitespace)
            val padded = if (hexs.length % 2 == 1) hexs + "0" else hexs
            if (padded.forall(c => Character.digit(c, 16) >= 0)) {
              pending += decoder.decode(
                padded.grouped(2).map(h => Integer.parseInt(h, 16).toChar).mkString)
            }
            i = end + 1
          }
        case c if c.isLetter || c == '\'' || c == '"' || c == '*' =>
          var j = i
          while (j < cs.length && { val ch = cs.charAt(j); ch.isLetterOrDigit || ch == '\'' || ch == '"' || ch == '*' }) j += 1
          cs.substring(i, j) match {
            case "Tj" | "TJ" => show()
            case "'" | "\""  => nextLine(); show() // both imply T* first
            case "Td" =>
              if (nums.length >= 2) translate(nums(nums.length - 2), nums(nums.length - 1))
              pending.clear()
            case "TD" => // Td that also sets leading = -ty
              if (nums.length >= 2) {
                leading = -nums(nums.length - 1)
                translate(nums(nums.length - 2), nums(nums.length - 1))
              }
              pending.clear()
            case "Tm" =>
              if (nums.length >= 6) {
                val n = nums.length
                ma = nums(n - 6); mb = nums(n - 5); mc = nums(n - 4)
                md = nums(n - 3); me = nums(n - 2); mf = nums(n - 1)
              }
              pending.clear()
            case "TL" =>
              if (nums.nonEmpty) leading = nums(nums.length - 1)
              pending.clear()
            case "T*" => nextLine(); pending.clear()
            case "Tf" => // font select: decoder switches with the graphics state
              decoder = fonts.getOrElse(lastName, FontDecoder.Identity)
              pending.clear()
            case "Do" => // draw XObject: splice a Form's pre-rendered text block
              forms.get(lastName).filter(_.nonEmpty).foreach { ft =>
                breakLine(); sb ++= ft; breakLine()
              }
              pending.clear()
            case "BT" =>
              ma = 1.0; mb = 0.0; mc = 0.0; md = 1.0; me = 0.0; mf = 0.0
              leading = 0.0; pending.clear()
            case _ => pending.clear()
          }
          nums.clear()
          i = j
        case c if (c >= '0' && c <= '9') || c == '-' || c == '+' || c == '.' =>
          var j = i + 1
          while (j < cs.length && { val ch = cs.charAt(j); (ch >= '0' && ch <= '9') || ch == '.' }) j += 1
          try nums += cs.substring(i, j).toDouble
          catch { case _: NumberFormatException => () } // lone '-'/'.'/'+'
          i = j
        case _ => i += 1
      }
    }
    sb.toString.reverse.dropWhile(_ == '\n').reverse
  }

  /** pdf_extractor.py:22-38: non-empty page texts joined "\n\n";
    * page_count always present, title/author when the /Info dict has them.
    */
  def extract(content: Array[Byte]): (String, Map[String, String]) = {
    val s = latin1(content)
    if (!s.startsWith("%PDF")) throw new IllegalArgumentException("not a PDF (missing %PDF header)")
    val scanned = objects(s)
    // Standard-handler encryption (when present): structure is plaintext,
    // strings/streams are RC4'd per object. Generation numbers are assumed
    // 0 (the object scanner keys on number only; non-zero generations
    // require incremental updates this walker doesn't model). The /Encrypt
    // dict is necessarily a top-level object (it can't live inside an
    // ObjStm — it's needed to decode them), so `scanned` suffices here.
    val dec = decryptorOf(s, scanned)
    def decryptFor(objNum: Int): Array[Byte] => Array[Byte] =
      dec.map(d => (bytes: Array[Byte]) => d.decrypt(objNum, 0, bytes)).getOrElse(identity)
    // content streams behind a filter this walker can't decode contribute
    // no text; the count makes that loss visible instead of silent
    var skippedFilters = 0
    val objs = expandObjectStreams(scanned, s, decryptFor, () => skippedFilters += 1)
    val pages = pageOrder(objs, s)
    def streamOf(n: Int): Option[Array[Byte]] =
      objs.get(n).flatMap(b => streamData(b, () => skippedFilters += 1, decryptFor(n)))
    // font decoders are per font OBJECT — cache across pages sharing them
    val decoderCache = mutable.Map.empty[Int, FontDecoder]
    def fontsFromDict(fd: String): Map[String, FontDecoder] =
      "/([A-Za-z0-9._+-]+)\\s+(\\d+)\\s+\\d+\\s+R".r.findAllMatchIn(fd).map { m =>
        val num = m.group(2).toInt
        m.group(1) -> decoderCache.getOrElseUpdate(num,
          objs.get(num).map(fontDecoder(_, objs, streamOf)).getOrElse(FontDecoder.Identity))
      }.toMap
    // /Resources may be inherited from an ancestor /Pages node (§7.7.3.4)
    def resourcesOf(pageNum: Int): Option[String] = {
      var cur   = pageNum
      var res   = Option.empty[String]
      var depth = 0
      while (res.isEmpty && depth < 32) {
        objs.get(cur) match {
          case Some(b) =>
            res = dictValue(b, "Resources", objs)
            if (res.isEmpty) ref(b, "Parent") match {
              case Some(p) => cur = p; depth += 1
              case None    => depth = 32
            }
          case None => depth = 32
        }
      }
      res
    }
    def fontsIn(res: Option[String]): Map[String, FontDecoder] =
      res.flatMap(dictValue(_, "Font", objs)).map(fontsFromDict).getOrElse(Map.empty)
    def xobjectRefs(res: Option[String]): Map[String, Int] =
      res.flatMap(dictValue(_, "XObject", objs)).map { xd =>
        "/([A-Za-z0-9._+-]+)\\s+(\\d+)\\s+\\d+\\s+R".r.findAllMatchIn(xd)
          .map(m => m.group(1) -> m.group(2).toInt).toMap
      }.getOrElse(Map.empty)
    // Form XObjects (§8.10): a `Do` on a /Subtype /Form draws a nested
    // content stream — LaTeX figure text, stamps, letterheads live there.
    // Each form's text renders ONCE (own /Resources: fonts + nested
    // forms, depth-cycled via `seen`) and splices in at its Do site as
    // its own block; positions are not threaded across the boundary
    // (declared deviation — the form's internal line structure is kept,
    // its placement on the page is the Do's document order).
    val formCache = mutable.Map.empty[Int, String]
    def formText(num: Int, seen: Set[Int]): String =
      if (seen.contains(num)) ""
      else formCache.getOrElse(num, {
        val t = objs.get(num)
          .filter(b => "/Subtype\\s*/Form(?![A-Za-z])".r.findFirstIn(b).isDefined)
          .flatMap { b =>
            streamData(b, () => skippedFilters += 1, decryptFor(num)).map { data =>
              val res = dictValue(b, "Resources", objs)
              val nested = xobjectRefs(res).map { case (n, o) => n -> formText(o, seen + num) }
              textOfStream(latin1(data), fontsIn(res), nested)
            }
          }.getOrElse("")
        formCache(num) = t
        t
      })
    val pageTexts = pages.map { p =>
      val res   = resourcesOf(p)
      val forms = xobjectRefs(res).map { case (n, o) => n -> formText(o, Set.empty) }
      refList(objs(p), "Contents")
        .flatMap(c => objs.get(c).flatMap(b => streamData(b, () => skippedFilters += 1, decryptFor(c))))
        .map(b => textOfStream(latin1(b), fontsIn(res), forms))
        .mkString("\n")
    }
    val info = for {
      m <- """/Info\s+(\d+)\s+\d+\s+R""".r.findFirstMatchIn(s)
      b <- objs.get(m.group(1).toInt)
    } yield (m.group(1).toInt, b)
    def infoStr(key: String): Option[String] = info.flatMap { case (num, b) =>
      (s"""/$key\\s*\\(""").r.findFirstMatchIn(b).map { m =>
        val raw = literal(b, m.end)._1
        latin1(decryptFor(num)(raw.toCharArray.map(_.toByte)))
      }
    }
    val meta = Map("page_count" -> pages.size.toString) ++
      infoStr("Title").map("title" -> _) ++ infoStr("Author").map("author" -> _) ++
      (if (skippedFilters > 0) Some("skipped_filters" -> skippedFilters.toString) else None)
    (pageTexts.filter(_.nonEmpty).mkString("\n\n"), meta)
  }
}

/** S2 — PDF text extraction (pdf_extractor.py:16-40). */
final class PdfExtractor extends Extractor {
  val name = "PdfExtractor"
  def extract(content: Array[Byte], fileName: String): (String, Map[String, String]) =
    PdfParser.extract(content)
}

/** S3 — DOCX (docx_extractor.py:16-27; text contract is docx2txt's: header
  * parts, then body, then footer parts; every paragraph emits its run text
  * followed by a blank line; tabs/breaks become real characters; final
  * strip). Metadata is `{}` like the reference.
  */
final class DocxExtractor extends Extractor {
  val name = "DocxExtractor"

  private val Para = "(?s)<w:p(?:\\s[^>]*)?>.*?</w:p>|<w:p/>".r
  private val Run = "(?s)<w:t(?:\\s[^>]*)?>(.*?)</w:t>|<w:tab\\s*/>|<w:br\\s*/>|<w:cr\\s*/>".r

  private def partText(xml: String): String =
    Para.findAllIn(xml).map { p =>
      Run.findAllMatchIn(p).map { m =>
        Option(m.group(1)).map(Ooxml.unescape).getOrElse(
          if (m.matched.startsWith("<w:tab")) "\t" else "\n")
      }.mkString + "\n\n"
    }.mkString

  def extract(content: Array[Byte], fileName: String): (String, Map[String, String]) = {
    val es = Ooxml.entries(content)
    if (!es.exists(_._1 == "word/document.xml"))
      throw new IllegalArgumentException("not a DOCX (no word/document.xml)")
    val ordered =
      es.collect { case (n, _) if n.matches("word/header\\d*\\.xml") => n }.sorted ++
        Vector("word/document.xml") ++
        es.collect { case (n, _) if n.matches("word/footer\\d*\\.xml") => n }.sorted
    val text = ordered.flatMap(Ooxml.entryText(es, _)).map(partText).mkString.trim
    (text, Map.empty)
  }
}

/** S4 — PPTX (pptx_extractor.py:26-57): shape text = paragraph texts joined
  * "\n" (python-pptx `shape.text`), non-empty shapes joined "\n" within a
  * slide, non-empty slides joined "\n\n"; slide_count + core-props metadata.
  *
  * Slide ORDER follows python-pptx exactly (round 8, closing the declared
  * numeric-order deviation): the `<p:sldIdLst>` r:id sequence in
  * `ppt/presentation.xml`, resolved through
  * `ppt/_rels/presentation.xml.rels` Relationship targets — a deck whose
  * rel order disagrees with the slideN.xml numbering (slides reordered in
  * the editor) extracts in PRESENTATION order. Numeric `slideN` order
  * remains the fallback when either part is absent/unresolvable (some
  * producers omit the list; the property spec covers that path).
  */
final class PptxExtractor extends Extractor {
  val name = "PptxExtractor"

  private val SlideName = "^ppt/slides/slide(\\d+)\\.xml$".r
  private val SldIdTag  = "<p:sldId\\s[^>]*>".r
  private val RelTag    = "<Relationship\\s[^>]*>".r
  private val RIdAttr   = "r:id=\"([^\"]+)\"".r
  private val IdAttr    = "\\bId=\"([^\"]+)\"".r
  private val TargetAttr = "\\bTarget=\"([^\"]+)\"".r

  /** Presentation-order slide entry names via sldIdLst → rels, when both
    * parts resolve to every listed slide; None → numeric fallback.
    */
  private def relOrder(es: Vector[(String, Array[Byte])]): Option[Vector[String]] =
    for {
      pres <- Ooxml.entryText(es, "ppt/presentation.xml")
      rels <- Ooxml.entryText(es, "ppt/_rels/presentation.xml.rels")
      lst  <- Ooxml.blocks(pres, "p:sldIdLst").headOption
      relTargets = RelTag.findAllIn(rels).map(_.toString).flatMap { t =>
        for (id <- IdAttr.findFirstMatchIn(t); tg <- TargetAttr.findFirstMatchIn(t))
          yield id.group(1) -> tg.group(1)
      }.toMap
      rids = SldIdTag.findAllIn(lst).map(_.toString)
        .flatMap(t => RIdAttr.findFirstMatchIn(t).map(_.group(1))).toVector
      // targets are part-relative ("slides/slide3.xml") or package-absolute
      // ("/ppt/slides/slide3.xml")
      names = rids.flatMap(relTargets.get).map(t =>
        if (t.startsWith("/")) t.drop(1) else "ppt/" + t)
      if names.nonEmpty && names.forall(n => es.exists(_._1 == n))
    } yield names

  def extract(content: Array[Byte], fileName: String): (String, Map[String, String]) = {
    val es = Ooxml.entries(content)
    val numeric = es.flatMap { case (n, _) =>
      SlideName.findFirstMatchIn(n).map(m => (m.group(1).toInt, n))
    }.sortBy(_._1).map(_._2)
    if (numeric.isEmpty && !es.exists(_._1 == "ppt/presentation.xml"))
      throw new IllegalArgumentException("not a PPTX (no ppt/presentation.xml)")
    val ordered = relOrder(es).getOrElse(numeric)
    val slideTexts = ordered.flatMap(Ooxml.entryText(es, _)).map { xml =>
      Ooxml.blocks(xml, "p:txBody").map { body =>
        Ooxml.blocks(body, "a:p")
          .map(p => Ooxml.blocks(p, "a:t").map(Ooxml.unescape).mkString)
          .mkString("\n")
      }.filter(_.nonEmpty).mkString("\n")
    }.filter(_.nonEmpty)
    val (title, author) = Ooxml.coreProps(es)
    val meta = Map("slide_count" -> ordered.size.toString) ++
      title.map("title" -> _) ++ author.map("author" -> _)
    (slideTexts.mkString("\n\n"), meta)
  }
}

/** S7 — image header parsing (image_extractor.py:18-68). PIL's metadata
  * half (width/height/format/mode) is re-expressed as real pure-JVM header
  * parsers: PNG IHDR, JPEG SOFn marker walk, GIF logical-screen descriptor,
  * WebP VP8X canvas. The OCR half is a pluggable [[Ocr]] seam — character
  * recognition genuinely needs a native engine (tesseract), which a
  * deployment binds without touching the engine; the default [[NoOcr]]
  * yields empty text, the reference's own behavior for textless images
  * (image_extractor.py:56-58).
  */
object ImageMeta {

  private def u16be(b: Array[Byte], i: Int): Int = ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
  private def u16le(b: Array[Byte], i: Int): Int = (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def u32be(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) | ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)
  private def u24le(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) | ((b(i + 2) & 0xff) << 16)

  private def ascii(b: Array[Byte], from: Int, len: Int): String =
    if (b.length < from + len) "" else new String(b, from, len, StandardCharsets.US_ASCII)

  /** (width, height, format, mode) — format/mode use PIL's vocabulary so the
    * metadata is payload-compatible with the reference's.
    */
  def parse(b: Array[Byte]): (Long, Long, String, String) = {
    if (b.length >= 26 && (b(0) & 0xff) == 0x89 && ascii(b, 1, 3) == "PNG") {
      val mode = b(25) match {
        case 0 => "L"; case 2 => "RGB"; case 3 => "P"; case 4 => "LA"; case 6 => "RGBA"
        case _ => "unknown"
      }
      (u32be(b, 16), u32be(b, 20), "PNG", mode)
    } else if (b.length >= 4 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8) {
      // walk FF-marker segments to the first SOFn (C0–CF minus C4/C8/CC)
      var i = 2
      while (i + 9 < b.length) {
        if ((b(i) & 0xff) != 0xff) throw new IllegalArgumentException("bad JPEG marker stream")
        val m = b(i + 1) & 0xff
        if (m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc) {
          val mode = (b(i + 9) & 0xff) match { case 1 => "L"; case 3 => "RGB"; case 4 => "CMYK"; case _ => "unknown" }
          return (u16be(b, i + 7).toLong, u16be(b, i + 5).toLong, "JPEG", mode)
        }
        i += 2 + u16be(b, i + 2)
      }
      throw new IllegalArgumentException("JPEG without SOF dimensions")
    } else if (ascii(b, 0, 6) == "GIF87a" || ascii(b, 0, 6) == "GIF89a") {
      (u16le(b, 6).toLong, u16le(b, 8).toLong, "GIF", "P")
    } else if (ascii(b, 0, 4) == "RIFF" && ascii(b, 8, 4) == "WEBP") {
      // three container layouts: extended (VP8X), simple lossy (VP8 ,
      // keyframe header carries dims), simple lossless (VP8L, 14+14-bit
      // packed dims) — most encoders emit the simple forms by default
      ascii(b, 12, 4) match {
        case "VP8X" if b.length >= 30 =>
          (u24le(b, 24).toLong + 1, u24le(b, 27).toLong + 1, "WEBP", "RGB")
        case "VP8 " if b.length >= 30 &&
            (b(23) & 0xff) == 0x9d && (b(24) & 0xff) == 0x01 && (b(25) & 0xff) == 0x2a =>
          ((u16le(b, 26) & 0x3fff).toLong, (u16le(b, 28) & 0x3fff).toLong, "WEBP", "RGB")
        case "VP8L" if b.length >= 25 && (b(20) & 0xff) == 0x2f =>
          val bits = (b(21) & 0xffL) | ((b(22) & 0xffL) << 8) | ((b(23) & 0xffL) << 16) | ((b(24) & 0xffL) << 24)
          val mode = if (((bits >> 28) & 1L) == 1L) "RGBA" else "RGB"
          ((bits & 0x3fff) + 1, ((bits >> 14) & 0x3fff) + 1, "WEBP", mode)
        case _ => throw new IllegalArgumentException("unrecognized WEBP layout")
      }
    } else throw new IllegalArgumentException("unrecognized image container")
  }
}

/** OCR seam: bytes + parsed metadata → recognized text. */
trait Ocr extends Serializable {
  def name: String
  def recognize(content: Array[Byte], width: Long, height: Long): String
}

/** Default binding: no native OCR engine in a pure-JVM container — empty
  * text (the reference's textless-image result), real header metadata.
  */
object NoOcr extends Ocr {
  val name = "none"
  def recognize(content: Array[Byte], width: Long, height: Long): String = ""
}

/** Tesseract-backed OCR for scanned/photographed pages — the reference's
  * actual engine (image_extractor.py:42 calls pytesseract, itself a CLI
  * wrapper around the `tesseract` binary; this binds the same interface
  * directly). Deployment-gated exactly like the ONNX embedder: the binary
  * is an environment artifact, so [[TesseractOcr.available]] probes for
  * it and the spec skips cleanly where it's absent. [[graft.sources.GlyphOcr]]
  * remains the pure-JVM path for machine-rendered text.
  *
  * One short-lived process per image, image bytes via a temp file (the
  * CLI sniffs the container format itself; stdin piping loses the
  * multi-page TIFF case). Inside `mapPartitions` this amortizes to the
  * same per-image process cost pytesseract pays.
  */
final class TesseractOcr(binary: String = "tesseract", lang: String = "eng") extends Ocr {
  val name = "tesseract"

  def recognize(content: Array[Byte], width: Long, height: Long): String = {
    val tmp = java.nio.file.Files.createTempFile("graft_ocr", ".img")
    try {
      java.nio.file.Files.write(tmp, content)
      // stderr spills to a temp file so a chatty tesseract can never fill the
      // OS pipe buffer and deadlock against our stdout read
      val errFile = java.nio.file.Files.createTempFile("graft_ocr", ".err")
      val p = new ProcessBuilder(binary, tmp.toString, "stdout", "-l", lang)
        .redirectError(errFile.toFile).start()
      val out = new String(p.getInputStream.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
      val rc  = p.waitFor()
      val err =
        try new String(java.nio.file.Files.readAllBytes(errFile), java.nio.charset.StandardCharsets.UTF_8)
        finally java.nio.file.Files.deleteIfExists(errFile)
      if (rc != 0)
        throw new IllegalStateException(s"tesseract exited $rc: ${err.linesIterator.take(3).mkString(" | ")}")
      out
    } finally java.nio.file.Files.deleteIfExists(tmp)
  }
}

object TesseractOcr {
  /** True when the binary answers `--version` — the spec's skip gate. */
  def available(binary: String = "tesseract"): Boolean =
    try {
      val p = new ProcessBuilder(binary, "--version").start()
      p.getInputStream.readAllBytes(); p.getErrorStream.readAllBytes()
      p.waitFor() == 0
    } catch { case _: java.io.IOException => false }
}

/** S7 — image scan: real header metadata + seam-provided OCR text. */
final class ImageExtractor(ocr: Ocr = NoOcr) extends Extractor {
  val name = "ImageExtractor"
  def extract(content: Array[Byte], fileName: String): (String, Map[String, String]) = {
    val (w, h, format, mode) = ImageMeta.parse(content)
    val text = ocr.recognize(content, w, h).strip()
    (text, Map(
      "width" -> w.toString, "height" -> h.toString,
      "format" -> format, "mode" -> mode,
      "file_size" -> content.length.toString,
      "ocr_engine" -> ocr.name,
    ))
  }
}

/** S5 — XLSX (xlsx_extractor.py:28-74): per sheet "Sheet: <name>", rows as
  * " | "-joined non-null cell strings, a 20-dash separator, all parts joined
  * "\n"; sheet_count / sheet_names / total_cells_processed metadata (plus
  * core-props author/title when present). Cell rendering mirrors openpyxl's
  * `str(cell.value)`: shared/inline strings verbatim, integral numbers
  * without a decimal point, booleans as True/False.
  */
final class XlsxExtractor extends Extractor {
  val name = "XlsxExtractor"

  private val Rel = "<Relationship\\b[^>]*/?>".r
  private val Sheet = "<sheet\\b[^>]*/?>".r
  private val Cell = "(?s)<c(\\s[^>]*)?>(.*?)</c>|<c(\\s[^>]*)?/>".r

  private def attr(tag: String, name: String): Option[String] =
    (java.util.regex.Pattern.quote(name) + "=\"([^\"]*)\"").r
      .findFirstMatchIn(tag).map(m => Ooxml.unescape(m.group(1)))

  private def numStr(v: String): String =
    if (v.matches("-?\\d+")) v else v.toDouble.toString

  def extract(content: Array[Byte], fileName: String): (String, Map[String, String]) = {
    val es = Ooxml.entries(content)
    val wb = Ooxml.entryText(es, "xl/workbook.xml")
      .getOrElse(throw new IllegalArgumentException("not an XLSX (no xl/workbook.xml)"))
    val relTargets: Map[String, String] =
      Ooxml.entryText(es, "xl/_rels/workbook.xml.rels").toSeq.flatMap { rels =>
        Rel.findAllIn(rels).flatMap(t => for (i <- attr(t, "Id"); tgt <- attr(t, "Target")) yield i -> tgt)
      }.toMap
    val shared: Vector[String] = Ooxml.entryText(es, "xl/sharedStrings.xml").toVector
      .flatMap(x => Ooxml.blocks(x, "si").map(si => Ooxml.blocks(si, "t").map(Ooxml.unescape).mkString))

    val sheets: Seq[(String, String)] = Sheet.findAllIn(wb).toSeq.zipWithIndex.map { case (tag, i) =>
      val sheetName = attr(tag, "name").getOrElse(s"Sheet${i + 1}")
      val target = attr(tag, "r:id").flatMap(relTargets.get)
        .map(t => if (t.startsWith("/")) t.stripPrefix("/") else "xl/" + t.stripPrefix("./"))
        .getOrElse(s"xl/worksheets/sheet${i + 1}.xml")
      (sheetName, target)
    }

    var totalCells = 0
    val parts = Vector.newBuilder[String]
    sheets.foreach { case (sheetName, path) =>
      Ooxml.entryText(es, path).foreach { xml =>
        val rowTexts = Ooxml.blocks(xml, "row").flatMap { row =>
          val values = Cell.findAllMatchIn(row).flatMap { m =>
            val attrs = Option(m.group(1)).orElse(Option(m.group(3))).getOrElse("")
            val inner = Option(m.group(2)).getOrElse("")
            def v = Ooxml.blocks(inner, "v").headOption.map(Ooxml.unescape)
            attr("<c" + attrs + ">", "t") match {
              case Some("s") => v.map(i => shared(i.toInt))
              case Some("inlineStr") =>
                Some(Ooxml.blocks(inner, "t").map(Ooxml.unescape).mkString).filter(_.nonEmpty)
              case Some("str") => v
              case Some("b") => v.map(x => if (x == "1") "True" else "False")
              case _ => v.map(numStr)
            }
          }.toVector
          if (values.isEmpty) None
          else { totalCells += values.size; Some(values.mkString(" | ")) }
        }
        if (rowTexts.nonEmpty) {
          parts += s"Sheet: $sheetName"
          parts += rowTexts.mkString("\n")
          parts += "-" * 20
        }
      }
    }
    val (title, author) = Ooxml.coreProps(es)
    val meta = Map(
      "sheet_count" -> sheets.size.toString,
      "sheet_names" -> sheets.map(_._1).mkString(","),
      "total_cells_processed" -> totalCells.toString,
    ) ++ title.map("title" -> _) ++ author.map("author" -> _)
    (parts.result().mkString("\n"), meta)
  }
}
