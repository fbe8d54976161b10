package graft

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.ISO_8859_1
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}
import java.util.zip.{Deflater, ZipEntry, ZipOutputStream}

import graft.sources._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** The pure-JVM binary extractors (S2/S3/S4 + real S5) against both the
  * committed STORED fixtures (the oracle queries' inputs) and DEFLATED /
  * FlateDecode variants built in memory — proving the compressed paths the
  * hex-regex oracle can't see.
  */
class BinaryExtractorsSpec extends AnyFunSuite {

  private def read(p: String): Array[Byte] = Files.readAllBytes(Paths.get(p))

  private def deflatedZip(entries: Seq[(String, String)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val zos = new ZipOutputStream(bos)
    entries.foreach { case (n, t) =>
      zos.putNextEntry(new ZipEntry(n)); zos.write(t.getBytes(UTF_8)); zos.closeEntry()
    }
    zos.close(); bos.toByteArray
  }

  test("PDF: pages joined blank-line, Td line breaks, /Info metadata") {
    val (text, meta) = new PdfExtractor().extract(read("fixtures/office/manual.pdf"), "manual.pdf")
    assert(text ==
      "Graft Engine Manual\nScans push filters down to parquet.\n\n" +
        "Joins broadcast the small side.\nTop-k avoids a global sort.")
    assert(meta == Map("page_count" -> "2", "title" -> "Graft Manual", "author" -> "Graft Team"))
  }

  test("PDF: FlateDecode streams, escapes, octal, hex strings, TJ arrays") {
    val payload = "BT (Line \\(one\\)\\n with escapes \\101) Tj T* [(a)-120(b)] TJ <4869> Tj ET"
    val deflater = new Deflater()
    deflater.setInput(payload.getBytes(ISO_8859_1)); deflater.finish()
    val buf = new Array[Byte](4096)
    val n = deflater.deflate(buf)
    val comp = new String(buf.take(n), ISO_8859_1)
    val pdf = ("%PDF-1.4\n" +
      "1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n" +
      "2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n" +
      "3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\nendobj\n" +
      s"4 0 obj\n<< /Length $n /Filter /FlateDecode >>\nstream\n$comp\nendstream\nendobj\n" +
      "trailer\n<< /Root 1 0 R >>\n%%EOF\n").getBytes(ISO_8859_1)
    val (text, meta) = new PdfExtractor().extract(pdf, "t.pdf")
    assert(text == "Line (one)\n with escapes A\nabHi")
    assert(meta == Map("page_count" -> "1"))
  }

  test("CSV sniffer: delimiter consistency + numeric-column header vote on the committed fixtures") {
    val spark = TestSpark.spark
    import graft.sources.FileSources
    assert(FileSources.sniffCsvDialect(spark, "fixtures/s6_semicolon.csv") == ((";", true)))
    assert(FileSources.sniffCsvDialect(spark, "fixtures/s6_tab.tsv") == (("\t", true)))
    assert(FileSources.sniffCsvDialect(spark, "fixtures/s6_noheader.csv") == ((",", false)))
    // the original s6 fixture (comma, word header over numeric ids)
    assert(FileSources.sniffCsvDialect(spark, "fixtures/s6.csv")._1 == ",")
    // a tiny sniff budget still works: the truncated trailing line is dropped
    assert(FileSources.sniffCsvDialect(spark, "fixtures/s6_semicolon.csv", sniffBytes = 40) == ((";", true)))
  }

  // ---- PDF 1.5+: object streams + cross-reference streams ----------------

  private def flate(b: Array[Byte]): Array[Byte] = {
    val d = new Deflater(); d.setInput(b); d.finish()
    val buf = new Array[Byte](8192); val n = d.deflate(buf); buf.take(n)
  }

  /** PNG-Up (Predictor 12) encode of fixed-width xref rows — the standard
    * wrapping for xref streams, exercising the decoder's predictor path.
    */
  private def pngUp(rows: Seq[Array[Int]], width: Int): Array[Byte] = {
    var prev = Array.fill(width)(0)
    rows.flatMap { r =>
      val enc = 2 +: r.indices.map(i => (r(i) - prev(i)) & 0xff)
      prev = r
      enc
    }.map(_.toByte).toArray
  }

  /** A complete PDF 1.5 document: catalog, page tree, and /Info live ONLY
    * inside a Flate-compressed /ObjStm; the only cross-reference is a
    * /Type/XRef stream (W [1 2 1], Flate + PNG-Up predictor) — the layout
    * every post-2005 writer emits, invisible to a plain `N 0 obj` scan.
    */
  private def buildPdf15(xrefStream: Boolean): Array[Byte] = {
    val members = Vector(
      1 -> "<< /Type /Catalog /Pages 2 0 R >>",
      2 -> "<< /Type /Pages /Kids [3 0 R 6 0 R] /Count 2 >>",
      3 -> "<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>",
      6 -> "<< /Type /Page /Parent 2 0 R /Contents 5 0 R >>",
      7 -> "<< /Title (Modern Manual) /Author (Graft) >>")
    val offs   = members.map(_._2.length + 1).scanLeft(0)(_ + _).init
    val header = members.zip(offs).map { case ((n, _), o) => s"$n $o" }.mkString(" ") + "\n"
    val stm    = flate((header + members.map(_._2).mkString(" ")).getBytes(ISO_8859_1))
    val cs1 = "BT (Page one modern) Tj ET"
    val cs2 = "BT (Page two modern) Tj ET"
    val sb = new StringBuilder
    def add(s: String): Int = { val off = sb.length; sb.append(s); off }
    add("%PDF-1.5\n")
    val off4 = add(s"4 0 obj\n<< /Length ${cs1.length} >>\nstream\n$cs1\nendstream\nendobj\n")
    val off5 = add(s"5 0 obj\n<< /Length ${cs2.length} >>\nstream\n$cs2\nendstream\nendobj\n")
    val off8 = add(s"8 0 obj\n<< /Type /ObjStm /N ${members.length} /First ${header.length}" +
      s" /Filter /FlateDecode /Length ${stm.length} >>\nstream\n" +
      new String(stm, ISO_8859_1) + "\nendstream\nendobj\n")
    if (xrefStream) {
      val off9 = sb.length
      val rows = Seq(
        Array(0, 0, 0xffff),    // 0: free
        Array(2, 8, 0),         // 1: in ObjStm 8, idx 0
        Array(2, 8, 1),
        Array(2, 8, 2),
        Array(1, off4, 0),
        Array(1, off5, 0),
        Array(2, 8, 3),
        Array(2, 8, 4),
        Array(1, off8, 0),
        Array(1, off9, 0))
      val packed = rows.map(r => Array(r(0), (r(1) >> 8) & 0xff, r(1) & 0xff, r(2) & 0xff))
      val xr     = flate(pngUp(packed, 4))
      add(s"9 0 obj\n<< /Type /XRef /Size 10 /W [1 2 1] /Index [0 10] /Root 1 0 R /Info 7 0 R" +
        s" /Filter /FlateDecode /DecodeParms << /Predictor 12 /Columns 4 >>" +
        s" /Length ${xr.length} >>\nstream\n" +
        new String(xr, ISO_8859_1) + "\nendstream\nendobj\n")
      add(s"startxref\n$off9\n%%EOF\n")
    } else {
      // no xref at all: members must still resolve by gap-fill
      add("trailer\n<< /Root 1 0 R /Info 7 0 R >>\n%%EOF\n")
    }
    sb.toString.getBytes(ISO_8859_1)
  }

  test("PDF 1.5 committed fixture (tools/make_pdf15_fixture.py): ASCIIHex ObjStm + xref stream") {
    val (text, meta) = new PdfExtractor().extract(read("fixtures/office/manual15.pdf"), "manual15.pdf")
    assert(text == "Object streams hold the page tree\n\nXref streams replace the table")
    assert(meta == Map("page_count" -> "2", "title" -> "Modern Manual", "author" -> "Graft Team"))
  }

  test("PDF 1.5: page tree and /Info inside a Flate ObjStm, resolved via the xref stream") {
    val (text, meta) = new PdfExtractor().extract(buildPdf15(xrefStream = true), "m15.pdf")
    assert(text == "Page one modern\n\nPage two modern")
    assert(meta == Map("page_count" -> "2", "title" -> "Modern Manual", "author" -> "Graft"))
  }

  test("PDF 1.5: ObjStm members fill gaps even without any cross-reference") {
    val (text, meta) = new PdfExtractor().extract(buildPdf15(xrefStream = false), "m15nx.pdf")
    assert(text == "Page one modern\n\nPage two modern")
    assert(meta("page_count") == "2" && meta("title") == "Modern Manual")
  }

  test("PDF 1.5: xref type-2 entry overrides a stale top-level object from an earlier update") {
    // incremental update: the original top-level page 3 (contents 4) was
    // superseded — the current version lives in the ObjStm and points at
    // contents 5. The xref stream is the authority on which one is live.
    val stale = "3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\nendobj\n"
    val members = Vector(
      1 -> "<< /Type /Catalog /Pages 2 0 R >>",
      2 -> "<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
      3 -> "<< /Type /Page /Parent 2 0 R /Contents 5 0 R >>")
    val offs   = members.map(_._2.length + 1).scanLeft(0)(_ + _).init
    val header = members.zip(offs).map { case ((n, _), o) => s"$n $o" }.mkString(" ") + "\n"
    val stm    = flate((header + members.map(_._2).mkString(" ")).getBytes(ISO_8859_1))
    val cs1 = "BT (old text) Tj ET"
    val cs2 = "BT (current text) Tj ET"
    val sb = new StringBuilder
    def add(s: String): Int = { val off = sb.length; sb.append(s); off }
    add("%PDF-1.5\n")
    add(stale)
    val off4 = add(s"4 0 obj\n<< /Length ${cs1.length} >>\nstream\n$cs1\nendstream\nendobj\n")
    val off5 = add(s"5 0 obj\n<< /Length ${cs2.length} >>\nstream\n$cs2\nendstream\nendobj\n")
    val off8 = add(s"8 0 obj\n<< /Type /ObjStm /N ${members.length} /First ${header.length}" +
      s" /Filter /FlateDecode /Length ${stm.length} >>\nstream\n" +
      new String(stm, ISO_8859_1) + "\nendstream\nendobj\n")
    val off9 = sb.length
    val rows = Seq(
      Array(0, 0, 0xffff), Array(2, 8, 0), Array(2, 8, 1), Array(2, 8, 2),
      Array(1, off4, 0), Array(1, off5, 0), Array(0, 0, 0), Array(0, 0, 0),
      Array(1, off8, 0), Array(1, off9, 0))
    val packed = rows.map(r => Array(r(0), (r(1) >> 8) & 0xff, r(1) & 0xff, r(2) & 0xff))
    val xr     = flate(pngUp(packed, 4))
    add(s"9 0 obj\n<< /Type /XRef /Size 10 /W [1 2 1] /Index [0 10] /Root 1 0 R" +
      s" /Filter /FlateDecode /DecodeParms << /Predictor 12 /Columns 4 >>" +
      s" /Length ${xr.length} >>\nstream\n" +
      new String(xr, ISO_8859_1) + "\nendstream\nendobj\n")
    add(s"startxref\n$off9\n%%EOF\n")
    val (text, _) = new PdfExtractor().extract(sb.toString.getBytes(ISO_8859_1), "inc.pdf")
    assert(text == "current text", "the ObjStm member named by the xref must shadow the stale top-level page")
  }

  test("PDF: ASCIIHex/ASCII85/LZW/RunLength filters, chained pipelines, skipped-filter count") {
    import java.io.ByteArrayOutputStream
    import scala.collection.mutable
    def pdfWith(contentObj: String): Array[Byte] = ("%PDF-1.4\n" +
      "1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n" +
      "2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n" +
      "3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\nendobj\n" +
      contentObj +
      "trailer\n<< /Root 1 0 R >>\n%%EOF\n").getBytes(ISO_8859_1)
    def obj(data: Array[Byte], filter: String) =
      s"4 0 obj\n<< /Length ${data.length} /Filter $filter >>\nstream\n" +
        new String(data, ISO_8859_1) + "\nendstream\nendobj\n"
    def extract(data: Array[Byte], filter: String) =
      new PdfExtractor().extract(pdfWith(obj(data, filter)), "t.pdf")
    val payload = "BT (hello filters) Tj ET".getBytes(ISO_8859_1)

    def hexEncode(d: Array[Byte]) = (d.map(b => f"$b%02x").mkString + ">").getBytes(ISO_8859_1)
    assert(extract(hexEncode(payload), "/ASCIIHexDecode")._1 == "hello filters")
    // odd digit count: implied trailing 0 — 0x4 ( = "(A) Tj" would need ops; just check decode
    assert(new String(graft.sources.PdfParser.asciiHexDecode("41 4>".getBytes(ISO_8859_1)), ISO_8859_1) == "A@")

    def a85Encode(d: Array[Byte]): Array[Byte] = {
      val sb = new StringBuilder
      var i = 0
      while (i < d.length) {
        val n = math.min(4, d.length - i)
        var v = 0L
        for (k <- 0 until 4) v = (v << 8) | (if (i + k < d.length) d(i + k) & 0xffL else 0L)
        val cs = new Array[Char](5)
        var t = v
        for (k <- 4 to 0 by -1) { cs(k) = ('!' + (t % 85).toInt).toChar; t /= 85 }
        if (n == 4 && v == 0) sb.append('z') else sb.appendAll(cs, 0, n + 1)
        i += 4
      }
      (sb.toString + "~>").getBytes(ISO_8859_1)
    }
    assert(extract(a85Encode(payload), "/ASCII85Decode")._1 == "hello filters")
    // the z shorthand round-trips four zero bytes
    assert(graft.sources.PdfParser.ascii85Decode("z~>".getBytes(ISO_8859_1)).toSeq == Seq[Byte](0, 0, 0, 0))

    def lzwEncode(d: Array[Byte]): Array[Byte] = { // 9-bit only: test data adds < 253 entries
      val dict = mutable.Map.empty[List[Byte], Int]
      for (i <- 0 until 256) dict(List(i.toByte)) = i
      var next  = 258
      val codes = mutable.ArrayBuffer[Int](256)
      var w     = List.empty[Byte]
      for (b <- d) {
        val wb = w :+ b
        if (dict.contains(wb)) w = wb
        else { codes += dict(w); dict(wb) = next; next += 1; w = List(b) }
      }
      if (w.nonEmpty) codes += dict(w)
      codes += 257
      require(next < 500, "test encoder only emits 9-bit codes")
      val out = new ByteArrayOutputStream(); var acc = 0L; var bits = 0
      for (c <- codes) {
        acc = (acc << 9) | c; bits += 9
        while (bits >= 8) { out.write(((acc >> (bits - 8)) & 0xff).toInt); bits -= 8 }
      }
      if (bits > 0) out.write(((acc << (8 - bits)) & 0xff).toInt)
      out.toByteArray
    }
    assert(extract(lzwEncode(payload), "/LZWDecode")._1 == "hello filters")

    def rleEncode(d: Array[Byte]): Array[Byte] = { // all-literal runs
      val out = new ByteArrayOutputStream()
      d.grouped(128).foreach { chunk => out.write(chunk.length - 1); out.write(chunk, 0, chunk.length) }
      out.write(128)
      out.toByteArray
    }
    assert(extract(rleEncode(payload), "/RunLengthDecode")._1 == "hello filters")
    // repeat runs: 257-254=3 copies of 'x'
    assert(new String(graft.sources.PdfParser.runLengthDecode(
      Array[Byte](254.toByte, 'x'.toByte, 128.toByte)), ISO_8859_1) == "xxx")

    // chained pipeline, applied left to right: hex wraps the RLE bytes
    val chained = extract(hexEncode(rleEncode(payload)), "[/ASCIIHexDecode /RunLengthDecode]")
    assert(chained._1 == "hello filters")

    // unsupported filter: no text, loss surfaced in metadata
    val (txt, meta) = extract("ÿØJPEGBYTES".getBytes(ISO_8859_1), "/DCTDecode")
    assert(txt == "" && meta("skipped_filters") == "1" && meta("page_count") == "1")
  }

  test("PDF: PNG/TIFF predictors undo after Flate (DecodeParms)") {
    import java.util.zip.Deflater
    val payload = "BT (predicted text) Tj ET".getBytes(ISO_8859_1)
    // PNG Up filter (type 2), Columns 5: rows are deltas vs previous row
    val cols   = 5
    val rows   = payload.grouped(cols).toArray
    val filtered = new java.io.ByteArrayOutputStream()
    var prev = new Array[Byte](cols)
    rows.foreach { r0 =>
      val r = java.util.Arrays.copyOf(r0, cols) // zero-pad final short row
      filtered.write(2)
      for (i <- 0 until cols) filtered.write((r(i) - prev(i)) & 0xff)
      prev = r
    }
    val deflater = new Deflater()
    deflater.setInput(filtered.toByteArray); deflater.finish()
    val buf = new Array[Byte](4096)
    val n   = deflater.deflate(buf)
    val pdf = ("%PDF-1.4\n" +
      "1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n" +
      "2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n" +
      "3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\nendobj\n" +
      s"4 0 obj\n<< /Length $n /Filter /FlateDecode /DecodeParms << /Predictor 12 /Columns $cols >> >>\nstream\n" +
      new String(buf.take(n), ISO_8859_1) + "\nendstream\nendobj\n" +
      "trailer\n<< /Root 1 0 R >>\n%%EOF\n").getBytes(ISO_8859_1)
    val (text, _) = new PdfExtractor().extract(pdf, "p.pdf")
    assert(text == "predicted text")
    // TIFF horizontal differencing (Predictor 2), 8-bit, 1 color
    val tiff = payload.clone()
    for (i <- tiff.length - 1 to 1 by -1) tiff(i) = (tiff(i) - tiff(i - 1)).toByte
    assert(new String(graft.sources.PdfParser.applyPredictor(
      tiff, Map("Predictor" -> 2, "Columns" -> tiff.length)), ISO_8859_1) == new String(payload, ISO_8859_1))
  }

  test("PDF: RC4-encrypted documents (standard handler R2/R3, empty user password)") {
    import java.util.zip.Deflater
    import graft.sources.PdfParser
    def pdfEscape(b: Array[Byte]): String = b.map { x =>
      val c = (x & 0xff).toChar
      if (c == '(' || c == ')' || c == '\\') "\\" + c
      else if (c >= ' ' && c < 0x7f) c.toString
      else f"\\${x & 0xff}%03o"
    }.mkString
    def build(r: Int, v: Int, bits: Int): Array[Byte] = {
      val o    = Array.tabulate(32)(i => (i * 7 + 3).toByte) // owner hash: opaque input to Algorithm 2
      val id0  = Array.tabulate(16)(i => (i * 13 + 1).toByte)
      val key  = PdfParser.fileKey(o, -1, id0, r, bits)
      val dec  = PdfParser.Decryptor(key)
      val deflater = new Deflater()
      deflater.setInput("BT (classified payload) Tj ET".getBytes(ISO_8859_1)); deflater.finish()
      val buf  = new Array[Byte](4096)
      val n    = deflater.deflate(buf)
      val encStream = dec.decrypt(4, 0, buf.take(n)) // RC4 is symmetric
      val encTitle  = dec.decrypt(6, 0, "Restricted Report".getBytes(ISO_8859_1))
      val oHex  = o.map(b => f"${b & 0xff}%02x").mkString
      val idHex = id0.map(b => f"${b & 0xff}%02x").mkString
      ("%PDF-1.4\n" +
        "1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n" +
        "2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n" +
        "3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\nendobj\n" +
        s"4 0 obj\n<< /Length ${encStream.length} /Filter /FlateDecode >>\nstream\n" +
        new String(encStream, ISO_8859_1) + "\nendstream\nendobj\n" +
        s"5 0 obj\n<< /Filter /Standard /V $v /R $r /Length $bits /O <$oHex> /U <$oHex> /P -1 >>\nendobj\n" +
        s"6 0 obj\n<< /Title (${pdfEscape(encTitle)}) >>\nendobj\n" +
        s"trailer\n<< /Root 1 0 R /Encrypt 5 0 R /Info 6 0 R /ID [<$idHex> <$idHex>] >>\n%%EOF\n").getBytes(ISO_8859_1)
    }
    for ((r, v, bits) <- Seq((2, 1, 40), (3, 2, 128))) {
      val (text, meta) = new PdfExtractor().extract(build(r, v, bits), s"enc-r$r.pdf")
      assert(text == "classified payload", s"R=$r")
      assert(meta("title") == "Restricted Report", s"R=$r")
      assert(!meta.contains("skipped_filters"), s"R=$r")
    }
    // unsupported combination (V2 handler claiming R4): no text, loss
    // surfaced — never garbage output
    val (t4, m4) = new PdfExtractor().extract(
      new String(build(3, 2, 128), ISO_8859_1).replace("/R 3", "/R 4").getBytes(ISO_8859_1), "enc-r4.pdf")
    assert(t4 == "" && m4("skipped_filters") == "1")
  }

  test("PDF: AESV2-encrypted documents (V4/R4 StdCF, empty user password)") {
    import java.util.zip.Deflater
    import graft.sources.PdfParser
    def pdfEscape(b: Array[Byte]): String = b.map { x =>
      val c = (x & 0xff).toChar
      if (c == '(' || c == ')' || c == '\\') "\\" + c
      else if (c >= ' ' && c < 0x7f) c.toString
      else f"\\${x & 0xff}%03o"
    }.mkString
    // ENCRYPTION side built directly on javax.crypto (ENCRYPT_MODE, manual
    // PKCS#7 pad, explicit IV) — independent of the walker's decrypt path
    def aesEncrypt(fk: Array[Byte], objNum: Int, data: Array[Byte], iv: Array[Byte]): Array[Byte] = {
      val md = java.security.MessageDigest.getInstance("MD5")
      md.update(fk)
      md.update(Array((objNum & 0xff).toByte, 0, 0, 0, 0).map(_.toByte))
      md.update("sAlT".getBytes(ISO_8859_1))
      val key  = md.digest() // 16-byte file key → min(16+5, 16) = 16
      val padN = 16 - data.length % 16
      val padded = data ++ Array.fill(padN)(padN.toByte)
      val c = javax.crypto.Cipher.getInstance("AES/CBC/NoPadding")
      c.init(javax.crypto.Cipher.ENCRYPT_MODE,
        new javax.crypto.spec.SecretKeySpec(key, "AES"),
        new javax.crypto.spec.IvParameterSpec(iv))
      iv ++ c.doFinal(padded)
    }
    def build(encryptMetadata: Boolean): Array[Byte] = {
      val o   = Array.tabulate(32)(i => (i * 11 + 5).toByte)
      val id0 = Array.tabulate(16)(i => (i * 17 + 2).toByte)
      val fk  = PdfParser.fileKey(o, -1, id0, 4, 128, encryptMetadata)
      val deflater = new Deflater()
      deflater.setInput("BT (aes classified) Tj ET".getBytes(ISO_8859_1)); deflater.finish()
      val buf = new Array[Byte](4096)
      val n   = deflater.deflate(buf)
      val encStream = aesEncrypt(fk, 4, buf.take(n), Array.tabulate(16)(i => (i * 29 + 7).toByte))
      val encTitle  = aesEncrypt(fk, 6, "Sealed Memo".getBytes(ISO_8859_1), Array.tabulate(16)(i => (i * 31 + 3).toByte))
      val oHex  = o.map(b => f"${b & 0xff}%02x").mkString
      val idHex = id0.map(b => f"${b & 0xff}%02x").mkString
      val em    = if (encryptMetadata) "" else " /EncryptMetadata false"
      ("%PDF-1.6\n" +
        "1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n" +
        "2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n" +
        "3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\nendobj\n" +
        s"4 0 obj\n<< /Length ${encStream.length} /Filter /FlateDecode >>\nstream\n" +
        new String(encStream, ISO_8859_1) + "\nendstream\nendobj\n" +
        "5 0 obj\n<< /Filter /Standard /V 4 /R 4 /Length 128" +
        s" /CF << /StdCF << /CFM /AESV2 /Length 16 >> >> /StmF /StdCF /StrF /StdCF$em" +
        s" /O <$oHex> /U <$oHex> /P -1 >>\nendobj\n" +
        s"6 0 obj\n<< /Title (${pdfEscape(encTitle)}) >>\nendobj\n" +
        s"trailer\n<< /Root 1 0 R /Encrypt 5 0 R /Info 6 0 R /ID [<$idHex> <$idHex>] >>\n%%EOF\n").getBytes(ISO_8859_1)
    }
    for (encMeta <- Seq(true, false)) {
      val (text, meta) = new PdfExtractor().extract(build(encMeta), s"aes-$encMeta.pdf")
      assert(text == "aes classified", s"encryptMetadata=$encMeta")
      assert(meta("title") == "Sealed Memo", s"encryptMetadata=$encMeta")
      assert(!meta.contains("skipped_filters"), s"encryptMetadata=$encMeta")
    }
    // tampered padding must surface as a skipped stream, not garbage text
    val good = build(true)
    val doc  = new String(good, ISO_8859_1)
    val si   = doc.indexOf("stream\n") + 7
    val bad  = good.clone(); bad(si + 17) = (bad(si + 17) ^ 0x5a).toByte // corrupt first ct block
    val (tBad, mBad) = new PdfExtractor().extract(bad, "aes-bad.pdf")
    assert(tBad == "" && mBad.contains("skipped_filters"))
  }

  test("PDF: AESV3-encrypted documents (V5 R5/R6, empty user and owner password)") {
    import java.security.MessageDigest
    import java.util.zip.Deflater
    import javax.crypto.Cipher
    import javax.crypto.spec.{IvParameterSpec, SecretKeySpec}
    // ENCRYPTION side is a from-scratch Algorithm 2.B + forward AES-256 —
    // written independently of PdfParser.hash2B so the two implementations
    // cross-check each other through the fixture.
    def aes(mode: Int, key: Array[Byte], iv: Array[Byte], data: Array[Byte]): Array[Byte] = {
      val c = Cipher.getInstance("AES/CBC/NoPadding")
      c.init(mode, new SecretKeySpec(key, "AES"), new IvParameterSpec(iv))
      c.doFinal(data)
    }
    def hash(pwd: Array[Byte], salt: Array[Byte], udata: Array[Byte], r: Int): Array[Byte] = {
      var k = MessageDigest.getInstance("SHA-256").digest(pwd ++ salt ++ udata)
      if (r == 5) return k
      var i = 0
      var lastE = 0
      while (i < 64 || lastE > i - 32) {
        val k1 = Array.fill(64)(pwd ++ k ++ udata).flatten
        val e  = aes(Cipher.ENCRYPT_MODE, k.take(16), k.slice(16, 32), k1)
        k = MessageDigest.getInstance(
          e.take(16).map(_ & 0xff).sum % 3 match {
            case 0 => "SHA-256"; case 1 => "SHA-384"; case _ => "SHA-512"
          }).digest(e)
        lastE = e.last & 0xff
        i += 1
      }
      k.take(32)
    }
    def encObj(fk: Array[Byte], data: Array[Byte], iv: Array[Byte]): Array[Byte] = {
      val padN = 16 - data.length % 16
      iv ++ aes(Cipher.ENCRYPT_MODE, fk, iv, data ++ Array.fill(padN)(padN.toByte))
    }
    def pdfEscape(b: Array[Byte]): String = b.map { x =>
      val c = (x & 0xff).toChar
      if (c == '(' || c == ')' || c == '\\') "\\" + c
      else if (c >= ' ' && c < 0x7f) c.toString
      else f"\\${x & 0xff}%03o"
    }.mkString
    val empty = Array.emptyByteArray
    // asOwner=true leaves the user password non-empty (junk validation
    // bytes) so the walker must fall back to the empty-OWNER-password path.
    def build(r: Int, asOwner: Boolean): Array[Byte] = {
      val fk    = Array.tabulate(32)(i => (i * 19 + 11).toByte) // the file key itself
      def salt(seed: Int) = Array.tabulate(8)(i => (i * 7 + seed).toByte)
      val (uvs, uks, ovs, oks) = (salt(1), salt(2), salt(3), salt(4))
      val u =
        if (!asOwner) hash(empty, uvs, empty, r) ++ uvs ++ uks
        else Array.tabulate(32)(i => (i * 3 + 1).toByte) ++ uvs ++ uks
      val ue =
        if (!asOwner) aes(Cipher.ENCRYPT_MODE, hash(empty, uks, empty, r), new Array[Byte](16), fk)
        else Array.tabulate(32)(i => (i * 5 + 2).toByte)
      val o  = hash(empty, ovs, u, r) ++ ovs ++ oks
      val oe = aes(Cipher.ENCRYPT_MODE, hash(empty, oks, u, r), new Array[Byte](16), fk)
      val deflater = new Deflater()
      deflater.setInput("BT (aes256 classified) Tj ET".getBytes(ISO_8859_1)); deflater.finish()
      val buf = new Array[Byte](4096)
      val n   = deflater.deflate(buf)
      val encStream = encObj(fk, buf.take(n), Array.tabulate(16)(i => (i * 37 + 5).toByte))
      val encTitle  = encObj(fk, "Vault Memo".getBytes(ISO_8859_1), Array.tabulate(16)(i => (i * 41 + 9).toByte))
      def hex(b: Array[Byte]) = b.map(x => f"${x & 0xff}%02x").mkString
      ("%PDF-1.7\n" +
        "1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n" +
        "2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n" +
        "3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\nendobj\n" +
        s"4 0 obj\n<< /Length ${encStream.length} /Filter /FlateDecode >>\nstream\n" +
        new String(encStream, ISO_8859_1) + "\nendstream\nendobj\n" +
        s"5 0 obj\n<< /Filter /Standard /V 5 /R $r /Length 256" +
        " /CF << /StdCF << /CFM /AESV3 /Length 32 >> >> /StmF /StdCF /StrF /StdCF" +
        s" /O <${hex(o)}> /U <${hex(u)}> /OE <${hex(oe)}> /UE <${hex(ue)}> /P -4 >>\nendobj\n" +
        s"6 0 obj\n<< /Title (${pdfEscape(encTitle)}) >>\nendobj\n" +
        "trailer\n<< /Root 1 0 R /Encrypt 5 0 R /Info 6 0 R >>\n%%EOF\n").getBytes(ISO_8859_1)
    }
    for (r <- Seq(5, 6); asOwner <- Seq(false, true)) {
      val (text, meta) = new PdfExtractor().extract(build(r, asOwner), s"aes256-r$r-$asOwner.pdf")
      assert(text == "aes256 classified", s"R=$r asOwner=$asOwner")
      assert(meta("title") == "Vault Memo", s"R=$r asOwner=$asOwner")
      assert(!meta.contains("skipped_filters"), s"R=$r asOwner=$asOwner")
    }
    // a non-empty (unknown) password in BOTH slots: no text, loss surfaced
    val locked = new String(build(6, asOwner = true), ISO_8859_1)
      .replaceFirst("/O <..", "/O <ff").getBytes(ISO_8859_1)
    val (tL, mL) = new PdfExtractor().extract(locked, "aes256-locked.pdf")
    assert(tL == "" && mL("skipped_filters") == "1")
  }

  test("PDF: committed AESV3 R6 fixture (built by tools/make_pdfaes3_fixture.py, cryptography lib)") {
    // third independent Algorithm 2.B implementation (Python hashlib +
    // cryptography) produced this file; byte-level agreement of all three
    // is what makes the fixture a cross-check rather than a replay
    val (text, meta) =
      new PdfExtractor().extract(read("fixtures/office/secure/manual256.pdf"), "manual256.pdf")
    assert(text ==
      "Graft Secure Manual\nKeys derive from SHA-256 chains.\n\n" +
        "Streams carry their own IV.\nPadding is PKCS#7.")
    assert(meta == Map("page_count" -> "2", "title" -> "Secure Manual", "author" -> "Graft Vault"))
  }

  test("DOCX: paragraphs blank-line separated, entities, tabs; deflated zip") {
    val (text, meta) = new DocxExtractor().extract(read("fixtures/office/report.docx"), "report.docx")
    assert(text ==
      "Graft engine design notes.\n\nOperators compile to declarative Spark plans.\n\n" +
        "Oracle parity holds at every scale factor.")
    assert(meta == Map.empty[String, String])

    val fancy = deflatedZip(Seq(
      "word/document.xml" ->
        ("""<w:document xmlns:w="x"><w:body>""" +
          "<w:p><w:r><w:t>a &amp; b</w:t></w:r><w:r><w:tab/><w:t>c</w:t></w:r></w:p>" +
          "<w:p><w:r><w:t>second</w:t></w:r></w:p></w:body></w:document>")))
    assert(new DocxExtractor().extract(fancy, "f.docx")._1 == "a & b\tc\n\nsecond")
  }

  test("PPTX: shapes joined newline within slide, slides blank-line, core props") {
    val (text, meta) = new PptxExtractor().extract(read("fixtures/office/slides.pptx"), "slides.pptx")
    assert(text ==
      "Quarterly Review\nIngest throughput grew nine percent.\n\n" +
        "Roadmap\nShip the binary extractor seam.")
    assert(meta == Map("slide_count" -> "2", "title" -> "Graft Deck", "author" -> "graft"))
  }

  test("PPTX: multi-run paragraphs concatenate; empty shapes skipped; slide10 sorts numerically") {
    def sp(inner: String) = s"<p:sp><p:txBody>$inner</p:txBody></p:sp>"
    def sld(shapes: String*) =
      "<p:sld><p:cSld><p:spTree>" + shapes.mkString + "</p:spTree></p:cSld></p:sld>"
    val multiRun = sld(
      sp("<a:p><a:r><a:t>He</a:t></a:r><a:r><a:t>llo</a:t></a:r></a:p><a:p><a:r><a:t>world</a:t></a:r></a:p>"),
      sp("<a:p><a:r><a:t></a:t></a:r></a:p>"), // empty shape — skipped
    )
    val zip = deflatedZip(Seq(
      "ppt/presentation.xml" -> "<p:presentation/>",
      "ppt/slides/slide10.xml" -> sld(sp("<a:p><a:r><a:t>tenth</a:t></a:r></a:p>")),
      "ppt/slides/slide2.xml" -> multiRun,
    ))
    // slide2 (numeric 2) precedes slide10 despite lexicographic entry order
    val (text, meta) = new PptxExtractor().extract(zip, "p.pptx")
    assert(text == "Hello\nworld\n\ntenth")
    assert(meta("slide_count") == "2")
  }

  test("PPTX: presentation.xml rels order overrides numeric slide order; broken rels fall back") {
    def sld(t: String) =
      s"<p:sld><p:cSld><p:spTree><p:sp><p:txBody><a:p><a:r><a:t>$t</a:t></a:r></a:p></p:txBody></p:sp></p:spTree></p:cSld></p:sld>"
    val pres =
      """<p:presentation><p:sldIdLst><p:sldId id="257" r:id="rId3"/><p:sldId id="256" r:id="rId2"/></p:sldIdLst></p:presentation>"""
    val rels =
      """<Relationships><Relationship Id="rId1" Type=".../slideMaster" Target="slideMasters/slideMaster1.xml"/>""" +
        """<Relationship Id="rId2" Type=".../slide" Target="slides/slide1.xml"/>""" +
        """<Relationship Id="rId3" Type=".../slide" Target="/ppt/slides/slide2.xml"/></Relationships>"""
    val entries = Seq(
      "ppt/presentation.xml" -> pres,
      "ppt/_rels/presentation.xml.rels" -> rels,
      "ppt/slides/slide1.xml" -> sld("first-numeric"),
      "ppt/slides/slide2.xml" -> sld("second-numeric"),
    )
    // sldIdLst lists rId3 (slide2, via package-absolute target) BEFORE rId2
    val (text, meta) = new PptxExtractor().extract(deflatedZip(entries), "p.pptx")
    assert(text == "second-numeric\n\nfirst-numeric")
    assert(meta("slide_count") == "2")
    // rels referencing a missing part → numeric fallback, not a crash
    val broken = entries.map {
      case (n, _) if n == "ppt/_rels/presentation.xml.rels" =>
        n -> """<Relationships><Relationship Id="rId2" Type=".../slide" Target="slides/slideMISSING.xml"/><Relationship Id="rId3" Type=".../slide" Target="slides/slide2.xml"/></Relationships>"""
      case e => e
    }
    val (text2, _) = new PptxExtractor().extract(deflatedZip(broken), "p.pptx")
    assert(text2 == "first-numeric\n\nsecond-numeric")
  }

  test("TesseractOcr: availability probe is honest; missing binary fails loudly; real binary reads a rendered label") {
    // a binary that cannot exist -> probe false, recognize throws (no
    // silent empty-text fallback masquerading as "image had no text")
    assert(!TesseractOcr.available("graft-no-such-binary-xyz"))
    intercept[java.io.IOException] {
      new TesseractOcr("graft-no-such-binary-xyz").recognize(GlyphOcr.renderPng("HI", unit = 3), 0, 0)
    }
    // deployment-gated path: runs only where the real engine is installed
    // (this container has none -- the spec SKIPS, it does not vacuously pass)
    assume(TesseractOcr.available(), "tesseract binary not installed")
    val rendered = GlyphOcr.renderPng("HELLO WORLD 42", unit = 5)
    val (text, meta) = new ImageExtractor(new TesseractOcr()).extract(rendered, "label.png")
    assert(meta("ocr_engine") == "tesseract")
    assert(text.toUpperCase.contains("HELLO"))

    // scanned-paper degradation: 3x3 box blur + deterministic speckle
    // noise over the anti-aliased render — the engine must RECOGNIZE, not
    // just run, on the shape a photocopied page actually has
    val base = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(
      GlyphOcr.renderPngAa("SCANNED PAGE 7", unitHi = 9, down = 2)))
    val w = base.getWidth; val h = base.getHeight
    val blurred = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var rng = 12345L
    def nextNoise(): Int = { rng = rng * 6364136223846793005L + 1442695040888963407L; ((rng >>> 33) % 31).toInt - 15 }
    for (y <- 0 until h; x <- 0 until w) {
      var sum = 0; var n = 0
      for (dy <- -1 to 1; dx <- -1 to 1) {
        val yy = y + dy; val xx = x + dx
        if (yy >= 0 && yy < h && xx >= 0 && xx < w) { sum += base.getRGB(xx, yy) & 0xff; n += 1 }
      }
      val v = math.max(0, math.min(255, sum / n + nextNoise()))
      blurred.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(blurred, "png", bos)
    val (degText, _) = new ImageExtractor(new TesseractOcr()).extract(bos.toByteArray, "scan.png")
    assert(degText.toUpperCase.contains("SCANNED"), s"degraded-scan recognition failed: '$degText'")
  }

  test("XLSX: sheet headers, pipe rows, dash rule, cell-type rendering") {
    val (text, meta) = new XlsxExtractor().extract(read("fixtures/office/book.xlsx"), "book.xlsx")
    assert(text ==
      "Sheet: inventory\nitem | qty\nwidget | 42\ngear | 7\n" + ("-" * 20) + "\n" +
        "Sheet: orders\nregion | amount\nemea | 1200\napac | 900\n" + ("-" * 20))
    assert(meta("sheet_count") == "2")
    assert(meta("sheet_names") == "inventory,orders")
    assert(meta("total_cells_processed") == "12")
  }

  test("XLSX: shared strings, booleans, floats, empty rows skipped") {
    val zip = deflatedZip(Seq(
      "xl/workbook.xml" ->
        """<workbook><sheets><sheet name="s" sheetId="1" r:id="rId1"/></sheets></workbook>""",
      "xl/_rels/workbook.xml.rels" ->
        """<Relationships><Relationship Id="rId1" Target="worksheets/sheet1.xml"/></Relationships>""",
      "xl/sharedStrings.xml" ->
        "<sst><si><t>alpha</t></si><si><t>be</t><t>ta</t></si></sst>",
      "xl/worksheets/sheet1.xml" ->
        ("<worksheet><sheetData>" +
          """<row><c t="s"><v>0</v></c><c t="s"><v>1</v></c></row>""" +
          """<row><c/><c></c></row>""" +
          """<row><c t="b"><v>1</v></c><c><v>2.5</v></c><c t="str"><v>=SUM</v></c></row>""" +
          "</sheetData></worksheet>"),
    ))
    val (text, meta) = new XlsxExtractor().extract(zip, "b.xlsx")
    assert(text == "Sheet: s\nalpha | beta\nTrue | 2.5 | =SUM\n" + ("-" * 20))
    assert(meta("total_cells_processed") == "5")
  }

  test("ImageMeta: PNG/JPEG/GIF/WebP headers parse; OCR seam plugs in") {
    val png = new ImageExtractor().extract(read("fixtures/images/pix.png"), "pix.png")
    assert(png._1 == "" && png._2("width") == "3" && png._2("height") == "2" &&
      png._2("format") == "PNG" && png._2("mode") == "L" && png._2("ocr_engine") == "none")
    val jpg = new ImageExtractor().extract(read("fixtures/images/photo.jpg"), "photo.jpg")
    assert(jpg._2("width") == "7" && jpg._2("height") == "9" && jpg._2("format") == "JPEG" && jpg._2("mode") == "L")
    val gif = new ImageExtractor().extract(read("fixtures/images/anim.gif"), "anim.gif")
    assert(gif._2("width") == "4" && gif._2("height") == "5" && gif._2("format") == "GIF" && gif._2("mode") == "P")
    val webp = new ImageExtractor().extract(read("fixtures/images/canvas.webp"), "canvas.webp")
    assert(webp._2("width") == "6" && webp._2("height") == "8" && webp._2("format") == "WEBP")

    // the real glyph engine recognizes machine-rendered text through the
    // full S7 path: render → PNG bytes → decode → segment → match
    val rendered = GlyphOcr.renderPng("HELLO WORLD 42\nSPARK OCR", unit = 3)
    val (gText, gMeta) = new ImageExtractor(GlyphOcr).extract(rendered, "label.png")
    assert(gText == "HELLO WORLD 42\nSPARK OCR")
    assert(gMeta("ocr_engine") == "glyph" && gMeta("format") == "PNG")
    // scale/threshold robustness: a different render scale and every glyph
    val pangram = "THE QUICK BROWN FOX JUMPS OVER A LAZY DOG 0123456789"
    assert(GlyphOcr.recognize(GlyphOcr.renderPng(pangram, unit = 5), 0, 0) == pangram)
    assert(GlyphOcr.recognize(GlyphOcr.renderPng(pangram, unit = 2), 0, 0) == pangram)
    // no text, no contrast → empty (the NoOcr-equivalent result)
    assert(GlyphOcr.recognize(read("fixtures/images/pix.png"), 3, 2) == "")
    // ANTI-ALIASED + PROPORTIONAL: gray edge pixels on every stroke
    // (non-integral 3.5 px unit), tight per-glyph advance — the Otsu +
    // connected-component path must still read it exactly
    assert(GlyphOcr.recognize(GlyphOcr.renderPngAa(pangram), 0, 0) == pangram)
    assert(GlyphOcr.recognize(GlyphOcr.renderPngAa("GRAFT AA 42\nSECOND LINE", unitHi = 5, down = 2), 0, 0)
      == "GRAFT AA 42\nSECOND LINE")
    assert(GlyphOcr.recognize(GlyphOcr.renderPngAa(pangram, unitHi = 9, down = 4), 0, 0) == pangram)

    // DEGRADED SCAN: tilt + uneven illumination (faded ink left, shadowed
    // paper right — ink 120 on one side vs background 105 on the other, so
    // NO global threshold works) + speckle noise. Deskew + Bradley
    // adaptive binarization must still read it exactly; and the clean
    // renders above prove the defenses never fire on straight input.
    val scanMsg = "DEGRADED SCAN 07\nADAPTIVE DESKEW"
    val degraded = GlyphOcr.degradeScan(GlyphOcr.renderPng(scanMsg), 2.0, 120, 150, 8)
    assert(GlyphOcr.recognize(degraded, 0, 0) == scanMsg)
    assert(GlyphOcr.recognize(
      GlyphOcr.degradeScan(GlyphOcr.renderPng(scanMsg), -1.5, 100, 140, 8), 0, 0) == scanMsg)
    // determinism: same degradation twice → identical bytes and text
    assert(java.util.Arrays.equals(degraded,
      GlyphOcr.degradeScan(GlyphOcr.renderPng(scanMsg), 2.0, 120, 150, 8)))

    // a bound OCR engine's text flows through; file_size is the blob length
    object FakeOcr extends Ocr {
      val name = "fake"
      def recognize(c: Array[Byte], w: Long, h: Long) = s"  ${w}x$h  "
    }
    val (t, m) = new ImageExtractor(FakeOcr).extract(read("fixtures/images/pix.png"), "pix.png")
    assert(t == "3x2" && m("ocr_engine") == "fake" && m("file_size").toInt == read("fixtures/images/pix.png").length)

    intercept[IllegalArgumentException] {
      ImageMeta.parse("BM not an image".getBytes(UTF_8)) // BMP unsupported
    }
  }

  test("ImageMeta: simple-format WebP (VP8 lossy / VP8L lossless) parse dims") {
    // 'VP8 ' keyframe: 3-byte frame tag, start code 9D 01 2A, 14-bit w/h
    val lossy = new Array[Byte](30)
    "RIFF".getBytes(UTF_8).copyToArray(lossy, 0)
    "WEBPVP8 ".getBytes(UTF_8).copyToArray(lossy, 8)
    lossy(23) = 0x9d.toByte; lossy(24) = 0x01; lossy(25) = 0x2a
    lossy(26) = 6; lossy(27) = 0 // width 6
    lossy(28) = 8; lossy(29) = 0 // height 8
    assert(ImageMeta.parse(lossy) == ((6L, 8L, "WEBP", "RGB")))
    // VP8L: 0x2F signature, then (w-1) 14 bits | (h-1) 14 bits | alpha bit 28
    val lossless = new Array[Byte](25)
    "RIFF".getBytes(UTF_8).copyToArray(lossless, 0)
    "WEBPVP8L".getBytes(UTF_8).copyToArray(lossless, 8)
    lossless(20) = 0x2f
    val bits = (5L) | (7L << 14) | (1L << 28) // 6x8, alpha
    lossless(21) = (bits & 0xff).toByte; lossless(22) = ((bits >> 8) & 0xff).toByte
    lossless(23) = ((bits >> 16) & 0xff).toByte; lossless(24) = ((bits >> 24) & 0xff).toByte
    assert(ImageMeta.parse(lossless) == ((6L, 8L, "WEBP", "RGBA")))
  }


  // ---- property round trips: random content → build a container in memory
  // → extract → compare against an expectation computed from the GENERATED
  // data (never from the parser). Deterministic ScalaCheck sampling, same
  // style as ChunkerSpec.

  private def xmlEsc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
      .replace("\"", "&quot;").replace("'", "&apos;")

  private val fragment: Gen[String] = for {
    n  <- Gen.choose(1, 12)
    cs <- Gen.listOfN(n, Gen.oneOf(('a' to 'z') ++ ('0' to '9') ++ Seq(' ', '&', '<', '>', '"', '\'', 'é', '.')))
  } yield cs.mkString

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  test("property: DOCX paragraphs/runs round-trip with XML escaping") {
    val parasGen = Gen.choose(1, 8).flatMap(n =>
      Gen.listOfN(n, Gen.choose(1, 4).flatMap(r => Gen.listOfN(r, fragment))))
    (0 until 60).foreach { seed =>
      val paras = sample(parasGen, seed.toLong)
      val xml = "<w:document><w:body>" +
        paras.map(rs => "<w:p>" + rs.map(t => s"<w:r><w:t>${xmlEsc(t)}</w:t></w:r>").mkString + "</w:p>").mkString +
        "</w:body></w:document>"
      val got = new DocxExtractor().extract(deflatedZip(Seq("word/document.xml" -> xml)), "p.docx")._1
      assert(got == paras.map(_.mkString).mkString("\n\n").trim, s"seed=$seed")
    }
  }

  test("property: PPTX slides/shapes round-trip; numeric slide order; empties skipped") {
    val slidesGen = Gen.choose(1, 6).flatMap(n =>
      Gen.listOfN(n, Gen.choose(0, 3).flatMap(sh =>
        Gen.listOfN(sh, Gen.choose(1, 3).flatMap(p => Gen.listOfN(p, fragment))))))
    (0 until 60).foreach { seed =>
      val slides = sample(slidesGen, seed.toLong)
      val entries = ("ppt/presentation.xml" -> "<p:presentation/>") +:
        slides.zipWithIndex.reverse.map { case (shapes, i) => // reverse entry order: parser must sort numerically
          s"ppt/slides/slide${i + 1}.xml" ->
            ("<p:sld><p:cSld><p:spTree>" + shapes.map(ps =>
              "<p:sp><p:txBody>" + ps.map(t => s"<a:p><a:r><a:t>${xmlEsc(t)}</a:t></a:r></a:p>").mkString + "</p:txBody></p:sp>").mkString +
              "</p:spTree></p:cSld></p:sld>")
        }
      val got = new PptxExtractor().extract(deflatedZip(entries), "p.pptx")
      val expected = slides
        .map(_.map(_.mkString("\n")).filter(_.nonEmpty).mkString("\n"))
        .filter(_.nonEmpty).mkString("\n\n")
      assert(got._1 == expected, s"seed=$seed")
      assert(got._2("slide_count") == slides.size.toString)
    }
  }

  test("property: XLSX cells (inline/shared/num/bool) round-trip; empty rows skipped") {
    sealed trait Cell
    case class Inline(s: String) extends Cell
    case class Shared(i: Int) extends Cell
    case class Num(v: Long) extends Cell
    case class Dbl(v: Double) extends Cell
    case class Bool(b: Boolean) extends Cell
    val shared = Vector("alpha", "two words", "a&b<c>")
    val cellGen: Gen[Cell] = Gen.oneOf(
      fragment.map(Inline.apply), Gen.choose(0, shared.size - 1).map(Shared.apply),
      Gen.choose(-999L, 999L).map(Num.apply), Gen.choose(-10.0, 10.0).map(Dbl.apply),
      Gen.oneOf(true, false).map(Bool.apply))
    val sheetGen = for {
      nRows <- Gen.choose(0, 5)
      rows  <- Gen.listOfN(nRows, Gen.choose(0, 4).flatMap(c => Gen.listOfN(c, cellGen)))
    } yield rows
    val bookGen = Gen.choose(1, 4).flatMap(n => Gen.listOfN(n, sheetGen))

    def cellXml(c: Cell): String = c match {
      case Inline(s) => s"""<c t="inlineStr"><is><t>${xmlEsc(s)}</t></is></c>"""
      case Shared(i) => s"""<c t="s"><v>$i</v></c>"""
      case Num(v)    => s"<c><v>$v</v></c>"
      case Dbl(v)    => s"<c><v>$v</v></c>"
      case Bool(b)   => s"""<c t="b"><v>${if (b) 1 else 0}</v></c>"""
    }
    def cellStr(c: Cell): String = c match {
      case Inline(s) => s
      case Shared(i) => shared(i)
      case Num(v)    => v.toString
      case Dbl(v)    => v.toString
      case Bool(b)   => if (b) "True" else "False"
    }
    (0 until 60).foreach { seed =>
      val sheets = sample(bookGen, seed.toLong)
      val entries = Seq(
        "xl/workbook.xml" -> ("<workbook><sheets>" + sheets.indices.map(i =>
          s"""<sheet name="s$i" sheetId="${i + 1}" r:id="rId${i + 1}"/>""").mkString + "</sheets></workbook>"),
        "xl/_rels/workbook.xml.rels" -> ("<Relationships>" + sheets.indices.map(i =>
          s"""<Relationship Id="rId${i + 1}" Target="worksheets/sheet${i + 1}.xml"/>""").mkString + "</Relationships>"),
        "xl/sharedStrings.xml" ->
          ("<sst>" + shared.map(s => s"<si><t>${xmlEsc(s)}</t></si>").mkString + "</sst>"),
      ) ++ sheets.zipWithIndex.map { case (rows, i) =>
        s"xl/worksheets/sheet${i + 1}.xml" ->
          ("<worksheet><sheetData>" + rows.map(r => "<row>" + r.map(cellXml).mkString + "</row>").mkString + "</sheetData></worksheet>")
      }
      val (text, meta) = new XlsxExtractor().extract(deflatedZip(entries), "b.xlsx")
      val expected = sheets.zipWithIndex.flatMap { case (rows, i) =>
        val rowTexts = rows.filter(_.nonEmpty).map(_.map(cellStr).mkString(" | "))
        if (rowTexts.isEmpty) Nil
        else Seq(s"Sheet: s$i", rowTexts.mkString("\n"), "-" * 20)
      }.mkString("\n")
      assert(text == expected, s"seed=$seed")
      assert(meta("total_cells_processed") == sheets.flatMap(_.map(_.size)).sum.toString)
    }
  }

  test("property: PDF pages/lines round-trip with literal-string escaping") {
    val lineGen = for {
      n  <- Gen.choose(1, 6)
      cs <- Gen.listOfN(n, Gen.oneOf(('a' to 'z') ++ Seq('(', ')', '\\', ' ', '.')))
    } yield cs.mkString
    val pagesGen = Gen.choose(1, 5).flatMap(n =>
      Gen.listOfN(n, Gen.choose(0, 4).flatMap(l => Gen.listOfN(l, lineGen))))
    def esc(s: String) = s.replace("\\", "\\\\").replace("(", "\\(").replace(")", "\\)")
    (0 until 60).foreach { seed =>
      val pages = sample(pagesGen, seed.toLong)
      val kids = pages.indices.map(i => s"${3 + 2 * i} 0 R").mkString(" ")
      val objs = Seq(
        "<< /Type /Catalog /Pages 2 0 R >>",
        s"<< /Type /Pages /Kids [$kids] /Count ${pages.size} >>",
      ) ++ pages.zipWithIndex.flatMap { case (lines, i) =>
        val content = "BT " + lines.map(l => s"(${esc(l)}) Tj").mkString(" T* ") + " ET"
        Seq(
          s"<< /Type /Page /Parent 2 0 R /Contents ${4 + 2 * i} 0 R >>",
          s"<< /Length ${content.length} >>\nstream\n$content\nendstream",
        )
      }
      val sb = new StringBuilder("%PDF-1.4\n")
      objs.zipWithIndex.foreach { case (o, i) => sb.append(s"${i + 1} 0 obj\n$o\nendobj\n") }
      sb.append("trailer\n<< /Root 1 0 R >>\n%%EOF\n")
      val got = new PdfExtractor().extract(sb.toString.getBytes(ISO_8859_1), "p.pdf")
      val expected = pages.map(_.mkString("\n")).filter(_.nonEmpty).mkString("\n\n")
      assert(got._1 == expected, s"seed=$seed")
      assert(got._2("page_count") == pages.size.toString)
    }
  }

  test("corrupt containers become error rows through the distributed seam") {
    val spark = TestSpark.spark
    import spark.implicits._
    val bad = Seq(
      ("broken.docx", "not a zip at all".getBytes(UTF_8)),
      ("broken.pdf", "also not a pdf".getBytes(UTF_8)),
    ).toDF("file_name", "content")
    val rows = Extractors.extractAll(spark, bad).collect().sortBy(_.file_name)
    assert(rows.forall(r => r.error != null && r.text == null))
    assert(rows.map(_.extractor).toSeq == Seq("DocxExtractor", "PdfExtractor"))
  }
}
