package graft

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.ISO_8859_1
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}
import java.util.zip.{Deflater, ZipEntry, ZipOutputStream}

import graft.sources._
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
