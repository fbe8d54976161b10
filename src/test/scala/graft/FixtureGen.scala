package graft

import java.io.FileOutputStream
import java.nio.charset.StandardCharsets.US_ASCII
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}
import java.util.zip.{CRC32, ZipEntry, ZipOutputStream}

/** One-shot generator for the committed binary-format fixtures under
  * fixtures/office/. Entries are STORED (uncompressed) and the PDF is pure
  * ASCII with uncompressed content streams ON PURPOSE: the DuckDB oracle can
  * then independently re-derive the expected text from the raw blob bytes
  * (hex regex over stored XML / `(...) Tj` pulls), making the correctness
  * check a genuine two-implementation comparison rather than a Spark-vs-
  * itself replay. Compressed variants (DEFLATED zip entries, FlateDecode
  * streams) are covered by unit tests that build archives in memory.
  *
  * Deterministic: fixed entry timestamps, no randomness. Re-run with
  *   sbt "Test/runMain graft.FixtureGen"
  */
object FixtureGen {

  private def storedZip(path: String, entries: Seq[(String, String)]): Unit = {
    val zos = new ZipOutputStream(new FileOutputStream(path))
    entries.foreach { case (name, text) =>
      val b = text.getBytes(UTF_8)
      val e = new ZipEntry(name)
      e.setMethod(ZipEntry.STORED)
      e.setSize(b.length.toLong)
      e.setCompressedSize(b.length.toLong)
      val crc = new CRC32(); crc.update(b); e.setCrc(crc.getValue)
      e.setTime(1356998400000L)
      zos.putNextEntry(e); zos.write(b); zos.closeEntry()
    }
    zos.close()
  }

  private val xmlDecl = "<?xml version=\"1.0\" encoding=\"UTF-8\" standalone=\"yes\"?>"

  def docxEntries: Seq[(String, String)] = Seq(
    "word/document.xml" ->
      (xmlDecl +
        "<w:document xmlns:w=\"http://schemas.openxmlformats.org/wordprocessingml/2006/main\"><w:body>" +
        "<w:p><w:r><w:t>Graft engine design notes.</w:t></w:r></w:p>" +
        "<w:p><w:r><w:t>Operators compile to declarative Spark plans.</w:t></w:r></w:p>" +
        "<w:p><w:r><w:t>Oracle parity holds at every scale factor.</w:t></w:r></w:p>" +
        "</w:body></w:document>"))

  def pptxEntries: Seq[(String, String)] = {
    def slide(texts: Seq[String]) =
      xmlDecl +
        "<p:sld xmlns:p=\"http://schemas.openxmlformats.org/presentationml/2006/main\"" +
        " xmlns:a=\"http://schemas.openxmlformats.org/drawingml/2006/main\"><p:cSld><p:spTree>" +
        texts.map(t => s"<p:sp><p:txBody><a:p><a:r><a:t>$t</a:t></a:r></a:p></p:txBody></p:sp>").mkString +
        "</p:spTree></p:cSld></p:sld>"
    Seq(
      "ppt/presentation.xml" ->
        (xmlDecl + "<p:presentation xmlns:p=\"http://schemas.openxmlformats.org/presentationml/2006/main\"/>"),
      "ppt/slides/slide1.xml" -> slide(Seq("Quarterly Review", "Ingest throughput grew nine percent.")),
      "ppt/slides/slide2.xml" -> slide(Seq("Roadmap", "Ship the binary extractor seam.")),
      "docProps/core.xml" ->
        (xmlDecl +
          "<cp:coreProperties xmlns:cp=\"http://schemas.openxmlformats.org/package/2006/metadata/core-properties\"" +
          " xmlns:dc=\"http://purl.org/dc/elements/1.1/\">" +
          "<dc:title>Graft Deck</dc:title><dc:creator>graft</dc:creator></cp:coreProperties>"),
    )
  }

  def xlsxEntries: Seq[(String, String)] = {
    def inline(t: String) = s"""<c t="inlineStr"><is><t>$t</t></is></c>"""
    def num(v: String) = s"<c><v>$v</v></c>"
    def sheet(rows: Seq[String]) =
      xmlDecl +
        "<worksheet xmlns=\"http://schemas.openxmlformats.org/spreadsheetml/2006/main\"><sheetData>" +
        rows.map(r => s"<row>$r</row>").mkString +
        "</sheetData></worksheet>"
    Seq(
      "xl/workbook.xml" ->
        (xmlDecl +
          "<workbook xmlns=\"http://schemas.openxmlformats.org/spreadsheetml/2006/main\"" +
          " xmlns:r=\"http://schemas.openxmlformats.org/officeDocument/2006/relationships\"><sheets>" +
          "<sheet name=\"inventory\" sheetId=\"1\" r:id=\"rId1\"/>" +
          "<sheet name=\"orders\" sheetId=\"2\" r:id=\"rId2\"/>" +
          "</sheets></workbook>"),
      "xl/_rels/workbook.xml.rels" ->
        (xmlDecl +
          "<Relationships xmlns=\"http://schemas.openxmlformats.org/package/2006/relationships\">" +
          "<Relationship Id=\"rId1\" Type=\"http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet\" Target=\"worksheets/sheet1.xml\"/>" +
          "<Relationship Id=\"rId2\" Type=\"http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet\" Target=\"worksheets/sheet2.xml\"/>" +
          "</Relationships>"),
      "xl/worksheets/sheet1.xml" -> sheet(Seq(
        inline("item") + inline("qty"),
        inline("widget") + num("42"),
        inline("gear") + num("7"),
      )),
      "xl/worksheets/sheet2.xml" -> sheet(Seq(
        inline("region") + inline("amount"),
        inline("emea") + num("1200"),
        inline("apac") + num("900"),
      )),
    )
  }

  def pdfBytes: Array[Byte] = {
    def stream(lines: Seq[String]): String = {
      val data = lines.mkString("\n") + "\n"
      s"<< /Length ${data.length} >>\nstream\n${data}endstream"
    }
    val objs: Seq[String] = Seq(
      "<< /Type /Catalog /Pages 2 0 R >>",
      "<< /Type /Pages /Kids [3 0 R 5 0 R] /Count 2 >>",
      "<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] /Contents 4 0 R >>",
      stream(Seq("BT", "/F1 12 Tf", "72 720 Td", "(Graft Engine Manual) Tj",
        "0 -16 Td", "(Scans push filters down to parquet.) Tj", "ET")),
      "<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] /Contents 6 0 R >>",
      stream(Seq("BT", "/F1 12 Tf", "72 720 Td", "(Joins broadcast the small side.) Tj",
        "0 -16 Td", "(Top-k avoids a global sort.) Tj", "ET")),
      "<< /Title (Graft Manual) /Author (Graft Team) >>",
    )
    val sb = new StringBuilder("%PDF-1.4\n")
    val offsets = objs.zipWithIndex.map { case (o, i) =>
      val off = sb.length
      sb.append(s"${i + 1} 0 obj\n$o\nendobj\n")
      off
    }
    val xrefOff = sb.length
    sb.append(s"xref\n0 ${objs.length + 1}\n")
    sb.append("0000000000 65535 f \n")
    offsets.foreach(o => sb.append(f"$o%010d 00000 n \n"))
    sb.append(s"trailer\n<< /Size ${objs.length + 1} /Root 1 0 R /Info 7 0 R >>\n")
    sb.append(s"startxref\n$xrefOff\n%%EOF\n")
    sb.toString.getBytes(US_ASCII)
  }

  def main(args: Array[String]): Unit = {
    val dir = Paths.get("fixtures/office")
    Files.createDirectories(dir)
    storedZip("fixtures/office/report.docx", docxEntries)
    storedZip("fixtures/office/slides.pptx", pptxEntries)
    storedZip("fixtures/office/book.xlsx", xlsxEntries)
    Files.write(dir.resolve("manual.pdf"), pdfBytes)
    println(s"wrote 4 fixtures to $dir")
  }
}
