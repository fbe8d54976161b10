package graft

import graft.sources.Archives
import org.scalatest.funsuite.AnyFunSuite

/** WARC / tar ingest: fixture parity with the oracle queries, the .gz
  * routes, resynchronization on torn records, and clean stops on torn
  * archives.
  */
class ArchivesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def read(p: String) = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p))

  private def gzip(b: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val g   = new java.util.zip.GZIPOutputStream(bos)
    g.write(b); g.close(); bos.toByteArray
  }

  test("WARC: fixture records parse with exact types, URIs and payloads") {
    val recs = Archives.parseWarc("segment.warc", read("/root/repo/fixtures/crawl/segment.warc")).toVector
    assert(recs.map(_.warc_type) == Vector("warcinfo", "conversion", "conversion", "response"))
    assert(recs(1).target_uri == "https://example.com/a")
    assert(new String(recs(2).payload, "UTF-8") == "Deduplication keeps corpora honest.\n")
    assert(recs.forall(r => r.content_length == r.payload.length))
    // the response payload's own header-lookalike lines stay IN the payload
    assert(new String(recs(3).payload, "UTF-8").contains("Content-Type: text/html"))
    assert(recs(3).content_type.startsWith("application/http"))
  }

  test("WARC: per-record gzip members (.warc.gz convention) parse identically") {
    val raw  = read("/root/repo/fixtures/crawl/segment.warc")
    val recs = Archives.parseWarc("x", raw).toVector
    // rebuild as one gzip member per record — GZIPInputStream must walk members
    val rebuilt = recs.map { r =>
      val hdr = s"WARC/1.0\r\nWARC-Type: ${r.warc_type}\r\nContent-Length: ${r.content_length}\r\n\r\n"
      gzip(hdr.getBytes("UTF-8") ++ r.payload ++ "\r\n\r\n".getBytes)
    }.reduce(_ ++ _)
    val viaGz = Archives.warcRecordsGz(spark,
      Seq(("m.warc.gz", rebuilt)).toDF("file_name", "content")).collect().toVector
    assert(viaGz.map(_.warc_type) == recs.map(_.warc_type))
    assert(viaGz.map(_.payload.toSeq) == recs.map(_.payload.toSeq))
    // non-gzip bytes through the gz route: zero records, never garbage
    assert(Archives.warcRecordsGz(spark,
      Seq(("bad.gz", "not gzip".getBytes)).toDF("file_name", "content")).count() == 0)
  }

  test("WARC: a torn record resyncs to the next marker instead of killing the segment") {
    val raw = read("/root/repo/fixtures/crawl/segment.warc")
    val s   = new String(raw, "ISO-8859-1")
    // overclaim the first conversion record's length so its slice overruns
    val torn = s.replaceFirst("Content-Length: 66", "Content-Length: 9999").getBytes("ISO-8859-1")
    val recs = Archives.parseWarc("torn", torn).toVector
    // warcinfo parses; the overclaimed record drops; the LATER records are
    // still found by resync
    assert(recs.map(_.warc_type).count(_ == "conversion") >= 1)
    assert(recs.exists(_.warc_type == "response"))
    assert(!recs.exists(_.content_length == 9999))
  }

  test("tar: fixture entries, directory skipped; tar.gz route; torn archive stops cleanly") {
    val entries = Archives.parseTar("docs.tar", read("/root/repo/fixtures/crawl/docs.tar")).toVector
    assert(entries.map(_.entry_name).sorted ==
      Vector("corpus/one.txt", "corpus/two.txt", "notes.md"))
    assert(new String(entries.find(_.entry_name == "notes.md").get.content, "UTF-8")
      == "# heading\nbullet line\n")
    assert(entries.forall(e => e.entry_bytes == e.content.length))

    val viaGz = Archives.tarGzEntries(spark,
      Seq(("docs.tar.gz", gzip(read("/root/repo/fixtures/crawl/docs.tar")))).toDF("file_name", "content"))
      .collect().toVector
    assert(viaGz.map(_.entry_name).sorted == entries.map(_.entry_name).sorted)

    // torn: truncate mid-content — parsed entries before the tear survive
    val raw  = read("/root/repo/fixtures/crawl/docs.tar")
    val torn = raw.take(512 * 3 + 100) // dir hdr + one.txt hdr + content block + partial
    val got  = Archives.parseTar("t", torn).toVector
    assert(got.map(_.entry_name) == Vector("corpus/one.txt"))
    // garbage in: zero entries
    assert(Archives.parseTar("g", Array.fill[Byte](700)(42)).isEmpty)
  }
}
