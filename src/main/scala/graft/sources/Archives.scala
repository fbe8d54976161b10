package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Archive/corpus container sources for training-data ingest — the formats
  * web-scale text actually arrives in: WARC (Common Crawl's container) and
  * tar / tar.gz bundles. Pure-JVM parsing over the `binaryFile` source;
  * each archive is one input row and its records fan out per-partition
  * (narrow, no shuffle) — the same distributed seam as the OOXML/PDF
  * extractors. Per-file parallelism is the unit here; a 100 TB crawl is
  * millions of ~1 GB WARC segments, which is exactly the sweet spot.
  */
object Archives {

  final case class WarcRecord(
      file_name: String, record_index: Int, warc_type: String,
      target_uri: String, warc_date: String, content_type: String,
      content_length: Long, payload: Array[Byte])

  /** WARC/1.x records (ISO 28500): each record is a `WARC/…` version line,
    * CRLF header lines to an empty line, exactly `Content-Length` payload
    * bytes, then CRLF CRLF. The walker resynchronizes on the next
    * `WARC/` marker after a malformed record instead of aborting the
    * file — a torn record costs itself, not the segment. Gzip-member
    * compression (the `.warc.gz` convention: one gzip member per record)
    * is handled transparently by [[gunzipAll]] upstream when the caller
    * routes through [[warcRecordsGz]].
    */
  def warcRecords(spark: SparkSession, binaries: DataFrame): Dataset[WarcRecord] = {
    import spark.implicits._
    binaries.select(col("file_name"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (name, bytes) => parseWarc(name, bytes) }
  }

  /** `.warc.gz` route: gunzip (multi-member aware — per-record members
    * concatenate into one valid WARC stream) then parse.
    */
  def warcRecordsGz(spark: SparkSession, binaries: DataFrame): Dataset[WarcRecord] = {
    import spark.implicits._
    binaries.select(col("file_name"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (name, bytes) => parseWarc(name, gunzipAll(bytes)) }
  }

  private[graft] def parseWarc(name: String, b: Array[Byte]): Iterator[WarcRecord] = {
    val out = Vector.newBuilder[WarcRecord]
    var pos = 0
    var idx = 0
    def indexOfWarc(from: Int): Int = {
      var i = from
      while (i >= 0 && i + 5 <= b.length) {
        if (b(i) == 'W' && b(i + 1) == 'A' && b(i + 2) == 'R' && b(i + 3) == 'C' && b(i + 4) == '/')
          return i
        i += 1
      }
      -1
    }
    def lineEnd(from: Int): Int = {
      var i = from
      while (i < b.length && b(i) != '\n') i += 1
      i
    }
    while ({ pos = indexOfWarc(pos); pos >= 0 }) {
      // header block: lines to the first empty line
      var p = lineEnd(pos) + 1
      val hdrs = scala.collection.mutable.Map.empty[String, String]
      var ok = true
      var done = false
      while (ok && !done && p < b.length) {
        val e    = lineEnd(p)
        val line = new String(b, p, e - p, java.nio.charset.StandardCharsets.UTF_8).stripSuffix("\r")
        if (line.isEmpty) done = true
        else {
          val c = line.indexOf(':')
          if (c > 0) hdrs(line.take(c).trim.toLowerCase(java.util.Locale.ROOT)) = line.drop(c + 1).trim
          p = e + 1
        }
        if (!done && p >= b.length) ok = false
        if (done) p = e + 1
      }
      val len = hdrs.get("content-length").flatMap(s => scala.util.Try(s.toLong).toOption)
      if (!ok || !done || len.isEmpty || len.get < 0 || p + len.get > b.length) {
        pos += 5 // malformed: resync at the next WARC/ marker
      } else {
        val payload = java.util.Arrays.copyOfRange(b, p, (p + len.get).toInt)
        out += WarcRecord(name, idx,
          hdrs.getOrElse("warc-type", ""), hdrs.getOrElse("warc-target-uri", ""),
          hdrs.getOrElse("warc-date", ""), hdrs.getOrElse("content-type", ""),
          len.get, payload)
        idx += 1
        pos = (p + len.get).toInt
      }
    }
    out.result().iterator
  }

  final case class TarEntry(
      file_name: String, entry_name: String, entry_bytes: Long, content: Array[Byte])

  /** POSIX ustar walk: 512-byte headers (name@0/100, octal size@124/12,
    * typeflag@156), content rounded up to block size; two zero blocks end
    * the archive. Only regular files ('0' or NUL) emit; directories and
    * pax/gnu extension records are skipped structurally (their size is
    * still consumed, so following entries stay aligned).
    */
  def tarEntries(spark: SparkSession, binaries: DataFrame): Dataset[TarEntry] = {
    import spark.implicits._
    binaries.select(col("file_name"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (name, bytes) => parseTar(name, bytes) }
  }

  /** `.tar.gz` route: gunzip then walk. */
  def tarGzEntries(spark: SparkSession, binaries: DataFrame): Dataset[TarEntry] = {
    import spark.implicits._
    binaries.select(col("file_name"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (name, bytes) => parseTar(name, gunzipAll(bytes)) }
  }

  private[graft] def parseTar(name: String, b: Array[Byte]): Iterator[TarEntry] = {
    val out = Vector.newBuilder[TarEntry]
    var pos = 0
    var ok  = true
    while (ok && pos + 512 <= b.length) {
      if ((0 until 512).forall(i => b(pos + i) == 0)) ok = false // end block
      else {
        var n = 0
        while (n < 100 && b(pos + n) != 0) n += 1
        val entryName = new String(b, pos, n, java.nio.charset.StandardCharsets.UTF_8)
        val sizeStr = new String(b, pos + 124, 12, java.nio.charset.StandardCharsets.US_ASCII)
          .takeWhile(c => c >= '0' && c <= '7')
        val size = scala.util.Try(java.lang.Long.parseLong(sizeStr, 8)).getOrElse(-1L)
        val tf   = b(pos + 156)
        if (size < 0 || pos + 512 + size > b.length) ok = false // torn header
        else {
          if ((tf == '0' || tf == 0) && entryName.nonEmpty)
            out += TarEntry(name, entryName, size,
              java.util.Arrays.copyOfRange(b, pos + 512, (pos + 512 + size).toInt))
          pos += 512 + (((size + 511) / 512) * 512).toInt
        }
      }
    }
    out.result().iterator
  }

  /** Concatenated-member gunzip (the `.warc.gz` / multi-stream convention:
    * `GZIPInputStream` with an explicit buffer already consumes successive
    * members). Non-gzip input returns empty — surfaced as zero records,
    * never garbage.
    */
  private[graft] def gunzipAll(bytes: Array[Byte]): Array[Byte] =
    try {
      val in  = new java.util.zip.GZIPInputStream(new java.io.ByteArrayInputStream(bytes), 8192)
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n   = in.read(buf)
      while (n > 0) { out.write(buf, 0, n); n = in.read(buf) }
      out.toByteArray
    } catch { case _: java.io.IOException => Array.emptyByteArray }
}
