package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}

/** Multimodal columns: image/audio/video as opaque `binary` columns with
  * typed metadata (the training-data-pipeline extension; no analog in the
  * reference, which only OCRs images driver-side via Tesseract —
  * backend/extractors/image_extractor.py:18-68).
  *
  * The Spark-side plumbing — binaryFile source, schema, partitioning, batch
  * shape of the per-partition feature extraction — is real and tested.
  * IMAGE decode is REAL ([[ImageIoDecoder]] / [[resizeImages]] on
  * javax.imageio: PNG/JPEG/GIF/BMP, no native deps); the deterministic
  * [[StubDecoder]] byte-histogram remains as the no-codec fallback for
  * formats the JVM can't decode (audio/video), and [[resizeStub]] /
  * [[sampleFrames]] stay byte-level stubs — audio/video codecs are not in
  * this container; a production deployment swaps in a codec-backed
  * [[Decoder]] with the same signature.
  */
object Multimodal {

  /** Opaque-binary table from a directory: (file_name, n_bytes, content).
    * `binaryFile` is Spark's distributed binary source — each file is one
    * row, read on executors, never collected to the driver.
    */
  def binaryTable(spark: SparkSession, dir: String): DataFrame =
    binaryTable(spark, dir, "*")

  /** Extension/name gating belongs in `pathGlobFilter`, not a post-scan
    * `where` on file_name: the glob prunes at file-LISTING time, so
    * non-matching blobs are never opened — a filter on the derived name
    * column would read every byte of a 100 TB corpus first.
    */
  def binaryTable(spark: SparkSession, dir: String, glob: String): DataFrame =
    spark.read.format("binaryFile").option("pathGlobFilter", glob).load(dir)
      .select(
        regexp_extract(col("path"), "([^/]+)$", 1).as("file_name"),
        col("length").as("n_bytes"),
        col("content"),
      )

  /** Content-based format sniff from magic bytes (real, not a stub).
    * Only the first 4 bytes are hex-encoded — hex(content) on the whole
    * blob would materialize a 2×-size string per row just to read 8 chars.
    */
  def sniffFormat(content: Column): Column = {
    val h = hex(substring(content, 1, 4))
    when(h.startsWith("89504E47"), "png")
      .when(h.startsWith("FFD8FF"), "jpeg")
      .when(h.startsWith("47494638"), "gif")
      .when(h.startsWith("52494646"), "riff") // wav/avi container
      .otherwise("unknown")
  }

  final case class MediaFeatures(file_name: String, n_bytes: Long, features: Array[Float])
  final case class Frame(file_name: String, frame_index: Int, frame_bytes: Array[Byte])

  /** Decoder seam: batch of (name, bytes) → fixed-dim feature vectors. */
  trait Decoder extends Serializable {
    def dim: Int
    def decodeBatch(batch: Seq[(String, Array[Byte])]): Seq[Array[Float]]
  }

  /** STUB decode: L1-normalized 16-bin byte histogram. Deterministic fake
    * standing in for codec decode + model features; the Spark plumbing
    * around it (mapPartitions batching, schema) is the real contract.
    */
  final class StubDecoder(val dim: Int = 16) extends Decoder {
    override def decodeBatch(batch: Seq[(String, Array[Byte])]): Seq[Array[Float]] =
      batch.map { case (_, bytes) =>
        val hist = new Array[Float](dim)
        var i = 0
        while (i < bytes.length) { hist((bytes(i) & 0xff) * dim / 256) += 1f; i += 1 }
        if (bytes.length > 0) { var j = 0; while (j < dim) { hist(j) /= bytes.length; j += 1 } }
        hist
      }
  }

  /** REAL image decode on javax.imageio (PNG/JPEG/GIF/BMP — the formats the
    * JVM ships codecs for; no native deps): features are decoded-PIXEL
    * statistics, not byte statistics. dim = 4:
    * (meanR, meanG, meanB, coverage) where coverage = fraction of pixels
    * with r+g+b > 381 (i.e. brighter than mid-gray). Channel means over
    * integer pixels are dyadic rationals — exactly representable in Float
    * AND in the oracle's double arithmetic, so the compare is exact, never
    * rounding-boundary luck. Undecodable inputs (audio, corrupt files)
    * fall back to the byte-histogram stub at the same dim — the documented
    * no-codec fallback, so a mixed-media corpus never throws.
    */
  final class ImageIoDecoder extends Decoder {
    val dim = 4
    private lazy val fallback = new StubDecoder(dim)
    override def decodeBatch(batch: Seq[(String, Array[Byte])]): Seq[Array[Float]] =
      batch.map { case (name, bytes) =>
        decodeImage(bytes) match {
          case Some(img) =>
            val (w, h) = (img.getWidth, img.getHeight)
            var (sr, sg, sb, bright) = (0L, 0L, 0L, 0L)
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val rgb = img.getRGB(x, y)
                val (r, g, b) = ((rgb >> 16) & 0xff, (rgb >> 8) & 0xff, rgb & 0xff)
                sr += r; sg += g; sb += b
                if (r + g + b > 381) bright += 1
                x += 1
              }
              y += 1
            }
            val n = (w.toLong * h).toDouble
            Array((sr / n).toFloat, (sg / n).toFloat, (sb / n).toFloat, (bright / n).toFloat)
          case None => fallback.decodeBatch(Seq((name, bytes))).head
        }
      }
  }

  private def decodeImage(bytes: Array[Byte]): Option[java.awt.image.BufferedImage] =
    try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
    catch { case scala.util.control.NonFatal(_) => None }

  /** Distributed feature extraction: one decoder per partition, inputs
    * drained in batches (same shape as [[Embedder.embedText]]). Narrow —
    * no shuffle.
    */
  def extractFeatures(
      spark: SparkSession,
      binaries: DataFrame,
      decoder: Decoder = new StubDecoder(),
      batchSize: Int = 32,
  ): Dataset[MediaFeatures] = {
    import spark.implicits._
    binaries.select(col("file_name"), col("n_bytes").cast("long"), col("content"))
      .as[(String, Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          val feats = decoder.decodeBatch(batch.map(r => (r._1, r._3)))
          batch.iterator.zip(feats.iterator).map { case ((name, n, _), f) => MediaFeatures(name, n, f) }
        }
      }
  }

  final case class Resized(file_name: String, n_bytes_in: Long, n_bytes_out: Int, content: Array[Byte])

  final case class ResizedImage(
      file_name: String, n_bytes_in: Long, out_w: Int, out_h: Int, content: Array[Byte])

  /** REAL image resize on decoded pixels: decode via javax.imageio, then
    *  - integer downscale factors (src divisible by target on both axes):
    *    exact AREA AVERAGE — each output pixel is the floor-mean of its
    *    source block, the alias-free reduction;
    *  - any other geometry: pixel-center NEAREST sampling (deterministic,
    *    no resampling kernel ambiguity).
    * Output `content` is raw row-major top-down RGB bytes (w·h·3) — a pure
    * function of decoded pixels, unlike a PNG re-encode whose byte stream
    * may legally differ across encoder versions. Undecodable inputs are
    * dropped (None), surfacing as missing rows rather than garbage bytes.
    * Narrow per-row map — no shuffle.
    */
  def resizeImages(
      spark: SparkSession,
      binaries: DataFrame,
      outW: Int,
      outH: Int,
  ): Dataset[ResizedImage] = {
    import spark.implicits._
    require(outW > 0 && outH > 0, s"target dims must be positive: ${outW}x$outH")
    binaries.select(col("file_name"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (name, bytes) =>
        decodeImage(bytes).map { img =>
          val (w, h) = (img.getWidth, img.getHeight)
          val out = new Array[Byte](outW * outH * 3)
          val exact = w % outW == 0 && h % outH == 0
          val (fx, fy) = (w / outW, h / outH)
          var oy = 0
          while (oy < outH) {
            var ox = 0
            while (ox < outW) {
              val (r, g, b) =
                if (exact) {
                  var (sr, sg, sb) = (0, 0, 0)
                  var y = oy * fy
                  while (y < (oy + 1) * fy) {
                    var x = ox * fx
                    while (x < (ox + 1) * fx) {
                      val rgb = img.getRGB(x, y)
                      sr += (rgb >> 16) & 0xff; sg += (rgb >> 8) & 0xff; sb += rgb & 0xff
                      x += 1
                    }
                    y += 1
                  }
                  val n = fx * fy
                  (sr / n, sg / n, sb / n)
                } else {
                  val rgb = img.getRGB(
                    math.min(w - 1, (ox * w + w / 2) / outW),
                    math.min(h - 1, (oy * h + h / 2) / outH))
                  ((rgb >> 16) & 0xff, (rgb >> 8) & 0xff, rgb & 0xff)
                }
              val i = (oy * outW + ox) * 3
              out(i) = r.toByte; out(i + 1) = g.toByte; out(i + 2) = b.toByte
              ox += 1
            }
            oy += 1
          }
          ResizedImage(name, bytes.length.toLong, outW, outH, out)
        }
      }
  }

  /** Resize STUB: deterministic byte-stream downsample to ≤ `targetBytes`
    * (every stride-th byte; a real image resize needs a codec — the 1-in/
    * 1-out schema and narrow per-row shape are the contract a codec-backed
    * implementation drops into).
    */
  def resizeStub(spark: SparkSession, binaries: DataFrame, targetBytes: Int): Dataset[Resized] = {
    import spark.implicits._
    binaries.select(col("file_name"), col("content"))
      .as[(String, Array[Byte])]
      .map { case (name, bytes) =>
        // ceil stride so the sample SPANS the stream: floor would emit a
        // plain prefix for inputs between target and 2×target bytes.
        val stride = math.max(1, (bytes.length + targetBytes - 1) / targetBytes)
        val out    = Iterator.range(0, bytes.length, stride).take(targetBytes).map(bytes(_)).toArray
        Resized(name, bytes.length.toLong, out.length, out)
      }
  }

  /** Content-defined chunking over the binary table: cut each blob at its
    * [[graft.functions.GearBoundaries]] rolling-hash boundaries and emit
    * one row per chunk with its md5 — the blob-level exact-dedup key
    * (identical media segments chunk identically even when shifted by
    * container bytes, so a groupBy on `chunk_md5` finds shared segments
    * across files the way `exactDupGroups` finds duplicate texts).
    *
    * Scale shape: the boundary scan is ONE codegen'd pass per blob; chunk
    * fan-out is a `posexplode` bounded by blob size / 2^maskBits; the
    * start/index window partitions per FILE (never more than one blob's
    * chunk ends in a partition). Chunk md5s hash the hex rendering (like
    * mm3's frames) so the oracle can slice the same hex string.
    *
    * Output: (file_name, chunk_index, chunk_start, chunk_end, chunk_bytes,
    * chunk_md5); empty blobs produce no rows.
    */
  def cdcChunks(binaries: DataFrame, maskBits: Int): DataFrame = {
    val bounds = org.apache.spark.sql.GraftBridge.column(
      graft.functions.GearBoundaries(
        org.apache.spark.sql.GraftBridge.expression(col("content")), maskBits))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("file_name").orderBy("chunk_end")
    binaries
      .where(col("n_bytes") > 0)
      .select(
        col("file_name"), col("content"),
        explode(array_distinct(concat(bounds, array((col("n_bytes") - 1).cast("int"))))).as("chunk_end"))
      .withColumn("chunk_start", coalesce(lag(col("chunk_end"), 1).over(w) + 1, lit(0)))
      .withColumn("chunk_index", row_number().over(w) - 1)
      .select(
        col("file_name"),
        col("chunk_index").cast("long").as("chunk_index"),
        col("chunk_start").cast("long").as("chunk_start"),
        col("chunk_end").cast("long").as("chunk_end"),
        (col("chunk_end") - col("chunk_start") + 1).cast("long").as("chunk_bytes"),
        md5(expr("substring(hex(content), chunk_start * 2 + 1, (chunk_end - chunk_start + 1) * 2)"))
          .as("chunk_md5"),
      )
  }

  final case class WavInfo(
      file_name: String, sample_rate: Int, channels: Int, bits: Int,
      n_frames: Long, duration_ms: Long, rms: Double, zero_crossings: Long, peak: Long)

  /** REAL audio decode for RIFF/WAVE 16-bit PCM — the one audio container
    * that needs no codec, just chunk walking (the audio analog of mm2's
    * javax.imageio step: decoded-SAMPLE features, not byte statistics).
    * Walks the chunk list (so cue/LIST/fact chunks before `data` don't
    * break parsing — a fixture plants one), then over the samples:
    * RMS (sum of squares is exact integer arithmetic → the double sqrt is
    * bit-identical in every engine), peak |s|, and channel-0 zero
    * crossings (strict sign flips — the cheap pitch proxy). Compressed or
    * non-16-bit WAVs drop (None), like undecodable images; a production
    * deployment binds a codec through the same [[Decoder]] seam.
    * Narrow per-row map — no shuffle.
    */
  def wavFeatures(spark: SparkSession, binaries: DataFrame): Dataset[WavInfo] = {
    import spark.implicits._
    binaries.select(col("file_name"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (name, b) =>
        def u16(i: Int) = (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
        def u32(i: Int) = (b(i) & 0xff).toLong | ((b(i + 1) & 0xff).toLong << 8) |
          ((b(i + 2) & 0xff).toLong << 16) | ((b(i + 3) & 0xff).toLong << 24)
        def tag(i: Int) = new String(b, i, 4, java.nio.charset.StandardCharsets.US_ASCII)
        if (b.length < 44 || tag(0) != "RIFF" || tag(8) != "WAVE") None
        else {
          var pos = 12
          var fmt  = -1
          var data = -1
          var dataLen = 0L
          while (pos + 8 <= b.length && (fmt < 0 || data < 0)) {
            val id  = tag(pos)
            val len = u32(pos + 4)
            if (id == "fmt ") fmt = pos + 8
            else if (id == "data") { data = pos + 8; dataLen = len }
            pos += 8 + len.toInt + (len.toInt & 1) // chunks are word-aligned
          }
          if (fmt < 0 || data < 0) None
          else {
            val audioFormat = u16(fmt)
            val channels    = u16(fmt + 2)
            val rate        = u32(fmt + 4).toInt
            val bits        = u16(fmt + 14)
            val end         = math.min(b.length.toLong, data + dataLen).toInt
            if (audioFormat != 1 || bits != 16 || channels < 1 || rate <= 0) None
            else {
              val nSamples = (end - data) / 2
              val nFrames  = nSamples.toLong / channels
              var sumSq = 0L
              var peak  = 0L
              var zc    = 0L
              var prev0 = 0
              var i = 0
              while (i < nSamples) {
                val raw = u16(data + i * 2)
                val s   = if (raw >= 0x8000) raw - 0x10000 else raw
                sumSq += s.toLong * s
                if (math.abs(s) > peak) peak = math.abs(s)
                if (i % channels == 0) { // channel 0
                  if (i > 0 && ((prev0 < 0 && s > 0) || (prev0 > 0 && s < 0))) zc += 1
                  prev0 = s
                }
                i += 1
              }
              val rms = if (nSamples > 0) math.sqrt(sumSq.toDouble / nSamples) else 0.0
              Some(WavInfo(name, rate, channels, bits, nFrames,
                nFrames * 1000L / rate, rms, zc, peak))
            }
          }
        }
      }
  }

  final case class Mp4Track(
      file_name: String, track_id: Long, handler: String,
      width: Int, height: Int, duration_ms: Long, movie_duration_ms: Long)

  /** REAL video-container metadata for ISO-BMFF (MP4/MOV): a recursive box
    * (atom) walk — `moov → mvhd` for the movie clock, `trak → tkhd` +
    * `mdia → hdlr` per track — no codec needed, the same no-decode slice
    * of the format [[wavFeatures]] takes for RIFF. One fixture plants a
    * `free` box before `moov`, so fixed-offset parsing fails. Durations
    * are tkhd units on the MOVIE timescale → milliseconds. Non-BMFF or
    * truncated inputs drop. Narrow per-row flatMap — no shuffle.
    */
  def mp4Tracks(spark: SparkSession, binaries: DataFrame): Dataset[Mp4Track] = {
    import spark.implicits._
    binaries.select(col("file_name"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (name, b) =>
        def u32(i: Int): Long =
          if (i + 4 > b.length) -1L
          else ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) | ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)
        def tag(i: Int): String =
          if (i + 4 > b.length) "" else new String(b, i, 4, java.nio.charset.StandardCharsets.US_ASCII)
        /** (tagName, payloadStart, payloadEnd) children of [from, to). */
        def boxes(from: Int, to: Int): Vector[(String, Int, Int)] = {
          val out = Vector.newBuilder[(String, Int, Int)]
          var p = from
          var ok = true
          while (ok && p + 8 <= to) {
            val sz = u32(p)
            if (sz < 8 || p + sz > to) ok = false
            else { out += ((tag(p + 4), p + 8, p + sz.toInt)); p += sz.toInt }
          }
          out.result()
        }
        val top = boxes(0, b.length)
        if (!top.exists(_._1 == "ftyp")) Iterator.empty
        else top.find(_._1 == "moov").iterator.flatMap { case (_, ms, me) =>
          val moov = boxes(ms, me)
          val clock = moov.find(_._1 == "mvhd").map { case (_, s, _) => (u32(s + 12), u32(s + 16)) }
          val (mts, mdur) = clock.getOrElse((0L, 0L))
          if (mts <= 0) Iterator.empty
          else moov.iterator.filter(_._1 == "trak").flatMap { case (_, ts, te) =>
            val trak = boxes(ts, te)
            for {
              (_, ks, _) <- trak.find(_._1 == "tkhd")
              handler = (for {
                (_, ds, de) <- trak.find(_._1 == "mdia")
                (_, hs, _)  <- boxes(ds, de).find(_._1 == "hdlr")
              } yield tag(hs + 8)).getOrElse("")
            } yield Mp4Track(name, u32(ks + 12),
              handler,
              (u32(ks + 76) >> 16).toInt, (u32(ks + 80) >> 16).toInt,
              u32(ks + 20) * 1000L / mts, mdur * 1000L / mts)
          }
        }
      }
  }

  final case class ExifMeta(
      file_name: String,
      orientation: Option[Int],
      make: Option[String],
      model: Option[String],
      datetime_original: Option[String],
  )

  /** JPEG EXIF metadata — a real TIFF IFD walk over the APP1 segment
    * (public specs: JPEG marker structure ISO 10918-1, EXIF 2.3 / TIFF 6.0
    * IFD layout). The multimodal-pipeline uses: orientation for decode
    * normalization, Make/Model for device stratification, DateTimeOriginal
    * for capture-time dedup windows.
    *
    * Walk: JPEG markers from SOI until SOS scanning for APP1 with the
    * `Exif\u0000\u0000` header; TIFF origin sets byte order (`II` little /
    * `MM` big — BOTH handled and fixture-exercised); IFD0 entries read
    * tags 0x0112 Orientation (SHORT), 0x010F Make / 0x0110 Model (ASCII,
    * inline when count <= 4 else offset-addressed), 0x8769 ExifIFD
    * pointer -> sub-IFD tag 0x9003 DateTimeOriginal. ASCII values strip
    * the spec's trailing NUL. Files without EXIF (or non-JPEG bytes)
    * yield all-None metadata rather than dropping — absence is data for
    * the stratification downstream. Bounds-checked throughout: a
    * truncated or hostile APP1 yields None fields, never a throw. Narrow
    * per-row map — no shuffle.
    */
  def exifMeta(spark: SparkSession, binaries: DataFrame): Dataset[ExifMeta] = {
    import spark.implicits._
    binaries.select(col("file_name"), col("content"))
      .as[(String, Array[Byte])]
      .map { case (name, b) => parseExif(name, b) }
  }

  private[graft] def parseExif(name: String, b: Array[Byte]): ExifMeta = {
    val none = ExifMeta(name, None, None, None, None)
    def u8(i: Int) = b(i) & 0xff
    if (b.length < 4 || u8(0) != 0xff || u8(1) != 0xd8) return none // not a JPEG (SOI)
    // marker walk to APP1/Exif
    var pos  = 2
    var tiff = -1
    while (tiff < 0 && pos + 4 <= b.length && u8(pos) == 0xff) {
      val marker = u8(pos + 1)
      if (marker == 0xd8 || (marker >= 0xd0 && marker <= 0xd7) || marker == 0x01) pos += 2
      else if (marker == 0xda) pos = b.length // SOS: entropy data follows, stop
      else {
        val len = (u8(pos + 2) << 8) | u8(pos + 3)
        if (marker == 0xe1 && pos + 10 <= b.length &&
          new String(b, pos + 4, 4, java.nio.charset.StandardCharsets.US_ASCII) == "Exif" &&
          u8(pos + 8) == 0 && u8(pos + 9) == 0) tiff = pos + 10
        else pos += 2 + len
      }
    }
    if (tiff < 0 || tiff + 8 > b.length) return none
    val le = (u8(tiff), u8(tiff + 1)) match {
      case (0x49, 0x49) => true
      case (0x4d, 0x4d) => false
      case _            => return none
    }
    def u16(i: Int): Int =
      if (i < 0 || i + 2 > b.length) -1
      else if (le) u8(i) | (u8(i + 1) << 8)
      else (u8(i) << 8) | u8(i + 1)
    def u32(i: Int): Long =
      if (i < 0 || i + 4 > b.length) -1L
      else if (le) u8(i).toLong | (u8(i + 1).toLong << 8) | (u8(i + 2).toLong << 16) | (u8(i + 3).toLong << 24)
      else (u8(i).toLong << 24) | (u8(i + 1).toLong << 16) | (u8(i + 2).toLong << 8) | u8(i + 3).toLong
    def ascii(count: Long, valuePos: Int): Option[String] = {
      // count includes the NUL terminator; <= 4 bytes pack inline at the
      // value slot, larger values live at a TIFF-relative offset
      val start = if (count <= 4) valuePos else (tiff + u32(valuePos)).toInt
      val n     = (count - 1).toInt
      if (n < 0 || start < 0 || start + n > b.length) None
      else Some(new String(b, start, n, java.nio.charset.StandardCharsets.US_ASCII))
    }
    def ifdEntries(off: Long): Seq[(Int, Long, Int)] = {
      val i0 = (tiff + off).toInt
      val n  = u16(i0)
      if (n <= 0 || n > 512) Seq.empty
      else (0 until n).flatMap { j =>
        val e = i0 + 2 + 12 * j
        if (e + 12 > b.length) None
        else Some((u16(e), u32(e + 4), e + 8)) // (tag, count, value slot pos)
      }
    }
    val ifd0  = u32(tiff + 4)
    if (ifd0 < 0) return none
    val e0    = ifdEntries(ifd0)
    def find(entries: Seq[(Int, Long, Int)], tag: Int) = entries.find(_._1 == tag)
    val orientation = find(e0, 0x0112).map { case (_, _, v) => u16(v) }.filter(_ > 0)
    val make  = find(e0, 0x010f).flatMap { case (_, c, v) => ascii(c, v) }
    val model = find(e0, 0x0110).flatMap { case (_, c, v) => ascii(c, v) }
    val dto = find(e0, 0x8769).map(_._3).map(u32).filter(_ >= 0).toSeq
      .flatMap(sub => ifdEntries(sub))
      .collectFirst { case (0x9003, c, v) => ascii(c, v) }.flatten
    ExifMeta(name, orientation, make, model, dto)
  }

  final case class DHashed(file_name: String, dhash: Long)

  /** Perceptual difference hash (dHash) of each decodable image: pixel-
    * center NEAREST sample to a 9×8 gray grid (gray = (r+g+b)/3, integer),
    * bit (y·8+x) set iff g[y][x] > g[y][x+1] — 64 ordinal brightness
    * comparisons that survive re-encoding, mild noise, and rescaling, the
    * classic recompressed-image near-dup key. Nearest (not area) sampling
    * everywhere: dHash is already a coarse ordinal feature, and one
    * integer-arithmetic sampling rule is what lets the oracle replay the
    * hash from raw BMP bytes. Undecodable inputs drop (None rows), like
    * [[resizeImages]]. Narrow per-row map — no shuffle.
    */
  def dHash(spark: SparkSession, binaries: DataFrame): Dataset[DHashed] = {
    import spark.implicits._
    binaries.select(col("file_name"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (name, bytes) =>
        decodeImage(bytes).map { img =>
          val (w, h) = (img.getWidth, img.getHeight)
          val g = Array.tabulate(8, 9) { (oy, ox) =>
            val rgb = img.getRGB(
              math.min(w - 1, (ox * w + w / 2) / 9),
              math.min(h - 1, (oy * h + h / 2) / 8))
            (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3
          }
          var bits = 0L
          for (y <- 0 until 8; x <- 0 until 8)
            if (g(y)(x) > g(y)(x + 1)) bits |= 1L << (y * 8 + x)
          DHashed(name, bits)
        }
      }
  }

  final case class PHashed(file_name: String, phash: Long)

  /** pHash's fixed-point DCT basis: cos(π(2x+1)u/64) quantized to
    * 1/32768 steps. Integer products are what keep the hash bit-identical
    * on every engine — a float DCT's sum order would flip bits near the
    * median cut. Public so the oracle embeds the SAME table.
    */
  val PHashCos: Array[Array[Long]] = Array.tabulate(8, 32)((u, x) =>
    Math.round(math.cos(math.Pi * (2 * x + 1) * u / 64.0) * 32768.0))

  /** Perceptual DCT hash (pHash) of each decodable image: 32×32
    * nearest-sample gray grid (the [[dHash]] sampling rule), the 8×8
    * low-frequency block of the 2-D DCT-II in fixed-point arithmetic
    * ([[PHashCos]]), bit (u·8+v) set iff the coefficient exceeds the
    * median of the 63 non-DC coefficients (the DC bit stays 0; median =
    * sorted index 31, ties break to 0 — `quantile_disc(0.5)` exactly).
    * Keys on global frequency structure, so it survives blur, gamma and
    * recompression that flip [[dHash]]'s adjacent-pixel ordinals; the
    * classic second key of an image near-dup pipeline (band-join the
    * hashes with [[dhashNearDupPairs]] — it only reads the bits).
    * Narrow per-row map — no shuffle.
    */
  def pHash(spark: SparkSession, binaries: DataFrame): Dataset[PHashed] = {
    import spark.implicits._
    binaries.select(col("file_name"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (name, bytes) =>
        decodeImage(bytes).map { img =>
          val (w, h) = (img.getWidth, img.getHeight)
          val g = Array.tabulate(32, 32) { (oy, ox) =>
            val rgb = img.getRGB(
              math.min(w - 1, (ox * w + w / 2) / 32),
              math.min(h - 1, (oy * h + h / 2) / 32))
            ((((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3).toLong
          }
          val coeff = Array.tabulate(8, 8) { (u, v) =>
            var s = 0L
            var oy = 0
            while (oy < 32) {
              var ox = 0
              while (ox < 32) {
                s += g(oy)(ox) * PHashCos(u)(ox) * PHashCos(v)(oy)
                ox += 1
              }
              oy += 1
            }
            s
          }
          val nonDc = (for (u <- 0 until 8; v <- 0 until 8 if u != 0 || v != 0)
            yield coeff(u)(v)).sorted
          val med = nonDc(31)
          var bits = 0L
          for (u <- 0 until 8; v <- 0 until 8)
            if ((u != 0 || v != 0) && coeff(u)(v) > med) bits |= 1L << (u * 8 + v)
          PHashed(name, bits)
        }
      }
  }

  /** Hamming-banded near-dup pairs over dHashes — the SimHash band trick at
    * the image level: 4 × 16-bit bands; by pigeonhole any pair within
    * Hamming distance ≤ 3 agrees EXACTLY on at least one band, so the
    * equi-join on (band, value) finds every such pair while never comparing
    * all pairs; candidates then verify by exact `bit_count(xor)`. maxDist
    * above 3 weakens the candidate guarantee (a distance-4 pair can spread
    * one flip per band) — the standard banded-LSH recall trade, same as
    * [[Dedup.simHashNearDupPairs]].
    *
    * Output: (file_a, file_b, dist), file_a < file_b.
    */
  def dhashNearDupPairs(hashes: DataFrame, maxDist: Int = 3): DataFrame = {
    val banded = hashes.select(
      col("file_name"), col("dhash"),
      explode(array((0 until 4).map(b =>
        struct(lit(b).as("band"), shiftrightunsigned(col("dhash"), 16 * b).bitwiseAND(lit(0xffffL)).as("v"))): _*)).as("bv"))
      .select(col("file_name"), col("dhash"), col("bv.band"), col("bv.v"))
    val l = banded.select(col("file_name").as("file_a"), col("dhash").as("__ha"), col("band"), col("v"))
    val r = banded.select(col("file_name").as("file_b"), col("dhash").as("__hb"), col("band"), col("v"))
    l.join(r, Seq("band", "v"))
      .where(col("file_a") < col("file_b"))
      .select(col("file_a"), col("file_b"),
        bit_count(col("__ha").bitwiseXOR(col("__hb"))).cast("long").as("dist"))
      .distinct()
      .where(col("dist") <= maxDist)
  }

  /** Frame sampling STUB: every `stride`-th `frameSize`-byte window, capped
    * at `maxFrames` (a real video decoder samples keyframes; the schema and
    * fan-out shape are what downstream operators consume).
    */
  def sampleFrames(
      spark: SparkSession,
      binaries: DataFrame,
      frameSize: Int,
      stride: Int,
      maxFrames: Int,
  ): Dataset[Frame] = {
    import spark.implicits._
    binaries.select(col("file_name"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (name, bytes) =>
        Iterator.range(0, math.max(bytes.length - frameSize + 1, 0), stride)
          .take(maxFrames)
          .zipWithIndex
          .map { case (off, idx) => Frame(name, idx, bytes.slice(off, off + frameSize)) }
      }
  }
}
