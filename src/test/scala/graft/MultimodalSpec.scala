package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Multimodal plumbing: real binaryFile source + magic-byte sniffing; the
  * decode stub's batch shape and determinism; frame-sampling fan-out.
  */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dir = "/root/repo/fixtures/media"

  test("format sniff is content-based (magic bytes), not extension-based") {
    val got = Multimodal.binaryTable(spark, dir)
      .select(col("file_name"), Multimodal.sniffFormat(col("content")).as("f"))
      .as[(String, String)].collect().toMap
    assert(got("img1.png") == "png")
    assert(got("img2.jpg") == "jpeg")
    assert(got("clip1.gif") == "gif")
    assert(got("audio1.bin") == "unknown")
  }

  test("stub features: fixed dim, histogram sums to ~1, deterministic") {
    val b  = Multimodal.binaryTable(spark, dir)
    val f1 = Multimodal.extractFeatures(spark, b).collect().sortBy(_.file_name)
    val f2 = Multimodal.extractFeatures(spark, b).collect().sortBy(_.file_name)
    assert(f1.length == 4)
    f1.foreach { m =>
      assert(m.features.length == 16)
      assert(math.abs(m.features.map(_.toDouble).sum - 1.0) < 1e-3)
    }
    assert(f1.map(_.features.toSeq).toSeq == f2.map(_.features.toSeq).toSeq)
  }

  // ---- real image decode (javax.imageio) ---------------------------------

  /** In-memory encode via ImageIO: the SAME codecs decode it back, proving
    * the decoder handles real PNG/JPEG/GIF bitstreams, not just BMP.
    */
  private def encode(img: java.awt.image.BufferedImage, fmt: String): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, fmt, bos), s"JVM must ship a $fmt encoder")
    bos.toByteArray
  }

  private def solid(w: Int, h: Int, rgb: Int): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until h).foreach(y => (0 until w).foreach(x => img.setRGB(x, y, rgb)))
    img
  }

  test("ImageIoDecoder: real pixel means from PNG, JPEG, GIF and the committed BMPs") {
    val dec = new Multimodal.ImageIoDecoder()
    // solid color → means are exactly the channel values in every format
    // (JPEG of a solid image is lossless enough to round-trip flat blocks)
    val img = solid(8, 4, 0x40A0C0) // r=64 g=160 b=192, bright (sum 416 > 381)
    Seq("png", "gif").foreach { fmt =>
      val Seq(f) = dec.decodeBatch(Seq((s"t.$fmt", encode(img, fmt))))
      assert(f.toSeq == Seq(64f, 160f, 192f, 1f), s"format $fmt")
    }
    // JPEG is lossy — real decode is within quantization error, never the
    // byte histogram the fallback would produce
    val Seq(fj) = dec.decodeBatch(Seq(("t.jpeg", encode(img, "jpeg"))))
    assert(fj.zip(Seq(64f, 160f, 192f, 1f)).forall { case (a, b) => math.abs(a - b) <= 2f },
      s"jpeg decode off: ${fj.toSeq}")
    // committed BMP fixtures: values the mm2 oracle re-derives from the blob
    val art1 = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get("fixtures/bitmap/art1.bmp"))
    val Seq(f1) = dec.decodeBatch(Seq(("art1.bmp", art1)))
    assert(f1.toSeq == Seq(100f, 95f, 90f, 0.1875f))
    // undecodable bytes fall back to the 4-bin byte-histogram stub
    val Seq(fb) = dec.decodeBatch(Seq(("junk.bin", Array[Byte](1, 2, 3, -1))))
    assert(fb.length == 4 && math.abs(fb.map(_.toDouble).sum - 1.0) < 1e-6)
  }

  test("resizeImages: exact area-average on integer factors, nearest otherwise, undecodable dropped") {
    // 4x2 image, left half red-ish (200,0,0), right half (0,100,0):
    // resize to 2x1 → each output pixel = mean of a 2x2 block
    val img = new java.awt.image.BufferedImage(4, 2, java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until 2).foreach { y =>
      (0 until 2).foreach(x => img.setRGB(x, y, 0xC80000))
      (2 until 4).foreach(x => img.setRGB(x, y, 0x006400))
    }
    val rows = Seq(
      ("a.png", encode(img, "png")),
      ("bad.bin", Array[Byte](9, 9, 9))).toDF("file_name", "content")
    val got = Multimodal.resizeImages(spark, rows, outW = 2, outH = 1)
      .collect().sortBy(_.file_name)
    assert(got.map(_.file_name).toSeq == Seq("a.png"), "undecodable rows must drop, not emit garbage")
    assert(got.head.content.toSeq == Seq[Byte](200.toByte, 0, 0, 0, 100, 0))
    // non-integer factor (3x3 → 2x2): pixel-center nearest, deterministic
    val g3 = new java.awt.image.BufferedImage(3, 3, java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until 3).foreach(y => (0 until 3).foreach(x => g3.setRGB(x, y, (x * 50 << 16) | (y * 50 << 8))))
    val n3 = Multimodal.resizeImages(spark, Seq(("g.png", encode(g3, "png"))).toDF("file_name", "content"), 2, 2)
      .collect().head
    // sample points: x∈{(0*3+1)/2=0 → px0, (1*3+1)/2=2 → px2}, same for y
    assert(n3.content.toSeq == Seq[Byte](0, 0, 0, 100.toByte, 0, 0, 0, 100.toByte, 0, 100.toByte, 100.toByte, 0))
  }

  test("dHash: invariant under lossless re-encode and rescale; banded join finds exactly the near pairs") {
    // the perceptual property that makes dHash a near-dup key: the SAME
    // pixels through a different container (BMP → PNG) or a clean 2×
    // upscale hash identically — byte-level keys (md5, CDC) see totally
    // different blobs
    val bmp = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/root/repo/fixtures/bitmap/dhash/art_b.bmp"))
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bmp))
    val up = new java.awt.image.BufferedImage(32, 32, java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until 32).foreach(y => (0 until 32).foreach(x => up.setRGB(x, y, img.getRGB(x / 2, y / 2))))
    val rows = Seq(
      ("orig.bmp", bmp),
      ("reenc.png", encode(img, "png")),
      ("upscaled.png", encode(up, "png")),
      ("noise.bin", Array.tabulate[Byte](64)(_.toByte)), // undecodable → drops
    ).toDF("file_name", "content")
    val hs = Multimodal.dHash(spark, rows).collect().map(h => h.file_name -> h.dhash).toMap
    assert(hs.keySet == Set("orig.bmp", "reenc.png", "upscaled.png"))
    assert(hs("orig.bmp") == hs("reenc.png"), "container change must not change the hash")
    assert(hs("orig.bmp") == hs("upscaled.png"), "clean 2x upscale must not change the hash")

    // banded join over the committed fixture set: exactly the two planted
    // near pairs, nothing else
    val b = Multimodal.binaryTable(spark, "/root/repo/fixtures/bitmap/dhash", "*.bmp")
    val pairs = Multimodal.dhashNearDupPairs(Multimodal.dHash(spark, b).toDF(), maxDist = 3)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).sorted
    assert(pairs.map(p => (p._1, p._2)).toSeq ==
      Seq(("art_a.bmp", "art_a2.bmp"), ("art_b.bmp", "art_b2.bmp")))
    assert(pairs.forall(_._3 <= 3))
  }

  test("pHash: re-encode/upscale invariant, near pairs close in Hamming, far pairs far") {
    val bmp = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/root/repo/fixtures/bitmap/dhash/art_b.bmp"))
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bmp))
    val up = new java.awt.image.BufferedImage(32, 32, java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until 32).foreach(y => (0 until 32).foreach(x => up.setRGB(x, y, img.getRGB(x / 2, y / 2))))
    val rows = Seq(
      ("orig.bmp", bmp),
      ("reenc.png", encode(img, "png")),
      ("upscaled.png", encode(up, "png")),
      ("noise.bin", Array.tabulate[Byte](64)(_.toByte)),
    ).toDF("file_name", "content")
    val hs = Multimodal.pHash(spark, rows).collect().map(h => h.file_name -> h.phash).toMap
    assert(hs.keySet == Set("orig.bmp", "reenc.png", "upscaled.png"))
    assert(hs("orig.bmp") == hs("reenc.png"))
    assert(hs("orig.bmp") == hs("upscaled.png"))
    // DC bit never set; exactly 31 of the 63 non-DC coeffs sit above the
    // index-31 median when all values are distinct
    assert((hs("orig.bmp") & 1L) == 0L)

    val b = Multimodal.binaryTable(spark, "/root/repo/fixtures/bitmap/dhash", "*.bmp")
    val ph = Multimodal.pHash(spark, b).collect().map(h => h.file_name -> h.phash).toMap
    def dist(a: Long, bb: Long) = java.lang.Long.bitCount(a ^ bb)
    // measured: near pairs 5 and 12, every cross pair >= 28 — a local
    // perturbation moves more pHash bits than dHash bits (many coeffs sit
    // near the median cut) but the near/far separation stays wide
    assert(dist(ph("art_a.bmp"), ph("art_a2.bmp")) <= 16, "planted near pair must stay close")
    assert(dist(ph("art_b.bmp"), ph("art_b2.bmp")) <= 16, "planted near pair must stay close")
    assert(dist(ph("art_a.bmp"), ph("art_c.bmp")) >= 20, "distinct art must be far")
    assert(dist(ph("art_a.bmp"), ph("art_d.bmp")) >= 20, "distinct art must be far")
  }

  test("property: banded dhash join finds EVERY pair within maxDist=3 and none beyond") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // random base hashes; per base, a partner at a planned Hamming distance
    // 0..6 via distinct random bit flips. Pigeonhole: every pair at ≤ 3
    // must surface (4 bands, ≤ 3 flips → one untouched band); pairs > 3
    // must be filtered even when they band-collide.
    val cases = (0 until 80).map { i =>
      val p    = Gen.Parameters.default
      val base = Gen.long.apply(p, Seed(i.toLong * 2)).get
      val d    = i % 7
      val bits = Gen.pick(d, 0 until 64).apply(p, Seed(i.toLong * 2 + 1)).get
      val partner = bits.foldLeft(base)((h, b) => h ^ (1L << b))
      (i, base, partner, d)
    }
    import spark.implicits._
    val hashes = cases.flatMap { case (i, base, partner, _) =>
      Seq((f"a$i%03d", base), (f"b$i%03d", partner))
    }.toDF("file_name", "dhash")
    val got = Multimodal.dhashNearDupPairs(hashes, maxDist = 3)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    cases.foreach { case (i, _, _, d) =>
      val pair = got.find(p => p._1 == f"a$i%03d" && p._2 == f"b$i%03d")
      if (d <= 3) assert(pair.exists(_._3 == d), s"case $i dist=$d must be found: $pair")
      else assert(pair.isEmpty, s"case $i dist=$d must be filtered: $pair")
    }
    // no self pairs, ordering canonical
    assert(got.forall(p => p._1 < p._2))
  }

  test("exifMeta: IFD walk in both byte orders, sub-IFD DateTimeOriginal, EXIF-less and hostile bytes survive") {
    val rows = Multimodal.exifMeta(spark,
      Multimodal.binaryTable(spark, "/root/repo/fixtures/images/exif", "*.jpg"))
      .collect().map(e => e.file_name -> e).toMap
    val ii = rows("exif_ii.jpg")
    assert(ii.orientation.contains(6) && ii.make.contains("GraftCam") &&
      ii.model.contains("X100 Mark II") && ii.datetime_original.contains("2025:12:31 23:59:58"))
    val mm = rows("exif_mm.jpg")
    assert(mm.orientation.contains(1) && mm.make.contains("Acme Optical") &&
      mm.model.isEmpty && mm.datetime_original.isEmpty)
    val no = rows("noexif.jpg")
    assert(no.orientation.isEmpty && no.make.isEmpty && no.datetime_original.isEmpty)
    // inline (count <= 4) ASCII path: 3-char make packs into the value slot
    val inline = {
      val e = "<"
      val mk = "AB\u0000"
      val ifd0 = Array[Byte](1, 0) ++ // 1 entry, LE
        Array[Byte](0x0f, 0x01, 2, 0) ++ Array[Byte](3, 0, 0, 0) ++ ("AB".getBytes :+ 0.toByte :+ 0.toByte) ++
        Array[Byte](0, 0, 0, 0)
      val tiff = "II".getBytes ++ Array[Byte](42, 0) ++ Array[Byte](8, 0, 0, 0) ++ ifd0
      val payload = "Exif".getBytes ++ Array[Byte](0, 0) ++ tiff
      val app1 = Array[Byte](0xff.toByte, 0xe1.toByte,
        ((payload.length + 2) >> 8).toByte, ((payload.length + 2) & 0xff).toByte) ++ payload
      Array[Byte](0xff.toByte, 0xd8.toByte) ++ app1 ++ Array[Byte](0xff.toByte, 0xd9.toByte)
    }
    assert(Multimodal.parseExif("inline.jpg", inline).make.contains("AB"))
    // truncated APP1 and random bytes must yield empty metadata, not throw
    assert(Multimodal.parseExif("trunc.jpg", inline.take(18)).make.isEmpty)
    assert(Multimodal.parseExif("junk.bin", Array[Byte](1, 2, 3)).orientation.isEmpty)
  }

  test("wavFeatures: chunk walk, decoded-sample features, non-PCM and truncated inputs drop") {
    val rows = Multimodal.wavFeatures(spark,
      Multimodal.binaryTable(spark, "/root/repo/fixtures/audio", "*.wav"))
      .collect().map(w => w.file_name -> w).toMap
    assert(rows.keySet == Set("tone.wav", "stereo.wav"))
    val t = rows("tone.wav")
    assert(t.sample_rate == 8000 && t.channels == 1 && t.n_frames == 160 && t.duration_ms == 20)
    assert(t.peak == 12000)
    // 160 samples of a period-20 sine: one strict sign flip per half period
    // except at exact zeros (sin(k·π) = 0 at sample 0, 10, 20, …, which
    // break the strict < 0 → > 0 chain): the sign sequence is
    // +…+ 0 −…− 0 +…+, so NO strict flips at all — every crossing passes
    // through an exact integer zero
    assert(t.zero_crossings == 0, s"got ${t.zero_crossings}")
    val s = rows("stereo.wav")
    // the LIST chunk before `data` must not derail parsing
    assert(s.sample_rate == 16000 && s.channels == 2 && s.n_frames == 96)
    assert(s.peak == 14500) // ramp max |i·300 − 14000| over i ∈ [0,95]: i=95 → 14500
    // channel 0 is the square wave: flips every 8 frames → 11 strict flips
    assert(s.zero_crossings == 11, s"got ${s.zero_crossings}")
    // RMS matches a direct recomputation from the generator's formulas
    val sq = (0 until 96).flatMap(i => Seq(if ((i / 8) % 2 == 0) 8000L else -8000L, i * 300L - 14000L))
    val expRms = math.sqrt(sq.map(x => x * x).sum.toDouble / sq.length)
    assert(math.abs(s.rms - expRms) < 1e-9)

    import spark.implicits._
    // non-PCM format code (3 = float) and a truncated header both drop
    val good = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/root/repo/fixtures/audio/tone.wav"))
    val nonPcm = good.clone(); nonPcm(20) = 3 // audioFormat lives at fmt+0 = offset 20
    val bad = Seq(("f.wav", nonPcm), ("t.wav", good.take(30))).toDF("file_name", "content")
    assert(Multimodal.wavFeatures(spark, bad).count() == 0)
  }

  test("mp4Tracks: recursive box walk, free-box tolerance, malformed inputs drop") {
    import spark.implicits._
    val rows = Multimodal.mp4Tracks(spark,
      Multimodal.binaryTable(spark, "/root/repo/fixtures/video", "*.mp4"))
      .collect().map(t => (t.file_name, t.track_id) -> t).toMap
    assert(rows.keySet == Set(("clip.mp4", 1L), ("clip.mp4", 2L), ("tiny.mp4", 1L)))
    val v = rows(("clip.mp4", 1L))
    assert(v.handler == "vide" && v.width == 320 && v.height == 180)
    assert(v.duration_ms == 2500 && v.movie_duration_ms == 2500)
    val a = rows(("clip.mp4", 2L))
    assert(a.handler == "soun" && a.width == 0 && a.height == 0)
    // tiny.mp4: free box before moov; timescale 600, duration 1200 → 2000 ms
    val t = rows(("tiny.mp4", 1L))
    assert(t.handler == "vide" && t.width == 64 && t.height == 48 && t.duration_ms == 2000)
    // malformed: missing ftyp, truncated box size, garbage — all drop
    val clip = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/root/repo/fixtures/video/clip.mp4"))
    val noFtyp = clip.drop(clip(3)) // strip the ftyp box (size byte 3)
    val badSize = clip.clone(); badSize(0) = 0x7f // first box claims 2 GB
    val bad = Seq(("a.mp4", noFtyp), ("b.mp4", badSize), ("c.mp4", "junk".getBytes))
      .toDF("file_name", "content")
    assert(Multimodal.mp4Tracks(spark, bad).count() == 0)
  }

  test("frame sampling: stride windows capped at maxFrames, dense indices") {
    val b = Multimodal.binaryTable(spark, dir)
    val frames = Multimodal.sampleFrames(spark, b, frameSize = 64, stride = 32, maxFrames = 5)
      .collect().groupBy(_.file_name)
    val png = frames("img1.png").sortBy(_.frame_index) // 408 bytes -> capped at 5
    assert(png.length == 5)
    assert(png.map(_.frame_index).toSeq == (0 until 5))
    assert(png.forall(_.frame_bytes.length == 64))
    val bin = frames("audio1.bin") // 256 bytes -> (256-64)/32+1 = 7 -> capped 5
    assert(bin.length == 5)
  }
}
