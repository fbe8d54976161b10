package graft.sources

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

/** Pure-JVM OCR for machine-rendered bitmap text behind the [[Ocr]] seam.
  *
  * The reference runs pytesseract over a grayscaled image with a 10 s
  * timeout (backend/extractors/image_extractor.py:38-42). A full Tesseract
  * port is out of scope for a zero-dependency JVM library, but the seam
  * should not be empty either: this engine implements the classical OCR
  * pipeline — decode (JDK ImageIO: PNG/JPEG/GIF/BMP), grayscale +
  * threshold (the reference's preprocess step), projection-profile line
  * and glyph segmentation, grid normalization, and nearest-template
  * matching against a built-in 5×7 uppercase bitmap font — plus the two
  * scanned-paper defenses a real scan needs before any of that works:
  * projection-profile DESKEW (±6°, applied only when it materially
  * sharpens the line profile) and Bradley ADAPTIVE binarization (local
  * integral-image threshold; survives uneven illumination where no
  * global Otsu cut separates faded ink from shadowed paper). The global
  * and adaptive passes both run; the one that confidently reads more
  * glyphs wins. It reads clean machine-rendered text and degraded
  * renders of the same font deterministically; natural-font
  * scanned-paper recognition still wants a real engine bound through
  * the same seam ([[TesseractOcr]]).
  *
  * [[NoOcr]] stays the default binding — S7's oracle contract (textless
  * images) is unchanged unless a caller opts in.
  */
object GlyphOcr extends Ocr {
  val name = "glyph"

  /** 5×7 bitmaps (7 rows × 5 bits, MSB = leftmost) for A–Z, 0–9. */
  private[graft] val font: Map[Char, Seq[Int]] = Map(
    'A' -> Seq(0x0e, 0x11, 0x11, 0x1f, 0x11, 0x11, 0x11),
    'B' -> Seq(0x1e, 0x11, 0x11, 0x1e, 0x11, 0x11, 0x1e),
    'C' -> Seq(0x0e, 0x11, 0x10, 0x10, 0x10, 0x11, 0x0e),
    'D' -> Seq(0x1c, 0x12, 0x11, 0x11, 0x11, 0x12, 0x1c),
    'E' -> Seq(0x1f, 0x10, 0x10, 0x1e, 0x10, 0x10, 0x1f),
    'F' -> Seq(0x1f, 0x10, 0x10, 0x1e, 0x10, 0x10, 0x10),
    'G' -> Seq(0x0e, 0x11, 0x10, 0x17, 0x11, 0x11, 0x0f),
    'H' -> Seq(0x11, 0x11, 0x11, 0x1f, 0x11, 0x11, 0x11),
    'I' -> Seq(0x0e, 0x04, 0x04, 0x04, 0x04, 0x04, 0x0e),
    'J' -> Seq(0x07, 0x02, 0x02, 0x02, 0x02, 0x12, 0x0c),
    'K' -> Seq(0x11, 0x12, 0x14, 0x18, 0x14, 0x12, 0x11),
    'L' -> Seq(0x10, 0x10, 0x10, 0x10, 0x10, 0x10, 0x1f),
    'M' -> Seq(0x11, 0x1b, 0x15, 0x15, 0x11, 0x11, 0x11),
    'N' -> Seq(0x11, 0x19, 0x15, 0x13, 0x11, 0x11, 0x11),
    'O' -> Seq(0x0e, 0x11, 0x11, 0x11, 0x11, 0x11, 0x0e),
    'P' -> Seq(0x1e, 0x11, 0x11, 0x1e, 0x10, 0x10, 0x10),
    'Q' -> Seq(0x0e, 0x11, 0x11, 0x11, 0x15, 0x12, 0x0d),
    'R' -> Seq(0x1e, 0x11, 0x11, 0x1e, 0x14, 0x12, 0x11),
    'S' -> Seq(0x0f, 0x10, 0x10, 0x0e, 0x01, 0x01, 0x1e),
    'T' -> Seq(0x1f, 0x04, 0x04, 0x04, 0x04, 0x04, 0x04),
    'U' -> Seq(0x11, 0x11, 0x11, 0x11, 0x11, 0x11, 0x0e),
    'V' -> Seq(0x11, 0x11, 0x11, 0x11, 0x11, 0x0a, 0x04),
    'W' -> Seq(0x11, 0x11, 0x11, 0x15, 0x15, 0x1b, 0x11),
    'X' -> Seq(0x11, 0x11, 0x0a, 0x04, 0x0a, 0x11, 0x11),
    'Y' -> Seq(0x11, 0x11, 0x0a, 0x04, 0x04, 0x04, 0x04),
    'Z' -> Seq(0x1f, 0x01, 0x02, 0x04, 0x08, 0x10, 0x1f),
    '0' -> Seq(0x0e, 0x11, 0x13, 0x15, 0x19, 0x11, 0x0e),
    '1' -> Seq(0x04, 0x0c, 0x04, 0x04, 0x04, 0x04, 0x0e),
    '2' -> Seq(0x0e, 0x11, 0x01, 0x06, 0x08, 0x10, 0x1f),
    '3' -> Seq(0x0e, 0x11, 0x01, 0x06, 0x01, 0x11, 0x0e),
    '4' -> Seq(0x02, 0x06, 0x0a, 0x12, 0x1f, 0x02, 0x02),
    '5' -> Seq(0x1f, 0x10, 0x1e, 0x01, 0x01, 0x11, 0x0e),
    '6' -> Seq(0x06, 0x08, 0x10, 0x1e, 0x11, 0x11, 0x0e),
    '7' -> Seq(0x1f, 0x01, 0x02, 0x04, 0x08, 0x08, 0x08),
    '8' -> Seq(0x0e, 0x11, 0x11, 0x0e, 0x11, 0x11, 0x0e),
    '9' -> Seq(0x0e, 0x11, 0x11, 0x0f, 0x01, 0x02, 0x0c),
  )
  /** Mean-darkness sample of a glyph box onto a gw×7 grid with FRACTIONAL
    * pixel coverage: each grid cell integrates the [0,1] darkness field
    * over its exact continuous extent, edge pixels weighted by overlap
    * area. Anti-aliased renders put glyphs at arbitrary sub-pixel phases
    * (a 3.5 px unit advances half-pixel per glyph); integer-grid majority
    * sampling aliases there, area integration does not. Image glyphs are
    * sampled into each candidate template's TIGHT grid shape, so a narrow
    * glyph (I, 1 — 3 font columns) is compared 3-to-3, never stretched
    * through a lossy, scale-dependent 5-wide resampling.
    */
  private def normalize(darkness: (Int, Int) => Double, gw: Int, x0: Int, x1: Int, y0: Int, y1: Int): Array[Double] =
    Array.tabulate(gw * 7) { i =>
      val (r, c) = (i / gw, i % gw)
      val xa = x0 + c * (x1 - x0).toDouble / gw
      val xb = x0 + (c + 1) * (x1 - x0).toDouble / gw
      val ya = y0 + r * (y1 - y0).toDouble / 7
      val yb = y0 + (r + 1) * (y1 - y0).toDouble / 7
      var sum  = 0.0
      var area = 0.0
      var y = math.floor(ya).toInt
      while (y < yb) {
        val wy = math.min(y + 1, yb) - math.max(y, ya)
        if (wy > 0) {
          var x = math.floor(xa).toInt
          while (x < xb) {
            val wx = math.min(x + 1, xb) - math.max(x, xa)
            if (wx > 0) { sum += wx * wy * darkness(y, x); area += wx * wy }
            x += 1
          }
        }
        y += 1
      }
      if (area > 0) sum / area else 0.0
    }

  /** tight width → templates cropped to their dark columns (gw×7 cells). */
  private val templatesByWidth: Map[Int, Array[(Char, Array[Boolean])]] =
    font.toArray.sortBy(_._1).map { case (c, rows) =>
      def at(y: Int, x: Int) = ((rows(y) >> (4 - x)) & 1) == 1
      val cols = (0 until 5).filter(x => (0 until 7).exists(y => at(y, x)))
      val gw   = cols.last + 1 - cols.head
      (gw, c, Array.tabulate(gw * 7)(i => at(i / gw, cols.head + i % gw)))
    }.groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3))).toMap

  /** Otsu's between-class-variance threshold over a 256-bin histogram —
    * robust on anti-aliased renders where the midpoint cut lands inside
    * the gray edge band and erodes thin strokes. On a clean two-level
    * image it degenerates to the midpoint.
    */
  private[graft] def otsu(hist: Array[Int], total: Int): Int = {
    var sumAll = 0L
    for (i <- 0 until 256) sumAll += i.toLong * hist(i)
    var best    = 0
    var bestVar = -1.0
    var wB      = 0L
    var sumB    = 0L
    for (t <- 0 until 256) {
      wB += hist(t)
      sumB += t.toLong * hist(t)
      val wF = total - wB
      if (wB > 0 && wF > 0) {
        val mB = sumB.toDouble / wB
        val mF = (sumAll - sumB).toDouble / wF
        val v  = wB.toDouble * wF * (mB - mF) * (mB - mF)
        if (v > bestVar) { bestVar = v; best = t }
      }
    }
    best
  }

  def recognize(content: Array[Byte], width: Long, height: Long): String = {
    val img = javax.imageio.ImageIO.read(new ByteArrayInputStream(content))
    if (img == null) return "" // format ImageIO can't decode (e.g. WEBP)
    val w = img.getWidth
    val h = img.getHeight
    // grayscale — the reference's preprocess step
    val lum0 = Array.ofDim[Int](h, w)
    var lo0  = 255
    var hi0  = 0
    for (y <- 0 until h; x <- 0 until w) {
      val rgb = img.getRGB(x, y)
      val l   = (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3
      lum0(y)(x) = l
      if (l < lo0) lo0 = l
      if (l > hi0) hi0 = l
    }
    if (hi0 - lo0 < 32) return "" // no contrast → no text

    // deskew (scanned-paper hardening): estimate the page tilt from the
    // provisional adaptive mask, counter-rotate when it is material.
    // Clean machine renders estimate ≈0° and pass through untouched; the
    // threshold map computes ONCE here and is reused by the adaptive
    // pass below unless the rotation invalidated it.
    val tmap0 = bradleyThreshold(lum0, w, h)
    val angle = estimateSkew(lum0, w, h, tmap0)
    // rotate() samples the source through R(θ), i.e. turns the image by
    // −θ — so passing the measured angle itself cancels the tilt
    val lum = if (math.abs(angle) >= 0.75) rotate(lum0, w, h, angle) else lum0

    val hist = new Array[Int](256)
    var lo   = 255
    var hi   = 0
    for (y <- 0 until h; x <- 0 until w) {
      val l = lum(y)(x)
      hist(l) += 1
      if (l < lo) lo = l
      if (l > hi) hi = l
    }
    val cut = otsu(hist, w * h)
    // GLOBAL pass — Otsu cut, continuous darkness from the global
    // contrast range (template match reads the gray edge band directly
    // instead of its thresholded shadow). Right for evenly-lit renders.
    val loF = lo
    val hiF = hi
    val global = recognizePass(lum, w, h,
      (y, x) => lum(y)(x) <= cut,
      (y, x) => math.min(1.0, math.max(0.0, (hiF - lum(y)(x)).toDouble / (hiF - loF))))
    // ADAPTIVE pass — Bradley local-mean threshold (integral image): a
    // pixel is ink when it is ≥15% darker than its neighborhood mean, so
    // uneven illumination (a shadowed scan whose background is darker on
    // one side than faded ink on the other — no global cut separates
    // them) still binarizes correctly. Darkness is the binary mask.
    val tmap = if (lum eq lum0) tmap0 else bradleyThreshold(lum, w, h)
    val adaptive = recognizePass(lum, w, h,
      (y, x) => lum(y)(x) < tmap(y)(x),
      (y, x) => if (lum(y)(x) < tmap(y)(x)) 1.0 else 0.0)
    // the pass that confidently reads more glyphs wins; ties keep the
    // global (gray-aware) reading
    if (adaptive._2 > global._2 ||
      (adaptive._2 == global._2 && adaptive._2 > 0 && adaptive._3 < global._3 - 1e-9))
      adaptive._1
    else global._1
  }

  /** Page-tilt estimate in degrees (±6°, 0.25° steps): shear the dark
    * mask by each candidate angle and score the row-projection profile's
    * sum of squares — text lines concentrate dark pixels into few rows
    * exactly when the shear cancels the tilt. Returns 0 unless the best
    * angle beats the unsheared score by a material margin (clean input
    * must never rotate).
    */
  private[graft] def estimateSkew(
      lum: Array[Array[Int]], w: Int, h: Int, tmap: Array[Array[Int]]): Double = {
    // the ADAPTIVE mask drives the estimate: under uneven illumination a
    // global cut floods one side of the page into a solid dark block
    // whose uniform projection drowns the text-line signal
    val darks = Array.newBuilder[Int]
    for (y <- 0 until h; x <- 0 until w if lum(y)(x) < tmap(y)(x)) darks += y * w + x
    val ps = darks.result()
    if (ps.length < 16) return 0.0
    def score(deg: Double): Double = {
      val t    = math.tan(math.toRadians(deg))
      val bins = new Array[Long](2 * h + 4)
      var i = 0
      while (i < ps.length) {
        val y = ps(i) / w
        val x = ps(i) % w
        val b = math.round(y - (x - w / 2.0) * t).toInt + h / 2
        if (b >= 0 && b < bins.length) bins(b) += 1
        i += 1
      }
      var s = 0.0
      var j = 0
      while (j < bins.length) { s += bins(j).toDouble * bins(j); j += 1 }
      s
    }
    val base = score(0.0)
    var bestA = 0.0
    var bestS = base
    var a = -6.0
    while (a <= 6.0 + 1e-9) {
      val s = score(a)
      if (s > bestS) { bestS = s; bestA = a }
      a += 0.25
    }
    if (bestS > base * 1.10) bestA else 0.0
  }

  /** Nearest-neighbor rotation about the image center, clamp-to-edge
    * sampling (no artificial white border to confuse local thresholds).
    */
  private[graft] def rotate(lum: Array[Array[Int]], w: Int, h: Int, deg: Double): Array[Array[Int]] = {
    val rad = math.toRadians(deg)
    val c   = math.cos(rad)
    val s   = math.sin(rad)
    val cx  = (w - 1) / 2.0
    val cy  = (h - 1) / 2.0
    Array.tabulate(h, w) { (y, x) =>
      val dx = x - cx
      val dy = y - cy
      val sx = math.max(0, math.min(w - 1, math.round(cx + dx * c - dy * s).toInt))
      val sy = math.max(0, math.min(h - 1, math.round(cy + dx * s + dy * c).toInt))
      lum(sy)(sx)
    }
  }

  /** Bradley adaptive threshold map: T(y,x) = 85% of the mean luminance
    * in a window of ~max(w,h)/16 (≥8) px half-width around the pixel,
    * from one integral image. Windows dwarf stroke width, so glyph
    * interiors always see background in their neighborhood.
    */
  private[graft] def bradleyThreshold(lum: Array[Array[Int]], w: Int, h: Int): Array[Array[Int]] = {
    val ii = Array.ofDim[Long](h + 1, w + 1)
    for (y <- 0 until h; x <- 0 until w)
      ii(y + 1)(x + 1) = lum(y)(x) + ii(y)(x + 1) + ii(y + 1)(x) - ii(y)(x)
    val half = math.max(8, math.max(w, h) / 16)
    Array.tabulate(h, w) { (y, x) =>
      val x0 = math.max(0, x - half)
      val x1 = math.min(w - 1, x + half)
      val y0 = math.max(0, y - half)
      val y1 = math.min(h - 1, y + half)
      val n    = (x1 - x0 + 1).toLong * (y1 - y0 + 1)
      val sum  = ii(y1 + 1)(x1 + 1) - ii(y0)(x1 + 1) - ii(y1 + 1)(x0) + ii(y0)(x0)
      val mean = sum.toDouble / n
      (mean * 0.85).toInt
    }
  }

  /** One segmentation + template-match pass over a fixed binarization:
    * returns (text, accepted glyph count, mean accepted distance).
    */
  private[graft] def recognizePass(
      lum: Array[Array[Int]], w: Int, h: Int,
      dark: (Int, Int) => Boolean, darkness: (Int, Int) => Double,
  ): (String, Int, Double) = {
    var accepted = 0
    var distSum  = 0.0
    // glyph segmentation by 8-connected components (anti-aliased diagonal
    // strokes — Z, X — survive 8-connectivity where a column-projection
    // profile or 4-connectivity would split them); boxes with x-overlap in
    // the same line are merged so a glyph that thresholds into two islands
    // still matches as one.
    val label = Array.fill(h, w)(-1)
    val boxes = Vector.newBuilder[Array[Int]] // x0, x1, y0, y1 (exclusive ends)
    var nextL = 0
    val stack = new java.util.ArrayDeque[Int]()
    for (sy <- 0 until h; sx <- 0 until w if dark(sy, sx) && label(sy)(sx) < 0) {
      var (x0, x1, y0, y1) = (sx, sx + 1, sy, sy + 1)
      label(sy)(sx) = nextL
      stack.push(sy * w + sx)
      while (!stack.isEmpty) {
        val p  = stack.pop()
        val py = p / w
        val px = p % w
        if (px < x0) x0 = px
        if (px >= x1) x1 = px + 1
        if (py < y0) y0 = py
        if (py >= y1) y1 = py + 1
        var dy = -1
        while (dy <= 1) {
          var dx = -1
          while (dx <= 1) {
            val ny = py + dy
            val nx = px + dx
            if (ny >= 0 && ny < h && nx >= 0 && nx < w && dark(ny, nx) && label(ny)(nx) < 0) {
              label(ny)(nx) = nextL
              stack.push(ny * w + nx)
            }
            dx += 1
          }
          dy += 1
        }
      }
      boxes += Array(x0, x1, y0, y1)
      nextL += 1
    }

    // group into lines by vertical overlap, top to bottom
    val lines = Vector.newBuilder[Vector[Array[Int]]]
    var cur   = Vector.empty[Array[Int]]
    var curY0 = 0
    var curY1 = 0
    for (b <- boxes.result().sortBy(_(2))) {
      if (cur.isEmpty) { cur = Vector(b); curY0 = b(2); curY1 = b(3) }
      else if (b(2) < curY1 && b(3) > curY0) {
        cur = cur :+ b; curY0 = math.min(curY0, b(2)); curY1 = math.max(curY1, b(3))
      } else { lines += cur; cur = Vector(b); curY0 = b(2); curY1 = b(3) }
    }
    if (cur.nonEmpty) lines += cur

    val outLines = lines.result().map { lineBoxes =>
      // merge x-overlapping boxes left to right
      val merged = Vector.newBuilder[Array[Int]]
      var acc: Array[Int] = null
      for (b <- lineBoxes.sortBy(_(0))) {
        if (acc == null) acc = b.clone()
        else if (b(0) < acc(1)) {
          acc(1) = math.max(acc(1), b(1)); acc(2) = math.min(acc(2), b(2)); acc(3) = math.max(acc(3), b(3))
        } else { merged += acc; acc = b.clone() }
      }
      if (acc != null) merged += acc
      val glyphs = merged.result()
      val sb     = new StringBuilder
      if (glyphs.nonEmpty) {
        // space rule keyed to LINE HEIGHT (every glyph is 7 font units
        // tall, so height/7 recovers the unit): tight inter-letter gaps
        // are at most 3 units (two empty side columns + pitch, 1 unit when
        // proportional), word gaps at least 5 — a 4-unit threshold splits
        // them regardless of how many narrow glyphs the line contains.
        val lineH    = glyphs.map(_(3)).max - glyphs.map(_(2)).min
        val spaceGap = lineH * 4.0 / 7.0
        var prevEnd  = -1
        glyphs.foreach { case Array(x0, x1, gy0, gy1) =>
          if (prevEnd >= 0 && (x0 - prevEnd) > spaceGap) sb.append(' ')
          prevEnd = x1
          // tight box for THIS glyph; match in each template shape's own
          // grid, best mean |template − cell darkness| wins — continuous
          // cells cost ~0.5 where quantization is genuinely ambiguous
          // instead of a full flip
          val (ch, dist) = templatesByWidth.iterator.flatMap { case (gw, ts) =>
            val cell = normalize(darkness, gw, x0, x1, gy0, gy1)
            ts.iterator.map { case (c, t) =>
              c -> t.indices.map(i => math.abs((if (t(i)) 1.0 else 0.0) - cell(i))).sum / t.length
            }
          }.minBy(_._2)
          if (dist <= 0.23) { // ≥77% mean agreement, else noise
            sb.append(ch)
            accepted += 1
            distSum += dist
          }
        }
      }
      sb.result()
    }
    val text = outLines.map(_.trim).filter(_.nonEmpty).mkString("\n")
    (text, accepted, if (accepted > 0) distSum / accepted else Double.MaxValue)
  }

  /** Deterministic fixture renderer for the same font: uppercase A–Z, 0–9
    * and spaces, `unit` px per font pixel, 1-unit letter gaps, 5-unit word
    * gaps, 2-unit line gaps, 2-unit margin. Returns PNG bytes. Drives the
    * OCR tests and generates S7 fixtures without any image library.
    */
  def renderPng(text: String, unit: Int = 3): Array[Byte] = {
    val lines = text.toUpperCase(java.util.Locale.ROOT).split("\n", -1).toSeq
    def lineWidth(l: String): Int = l.foldLeft(0) { (acc, c) =>
      acc + (if (c == ' ') 5 * unit else 5 * unit + unit)
    }
    val wPx = math.max(lines.map(lineWidth).max, unit) + 4 * unit
    val hPx = lines.length * (7 * unit + 2 * unit) + 2 * unit
    val img = new java.awt.image.BufferedImage(wPx, hPx, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until hPx; x <- 0 until wPx) img.setRGB(x, y, 0xffffff)
    lines.zipWithIndex.foreach { case (line, li) =>
      var x0 = 2 * unit
      val y0 = 2 * unit + li * (7 * unit + 2 * unit)
      line.foreach { c =>
        if (c == ' ') x0 += 5 * unit
        else {
          font.get(c).foreach { rows =>
            for (r <- 0 until 7; cc <- 0 until 5 if ((rows(r) >> (4 - cc)) & 1) == 1)
              for (dy <- 0 until unit; dx <- 0 until unit)
                img.setRGB(x0 + cc * unit + dx, y0 + r * unit + dy, 0x000000)
          }
          x0 += 5 * unit + unit
        }
      }
    }
    val bos = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Anti-aliased PROPORTIONAL renderer: glyphs advance by their tight
    * width (I and 1 are 3 font columns, W is 5) with 1-unit letter gaps
    * and 5-unit word gaps, rastered at `unitHi` px/unit and box-averaged
    * down by `down` — a non-integral effective unit (7/2 = 3.5 px) puts
    * genuine gray edge pixels on every stroke boundary, the shape
    * pytesseract sees from screen renders. Deterministic: no system fonts,
    * no Java2D antialiasing hints.
    */
  def renderPngAa(text: String, unitHi: Int = 7, down: Int = 2): Array[Byte] = {
    val lines = text.toUpperCase(java.util.Locale.ROOT).split("\n", -1).toSeq
    def tight(c: Char): (Int, Int) = { // (first dark col, tight width)
      val rows = font(c)
      def at(y: Int, x: Int) = ((rows(y) >> (4 - x)) & 1) == 1
      val cols = (0 until 5).filter(x => (0 until 7).exists(y => at(y, x)))
      (cols.head, cols.last + 1 - cols.head)
    }
    def lineWidth(l: String): Int = l.foldLeft(0) { (acc, c) =>
      acc + (if (c == ' ') 5 * unitHi else (tight(c)._2 + 1) * unitHi)
    }
    val wHi = math.max(lines.map(lineWidth).max, unitHi) + 4 * unitHi
    val hHi = lines.length * (7 * unitHi + 2 * unitHi) + 2 * unitHi
    val big = Array.fill(hHi, wHi)(255)
    lines.zipWithIndex.foreach { case (line, li) =>
      var x0 = 2 * unitHi
      val y0 = 2 * unitHi + li * (7 * unitHi + 2 * unitHi)
      line.foreach { c =>
        if (c == ' ') x0 += 5 * unitHi
        else
          font.get(c).foreach { rows =>
            val (c0, tw) = tight(c)
            for (r <- 0 until 7; cc <- 0 until tw if ((rows(r) >> (4 - (c0 + cc))) & 1) == 1)
              for (dy <- 0 until unitHi; dx <- 0 until unitHi)
                big(y0 + r * unitHi + dy)(x0 + cc * unitHi + dx) = 0
            x0 += (tw + 1) * unitHi
          }
      }
    }
    val wLo = (wHi + down - 1) / down
    val hLo = (hHi + down - 1) / down
    val img = new java.awt.image.BufferedImage(wLo, hLo, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until hLo; x <- 0 until wLo) {
      var sum = 0
      var n   = 0
      for (dy <- 0 until down; dx <- 0 until down) {
        val sy = y * down + dy
        val sx = x * down + dx
        if (sy < hHi && sx < wHi) { sum += big(sy)(sx); n += 1 }
      }
      val g = sum / n
      img.setRGB(x, y, (g << 16) | (g << 8) | g)
    }
    val bos = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Deterministic "bad photocopy" degradation for fixtures: rotate the
    * page by `angleDeg` (the scanner tilt), apply an uneven-illumination
    * ramp — ink FADES up by `fade` gray levels on the left while the
    * background SHADES down by `shadow` on the right, so past ~half the
    * gray range no single global threshold separates ink from paper
    * anywhere on the page — then sprinkle `noisePer10k` LCG speckles per
    * 10k pixels (dark dust on paper, light pinholes in ink). Returns PNG
    * bytes; same-input → same-output.
    */
  def degradeScan(
      png: Array[Byte], angleDeg: Double, fade: Int, shadow: Int,
      noisePer10k: Int = 0, seed: Long = 0x5DEECE66DL,
  ): Array[Byte] = {
    val img = javax.imageio.ImageIO.read(new ByteArrayInputStream(png))
    val w   = img.getWidth
    val h   = img.getHeight
    val lum = Array.tabulate(h, w)((y, x) => img.getRGB(x, y) & 0xff)
    val rot = if (angleDeg != 0.0) rotate(lum, w, h, angleDeg) else lum
    val out = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val frac = x.toDouble / math.max(1, w - 1)
      val l = math.max(0, math.min(255,
        rot(y)(x) + (fade * (1.0 - frac)).toInt - (shadow * frac).toInt))
      out.setRGB(x, y, l * 0x10101)
    }
    var st = seed
    def next(): Long = { st = st * 6364136223846793005L + 1442695040888963407L; st >>> 33 }
    val nNoise = (w.toLong * h * noisePer10k / 10000).toInt
    for (_ <- 0 until nNoise) {
      val x   = (next() % w).toInt
      val y   = (next() % h).toInt
      val cur = out.getRGB(x, y) & 0xff
      val l   = if (cur > 128) cur - 90 else cur + 90
      out.setRGB(x, y, l * 0x10101)
    }
    val bos = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(out, "png", bos)
    bos.toByteArray
  }
}
