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
  * matching against a built-in 5×7 uppercase bitmap font. It reads clean
  * machine-rendered text (screenshots, rendered labels, generated
  * fixtures) deterministically; scanned-paper recognition remains a
  * declared non-goal (bind a real engine through the same seam).
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
  /** Majority-sample a boolean raster's box onto a gw×7 grid. Image glyphs
    * are sampled into each candidate template's TIGHT grid shape, so a
    * narrow glyph (I, 1 — 3 font columns) is compared 3-to-3, never
    * stretched through a lossy, scale-dependent 5-wide resampling.
    */
  private def normalize(darkAt: (Int, Int) => Boolean, gw: Int, x0: Int, x1: Int, y0: Int, y1: Int): Array[Boolean] =
    Array.tabulate(gw * 7) { i =>
      val (r, c) = (i / gw, i % gw)
      val xa = x0 + (c * (x1 - x0)) / gw;   val xb = math.max(xa + 1, x0 + ((c + 1) * (x1 - x0)) / gw)
      val ya = y0 + (r * (y1 - y0)) / 7;    val yb = math.max(ya + 1, y0 + ((r + 1) * (y1 - y0)) / 7)
      var darkN = 0
      for (y <- ya until yb; x <- xa until xb) if (darkAt(y, x)) darkN += 1
      darkN * 2 >= (xb - xa) * (yb - ya)
    }

  /** tight width → templates cropped to their dark columns (gw×7 cells). */
  private val templatesByWidth: Map[Int, Array[(Char, Array[Boolean])]] =
    font.toArray.sortBy(_._1).map { case (c, rows) =>
      def at(y: Int, x: Int) = ((rows(y) >> (4 - x)) & 1) == 1
      val cols = (0 until 5).filter(x => (0 until 7).exists(y => at(y, x)))
      val gw   = cols.last + 1 - cols.head
      (gw, c, Array.tabulate(gw * 7)(i => at(i / gw, cols.head + i % gw)))
    }.groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3))).toMap

  def recognize(content: Array[Byte], width: Long, height: Long): String = {
    val img = javax.imageio.ImageIO.read(new ByteArrayInputStream(content))
    if (img == null) return "" // format ImageIO can't decode (e.g. WEBP)
    val w = img.getWidth
    val h = img.getHeight
    // grayscale + midpoint threshold — the reference's preprocess step
    val lum = Array.ofDim[Int](h, w)
    var lo  = 255
    var hi  = 0
    for (y <- 0 until h; x <- 0 until w) {
      val rgb = img.getRGB(x, y)
      val l   = (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3
      lum(y)(x) = l
      if (l < lo) lo = l
      if (l > hi) hi = l
    }
    if (hi - lo < 32) return "" // no contrast → no text
    val cut = (lo + hi) / 2
    def dark(y: Int, x: Int) = lum(y)(x) < cut

    // line segmentation: maximal y-runs with at least one dark pixel
    def runs(n: Int, any: Int => Boolean): Vector[(Int, Int)] = {
      val out = Vector.newBuilder[(Int, Int)]
      var s   = -1
      for (i <- 0 until n) {
        if (any(i) && s < 0) s = i
        if (!any(i) && s >= 0) { out += ((s, i)); s = -1 }
      }
      if (s >= 0) out += ((s, n))
      out.result()
    }
    val lines = runs(h, y => (0 until w).exists(x => dark(y, x)))

    val outLines = lines.map { case (y0, y1) =>
      val sb     = new StringBuilder
      val glyphs = runs(w, x => (y0 until y1).exists(y => dark(y, x)))
      if (glyphs.nonEmpty) {
        // space rule keyed to LINE HEIGHT (every glyph is 7 font units
        // tall, so height/7 recovers the unit): tight inter-letter gaps
        // are at most 3 units (two empty side columns + pitch), word gaps
        // at least 5 — a 4-unit threshold splits them regardless of how
        // many narrow glyphs the line happens to contain.
        val spaceGap = (y1 - y0) * 4.0 / 7.0
        var prevEnd  = -1
        glyphs.foreach { case (x0, x1) =>
          if (prevEnd >= 0 && (x0 - prevEnd) > spaceGap) sb.append(' ')
          prevEnd = x1
          // tight vertical box for THIS glyph; match in each template
          // shape's own grid, best normalized distance wins
          val ys = (y0 until y1).filter(y => (x0 until x1).exists(x => dark(y, x)))
          val (ch, dist) = templatesByWidth.iterator.flatMap { case (gw, ts) =>
            val cell = normalize(dark, gw, x0, x1, ys.head, ys.last + 1)
            ts.iterator.map { case (c, t) =>
              c -> t.indices.count(i => t(i) != cell(i)).toDouble / t.length
            }
          }.minBy(_._2)
          if (dist <= 0.23) sb.append(ch) // ≥77% of cells agree, else noise
        }
      }
      sb.result()
    }
    outLines.map(_.trim).filter(_.nonEmpty).mkString("\n")
  }

  /** Deterministic fixture renderer for the same font: uppercase A–Z, 0–9
    * and spaces, `unit` px per font pixel, 1-unit letter gaps, 5-unit word
    * gaps, 2-unit line gaps, 2-unit margin. Returns PNG bytes. Drives the
    * OCR tests and generates S7 fixtures without any image library.
    */
  def renderPng(text: String, unit: Int = 3): Array[Byte] = {
    val lines = text.toUpperCase.split("\n", -1).toSeq
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
}
