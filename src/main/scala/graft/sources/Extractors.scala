package graft.sources

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Pluggable binary-extraction seam mirroring the reference's BaseExtractor
  * contract (backend/extractors/base.py:10-26: file → (text, metadata)) and
  * ExtractorFactory extension map (backend/extractors/factory.py:22-46).
  *
  * The text-family extractors (S8/S9/S10 + the per-file CSV form of S6) are
  * complete JVM re-expressions, and the binary document formats
  * (PDF/DOCX/PPTX/XLSX — S2/S3/S4/S5) are real pure-JVM parsers in
  * [[BinaryExtractors]] (`java.util.zip` containers + FlateDecode + targeted
  * XML/content-stream pulls — no external libraries). Images (S7) get real
  * header metadata (PNG/JPEG/GIF/WebP dimensions + mode via [[ImageMeta]]);
  * only the character-recognition half stays a pluggable [[Ocr]] seam —
  * OCR genuinely needs a native engine (tesseract), which production binds
  * via `new ImageExtractor(myOcr)` in a custom registry without touching
  * the engine.
  */
trait Extractor extends Serializable {

  /** Extractor class name — what the S1 factory routes on / reports. */
  def name: String

  /** File bytes + original file name → (extracted text, metadata). */
  def extract(content: Array[Byte], fileName: String): (String, Map[String, String])
}

object Extractors {

  private def decode(content: Array[Byte]): String =
    new String(content, StandardCharsets.UTF_8)

  private[sources] def extOf(fileName: String): String = {
    val base = fileName.substring(fileName.lastIndexOf('/') + 1)
    val i    = base.lastIndexOf('.')
    if (i < 0) "" else base.substring(i + 1).toLowerCase(java.util.Locale.ROOT)
  }

  /** S8 (text_extractor.py:15-22). JVM UTF-8 decode substitutes malformed
    * bytes with U+FFFD where Python's errors='ignore' drops them — a
    * declared deviation, invisible on valid UTF-8 input.
    */
  final class TextExtractor extends Extractor {
    val name = "TextExtractor"
    def extract(content: Array[Byte], fileName: String): (String, Map[String, String]) =
      (decode(content), Map("encoding" -> "utf-8"))
  }

  /** S9 (code_extractor.py:15-28): raw text + language-from-extension. */
  final class CodeExtractor extends Extractor {
    val name = "CodeExtractor"
    def extract(content: Array[Byte], fileName: String): (String, Map[String, String]) =
      (decode(content), Map("language" -> extOf(fileName)))
  }

  /** S10 (cs_extractor.py:16-50): language/file_size/line_count metadata +
    * namespace sniff over the first 20 lines.
    */
  final class CsExtractor extends Extractor {
    val name = "CsExtractor"
    def extract(content: Array[Byte], fileName: String): (String, Map[String, String]) = {
      val text = decode(content)
      val base = Map(
        "language"   -> "cs",
        "file_size"  -> content.length.toString,
        "line_count" -> text.linesIterator.size.toString,
      )
      val ns = text.linesIterator.take(20).map(_.trim)
        .collectFirst { case l if l.startsWith("namespace ") => l.split("\\s+")(1).stripSuffix(";") }
      (text, ns.fold(base)(n => base + ("namespace" -> n)))
    }
  }

  /** Per-file CSV form of S6 (csv_extractor.py:74-80 " | " row render);
    * the distributed form is [[FileSources.csvDocument]]. Naive comma split
    * — the reference's dialect sniffer is modeled by the explicit delimiter
    * option of the distributed reader.
    */
  final class CsvExtractor extends Extractor {
    val name = "CsvExtractor"
    def extract(content: Array[Byte], fileName: String): (String, Map[String, String]) = {
      val lines = decode(content).linesIterator.toVector
      val text  = lines.drop(1).map(_.split(",", -1).mkString(" | ")).mkString("\n")
      val nCols = lines.headOption.map(_.split(",", -1).length).getOrElse(0)
      (text, Map("row_count" -> (lines.length - 1).max(0).toString, "column_count" -> nCols.toString))
    }
  }

  /** Registration point for formats whose parsers aren't bundled: routing
    * works (S1 reports the right extractor), extraction fails loudly until
    * a production instance is registered.
    */
  final class Unbound(val name: String, format: String) extends Extractor {
    def extract(content: Array[Byte], fileName: String): (String, Map[String, String]) =
      throw new UnsupportedOperationException(
        s"$name: $format parsing needs a native library; supply a custom registry with a bound instance")
  }

  /** The reference's full 23-extension map (factory.py:22-46). */
  val defaultRegistry: Map[String, Extractor] = {
    val text = new TextExtractor
    val code = new CodeExtractor
    val img  = new ImageExtractor()
    val pptx = new PptxExtractor
    Map(
      "pdf"  -> new PdfExtractor,
      "docx" -> new DocxExtractor,
      "pptx" -> pptx, "ppt" -> pptx,
      "jpg"  -> img, "jpeg" -> img, "png" -> img, "webp" -> img,
      "xlsx" -> new XlsxExtractor,
      "txt"  -> text, "md" -> text,
      "py" -> code, "js" -> code, "java" -> code, "cpp" -> code, "html" -> code,
      "css" -> code, "json" -> code, "xml" -> code, "yaml" -> code, "yml" -> code,
      "cs"  -> new CsExtractor,
      "csv" -> new CsvExtractor,
    )
  }

  /** Factory dispatch (factory.py:48-71); None ⇔ the reference's
    * InvalidFileFormatError.
    */
  def forFile(fileName: String, registry: Map[String, Extractor] = defaultRegistry): Option[Extractor] =
    registry.get(extOf(fileName))

  final case class Extracted(
      file_name: String,
      extractor: String,
      text: String,
      metadata: Map[String, String],
      error: String,
  )

  /** Distributed extraction over a binaryFile scan: a narrow mapPartitions
    * pass (files decode on executors, nothing collects to the driver). Per
    * the reference's batch-ingest behavior, one bad file yields an error row
    * instead of failing the batch.
    */
  def extractAll(
      spark: SparkSession,
      binaries: DataFrame,
      registry: Map[String, Extractor] = defaultRegistry,
  ): Dataset[Extracted] = {
    import spark.implicits._
    binaries.select(col("file_name"), col("content"))
      .as[(String, Array[Byte])]
      .map { case (f, c) =>
        forFile(f, registry) match {
          case None => Extracted(f, null, null, Map.empty, s"unsupported extension: ${extOf(f)}")
          case Some(x) =>
            try { val (t, m) = x.extract(c, f); Extracted(f, x.name, t, m, null) }
            catch {
              // Class name included: getMessage alone is null for
              // message-less exceptions, which would make a failure row
              // indistinguishable from a success.
              case e: Exception =>
                Extracted(f, x.name, null, Map.empty,
                  s"${e.getClass.getName}: ${Option(e.getMessage).getOrElse("")}")
            }
        }
      }
  }
}
