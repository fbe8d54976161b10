package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Ingestion sources (SURVEY §2.1 S1, S6, S8–S10). The reference's binary
  * extractors (PDF/DOCX/PPTX/OCR — S2-S5/S7) need native libs that are out
  * of a Spark-core engine's scope (SURVEY marks them non-oracle); the
  * text-family extractors below are full re-expressions:
  *
  *  - S6 CSV: `spark.read.csv` + the reference's "a | b | c" row join
  *    (backend/extractors/csv_extractor.py:74-80); Spark's distributed CSV
  *    reader replaces the driver-side sniffer (delimiter passed explicitly).
  *  - S8 text/markdown: `wholetext` read (backend/extractors/text_extractor.py:14-24).
  *  - S9 code: `wholetext` + language-from-extension metadata
  *    (backend/extractors/code_extractor.py:14-28).
  *  - S10 C#: S9 + line_count/file_size/namespace sniff from the first 20
  *    lines (backend/extractors/cs_extractor.py:41-45).
  *  - S1 factory: extension → extractor routing with unknown-ext error
  *    (backend/extractors/factory.py:22-71), as a pure column expression.
  */
object FileSources {

  /** S1 — extension → extractor name, derived from the pluggable
    * [[Extractors.defaultRegistry]] (the same instances [[Extractors
    * .extractAll]] dispatches to, so routing and execution can't drift);
    * unknown extensions map to an error marker instead of throwing, so a
    * batch with one bad file still flows.
    */
  def extractorFor(ext: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    Extractors.defaultRegistry.foldLeft(lit(null).cast("string")) { case (acc, (e, x)) =>
      when(lower(ext) === e, lit(x.name)).otherwise(acc)
    }.as("extractor")

  /** S6 — CSV file → one document: rows rendered "a | b | c" (reference row
    * join), joined by newline in first-column order; row/col counts as
    * metadata.
    */
  def csvDocument(spark: SparkSession, path: String, orderCol: String): DataFrame = {
    val df   = spark.read.option("header", "true").csv(path)
    val cols = df.columns
    val rendered = df.select(
      col(orderCol).cast("long").as("__ord"),
      // coalesce each cell: Spark reads empty CSV cells as null and
      // concat_ws SKIPS nulls, which would silently drop the cell and
      // misalign the ' | ' columns (the reference renders empties as '')
      concat_ws(" | ", cols.map(c => coalesce(col(c), lit(""))): _*).as("row_text"),
    )
    rendered.agg(
      array_join(transform(sort_array(collect_list(struct(col("__ord"), col("row_text")))), r => r("row_text")), "\n").as("text"),
      count(lit(1)).as("n_rows"),
    ).withColumn("n_cols", lit(cols.length).cast("long"))
  }

  /** S6 sniffer — bounded driver-side dialect detection mirroring Python's
    * `csv.Sniffer` (backend/extractors/csv_extractor.py:50-60): ONE read of
    * the first `sniffBytes` of the file on the driver (never the corpus —
    * the distributed read that follows uses the sniffed dialect), then
    *  - delimiter: the candidate (`,` `;` tab `|` `:`) whose per-line
    *    occurrence count is most CONSISTENT across sniffed lines (highest
    *    fraction of lines agreeing on the modal count, ties broken by the
    *    modal count, then candidate priority order — Sniffer's frequency-
    *    consistency idea);
    *  - header: Sniffer's type-shape vote, reduced to its decisive case —
    *    some column is numeric in every body row but not in row 1.
    * Returns (delimiter, hasHeader).
    */
  def sniffCsvDialect(
      spark: SparkSession, path: String, sniffBytes: Int = 64 * 1024): (String, Boolean) = {
    val p  = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    val buf = new Array[Byte](sniffBytes)
    val n = try {
      var off = 0
      var r   = 0
      while (off < sniffBytes && r >= 0) { r = in.read(buf, off, sniffBytes - off); if (r > 0) off += r }
      off
    } finally in.close()
    val text   = new String(buf, 0, math.max(n, 0), java.nio.charset.StandardCharsets.UTF_8)
    val lines0 = text.split("\r?\n", -1).toVector
    // a full buffer means the last line may be truncated mid-row — drop it
    val lines = (if (n == sniffBytes && lines0.length > 1) lines0.init else lines0)
      .filter(_.nonEmpty)
    require(lines.nonEmpty, s"cannot sniff an empty file: $path")
    val candidates = Seq(",", ";", "\t", "|", ":")
    def quoted(d: String) = java.util.regex.Pattern.quote(d)
    val delim = candidates.maxBy { d =>
      val counts = lines.map(l => quoted(d).r.findAllIn(l).size)
      val mode   = counts.groupBy(identity).maxBy { case (k, v) => (v.size, k) }._1
      if (mode == 0) (0.0, 0) else (counts.count(_ == mode).toDouble / counts.size, mode)
    }
    val rows  = lines.take(50).map(_.split(quoted(delim), -1).toVector)
    val width = rows.head.length
    val body  = rows.tail.filter(_.length == width)
    def numeric(s: String) = s.trim.nonEmpty && scala.util.Try(s.trim.toDouble).isSuccess
    val hasHeader = body.nonEmpty && (0 until width).exists { c =>
      body.forall(r => numeric(r(c))) && !numeric(rows.head(c))
    }
    (delim, hasHeader)
  }

  /** S6 with auto-detected dialect: [[sniffCsvDialect]] then the same
    * distributed render as [[csvDocument]], rows ordered by the FIRST
    * column (cast long — the sniffed-CSV contract mirrors the reference's
    * id-led exports). Headerless files render all rows; the synthesized
    * `_c*` names never appear in the text. Output adds the sniffed
    * (delimiter, has_header) as metadata columns.
    */
  def csvDocumentSniffed(spark: SparkSession, path: String): DataFrame = {
    val (delim, hasHeader) = sniffCsvDialect(spark, path)
    val df   = spark.read.option("header", hasHeader.toString).option("sep", delim).csv(path)
    val cols = df.columns
    df.select(
        col(cols.head).cast("long").as("__ord"),
        concat_ws(" | ", cols.map(c => coalesce(col(c), lit(""))): _*).as("row_text"),
      )
      .agg(
        array_join(transform(sort_array(collect_list(struct(col("__ord"), col("row_text")))), r => r("row_text")), "\n").as("text"),
        count(lit(1)).as("n_rows"),
      )
      .withColumn("n_cols", lit(cols.length).cast("long"))
      .withColumn("delimiter", lit(delim))
      .withColumn("has_header", lit(hasHeader))
  }

  /** S5 — XLSX modeled as one CSV per sheet (SURVEY §2.1: `spark.read.excel`
    * is not core, so the workbook text rendering is re-expressed over CSV
    * sheets): each sheet renders as "Sheet: <name>" + 20-dash rule + " | "
    * rows (the reference's separator format,
    * backend/extractors/xlsx_extractor.py:46-58), sheets joined by blank
    * lines; metadata = sheet_count + per-sheet row counts.
    */
  def xlsxModeled(spark: SparkSession, sheets: Seq[(String, String)], orderCol: String): DataFrame = {
    val rendered = sheets.zipWithIndex.map { case ((name, path), idx) =>
      csvDocument(spark, path, orderCol)
        .select(
          concat(lit(s"Sheet: $name\n"), lit("-" * 20), lit("\n"), col("text")).as("sheet_text"),
          col("n_rows"),
        )
        // WORKBOOK order (the caller's Seq), not alphabetical sheet-name
        // order — the reference renders sheets as the workbook lists them
        .withColumn("sheet_pos", lit(idx))
    }
    rendered.reduce(_ unionByName _)
      .agg(
        array_join(transform(sort_array(collect_list(struct(col("sheet_pos"), col("sheet_text")))), r => r("sheet_text")), "\n\n").as("text"),
        count(lit(1)).cast("long").as("sheet_count"),
        sum(col("n_rows")).cast("long").as("total_rows"),
      )
  }

  /** S8/S9 — whole-file text rows: (file_name, text). */
  def wholeTextFiles(spark: SparkSession, dir: String): DataFrame =
    spark.read.option("wholetext", "true").text(dir)
      .withColumn("file_name", regexp_extract(input_file_name(), "([^/]+)$", 1))
      .withColumnRenamed("value", "text")

  /** S21 — JSONL corpus scan (the standard LLM training-corpus
    * interchange format): newline-delimited JSON with an EXPLICIT schema —
    * inference would scan the corpus twice and lock the job to whatever
    * fields the first shards happened to carry. Gzip shards decompress by
    * extension through the same reader (Hadoop codec), so mixed
    * plain/.gz shard directories — the normal corpus layout — read in one
    * pass. `columnNameOfCorruptRecord` kept default-null-dropping is NOT
    * used: PERMISSIVE + a corrupt-record column would silently null every
    * field on one bad line, so FAILFAST is the right corpus-ingest
    * default (a bad shard should stop the job, not poison the corpus).
    */
  def jsonlScan(
      spark: SparkSession,
      dir: String,
      schema: org.apache.spark.sql.types.StructType,
      failFast: Boolean = true,
  ): DataFrame =
    spark.read
      .schema(schema)
      .option("mode", if (failFast) "FAILFAST" else "PERMISSIVE")
      .json(dir)

  /** S9 — code scan: language = raw extension (reference keeps the ext). */
  def codeScan(spark: SparkSession, dir: String): DataFrame =
    wholeTextFiles(spark, dir)
      .withColumn("language", regexp_extract(col("file_name"), "\\.(\\w+)$", 1))
      .withColumn("n_lines", size(split(col("text"), "\n", -1)).cast("long"))

  /** S10 — C# scan: namespace sniffed from the first 20 lines; line count
    * uses Python-splitlines semantics ("a\nb\n" = 2 lines, "" = 0) for
    * parity with the reference's cs metadata
    * (backend/extractors/cs_extractor.py:32) — unlike S8/S9's library-defined
    * split-based n_lines.
    */
  def csScan(spark: SparkSession, dir: String): DataFrame =
    codeScan(spark, dir)
      .where(col("language") === "cs")
      .withColumn("n_lines",
        when(length(col("text")) === 0, 0L)
          .otherwise(size(split(regexp_replace(col("text"), "\n$", ""), "\n", -1)).cast("long")))
      .withColumn("namespace",
        regexp_extract(array_join(slice(split(col("text"), "\n", -1), 1, 20), "\n"), "namespace\\s+([\\w.]+)", 1))
      .withColumn("file_size", length(col("text")).cast("long"))
}
