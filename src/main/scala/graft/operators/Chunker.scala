package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** One emitted chunk (reference payload shape: backend/chunker.py:119-126 —
  * {text, chunk_index, token_count}; document linkage added by the caller).
  */
final case class Chunk(doc_id: Long, chunk_index: Int, text: String, token_count: Int, total_chunks: Int)

/** Input row for chunking (driver testdata `documents` schema). */
final case class DocRow(doc_id: Long, text: String, lang: String)

/** Generator-shaped (1 row → N rows) chunking operators, run as
  * `Dataset.flatMap` so Spark distributes them per-partition with no shuffle.
  *
  * Semantics mirror the reference chunker:
  *  - token counting: whitespace split (reference: backend/chunker.py:31 —
  *    the declared v1 semantic per SURVEY §2.7 C1);
  *  - sentence split regex (backend/chunker.py:89);
  *  - greedy sentence packing to ≤ maxTokens per chunk (backend/chunker.py:109-133);
  *  - overlap: backtrack whole sentences until ≥ overlapTokens, never all of
  *    them — the infinite-loop guard (backend/chunker.py:135-152);
  *  - oversized single sentences: greedy word packing (backend/chunker.py:33-61);
  *  - code files: top-level-block splitting by indentation/keyword boundaries,
  *    the declared JVM deviation from Python-AST chunking
  *    (backend/chunker.py:156-211; fallback mirror of 206-209).
  */
object Chunker extends Serializable {

  val MaxTokens     = 500
  val OverlapTokens = 50

  /** Whitespace token count — C1's declared fallback semantic. */
  def countTokens(text: String): Int = {
    val t = text.trim
    if (t.isEmpty) 0 else t.split("\\s+").length
  }

  private val SentenceSplit = "(?<=[.!?])\\s+(?=[A-Z])|(?<=[.!?])\\s*$"

  def splitSentences(text: String): Vector[String] =
    text.split(SentenceSplit).iterator.map(_.trim).filter(_.nonEmpty).toVector

  /** Greedy word-packing of an oversized sentence into ≤ maxTokens pieces
    * (reference: backend/chunker.py:33-61). Words pack by cumulative
    * `counter` cost; under the whitespace counter every word costs 1, so
    * this is exactly fixed-size grouping.
    */
  def splitOversized(
      sentence: String,
      maxTokens: Int = MaxTokens,
      counter: TokenCounter = TokenCounters.Whitespace,
  ): Vector[String] = {
    val words = sentence.trim.split("\\s+").filter(_.nonEmpty)
    val out   = Vector.newBuilder[String]
    val cur   = Vector.newBuilder[String]
    var n     = 0
    var size  = 0
    for (w <- words) {
      val c = math.max(counter.count(w), 1)
      if (size > 0 && n + c > maxTokens) {
        out += cur.result().mkString(" "); cur.clear(); n = 0; size = 0
      }
      cur += w; n += c; size += 1
    }
    if (size > 0) out += cur.result().mkString(" ")
    out.result()
  }

  /** Prose chunker (reference: backend/chunker.py:83-154). Deterministic.
    * `counter` is the C1 seam: whitespace (the oracle semantic) by default,
    * [[TokenCounters.WordPiece]] for HF-parity boundaries when a vocab is
    * available — same packing/overlap logic either way.
    */
  def chunkProse(
      text: String,
      maxTokens: Int = MaxTokens,
      overlapTokens: Int = OverlapTokens,
      counter: TokenCounter = TokenCounters.Whitespace,
  ): Vector[(String, Int)] = {
    val sentences0 = splitSentences(text)
    val sentences =
      (if (sentences0.isEmpty && text.trim.nonEmpty) Vector(text.trim) else sentences0)
        .flatMap(s => if (counter.count(s) > maxTokens) splitOversized(s, maxTokens, counter) else Vector(s))
    if (sentences.isEmpty) return Vector.empty

    val counts = sentences.map(counter.count)
    val chunks = Vector.newBuilder[(String, Int)]
    var current = Vector.empty[Int] // indices of sentences in the current chunk
    var currentTokens = 0

    def flush(): Unit = if (current.nonEmpty) {
      val textOut = current.map(sentences).mkString(" ")
      chunks += ((textOut, currentTokens))
    }

    var i = 0
    while (i < sentences.length) {
      if (currentTokens + counts(i) > maxTokens && current.nonEmpty) {
        flush()
        // Overlap: walk back whole sentences until >= overlapTokens, but
        // never take ALL of the previous chunk (infinite-loop guard,
        // reference: backend/chunker.py:135-152).
        var keep = Vector.empty[Int]
        var keepTokens = 0
        var j = current.length - 1
        while (j > 0 && keepTokens < overlapTokens) {
          keep = current(j) +: keep
          keepTokens += counts(current(j))
          j -= 1
        }
        current = keep
        currentTokens = keepTokens
        // Do NOT append sentence i yet: re-enter the size check with the
        // overlap as the current chunk, mirroring the reference's return
        // into its packing loop (backend/chunker.py:135-152). If the
        // overlap + sentence i still exceeds maxTokens, the overlap-only
        // chunk is flushed (keep shrinks strictly each pass — terminates),
        // so no chunk ever exceeds maxTokens.
      } else {
        current = current :+ i
        currentTokens += counts(i)
        i += 1
      }
    }
    flush()
    chunks.result()
  }

  private val CodeBoundary = "^(def |async def |class |@|function |public |private |protected |static |fn |object |trait )".r

  /** Code chunker: split at unindented top-level boundaries, then pack blocks
    * greedily to ≤ maxTokens (declared deviation from the reference's
    * Python-AST walk — same packing, regex/indentation boundaries).
    */
  def chunkCode(
      text: String,
      maxTokens: Int = MaxTokens,
      counter: TokenCounter = TokenCounters.Whitespace,
  ): Vector[(String, Int)] = {
    val lines = text.split("\n", -1)
    val blocks = Vector.newBuilder[String]
    val cur = new StringBuilder
    // a block holding ONLY decorator lines so far must not flush at the
    // next boundary: "@dec\ndef f()" is one construct (Python binds the
    // decorator to the def below it — ast.parse never separates them;
    // splitting here was the worst of the declared regex-boundary
    // deviations, reference backend/chunker.py:162)
    var onlyDecorators = true
    // Logical-line tracking, the ast.parse properties a physical-line
    // scanner can recover: (1) triple-quoted strings — a line inside a
    // docstring is never a boundary, however def-like it looks; (2) PAREN
    // DEPTH — a decorator or signature spanning parens ("@app.route(\n
    // ...)\ndef f():", "def f(a,\n b):") is ONE logical line, so its
    // continuation lines neither open a boundary nor demote the pending
    // decorator; (3) trailing-backslash continuations. The char scanner
    // skips `#` comments and single-line string bodies so a "(" in either
    // never skews the depth. Still naive about parens inside f-string
    // replacement fields — the right trade for a line scanner.
    var inTriple: String      = null
    var depth                 = 0
    var backslashCont         = false
    // non-zero: the next line STARTS inside this single-quoted string (the
    // previous line ended with a newline-escaping backslash mid-string).
    // Without this the continuation line was scanned as CODE, so brackets
    // or quotes in the string's remainder corrupted `depth`/string state
    // and could merge the whole rest of the file into one block.
    var inSingle: Char        = 0
    // scan a 1-quoted string body from `start`; returns the index after
    // the closing quote. A trailing backslash legally escapes the newline
    // ('start \<NL>rest' — ast.parse keeps the statement one node): mark
    // the continuation AND remember the open quote so the next line
    // resumes INSIDE the string. Unterminated with no trailing backslash
    // is a Python syntax error — recover at code level.
    def scanStringBody(line: String, start: Int, q: Char): Int = {
      var i = start
      inSingle = 0
      while (i < line.length) {
        if (line.charAt(i) == '\\') {
          if (i == line.length - 1) { backslashCont = true; inSingle = q; return line.length }
          i += 2
        } else if (line.charAt(i) == q) return i + 1
        else i += 1
      }
      i
    }
    def scanLine(line: String): Unit = {
      backslashCont = false
      var i = if (inSingle != 0) scanStringBody(line, 0, inSingle) else 0
      while (i < line.length) {
        if (inTriple != null) {
          if (line.startsWith(inTriple, i)) { inTriple = null; i += 3 } else i += 1
        } else {
          val ch = line.charAt(i)
          if (ch == '#') i = line.length
          else if (ch == '"' || ch == '\'') {
            val q = ch.toString
            if (line.startsWith(q * 3, i)) { inTriple = q * 3; i += 3 }
            else i = scanStringBody(line, i + 1, ch)
          } else if (ch == '(' || ch == '[' || ch == '{') { depth += 1; i += 1 }
          else if (ch == ')' || ch == ']' || ch == '}') { depth = math.max(0, depth - 1); i += 1 }
          else if (ch == '\\' && i == line.length - 1) { backslashCont = true; i += 1 }
          else i += 1
        }
      }
    }
    for (line <- lines) {
      val isContinuation = inTriple != null || depth > 0 || backslashCont
      val isBoundary = !isContinuation &&
        CodeBoundary.findFirstIn(line).isDefined && !line.startsWith(" ") && !line.startsWith("\t")
      if (isBoundary && cur.nonEmpty && !onlyDecorators) {
        blocks += cur.result(); cur.clear(); onlyDecorators = true
      }
      if (cur.nonEmpty) cur.append('\n')
      cur.append(line)
      if (!isContinuation && line.trim.nonEmpty && !line.startsWith("@")) onlyDecorators = false
      scanLine(line)
    }
    if (cur.nonEmpty) blocks += cur.result()
    val bs = blocks.result().map(_.trim).filter(_.nonEmpty)
    if (bs.isEmpty) return Vector.empty

    // Greedy block packing, oversized blocks fall back to prose chunking
    // (reference fallback: backend/chunker.py:206-209).
    val packed = Vector.newBuilder[(String, Int)]
    var acc = Vector.empty[String]
    var accTokens = 0
    def flush(): Unit = if (acc.nonEmpty) { packed += ((acc.mkString("\n\n"), accTokens)); acc = Vector.empty; accTokens = 0 }
    for (b <- bs) {
      val n = counter.count(b)
      if (n > maxTokens) { flush(); packed ++= chunkProse(b, maxTokens, 0, counter) }
      else {
        if (accTokens + n > maxTokens) flush()
        acc = acc :+ b; accTokens += n
      }
    }
    flush()
    packed.result()
  }

  /** Only py/python route to the code chunker, matching the reference exactly
    * (backend/chunker.py:77-80: `if is_code and language in ["py","python"]`).
    * js/java/cpp/javascript fall through to prose there too.
    */
  private val CodeLangs = Set("py", "python")

  /** Code-vs-prose dispatch (reference: backend/chunker.py:63-81). */
  def chunkDocument(
      doc: DocRow,
      maxTokens: Int = MaxTokens,
      counter: TokenCounter = TokenCounters.Whitespace,
  ): Vector[Chunk] = {
    val pieces =
      if (doc.lang != null && CodeLangs.contains(doc.lang.toLowerCase(java.util.Locale.ROOT)))
        chunkCode(Option(doc.text).getOrElse(""), maxTokens, counter)
      else chunkProse(Option(doc.text).getOrElse(""), maxTokens, counter = counter)
    // total_chunks rides along from generation: a document's chunks are all
    // emitted here, so the registry/payload count costs no shuffle later.
    pieces.zipWithIndex.map { case ((t, n), i) => Chunk(doc.doc_id, i, t, n, pieces.length) }
  }

  /** Distributed chunking: documents(doc_id, text, lang) → chunks. Narrow
    * (no shuffle); scales linearly with input partitions.
    */
  def chunk(
      spark: SparkSession,
      documents: DataFrame,
      maxTokens: Int = MaxTokens,
      counter: TokenCounter = TokenCounters.Whitespace,
  ): Dataset[Chunk] = {
    import spark.implicits._
    graft.Par.fanOut(documents.selectExpr("doc_id", "text", "lang"))
      .as[DocRow]
      .flatMap(chunkDocument(_, maxTokens, counter))
  }

  // ------------------------------------------------------------------
  // Semantic chunking (adjacent-sentence similarity breakpoints)
  // ------------------------------------------------------------------

  /** Adjacent-sentence similarity strategy for [[semanticChunks]]. The
    * batch shape (all of one document's sentences at once) lets an
    * embedding-backed implementation amortize one model call per document
    * instead of one per boundary.
    */
  trait AdjacentSimilarity extends Serializable {
    /** `n` sentences in → `n − 1` similarities, entry `i` scoring the
      * boundary between sentence `i` and sentence `i + 1`.
      */
    def adjacentSims(sents: IndexedSeq[String]): IndexedSeq[Double]
  }

  /** Engine-portable default similarity: cosine over DISTINCT lowercase
    * alphanumeric token sets, `|A∩B| / sqrt(|A|·|B|)` (0 when either set
    * is empty). Integer set sizes in, one IEEE mul/sqrt/div out — a SQL
    * engine replays the decision bit-identically, which is what lets the
    * chunk boundaries themselves be value-checked by the oracle.
    */
  object TokenSetCosine extends AdjacentSimilarity {
    def tokenSet(s: String): Set[String] =
      s.toLowerCase(java.util.Locale.ROOT).split("[^a-z0-9]+").iterator.filter(_.nonEmpty).toSet
    override def adjacentSims(sents: IndexedSeq[String]): IndexedSeq[Double] = {
      val sets = sents.map(tokenSet)
      (0 until sents.length - 1).map { i =>
        val (a, b) = (sets(i), sets(i + 1))
        if (a.isEmpty || b.isEmpty) 0.0
        else a.intersect(b).size / math.sqrt(a.size.toDouble * b.size)
      }
    }
  }

  /** Embedding-backed similarity: batch-embed the document's sentences
    * (one [[Embedder]] call per doc — the ONNX seam drops in here at
    * deployment) and take the cosine of adjacent vectors. Embedder outputs
    * are L2-normalized, so cosine is a plain dot product.
    */
  final class EmbeddingCosine(embedder: Embedder = Embedder.default) extends AdjacentSimilarity {
    override def adjacentSims(sents: IndexedSeq[String]): IndexedSeq[Double] = {
      val vs = embedder.embedBatch(sents).toIndexedSeq
      (0 until sents.length - 1).map { i =>
        val (a, b) = (vs(i), vs(i + 1))
        var d = 0.0; var j = 0
        while (j < a.length) { d += a(j).toDouble * b(j); j += 1 }
        d
      }
    }
  }

  /** One semantic chunk: a maximal run of sentences whose adjacent
    * similarities all stay ≥ the threshold.
    */
  final case class SemanticChunk(
      doc_id: Long, chunk_index: Int, text: String, n_sentences: Int, token_count: Int)

  /** Per-document semantic split (pure, driver/executor-agnostic): RE2-safe
    * sentinel sentence split (the [[graft.operators.Dedup.dedupSentences]]
    * splitter — `([.!?])[ \t\r\n]+` inserts a sentinel, split on it; no
    * lookbehind, so a SQL engine replays it with two regex calls), trim,
    * drop empties, then break BEFORE sentence `i+1` whenever
    * `sim(i, i+1) < threshold`. Chunk text rejoins with a single space;
    * `token_count` counts `[ \t\r\n]+`-separated tokens of the rejoined
    * text (≡ the sum over member sentences, since members are trimmed and
    * non-empty).
    */
  def semanticChunkDoc(
      docId: Long,
      text: String,
      threshold: Double,
      sim: AdjacentSimilarity = TokenSetCosine,
  ): Vector[SemanticChunk] = {
    val sentinel = ""
    val sents = Option(text).getOrElse("")
      .replaceAll("([.!?])[ \t\r\n]+", "$1" + sentinel)
      .split(sentinel, -1)
      .iterator.map(_.trim).filter(_.nonEmpty).toIndexedSeq
    if (sents.isEmpty) return Vector.empty
    val sims = sim.adjacentSims(sents)
    val out  = Vector.newBuilder[SemanticChunk]
    var start = 0
    var idx   = 0
    def flush(end: Int): Unit = { // [start, end) → one chunk
      val t = sents.slice(start, end).mkString(" ")
      out += SemanticChunk(docId, idx, t, end - start,
        t.split("[ \t\r\n]+").count(_.nonEmpty))
      idx += 1
      start = end
    }
    for (i <- sims.indices) if (sims(i) < threshold) flush(i + 1)
    flush(sents.length)
    out.result()
  }

  /** Distributed semantic chunking (Kamradt-style embedding-drop
    * splitting, the retrieval-chunking upgrade over fixed-size packing:
    * boundaries land where the topic shifts, not at an arbitrary token
    * budget). The reference packs greedily by token count only
    * (backend/chunker.py:109-133); this is the standard next step RAG
    * stacks layer on, with the similarity strategy pluggable
    * ([[TokenSetCosine]] portable default, [[EmbeddingCosine]] for the
    * model-backed path).
    *
    * Scale shape: a document never leaves its row — split, score, and
    * reassemble all happen inside one `flatMap` pass (narrow, no shuffle,
    * no window over the corpus); 100 TB changes the partition count, not
    * the plan.
    */
  def semanticChunks(
      spark: SparkSession,
      documents: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double = 0.35,
      sim: AdjacentSimilarity = TokenSetCosine,
  ): Dataset[SemanticChunk] = {
    import spark.implicits._
    graft.Par.fanOut(documents.selectExpr(s"$idCol as doc_id", s"$textCol as text"))
      .as[(Long, String)]
      .flatMap { case (id, t) => semanticChunkDoc(id, t, threshold, sim) }
  }
}
