package graft.onnx

import graft.onnx.Onnx.{FTensor, LTensor, Tensor}
import graft.operators.Embedder

/** Real-model embedding behind the [[graft.operators.Embedder]] seam
  * (SURVEY §2.5; reference: backend/embedding_service.py:52-62 encodes
  * with all-mpnet-base-v2 through SentenceTransformers).
  *
  * A deployment drops in the two artifacts the reference model ships as —
  * `model.onnx` and the HF `vocab.txt` — and every V2/V3 pipeline stage
  * (ingest, search, clustering input) runs true model embeddings through
  * the SAME `mapPartitions` batch path the [[graft.operators.HashingEmbedder]]
  * uses; the hash embedder stays the oracle semantic (torch float
  * nondeterminism has no cross-engine replay).
  *
  * Contract (the sentence-transformers convention):
  *  - inputs `input_ids` and `attention_mask`, int64 `[batch, seqLen]`,
  *    WordPiece ids from the ordered vocab (line number = id, HF layout),
  *    `[CLS] … [SEP]` framing when those tokens exist in the vocab,
  *    `[PAD]` (or id 0) padding to the batch's max length;
  *  - a rank-3 output `[batch, seqLen, H]` is attention-mask mean-pooled
  *    then L2-normalized (what SentenceTransformers does for mpnet,
  *    embedding_service.py:58-60); a rank-2 `[batch, H]` output is taken
  *    as the pooled sentence vector and L2-normalized.
  *
  * The parsed graph is cached per (JVM, path) — executors re-use one
  * model across partitions exactly like the reference's process singleton
  * (embedding_service.py:16-27). On a real cluster ship the files via
  * `SparkContext.addFile` and resolve with `SparkFiles.get`; only the
  * PATH serializes with the closure, never the weights.
  */
final class OnnxEmbedder(
    modelPath: String,
    vocabPath: String,
    val dim: Int,
    maxSeqLen: Int = 128,
    inputIdsName: String = "input_ids",
    attentionMaskName: String = "attention_mask",
) extends Embedder {

  @transient private lazy val graph = OnnxEmbedder.modelFor(modelPath)
  @transient private lazy val vocab = OnnxEmbedder.vocabFor(vocabPath)

  override def embedBatch(texts: Seq[String]): Seq[Array[Float]] = {
    if (texts.isEmpty) return Seq.empty
    val encoded = texts.map(t => vocab.encode(Option(t).getOrElse(""), maxSeqLen))
    val seqLen  = math.max(encoded.map(_.length).max, 1)
    val b       = texts.length
    val ids     = new Array[Long](b * seqLen)
    val mask    = new Array[Long](b * seqLen)
    for ((toks, r) <- encoded.zipWithIndex) {
      var c = 0
      while (c < seqLen) {
        ids(r * seqLen + c) = if (c < toks.length) toks(c) else vocab.padId
        mask(r * seqLen + c) = if (c < toks.length) 1L else 0L
        c += 1
      }
    }
    val feeds = Map[String, Tensor](
      inputIdsName -> LTensor(Vector(b, seqLen), ids),
      attentionMaskName -> LTensor(Vector(b, seqLen), mask))
    val outName = graph.outputNames.head
    val out = graph.run(feeds)(outName) match {
      case t: FTensor => t
      case _ => throw new IllegalStateException(s"model output '$outName' is not float")
    }
    out.dims match {
      case Vector(`b`, `seqLen`, h) =>
        require(h == dim, s"model hidden size $h != declared dim $dim")
        (0 until b).map { r =>
          val v = new Array[Float](h)
          var n = 0.0
          var c = 0
          while (c < seqLen) {
            if (mask(r * seqLen + c) == 1L) {
              n += 1
              var j = 0
              while (j < h) { v(j) += out.data((r * seqLen + c) * h + j); j += 1 }
            }
            c += 1
          }
          if (n > 0) { var j = 0; while (j < h) { v(j) = (v(j) / n).toFloat; j += 1 } }
          OnnxEmbedder.l2normalize(v)
        }
      case Vector(`b`, h) =>
        require(h == dim, s"model output size $h != declared dim $dim")
        (0 until b).map { r =>
          OnnxEmbedder.l2normalize(java.util.Arrays.copyOfRange(out.data, r * h, (r + 1) * h))
        }
      case other =>
        throw new IllegalStateException(
          s"model output shape ${other.mkString("x")} is neither [batch,seq,H] nor [batch,H]")
    }
  }
}

object OnnxEmbedder {

  private val models = new java.util.concurrent.ConcurrentHashMap[String, Onnx.Graph]()
  private val vocabs = new java.util.concurrent.ConcurrentHashMap[String, WordPieceIds]()

  private[onnx] def modelFor(path: String): Onnx.Graph =
    models.computeIfAbsent(path, Onnx.loadFile)

  private[onnx] def vocabFor(path: String): WordPieceIds =
    vocabs.computeIfAbsent(path, p => WordPieceIds.fromFile(p))

  private[onnx] def l2normalize(v: Array[Float]): Array[Float] = {
    var s = 0.0
    var i = 0
    while (i < v.length) { s += v(i).toDouble * v(i); i += 1 }
    val n = math.sqrt(s)
    if (n > 0) { i = 0; while (i < v.length) { v(i) = (v(i) / n).toFloat; i += 1 } }
    v
  }

  /** Id-producing greedy WordPiece over an ORDERED vocab (line number = id,
    * the HF vocab.txt layout). Same pre-tokenization and longest-match rule
    * as [[graft.operators.TokenCounters.WordPiece]] (which only counts);
    * this variant exists because the model needs the ids themselves.
    */
  final class WordPieceIds(tokens: Vector[String], lowercase: Boolean = true) extends Serializable {
    require(tokens.nonEmpty, "empty vocab")
    private val ids = tokens.zipWithIndex.toMap
    val unkId: Long = ids.getOrElse("[UNK]", 0).toLong
    val padId: Long = ids.getOrElse("[PAD]", 0).toLong
    private val clsId = ids.get("[CLS]").map(_.toLong)
    private val sepId = ids.get("[SEP]").map(_.toLong)

    private def preTokenize(text: String): Vector[String] = {
      val out = Vector.newBuilder[String]
      val cur = new StringBuilder
      def flush(): Unit = if (cur.nonEmpty) { out += cur.result(); cur.clear() }
      val s = if (lowercase) text.toLowerCase(java.util.Locale.ROOT) else text
      var i = 0
      while (i < s.length) {
        val c = s.charAt(i)
        if (c.isWhitespace) flush()
        else if (c.isLetterOrDigit) cur.append(c)
        else { flush(); out += c.toString }
        i += 1
      }
      flush()
      out.result()
    }

    private def wordPieceIds(word: String): Vector[Long] = {
      if (word.length > 100) return Vector(unkId)
      val out   = Vector.newBuilder[Long]
      var start = 0
      while (start < word.length) {
        var end   = word.length
        var found = -1
        while (end > start && found < 0) {
          val piece = (if (start > 0) "##" else "") + word.substring(start, end)
          ids.get(piece) match {
            case Some(id) => found = end; out += id.toLong
            case None     => end -= 1
          }
        }
        if (found < 0) return Vector(unkId)
        start = found
      }
      out.result()
    }

    /** Cross-encoder pair framing `[CLS] a… [SEP] b… [SEP]` (the HF
      * sentence-pair convention) — the B side truncates first (queries
      * are short and must survive whole), the final [SEP] is kept.
      */
    def encodePair(a: String, b: String, maxLen: Int): Array[Long] = {
      val aIds = preTokenize(a).flatMap(wordPieceIds)
      val bIds = preTokenize(b).flatMap(wordPieceIds)
      val framedA = clsId.toVector ++ aIds ++ sepId.toVector
      val budget  = maxLen - framedA.length - sepId.size
      val framed  =
        if (budget >= bIds.length) framedA ++ bIds ++ sepId.toVector
        else if (budget > 0) framedA ++ bIds.take(budget) ++ sepId.toVector
        else framedA // degenerate: the query alone fills the window
      val t =
        if (framed.length <= maxLen) framed
        else sepId match {
          case Some(sep) => framed.take(maxLen - 1) :+ sep
          case None      => framed.take(maxLen)
        }
      t.toArray
    }

    /** `[CLS] pieces… [SEP]` (framing only when the vocab has the tokens),
      * truncated to `maxLen` with the [SEP] kept at the end.
      */
    def encode(text: String, maxLen: Int): Array[Long] = {
      val body = preTokenize(text).flatMap(wordPieceIds)
      val framed = clsId.toVector ++ body ++ sepId.toVector
      val t =
        if (framed.length <= maxLen) framed
        else sepId match {
          case Some(sep) => framed.take(maxLen - 1) :+ sep
          case None      => framed.take(maxLen)
        }
      t.toArray
    }
  }

  object WordPieceIds {
    def fromFile(path: String, lowercase: Boolean = true): WordPieceIds = {
      val src = scala.io.Source.fromFile(path, "UTF-8")
      try new WordPieceIds(src.getLines().map(_.trim).filter(_.nonEmpty).toVector, lowercase)
      finally src.close()
    }
  }
}
