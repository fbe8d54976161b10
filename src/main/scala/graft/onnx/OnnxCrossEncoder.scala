package graft.onnx

import graft.onnx.Onnx.{FTensor, LTensor, Tensor}
import graft.operators.Rank

/** Real-model candidate reranking behind the [[Rank.PairScorer]] seam —
  * the precision stage of the two-stage retrieval shape
  * ([[Rank.rerankTopKWith]]; Nogueira & Cho 2019's monoBERT, which the
  * sentence-transformers CrossEncoder class ships as `model.onnx` +
  * `vocab.txt`, the same artifact pair [[OnnxEmbedder]] consumes).
  *
  * Contract (the HF cross-encoder convention):
  *  - inputs `input_ids`/`attention_mask`, int64 `[batch, seqLen]`, each
  *    row the pair framing `[CLS] query [SEP] doc [SEP]`
  *    ([[OnnxEmbedder.WordPieceIds.encodePair]] — the doc side truncates
  *    first), `[PAD]` to the batch max;
  *  - output: the relevance head — rank-2 `[batch, 1]` or rank-1
  *    `[batch]` float logits, returned raw (callers rank by it; a
  *    sigmoid would not change the order).
  *
  * The deterministic Dice default stays the oracle semantic
  * (cross-encoder floats have no cross-engine replay); this class is the
  * drop-in for deployments with the real model, validated in-sandbox
  * against the TinyMpnet-shaped export with a pooled linear head
  * (`TinyMpnet.writeCrossTo`). Graphs cache per (JVM, path) like
  * [[OnnxEmbedder]] — ship files via `SparkContext.addFile`, only the
  * path serializes.
  */
final class OnnxCrossEncoder(
    modelPath: String,
    vocabPath: String,
    maxSeqLen: Int = 128,
    inputIdsName: String = "input_ids",
    attentionMaskName: String = "attention_mask",
) extends Rank.PairScorer {

  @transient private lazy val graph = OnnxEmbedder.modelFor(modelPath)
  @transient private lazy val vocab = OnnxEmbedder.vocabFor(vocabPath)

  override def scoreBatch(query: String, texts: Seq[String]): Seq[Double] = {
    if (texts.isEmpty) return Seq.empty
    val encoded = texts.map(t =>
      vocab.encodePair(Option(query).getOrElse(""), Option(t).getOrElse(""), maxSeqLen))
    val seqLen = math.max(encoded.map(_.length).max, 1)
    val b      = texts.length
    val ids    = new Array[Long](b * seqLen)
    val mask   = new Array[Long](b * seqLen)
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
      case Vector(`b`, 1) | Vector(`b`) => (0 until b).map(r => out.data(r).toDouble)
      case other => throw new IllegalStateException(
        s"cross-encoder output shape ${other.mkString("x")} is neither [batch,1] nor [batch]")
    }
  }
}
