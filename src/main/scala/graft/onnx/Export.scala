package graft.onnx

/** Minimal protobuf writer — enough of the wire format to emit a real
  * ModelProto (the mirror of [[Proto]]'s reader). Main-code so the
  * deployment fixture generator ([[TinyMpnet.main]]) and the specs share
  * one implementation.
  */
final class ProtoWriter {
  val out = new java.io.ByteArrayOutputStream()
  def varint(v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7fL) != 0) { out.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
    out.write(v.toInt)
  }
  def tag(field: Int, wt: Int): Unit = varint((field.toLong << 3) | wt)
  def bytes(field: Int, b: Array[Byte]): Unit = { tag(field, 2); varint(b.length); out.write(b) }
  def str(field: Int, s: String): Unit = bytes(field, s.getBytes("UTF-8"))
  def int(field: Int, v: Long): Unit = { tag(field, 0); varint(v) }
  def msg(field: Int)(f: ProtoWriter => Unit): Unit = { val p = new ProtoWriter; f(p); bytes(field, p.out.toByteArray) }
  def packedLongs(field: Int, vs: Seq[Long]): Unit = {
    val p = new ProtoWriter; vs.foreach(p.varint); bytes(field, p.out.toByteArray)
  }
  def packedFloats(field: Int, vs: Seq[Float]): Unit = {
    val bb = java.nio.ByteBuffer.allocate(vs.length * 4).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    vs.foreach(bb.putFloat)
    bytes(field, bb.array())
  }
}

/** A tiny but REAL mpnet-shaped sentence encoder, emitted as genuine
  * ModelProto bytes: word + position embeddings (position length sliced
  * at runtime from `Shape(input_ids)`, the HF-export construction),
  * embedding LayerNorm, then `layers` transformer encoder blocks — 2-head
  * self-attention with the `Equal→Where→Unsqueeze` additive attention
  * mask, pre-split `Reshape([0,0,h,dh])→Transpose` head packing, scaled
  * dot-product `Softmax`, residual + LayerNorm, and an exact-GELU
  * (`0.5·x·(1+Erf(x/√2))`) feed-forward — closing with a rank-3
  * `last_hidden_state` that [[OnnxEmbedder]] mask-mean-pools and
  * L2-normalizes, exactly as it would a sentence-transformers mpnet
  * export (reference: backend/embedding_service.py:52-62).
  *
  * Purpose: the ONNX runtime ships as a deployment seam (drop in
  * `model.onnx` + `vocab.txt`), and real weights aren't shippable — this
  * export is the in-repo stand-in with every structural element of the
  * real graph, so the interpreter's end-to-end behavior (batching,
  * padding, masking, pooling) is validated against an independent
  * forward pass instead of trusted. `runMain graft.onnx.TinyMpnet <dir>`
  * writes the artifact pair for smoke-testing a deployment wiring.
  *
  * Weights are deterministic (name-seeded LCG, small amplitude) so the
  * spec's independent double-precision forward reproduces them exactly.
  */
object TinyMpnet {

  val hidden  = 8
  val heads   = 2
  val headDim = hidden / heads
  val inter   = 16
  val layers  = 2
  val maxPos  = 128

  val vocabLines: Vector[String] = Vector(
    "[PAD]", "[UNK]", "[CLS]", "[SEP]",
    "the", "spark", "engine", "data", "pipeline", "vector", "search",
    "index", "join", "scan", "crawl", "token", "##izer", "quality",
    "de", "##dup", "stream", "batch", "filter", "shard", "merge",
    "sort", "read", "write", ".", ",")

  /** Name-seeded deterministic weights in [-amp, amp]. */
  def weights(name: String, n: Int, amp: Float): Array[Float] = {
    var s = scala.util.hashing.MurmurHash3.stringHash(name, 42).toLong & 0xffffffffL
    Array.fill(n) {
      s = s * 6364136223846793005L + 1442695040888963407L
      (((s >>> 33) % 20001L) - 10000L) / 10000f * amp
    }
  }

  def modelBytes: Array[Byte] = build(crossHead = false)

  /** The cross-encoder variant: the SAME 2-layer body, then the HF
    * CrossEncoder head shape — masked mean-pool of the last hidden state
    * and a Linear(H→1) relevance logit (`logits` `[batch, 1]`). Exercises
    * Cast/ReduceSum/broadcast-Mul pooling INSIDE the graph (the
    * embedder's pooling runs outside it), which is exactly what a real
    * exported cross-encoder ships.
    */
  def crossModelBytes: Array[Byte] = build(crossHead = true)

  private def build(crossHead: Boolean): Array[Byte] = {
    val V = vocabLines.length
    val m = new ProtoWriter
    m.msg(7) { g =>
      g.str(2, "tiny-mpnet")
      def node(op: String, ins: Seq[String], outs: Seq[String],
          intsAttrs: Map[String, Seq[Long]] = Map.empty, intAttrs: Map[String, Long] = Map.empty): Unit =
        g.msg(1) { p =>
          ins.foreach(p.str(1, _))
          outs.foreach(p.str(2, _))
          p.str(4, op)
          for ((n, vs) <- intsAttrs) p.msg(5) { a => a.str(1, n); a.packedLongs(8, vs); a.int(20, 7) }
          for ((n, v) <- intAttrs) p.msg(5) { a => a.str(1, n); a.int(3, v); a.int(20, 2) }
        }
      def finit(name: String, dims: Seq[Long], data: Seq[Float]): Unit =
        g.msg(5) { t => t.packedLongs(1, dims); t.int(2, 1); t.packedFloats(4, data); t.str(8, name) }
      def linit(name: String, dims: Seq[Long], data: Seq[Long]): Unit =
        g.msg(5) { t => t.packedLongs(1, dims); t.int(2, 7); t.packedLongs(7, data); t.str(8, name) }

      // ---- parameters ----
      finit("word_emb", Seq(V, hidden), weights("word_emb", V * hidden, 0.5f).toSeq)
      finit("pos_emb", Seq(maxPos, hidden), weights("pos_emb", maxPos * hidden, 0.1f).toSeq)
      finit("ln_emb_g", Seq(hidden), weights("ln_emb_g", hidden, 0.2f).map(_ + 1f).toSeq)
      finit("ln_emb_b", Seq(hidden), weights("ln_emb_b", hidden, 0.1f).toSeq)
      for (i <- 0 until layers) {
        for (p <- Seq("wq", "wk", "wv", "wo")) finit(s"$p$i", Seq(hidden, hidden), weights(s"$p$i", hidden * hidden, 0.4f).toSeq)
        for (p <- Seq("bq", "bk", "bv", "bo")) finit(s"$p$i", Seq(hidden), weights(s"$p$i", hidden, 0.1f).toSeq)
        finit(s"w1_$i", Seq(hidden, inter), weights(s"w1_$i", hidden * inter, 0.4f).toSeq)
        finit(s"b1_$i", Seq(inter), weights(s"b1_$i", inter, 0.1f).toSeq)
        finit(s"w2_$i", Seq(inter, hidden), weights(s"w2_$i", inter * hidden, 0.4f).toSeq)
        finit(s"b2_$i", Seq(hidden), weights(s"b2_$i", hidden, 0.1f).toSeq)
        for (p <- Seq("ln1_g", "ln2_g")) finit(s"${p}_$i", Seq(hidden), weights(s"${p}_$i", hidden, 0.2f).map(_ + 1f).toSeq)
        for (p <- Seq("ln1_b", "ln2_b")) finit(s"${p}_$i", Seq(hidden), weights(s"${p}_$i", hidden, 0.1f).toSeq)
      }
      // ---- constants ----
      linit("one_l", Seq(1), Seq(1L))
      finit("zero_f", Seq(1), Seq(0f))
      finit("ninf_f", Seq(1), Seq(-1e9f))
      finit("scale_f", Seq(1), Seq((1.0 / math.sqrt(headDim.toDouble)).toFloat))
      finit("half_f", Seq(1), Seq(0.5f))
      finit("one_f", Seq(1), Seq(1f))
      finit("sqrt2_f", Seq(1), Seq(math.sqrt(2.0).toFloat))
      linit("qkv_shape", Seq(4), Seq(0L, 0L, heads.toLong, headDim.toLong))
      linit("merge_shape", Seq(3), Seq(0L, 0L, hidden.toLong))
      linit("pos_start", Seq(1), Seq(0L))
      linit("axis0", Seq(1), Seq(0L))
      linit("idx1", Seq(1), Seq(1L))

      // ---- embeddings: word + runtime-sliced positions, LayerNorm ----
      node("Gather", Seq("word_emb", "input_ids"), Seq("emb0"))
      node("Shape", Seq("input_ids"), Seq("shp"))
      node("Gather", Seq("shp", "idx1"), Seq("slen"))
      node("Slice", Seq("pos_emb", "pos_start", "slen", "axis0"), Seq("pos"))
      node("Add", Seq("emb0", "pos"), Seq("embp"))
      node("LayerNormalization", Seq("embp", "ln_emb_g", "ln_emb_b"), Seq("x0"))
      // ---- additive attention mask [B,1,1,S] ----
      node("Equal", Seq("attention_mask", "one_l"), Seq("keep"))
      node("Where", Seq("keep", "zero_f", "ninf_f"), Seq("am"))
      node("Unsqueeze", Seq("am"), Seq("am4"), intsAttrs = Map("axes" -> Seq(1L, 2L)))

      var x = "x0"
      for (i <- 0 until layers) {
        def nm(s: String) = s"${s}_$i"
        for (p <- Seq("q", "k", "v")) {
          node("MatMul", Seq(x, s"w$p$i"), Seq(nm(s"${p}0")))
          node("Add", Seq(nm(s"${p}0"), s"b$p$i"), Seq(nm(s"${p}1")))
          node("Reshape", Seq(nm(s"${p}1"), "qkv_shape"), Seq(nm(s"${p}r")))
          node("Transpose", Seq(nm(s"${p}r")), Seq(nm(s"${p}t")), intsAttrs = Map("perm" -> Seq(0L, 2L, 1L, 3L)))
        }
        node("Transpose", Seq(nm("kt")), Seq(nm("kT")), intsAttrs = Map("perm" -> Seq(0L, 1L, 3L, 2L)))
        node("MatMul", Seq(nm("qt"), nm("kT")), Seq(nm("s0")))
        node("Mul", Seq(nm("s0"), "scale_f"), Seq(nm("s1")))
        node("Add", Seq(nm("s1"), "am4"), Seq(nm("s2")))
        node("Softmax", Seq(nm("s2")), Seq(nm("a")))
        node("MatMul", Seq(nm("a"), nm("vt")), Seq(nm("ctx")))
        node("Transpose", Seq(nm("ctx")), Seq(nm("ctxT")), intsAttrs = Map("perm" -> Seq(0L, 2L, 1L, 3L)))
        node("Reshape", Seq(nm("ctxT"), "merge_shape"), Seq(nm("ctxm")))
        node("MatMul", Seq(nm("ctxm"), s"wo$i"), Seq(nm("ao0")))
        node("Add", Seq(nm("ao0"), s"bo$i"), Seq(nm("ao")))
        node("Add", Seq(x, nm("ao")), Seq(nm("r1")))
        node("LayerNormalization", Seq(nm("r1"), s"ln1_g_$i", s"ln1_b_$i"), Seq(nm("l1")))
        // exact GELU: 0.5 * x * (1 + erf(x / sqrt 2))
        node("MatMul", Seq(nm("l1"), s"w1_$i"), Seq(nm("f0a")))
        node("Add", Seq(nm("f0a"), s"b1_$i"), Seq(nm("f0")))
        node("Div", Seq(nm("f0"), "sqrt2_f"), Seq(nm("gd")))
        node("Erf", Seq(nm("gd")), Seq(nm("ge")))
        node("Add", Seq(nm("ge"), "one_f"), Seq(nm("g1")))
        node("Mul", Seq(nm("f0"), nm("g1")), Seq(nm("g2")))
        node("Mul", Seq(nm("g2"), "half_f"), Seq(nm("g3")))
        node("MatMul", Seq(nm("g3"), s"w2_$i"), Seq(nm("f1a")))
        node("Add", Seq(nm("f1a"), s"b2_$i"), Seq(nm("f1")))
        node("Add", Seq(nm("l1"), nm("f1")), Seq(nm("r2")))
        val outName = if (i == layers - 1) "last_hidden_state" else s"x${i + 1}"
        node("LayerNormalization", Seq(nm("r2"), s"ln2_g_$i", s"ln2_b_$i"), Seq(outName))
        x = outName
      }
      if (crossHead) {
        finit("w_head", Seq(hidden, 1), weights("w_head", hidden, 0.4f).toSeq)
        finit("b_head", Seq(1), weights("b_head", 1, 0.1f).toSeq)
        // masked mean-pool inside the graph: float mask [B,S,1] gates the
        // hidden states, ReduceSum/ReduceSum divides by the true lengths
        node("Cast", Seq("attention_mask"), Seq("mf"), intAttrs = Map("to" -> 1L))
        node("Unsqueeze", Seq("mf"), Seq("mf3"), intsAttrs = Map("axes" -> Seq(2L)))
        node("Mul", Seq("last_hidden_state", "mf3"), Seq("mh"))
        node("ReduceSum", Seq("mh"), Seq("sumh"),
          intsAttrs = Map("axes" -> Seq(1L)), intAttrs = Map("keepdims" -> 0L))
        node("ReduceSum", Seq("mf"), Seq("cnt"),
          intsAttrs = Map("axes" -> Seq(1L)), intAttrs = Map("keepdims" -> 1L))
        node("Div", Seq("sumh", "cnt"), Seq("pooled"))
        node("MatMul", Seq("pooled", "w_head"), Seq("h0"))
        node("Add", Seq("h0", "b_head"), Seq("logits"))
      }
      g.msg(11)(_.str(1, "input_ids"))
      g.msg(11)(_.str(1, "attention_mask"))
      g.msg(12)(_.str(1, if (crossHead) "logits" else "last_hidden_state"))
    }
    m.out.toByteArray
  }

  /** Write the deployment artifact pair (model.onnx + vocab.txt) to `dir`. */
  def writeTo(dir: String): (String, String) = {
    val d = java.nio.file.Paths.get(dir)
    java.nio.file.Files.createDirectories(d)
    val mp = d.resolve("model.onnx")
    java.nio.file.Files.write(mp, modelBytes)
    val vp = d.resolve("vocab.txt")
    java.nio.file.Files.write(vp, vocabLines.mkString("\n").getBytes("UTF-8"))
    (mp.toString, vp.toString)
  }

  /** Cross-encoder artifact pair ([[crossModelBytes]] + the same vocab). */
  def writeCrossTo(dir: String): (String, String) = {
    val d = java.nio.file.Paths.get(dir)
    java.nio.file.Files.createDirectories(d)
    val mp = d.resolve("model.onnx")
    java.nio.file.Files.write(mp, crossModelBytes)
    val vp = d.resolve("vocab.txt")
    java.nio.file.Files.write(vp, vocabLines.mkString("\n").getBytes("UTF-8"))
    (mp.toString, vp.toString)
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft-tiny-mpnet")
    val (mp, vp) = writeTo(dir)
    println(s"wrote $mp and $vp (hidden=$hidden heads=$heads layers=$layers vocab=${vocabLines.length})")
  }
}
