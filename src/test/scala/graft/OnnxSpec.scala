package graft

import graft.onnx.Onnx
import graft.onnx.Onnx.{Attr, FTensor, Graph, LTensor, Node}
import graft.onnx.OnnxEmbedder
import org.scalatest.funsuite.AnyFunSuite

/** From-scratch ONNX runtime: wire-format parse (via a test-side protobuf
  * WRITER, so the fixture is real ModelProto bytes), per-op semantics
  * against hand computations, and the OnnxEmbedder end-to-end through the
  * distributed Embedder.embedText path.
  */
class OnnxSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // ---- minimal protobuf writer (test-side only) ---------------------------
  private final class PW {
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
    def msg(field: Int)(f: PW => Unit): Unit = { val p = new PW; f(p); bytes(field, p.out.toByteArray) }
    def packedLongs(field: Int, vs: Seq[Long]): Unit = {
      val p = new PW; vs.foreach(p.varint); bytes(field, p.out.toByteArray)
    }
    def packedFloats(field: Int, vs: Seq[Float]): Unit = {
      val bb = java.nio.ByteBuffer.allocate(vs.length * 4).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      vs.foreach(bb.putFloat)
      bytes(field, bb.array())
    }
  }

  private def tensorMsg(p: PW, name: String, dims: Seq[Long], floats: Seq[Float] = Nil,
      longs: Seq[Long] = Nil, rawFloats: Boolean = false): Unit = {
    p.packedLongs(1, dims)
    if (longs.nonEmpty) { p.int(2, 7); p.packedLongs(7, longs) }
    else if (rawFloats) {
      p.int(2, 1)
      val bb = java.nio.ByteBuffer.allocate(floats.length * 4).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      floats.foreach(bb.putFloat)
      p.bytes(9, bb.array()) // raw_data path
    } else { p.int(2, 1); p.packedFloats(4, floats) }
    p.str(8, name)
  }

  private def nodeMsg(p: PW, op: String, ins: Seq[String], outs: Seq[String],
      intsAttrs: Map[String, Seq[Long]] = Map.empty, intAttrs: Map[String, Long] = Map.empty): Unit = {
    ins.foreach(p.str(1, _))
    outs.foreach(p.str(2, _))
    p.str(4, op)
    for ((n, vs) <- intsAttrs) p.msg(5) { a => a.str(1, n); a.packedLongs(8, vs); a.int(20, 7) }
    for ((n, v) <- intAttrs) p.msg(5) { a => a.str(1, n); a.int(3, v); a.int(20, 2) }
  }

  /** Tiny sentence encoder in REAL ModelProto bytes: Gather(table, ids) →
    * mask mean-pool → Gemm-free dense (MatMul+Add) → Tanh, output [B,H=4].
    */
  private def buildEncoderBytes(table: Seq[Float], w: Seq[Float], bias: Seq[Float]): Array[Byte] = {
    val m = new PW
    m.msg(7) { g => // ModelProto.graph
      g.str(2, "tiny-encoder")
      nodeMsg2(g, "Gather", Seq("table", "input_ids"), Seq("emb"))
      nodeMsg2(g, "Cast", Seq("attention_mask"), Seq("maskf"), intAttrs = Map("to" -> 1L))
      nodeMsg2(g, "Unsqueeze", Seq("maskf"), Seq("mask3"), intsAttrs = Map("axes" -> Seq(2L)))
      nodeMsg2(g, "Mul", Seq("emb", "mask3"), Seq("masked"))
      nodeMsg2(g, "ReduceSum", Seq("masked"), Seq("summed"), intsAttrs = Map("axes" -> Seq(1L)), intAttrs = Map("keepdims" -> 0L))
      nodeMsg2(g, "ReduceSum", Seq("mask3"), Seq("counts"), intsAttrs = Map("axes" -> Seq(1L)), intAttrs = Map("keepdims" -> 0L))
      nodeMsg2(g, "Div", Seq("summed", "counts"), Seq("mean"))
      nodeMsg2(g, "MatMul", Seq("mean", "w"), Seq("proj"))
      nodeMsg2(g, "Add", Seq("proj", "bias"), Seq("dense"))
      nodeMsg2(g, "Tanh", Seq("dense"), Seq("sentence_embedding"))
      g.msg(5)(tensorMsg(_, "table", Seq(12, 4), floats = table, rawFloats = true)) // raw_data path covered
      g.msg(5)(tensorMsg(_, "w", Seq(4, 4), floats = w))
      g.msg(5)(tensorMsg(_, "bias", Seq(4), floats = bias))
      g.msg(11)(_.str(1, "input_ids"))
      g.msg(11)(_.str(1, "attention_mask"))
      g.msg(12)(_.str(1, "sentence_embedding"))
    }
    m.out.toByteArray
  }

  private def nodeMsg2(g: PW, op: String, ins: Seq[String], outs: Seq[String],
      intsAttrs: Map[String, Seq[Long]] = Map.empty, intAttrs: Map[String, Long] = Map.empty): Unit =
    g.msg(1)(nodeMsg(_, op, ins, outs, intsAttrs, intAttrs))

  // deterministic fixture weights, recomputable in expected-value code
  private val table = (0 until 12 * 4).map { k =>
    val (i, j) = (k / 4, k % 4); (((i * 7 + j * 3) % 11) - 5) / 10f
  }
  private val w    = (0 until 16).map { k => val (i, j) = (k / 4, k % 4); (((i * 5 + j * 2) % 7) - 3) / 10f }
  private val bias = (0 until 4).map(j => (j * 2 - 3) / 20f)
  private val vocabLines = Vector("[PAD]", "[UNK]", "[CLS]", "[SEP]", "hello", "world", "spark", "eng", "##ine", "data", ".", "x")

  /** Independent plain-Scala forward pass for the fixture encoder. */
  private def expectedVec(ids: Seq[Int]): Array[Float] = {
    val mean = new Array[Float](4)
    for (id <- ids; j <- 0 until 4) mean(j) += table(id * 4 + j)
    for (j <- 0 until 4) mean(j) /= ids.length
    val dense = new Array[Float](4)
    for (j <- 0 until 4) {
      var acc = 0.0
      for (k <- 0 until 4) acc += mean(k).toDouble * w(k * 4 + j)
      dense(j) = math.tanh(acc + bias(j)).toFloat
    }
    val n = math.sqrt(dense.map(x => x.toDouble * x).sum)
    dense.map(x => (x / n).toFloat)
  }

  private def writeFixture(): (String, String) = {
    val dir = java.nio.file.Files.createTempDirectory("graft_onnx")
    val mp  = dir.resolve("model.onnx")
    java.nio.file.Files.write(mp, buildEncoderBytes(table, w, bias))
    val vp = dir.resolve("vocab.txt")
    java.nio.file.Files.write(vp, vocabLines.mkString("\n").getBytes("UTF-8"))
    (mp.toString, vp.toString)
  }

  // ---- op-level tests (graphs built directly, no proto round trip) --------

  private def one(op: String, ins: Map[String, Onnx.Tensor], inNames: Seq[String],
      attrs: Map[String, Attr] = Map.empty): Onnx.Tensor = {
    val g = Graph("t", Vector(Node(op, "n0", inNames.toVector, Vector("y"), attrs)),
      Map.empty, inNames.toVector, Vector("y"))
    g.run(ins)("y")
  }

  test("Add broadcasts [2,3] + [3] and [2,1] + [1,3] by the numpy rules") {
    val a = FTensor(Vector(2, 3), Array(1f, 2f, 3f, 4f, 5f, 6f))
    val b = FTensor(Vector(3), Array(10f, 20f, 30f))
    assert(one("Add", Map("a" -> a, "b" -> b), Seq("a", "b")).asInstanceOf[FTensor].data.toSeq ==
      Seq(11f, 22f, 33f, 14f, 25f, 36f))
    val c = FTensor(Vector(2, 1), Array(1f, 2f))
    val d = FTensor(Vector(1, 3), Array(10f, 20f, 30f))
    assert(one("Add", Map("a" -> c, "b" -> d), Seq("a", "b")).asInstanceOf[FTensor].data.toSeq ==
      Seq(11f, 21f, 31f, 12f, 22f, 32f))
  }

  test("MatMul: 2-D exact, batched [2,2,3]x[3,2] broadcasts the weight") {
    val a = FTensor(Vector(2, 3), Array(1f, 2f, 3f, 4f, 5f, 6f))
    val b = FTensor(Vector(3, 2), Array(7f, 8f, 9f, 10f, 11f, 12f))
    val y = one("MatMul", Map("a" -> a, "b" -> b), Seq("a", "b")).asInstanceOf[FTensor]
    assert(y.dims == Vector(2, 2) && y.data.toSeq == Seq(58f, 64f, 139f, 154f))
    val ab = FTensor(Vector(2, 2, 3), (1 to 12).map(_.toFloat).toArray)
    val yb = one("MatMul", Map("a" -> ab, "b" -> b), Seq("a", "b")).asInstanceOf[FTensor]
    assert(yb.dims == Vector(2, 2, 2))
    assert(yb.data.take(4).toSeq == Seq(58f, 64f, 139f, 154f)) // batch 0 == the 2-D case
    assert(yb.data.drop(4).toSeq == Seq(220f, 244f, 301f, 334f))
  }

  test("MatMul mixed batch broadcast [2,1,1,2]x[1,3,2,1] maps per-dimension, not flat-modulo") {
    val a = FTensor(Vector(2, 1, 1, 2), Array(1f, 2f, 3f, 4f))
    val b = FTensor(Vector(1, 3, 2, 1), Array(10f, 20f, 30f, 40f, 50f, 60f))
    val y = one("MatMul", Map("a" -> a, "b" -> b), Seq("a", "b")).asInstanceOf[FTensor]
    assert(y.dims == Vector(2, 3, 1, 1))
    // out[i][j] = a_i · b_j for every (i, j) pair — a flat modulo walks (0,0),(1,1),(0,2),…
    assert(y.data.toSeq == Seq(50f, 110f, 170f, 110f, 250f, 390f))
  }

  test("Unsqueeze with multiple axes normalizes negatives against the OUTPUT rank") {
    val x = FTensor(Vector(2, 3), (1 to 6).map(_.toFloat).toArray)
    val y = one("Unsqueeze", Map("x" -> x), Seq("x"),
      Map("axes" -> Attr(ints = Vector(0L, -1L)))).asInstanceOf[FTensor]
    assert(y.dims == Vector(1, 2, 3, 1)) // -1 → output position 3, not 2
  }

  test("Gemm honors alpha/beta/transB; Transpose permutes strides") {
    val a = FTensor(Vector(2, 2), Array(1f, 2f, 3f, 4f))
    val b = FTensor(Vector(2, 2), Array(5f, 6f, 7f, 8f)) // transB: effective [[5,7],[6,8]]
    val c = FTensor(Vector(2), Array(100f, 200f))
    val y = one("Gemm", Map("a" -> a, "b" -> b, "c" -> c), Seq("a", "b", "c"),
      Map("alpha" -> Attr(f = Some(2f)), "beta" -> Attr(f = Some(1f)), "transB" -> Attr(i = Some(1L))))
      .asInstanceOf[FTensor]
    // A·Bᵀ = [[17,23],[39,53]]; ×2 + C
    assert(y.data.toSeq == Seq(134f, 246f, 178f, 306f))
    val t = one("Transpose", Map("a" -> FTensor(Vector(2, 3), Array(1f, 2f, 3f, 4f, 5f, 6f))),
      Seq("a"), Map("perm" -> Attr(ints = Vector(1L, 0L)))).asInstanceOf[FTensor]
    assert(t.dims == Vector(3, 2) && t.data.toSeq == Seq(1f, 4f, 2f, 5f, 3f, 6f))
  }

  test("Softmax(-1) rows sum to 1 and match a hand-computed pair; LayerNormalization matches hand calc") {
    val y = one("Softmax", Map("x" -> FTensor(Vector(2, 2), Array(0f, math.log(3f).toFloat, 1f, 1f))),
      Seq("x")).asInstanceOf[FTensor]
    assert(math.abs(y.data(0) - 0.25f) < 1e-6 && math.abs(y.data(1) - 0.75f) < 1e-6)
    assert(math.abs(y.data(2) - 0.5f) < 1e-6)
    val x  = FTensor(Vector(1, 4), Array(1f, 2f, 3f, 4f))
    val sc = FTensor(Vector(4), Array(1f, 1f, 2f, 1f))
    val bi = FTensor(Vector(4), Array(0f, 0f, 0f, 10f))
    val ln = one("LayerNormalization", Map("x" -> x, "s" -> sc, "b" -> bi), Seq("x", "s", "b"))
      .asInstanceOf[FTensor]
    // mean 2.5, var 1.25 → normalized ±1.3416, ±0.4472
    assert(math.abs(ln.data(0) - -1.3416355f) < 1e-4)
    assert(math.abs(ln.data(2) - 2 * 0.4472136f) < 1e-4)
    assert(math.abs(ln.data(3) - (10f + 1.3416355f)) < 1e-4)
  }

  test("Erf hits the known lattice (float32 resolution); Reshape -1 infers; Concat stacks on the axis") {
    val e = one("Erf", Map("x" -> FTensor(Vector(3), Array(0f, 1f, -1f))), Seq("x")).asInstanceOf[FTensor]
    assert(math.abs(e.data(0)) < 2e-7) // A&S 7.1.26 polynomial: |err| < 1.5e-7, not exactly 0 at 0
    assert(math.abs(e.data(1) - 0.8427008f) < 2e-7)
    assert(math.abs(e.data(2) + 0.8427008f) < 2e-7)
    val r = one("Reshape", Map("x" -> FTensor(Vector(2, 3), (1 to 6).map(_.toFloat).toArray),
      "s" -> LTensor(Vector(2), Array(3L, -1L))), Seq("x", "s")).asInstanceOf[FTensor]
    assert(r.dims == Vector(3, 2))
    val cc = one("Concat", Map(
      "a" -> FTensor(Vector(1, 2), Array(1f, 2f)), "b" -> FTensor(Vector(1, 2), Array(3f, 4f))),
      Seq("a", "b"), Map("axis" -> Attr(i = Some(0L)))).asInstanceOf[FTensor]
    assert(cc.dims == Vector(2, 2) && cc.data.toSeq == Seq(1f, 2f, 3f, 4f))
  }

  test("Gather picks rows by int64 index, negative indices wrap, unknown op fails with the supported list") {
    val data = FTensor(Vector(3, 2), Array(1f, 2f, 3f, 4f, 5f, 6f))
    val y = one("Gather", Map("d" -> data, "i" -> LTensor(Vector(2), Array(2L, -3L))), Seq("d", "i"))
      .asInstanceOf[FTensor]
    assert(y.dims == Vector(2, 2) && y.data.toSeq == Seq(5f, 6f, 1f, 2f))
    val ex = intercept[IllegalArgumentException](one("NotAnOp", Map("d" -> data), Seq("d")))
    assert(ex.getMessage.contains("supported"))
  }

  // ---- model round trip + embedder ----------------------------------------

  test("ModelProto bytes round-trip: parser reads nodes, packed + raw_data initializers, io names") {
    val g = Onnx.load(buildEncoderBytes(table, w, bias))
    assert(g.nodes.map(_.opType) == Vector("Gather", "Cast", "Unsqueeze", "Mul",
      "ReduceSum", "ReduceSum", "Div", "MatMul", "Add", "Tanh"))
    assert(g.initializers.keySet == Set("table", "w", "bias"))
    assert(g.initializers("table").asInstanceOf[FTensor].data.toSeq == table) // raw_data LE decode
    assert(g.initializers("w").asInstanceOf[FTensor].data.toSeq == w)         // packed float_data
    assert(g.feedNames == Vector("input_ids", "attention_mask"))
    assert(g.outputNames == Vector("sentence_embedding"))
  }

  test("OnnxEmbedder: wordpiece ids + padding + forward pass match an independent hand computation") {
    val (mp, vp) = writeFixture()
    val emb = new OnnxEmbedder(mp, vp, dim = 4)
    // "hello world" → [CLS] hello world [SEP] = 2,4,5,3
    // "engine." → [CLS] eng ##ine . [SEP] = 2,7,8,10,3 (longest batch row)
    // "zzz" → [CLS] [UNK] [SEP] = 2,1,3 (padded — padding must NOT leak into the mean)
    val vs = emb.embedBatch(Seq("hello world", "engine.", "zzz"))
    val exp = Seq(expectedVec(Seq(2, 4, 5, 3)), expectedVec(Seq(2, 7, 8, 10, 3)), expectedVec(Seq(2, 1, 3)))
    for ((v, e) <- vs.zip(exp); j <- 0 until 4)
      assert(math.abs(v(j) - e(j)) < 1e-6f, s"${v.toSeq} vs ${e.toSeq}")
    // unit norm
    assert(math.abs(vs.head.map(x => x.toDouble * x).sum - 1.0) < 1e-6)
  }

  test("OnnxEmbedder runs distributed through Embedder.embedText (mapPartitions, model cached per JVM)") {
    val (mp, vp) = writeFixture()
    import spark.implicits._
    val df = Seq((1L, "hello world"), (2L, "engine."), (3L, "spark data x"), (4L, "hello world"))
      .toDF("id", "text")
    val emb = new OnnxEmbedder(mp, vp, dim = 4)
    val out = graft.operators.Embedder.embedText(spark, df, "id", "text", emb, batchSize = 2)
      .collect().map(e => e.id -> e.embedding).toMap
    // same text → same vector; equals the local batch path exactly
    assert(out(1L).toSeq == out(4L).toSeq)
    val local = emb.embedBatch(Seq("hello world", "engine.", "spark data x"))
    assert(out(1L).toSeq == local(0).toSeq && out(2L).toSeq == local(1).toSeq && out(3L).toSeq == local(2).toSeq)
  }

  test("property: TensorProto round-trips through the wire reader — packed, raw_data and int64 forms") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val tGen = for {
      rank <- Gen.choose(0, 3)
      dims <- Gen.listOfN(rank, Gen.choose(1, 4))
      n     = dims.product
      isF  <- Gen.oneOf(true, false)
      raw  <- Gen.oneOf(true, false)
      fs   <- Gen.listOfN(n, Gen.oneOf(0f, -1.5f, 3.25e-10f, 1e30f, -0f, 42f))
      ls   <- Gen.listOfN(n, Gen.oneOf(0L, -1L, Long.MaxValue, Long.MinValue, 77L))
    } yield (dims, isF, raw, fs, ls)
    for (seed <- 0 until 150) {
      val (dims, isF, raw, fs, ls) = tGen.apply(Gen.Parameters.default, Seed(seed.toLong)).get
      val m = new PW
      m.msg(7) { g =>
        if (isF) g.msg(5)(tensorMsg(_, "t", dims.map(_.toLong), floats = fs, rawFloats = raw))
        else g.msg(5)(tensorMsg(_, "t", dims.map(_.toLong), longs = ls))
        g.msg(12)(_.str(1, "t"))
      }
      val got = Onnx.load(m.out.toByteArray).initializers("t")
      assert(got.dims == dims.toVector, s"seed $seed dims")
      got match {
        case FTensor(_, d) => assert(isF && d.map(java.lang.Float.floatToIntBits).toSeq ==
          fs.map(java.lang.Float.floatToIntBits), s"seed $seed floats (raw=$raw)")
        case LTensor(_, d) => assert(!isF && d.toSeq == ls, s"seed $seed longs")
      }
    }
  }

  test("FLOAT16 initializers widen to exact float32 on the representable lattice (raw and typed forms)") {
    // half bit patterns with exactly-representable values
    val cases = Seq(
      0x0000 -> 0f, 0x8000 -> -0f, 0x3c00 -> 1f, 0xc000 -> -2f,
      0x3800 -> 0.5f, 0x7bff -> 65504f,           // max finite half
      0x0001 -> (1f / 1024f) * math.pow(2, -14).toFloat, // smallest subnormal
      0x7c00 -> Float.PositiveInfinity)
    for ((bits, want) <- cases)
      assert(graft.onnx.Onnx.halfToFloat(bits) == want, f"0x$bits%04x")
    assert(graft.onnx.Onnx.halfToFloat(0x7c01).isNaN)
    // through the wire: raw_data little-endian halves
    val m = new PW
    m.msg(7) { g =>
      g.msg(5) { t =>
        t.packedLongs(1, Seq(3L))
        t.int(2, 10) // FLOAT16
        val bb = java.nio.ByteBuffer.allocate(6).order(java.nio.ByteOrder.LITTLE_ENDIAN)
        Seq(0x3c00, 0xc000, 0x3800).foreach(v => bb.putShort(v.toShort))
        t.bytes(9, bb.array())
        t.str(8, "h")
      }
      g.msg(12)(_.str(1, "h"))
    }
    val got = Onnx.load(m.out.toByteArray).initializers("h").asInstanceOf[FTensor]
    assert(got.data.toSeq == Seq(1f, -2f, 0.5f))
  }

  test("single-head self-attention composes from MatMul/Transpose/Softmax/Add — the encoder-layer core") {
    // x: [1, 3, 2] (batch 1, seq 3, hidden 2); Wq/Wk/Wv: [2, 2]
    val x  = FTensor(Vector(1, 3, 2), Array(1f, 0f, 0f, 1f, 1f, 1f))
    val wq = FTensor(Vector(2, 2), Array(1f, 0f, 0f, 1f))   // identity
    val wk = FTensor(Vector(2, 2), Array(1f, 0f, 0f, 1f))
    val wv = FTensor(Vector(2, 2), Array(2f, 0f, 0f, 2f))   // 2·identity
    val scale = FTensor(Vector(1), Array((1.0 / math.sqrt(2.0)).toFloat))
    val g = Graph("attn", Vector(
      Node("MatMul", "q", Vector("x", "wq"), Vector("Q"), Map.empty),
      Node("MatMul", "k", Vector("x", "wk"), Vector("K"), Map.empty),
      Node("MatMul", "v", Vector("x", "wv"), Vector("V"), Map.empty),
      Node("Transpose", "kt", Vector("K"), Vector("KT"), Map("perm" -> Attr(ints = Vector(0L, 2L, 1L)))),
      Node("MatMul", "qk", Vector("Q", "KT"), Vector("S0"), Map.empty),
      Node("Mul", "sc", Vector("S0", "scale"), Vector("S"), Map.empty),
      Node("Softmax", "sm", Vector("S"), Vector("A"), Map("axis" -> Attr(i = Some(-1L)))),
      Node("MatMul", "av", Vector("A", "V"), Vector("Y"), Map.empty),
    ), Map("wq" -> wq, "wk" -> wk, "wv" -> wv, "scale" -> scale), Vector("x"), Vector("Y"))
    val y = g.run(Map("x" -> x))("Y").asInstanceOf[FTensor]
    assert(y.dims == Vector(1, 3, 2))
    // independent hand computation of softmax(QKᵀ/√d)·V
    val rows = Array(Array(1f, 0f), Array(0f, 1f), Array(1f, 1f))
    val s = 1.0 / math.sqrt(2.0)
    for (i <- 0 until 3) {
      val logits = rows.map(r => (r(0) * rows(i)(0) + r(1) * rows(i)(1)) * s)
      val m = logits.max
      val es = logits.map(l => math.exp(l - m))
      val z = es.sum
      val exp0 = (0 until 3).map(j => es(j) / z * 2 * rows(j)(0)).sum
      val exp1 = (0 until 3).map(j => es(j) / z * 2 * rows(j)(1)).sum
      assert(math.abs(y.data(i * 2) - exp0) < 1e-6, s"row $i dim 0")
      assert(math.abs(y.data(i * 2 + 1) - exp1) < 1e-6, s"row $i dim 1")
    }
  }

  test("Equal/Greater/Where/Expand/Slice: the mask-building ops HF exports lean on") {
    // Equal broadcasts and yields int64 0/1 (the bool convention)
    val eq = one("Equal", Map(
      "a" -> LTensor(Vector(2, 2), Array(1L, 0L, 5L, 0L)), "b" -> LTensor(Vector(1), Array(0L))),
      Seq("a", "b")).asInstanceOf[LTensor]
    assert(eq.data.toSeq == Seq(0L, 1L, 0L, 1L))
    val gt = one("Greater", Map(
      "a" -> FTensor(Vector(3), Array(1f, -2f, 0f)), "b" -> FTensor(Vector(1), Array(0f))),
      Seq("a", "b")).asInstanceOf[LTensor]
    assert(gt.data.toSeq == Seq(1L, 0L, 0L))
    // Where: the additive-mask pattern — pad positions get -1e9
    val wh = one("Where", Map(
      "c" -> LTensor(Vector(2, 2), Array(1L, 0L, 0L, 1L)),
      "x" -> FTensor(Vector(1), Array(0f)),
      "y" -> FTensor(Vector(1), Array(-1e9f))), Seq("c", "x", "y")).asInstanceOf[FTensor]
    assert(wh.data.toSeq == Seq(0f, -1e9f, -1e9f, 0f))
    val ex = one("Expand", Map(
      "x" -> FTensor(Vector(2, 1), Array(3f, 4f)),
      "s" -> LTensor(Vector(2), Array(2L, 3L))), Seq("x", "s")).asInstanceOf[FTensor]
    assert(ex.dims == Vector(2, 3) && ex.data.toSeq == Seq(3f, 3f, 3f, 4f, 4f, 4f))
    // Slice: negative start wraps, end clamps, step strides
    val sl = one("Slice", Map(
      "x" -> FTensor(Vector(2, 4), (1 to 8).map(_.toFloat).toArray),
      "st" -> LTensor(Vector(1), Array(-3L)), "en" -> LTensor(Vector(1), Array(100L)),
      "ax" -> LTensor(Vector(1), Array(1L)), "sp" -> LTensor(Vector(1), Array(2L))),
      Seq("x", "st", "en", "ax", "sp")).asInstanceOf[FTensor]
    assert(sl.dims == Vector(2, 2) && sl.data.toSeq == Seq(2f, 4f, 6f, 8f))
  }

  test("masked attention: Equal→Where builds the additive mask, pad positions get zero weight") {
    // seq 3 with position 2 padded: scores softmax over only the first two
    val x    = FTensor(Vector(1, 3, 2), Array(1f, 0f, 0f, 1f, 9f, 9f)) // junk at pad pos
    val mask = LTensor(Vector(1, 3), Array(1L, 1L, 0L))
    val g = Graph("mattn", Vector(
      Node("Equal", "pad", Vector("mask", "one"), Vector("keep"), Map.empty),
      Node("Where", "add", Vector("keep", "zero", "ninf"), Vector("amask"), Map.empty),
      Node("Unsqueeze", "um", Vector("amask"), Vector("amask3"), Map("axes" -> Attr(ints = Vector(1L)))),
      Node("Transpose", "kt", Vector("x"), Vector("XT"), Map("perm" -> Attr(ints = Vector(0L, 2L, 1L)))),
      Node("MatMul", "qk", Vector("x", "XT"), Vector("S0"), Map.empty),
      Node("Add", "ms", Vector("S0", "amask3"), Vector("S"), Map.empty),
      Node("Softmax", "sm", Vector("S"), Vector("A"), Map("axis" -> Attr(i = Some(-1L)))),
      Node("MatMul", "av", Vector("A", "x"), Vector("Y"), Map.empty),
    ), Map(
      "one" -> LTensor(Vector(1), Array(1L)),
      "zero" -> FTensor(Vector(1), Array(0f)),
      "ninf" -> FTensor(Vector(1), Array(-1e9f))), Vector("x", "mask"), Vector("Y"))
    val a = g.run(Map("x" -> x, "mask" -> mask))("Y").asInstanceOf[FTensor]
    // no output row may depend on the junk pad vector: weights there ~ e^-1e9
    for (i <- 0 until 2; j <- 0 until 2)
      assert(math.abs(a.data(i * 2 + j)) <= 1.0f + 1e-5f,
        s"pad vector leaked into row $i: ${a.data.toSeq}")
  }

  test("TinyMpnet export: real 2-layer transformer ModelProto runs end-to-end; padded batch == singleton batches; matches an independent forward") {
    import graft.onnx.TinyMpnet
    val (mp, vp) = TinyMpnet.writeTo(java.nio.file.Files.createTempDirectory("graft_mpnet").toString)
    val emb = new OnnxEmbedder(mp, vp, TinyMpnet.hidden)
    val texts = Seq(
      "the spark engine",                                   // 3 words, all in vocab
      "the tokenizer dedup pipeline quality stream scan",   // longer, subword splits
      "zzz qqq")                                            // all-UNK
    // padding invariance: the batch pads rows 1/3 to row 2's length — the
    // additive mask plus masked mean-pool must make the pad positions
    // invisible, so each batched vector equals its singleton-batch vector
    val batched = emb.embedBatch(texts)
    for ((t, i) <- texts.zipWithIndex) {
      val solo = emb.embedBatch(Seq(t)).head
      for (j <- 0 until TinyMpnet.hidden)
        assert(math.abs(batched(i)(j) - solo(j)) < 1e-6f, s"text $i dim $j: pad positions leaked")
    }

    // independent double-precision forward over the same deterministic
    // weights — embeddings + positions + LN, 2-head masked attention,
    // residuals, exact GELU FFN, final mask-mean-pool + L2
    val H = TinyMpnet.hidden; val heads = TinyMpnet.heads; val dh = TinyMpnet.headDim; val I = TinyMpnet.inter
    def w(name: String, n: Int, amp: Float): Array[Double] = TinyMpnet.weights(name, n, amp).map(_.toDouble)
    // fl() rounds to float32 at each op boundary, mirroring the runtime's
    // float storage between ops (accumulations stay double, like matmul's)
    def fl(v: Double): Double = v.toFloat.toDouble
    def ln(x: Array[Double], g: Array[Double], b: Array[Double]): Array[Double] = {
      val mu = x.sum / x.length
      val va = x.map(v => (v - mu) * (v - mu)).sum / x.length
      val den = math.sqrt(va + 1e-5f)
      x.indices.map(j => fl((x(j) - mu) / den * g(j) + b(j))).toArray
    }
    def matvec(x: Array[Double], m: Array[Double], rows: Int, cols: Int): Array[Double] =
      Array.tabulate(cols)(j => (0 until rows).map(k => x(k) * m(k * cols + j)).sum)
    // Abramowitz-Stegun 7.1.26 (|err| < 1.5e-7), implemented here
    // independently of the runtime's copy
    def erfAS(x: Double): Double = {
      val s = if (x < 0) -1.0 else 1.0
      val a = math.abs(x)
      val t = 1.0 / (1.0 + 0.3275911 * a)
      val y = 1.0 - (((((1.061405429 * t - 1.453152027) * t) + 1.421413741) * t - 0.284496736) * t + 0.254829592) * t * math.exp(-a * a)
      s * y
    }
    def forward(ids: Seq[Int]): Array[Float] = {
      val S = ids.length
      val wordE = w("word_emb", TinyMpnet.vocabLines.length * H, 0.5f)
      val posE  = w("pos_emb", TinyMpnet.maxPos * H, 0.1f)
      val lnEg  = w("ln_emb_g", H, 0.2f).map(_ + 1f); val lnEb = w("ln_emb_b", H, 0.1f)
      var x: Array[Array[Double]] = ids.zipWithIndex.map { case (id, p) =>
        ln(Array.tabulate(H)(j => fl(fl(wordE(id * H + j)) + fl(posE(p * H + j)))), lnEg, lnEb)
      }.toArray
      for (i <- 0 until TinyMpnet.layers) {
        val (wq, wk, wv, wo) = (w(s"wq$i", H * H, 0.4f), w(s"wk$i", H * H, 0.4f), w(s"wv$i", H * H, 0.4f), w(s"wo$i", H * H, 0.4f))
        val (bq, bk, bv, bo) = (w(s"bq$i", H, 0.1f), w(s"bk$i", H, 0.1f), w(s"bv$i", H, 0.1f), w(s"bo$i", H, 0.1f))
        val q = x.map(r => matvec(r, wq, H, H).zip(bq).map { case (a, b) => fl(fl(a) + b) })
        val k = x.map(r => matvec(r, wk, H, H).zip(bk).map { case (a, b) => fl(fl(a) + b) })
        val v = x.map(r => matvec(r, wv, H, H).zip(bv).map { case (a, b) => fl(fl(a) + b) })
        val ctx = Array.ofDim[Double](S, H)
        for (hd <- 0 until heads; si <- 0 until S) {
          val scaleF = (1.0 / math.sqrt(dh.toDouble)).toFloat.toDouble
          val lsc = (0 until S).map { sj =>
            val raw = fl((0 until dh).map(d => q(si)(hd * dh + d) * k(sj)(hd * dh + d)).sum)
            fl(raw * scaleF) // the runtime's separate Mul-by-scale op
          }
          val mx = lsc.max
          val es = lsc.map(l0 => fl(math.exp(l0 - mx))); val z = es.sum
          val aw = es.map(e => fl(e / z))
          for (d <- 0 until dh)
            ctx(si)(hd * dh + d) = fl((0 until S).map(sj => aw(sj) * v(sj)(hd * dh + d)).sum)
        }
        val ao = ctx.map(r => matvec(r, wo, H, H).zip(bo).map { case (a, b) => fl(fl(a) + b) })
        val l1g = w(s"ln1_g_$i", H, 0.2f).map(_ + 1f); val l1b = w(s"ln1_b_$i", H, 0.1f)
        val l1 = x.indices.map(s => ln(x(s).zip(ao(s)).map { case (a, b) => fl(a + b) }, l1g, l1b)).toArray
        val (w1, b1) = (w(s"w1_$i", H * I, 0.4f), w(s"b1_$i", I, 0.1f))
        val (w2, b2) = (w(s"w2_$i", I * H, 0.4f), w(s"b2_$i", H, 0.1f))
        val ff = l1.map { r =>
          val f0 = matvec(r, w1, H, I).zip(b1).map { case (a, b) => fl(fl(a) + b) }
          // each GELU stage is its own runtime op, so each rounds to float
          val ge = f0.map { v0 =>
            val d0 = fl(v0 / math.sqrt(2.0).toFloat.toDouble)
            val e0 = fl(erfAS(d0))
            fl(fl(v0 * fl(e0 + 1.0)) * 0.5)
          }
          matvec(ge, w2, I, H).zip(b2).map { case (a, b) => fl(fl(a) + b) }
        }
        val l2g = w(s"ln2_g_$i", H, 0.2f).map(_ + 1f); val l2b = w(s"ln2_b_$i", H, 0.1f)
        x = l1.indices.map(s => ln(l1(s).zip(ff(s)).map { case (a, b) => fl(a + b) }, l2g, l2b)).toArray
      }
      val pooled = Array.tabulate(H)(j => x.map(_(j)).sum / S)
      val n = math.sqrt(pooled.map(v0 => v0 * v0).sum)
      pooled.map(v0 => (v0 / n).toFloat)
    }
    val v0 = new OnnxEmbedder.WordPieceIds(TinyMpnet.vocabLines)
    for (t <- texts) {
      val ids = v0.encode(t, 128).map(_.toInt).toSeq
      val want = forward(ids)
      val got = emb.embedBatch(Seq(t)).head
      for (j <- 0 until H)
        assert(math.abs(got(j) - want(j)) < 2e-5f,
          s"'$t' dim $j: got ${got(j)} want ${want(j)}")
    }

    // fertility of the REAL tokenizer path: subword splits measured through
    // the same vocab the model embeds with
    val sent = "the tokenizer dedup pipeline"
    val pieces = v0.encode(sent, 128).length - 2 // strip [CLS]/[SEP]
    assert(pieces == 6) // the, token ##izer, de ##dup, pipeline
    assert(pieces.toDouble / sent.split(" ").length == 1.5)
  }

  test("WordPieceIds: framing, truncation keeps [SEP], unknown word collapses to one [UNK]") {
    val v = new OnnxEmbedder.WordPieceIds(vocabLines)
    assert(v.encode("Hello, world", 16).toSeq == Seq(2L, 4L, 1L, 5L, 3L)) // ',' not in vocab → UNK
    assert(v.encode("engine", 16).toSeq == Seq(2L, 7L, 8L, 3L))
    val t = v.encode("hello world hello world hello", 4)
    assert(t.length == 4 && t.head == 2L && t.last == 3L)
    assert(v.encode("", 8).toSeq == Seq(2L, 3L))
  }

  test("encodePair: [CLS] a [SEP] b [SEP] framing; doc side truncates first, query survives whole") {
    import graft.onnx.TinyMpnet
    val v = new OnnxEmbedder.WordPieceIds(TinyMpnet.vocabLines)
    // cls=2 sep=3, the=4, spark=5, engine=6(+7? engine is one token id 6)
    assert(v.encodePair("the", "spark", 16).toSeq == Seq(2L, 4L, 3L, 5L, 3L))
    val t = v.encodePair("the spark", "engine data pipeline vector search index", 8)
    assert(t.length == 8 && t.last == 3L)
    assert(t.take(4).toSeq == Seq(2L, 4L, 5L, 3L), "query side must survive whole")
    // degenerate: query alone fills the window
    val q = v.encodePair("the spark engine data pipeline", "vector", 5)
    assert(q.head == 2L && q.length <= 5)
  }

  test("TinyMpnet cross export: in-graph masked mean-pool + linear head matches an independent composition; padding-invariant") {
    import graft.onnx.{OnnxCrossEncoder, TinyMpnet}
    val dir = java.nio.file.Files.createTempDirectory("graft_cross").toString
    val (cmp, cvp) = TinyMpnet.writeCrossTo(dir)
    val ce = new OnnxCrossEncoder(cmp, cvp)
    val query = "vector search"
    val docs = Seq(
      "the spark engine",
      "the tokenizer dedup pipeline quality stream scan",
      "zzz qqq")
    val batched = ce.scoreBatch(query, docs)
    assert(batched.length == 3)
    // padding invariance: each batched logit equals its singleton logit
    for ((d, i) <- docs.zipWithIndex) {
      val solo = ce.scoreBatch(query, Seq(d)).head
      assert(math.abs(batched(i) - solo) < 1e-6, s"doc $i: pad positions leaked into the head")
    }
    // independent composition check of the HEAD: run the HEADLESS body on
    // the same pair ids, mean-pool + Linear in double precision — the body
    // itself is validated against a from-scratch forward in the TinyMpnet
    // test, so this pins the pooling/head subgraph
    val (hmp, _) = TinyMpnet.writeTo(java.nio.file.Files.createTempDirectory("graft_cross_h").toString)
    val body  = Onnx.loadFile(hmp)
    val vocab = new OnnxEmbedder.WordPieceIds(TinyMpnet.vocabLines)
    val wH = TinyMpnet.weights("w_head", TinyMpnet.hidden, 0.4f)
    val bH = TinyMpnet.weights("b_head", 1, 0.1f)(0)
    for ((d, i) <- docs.zipWithIndex) {
      val ids = vocab.encodePair(query, d, 128)
      val s   = ids.length
      val feeds = Map[String, Onnx.Tensor](
        "input_ids" -> LTensor(Vector(1, s), ids),
        "attention_mask" -> LTensor(Vector(1, s), Array.fill(s)(1L)))
      val hid = body.run(feeds)("last_hidden_state").asInstanceOf[FTensor]
      val h   = TinyMpnet.hidden
      val pooled = Array.tabulate(h) { j =>
        ((0 until s).map(p => hid.data(p * h + j).toDouble).sum / s).toFloat.toDouble
      }
      val want = (pooled.zip(wH).map { case (a, w) => a * w }.sum.toFloat + bH).toDouble
      assert(math.abs(batched(i) - want) < 1e-5, s"doc $i: head logit ${batched(i)} != composed $want")
    }
  }

  test("rerankTopKWith + OnnxCrossEncoder: end-to-end two-stage rerank is deterministic and candidate-bounded") {
    import graft.onnx.{OnnxCrossEncoder, TinyMpnet}
    import graft.operators.Rank
    import spark.implicits._
    val (cmp, cvp) = TinyMpnet.writeCrossTo(
      java.nio.file.Files.createTempDirectory("graft_cross_rr").toString)
    val ce = new OnnxCrossEncoder(cmp, cvp)
    val docs = (0 until 60).map { i =>
      (i.toLong, s"the spark engine ${if (i % 3 == 0) "vector search index" else "crawl batch filter"} doc w$i")
    }.toDF("doc_id", "text")
    def run() = Rank.rerankTopKWith(docs, "doc_id", "text",
      terms = Seq("vector", "search"), query = "vector search index",
      scorer = ce, k = 5, nCandidates = 20)
      .collect().map(r => (r.getLong(0), r.getDouble(2)))
    val a = run(); val b = run()
    assert(a.length == 5 && a.sameElements(b), "model-backed rerank must be deterministic")
    assert(a.map(_._1).forall(_ % 3 == 0), "rerank must prefer the on-topic docs")
  }

  test("ParityCheck cross gate: self-parity passes, a corrupted pair fails alone") {
    import graft.onnx.{OnnxCrossEncoder, ParityCheck, TinyMpnet}
    val dir = java.nio.file.Files.createTempDirectory("graft_xparity").toString
    val (mp, vp) = TinyMpnet.writeCrossTo(dir)
    val ce = new OnnxCrossEncoder(mp, vp)
    val pairs = Seq(
      ("vector search", "the spark engine"),
      ("vector search", "crawl batch filter"),
      ("dedup pipeline", "the tokenizer dedup pipeline"))
    val logits = pairs.groupBy(_._1).toSeq.flatMap { case (q, ps) =>
      ps.map(_._2).zip(ce.scoreBatch(q, ps.map(_._2))).map { case (d, s) => (q, d, s) }
    }
    def writeReport(rows: Seq[(String, String, Double)]): Unit = {
      val pw = new java.io.PrintWriter(s"$dir/cross_parity.tsv", "UTF-8")
      pw.println("query\tdoc\tlogit")
      rows.foreach { case (q, d, s) => pw.println(f"$q\t$d\t$s%.6f") }
      pw.close()
    }
    writeReport(logits)
    val res = ParityCheck.runCross(dir)
    assert(res.size == 3 && res.forall(_.ok), res.mkString("; "))
    writeReport(logits.updated(1, (logits(1)._1, logits(1)._2, logits(1)._3 + 1.0)))
    val res2 = ParityCheck.runCross(dir)
    assert(res2.count(!_.ok) == 1, res2.mkString("; "))
  }

  test("ParityCheck harness: reads the report, gates per probe, a corrupted row fails alone") {
    import graft.onnx.{ParityCheck, TinyMpnet}
    val dir = java.nio.file.Files.createTempDirectory("graft_parity").toString
    val (mp, vp) = TinyMpnet.writeTo(dir)
    val emb = new OnnxEmbedder(mp, vp, TinyMpnet.hidden)
    val probes = Seq("the spark engine", "zzz qqq", "tokenizer quality stream")
    val vecs = emb.embedBatch(probes)
    def writeReport(rows: Seq[String]): Unit = {
      val pw = new java.io.PrintWriter(s"$dir/parity.tsv", "UTF-8")
      pw.println(s"dim\t${TinyMpnet.hidden}")
      rows.foreach(pw.println)
      pw.close()
    }
    val rows = probes.zip(vecs).map { case (s, v) =>
      s + "\t" + v.map(x => f"$x%.8f").mkString(",")
    }
    writeReport(rows)
    val res = ParityCheck.run(dir)
    assert(res.size == 3 && res.forall(_.ok), res.mkString("; "))
    // corrupt the second probe's expected vector: only that row may fail
    writeReport(rows.updated(1, {
      val Array(s, v) = rows(1).split('\t')
      s + "\t" + v.split(',').map(x => (x.toDouble + 0.1).toString).mkString(",")
    }))
    val res2 = ParityCheck.run(dir)
    assert(!res2(1).ok && res2(0).ok && res2(2).ok, res2.mkString("; "))
  }

  test("committed checkpoint: ParityCheck's deployment gate runs unconditionally against the in-repo model") {
    // fixtures/onnx/checkpoint{,_cross} are generated by
    // graft.onnx.CheckpointFixture and COMMITTED, so the full deployment
    // path — read model.onnx + vocab.txt off disk, WordPiece-tokenize,
    // run the graph, pool/normalize (or score pairs), parse the pinned
    // TSV, apply the release gates — exercises on every `sbt test` with
    // no env gate. The pinned vectors are a regression pin; correctness
    // is separately proven by the independent-forward specs above.
    val res = graft.onnx.ParityCheck.run("fixtures/onnx/checkpoint")
    assert(res.length == graft.onnx.CheckpointFixture.probes.length)
    assert(res.forall(_.ok), res.filterNot(_.ok).mkString("; "))
    val cres = graft.onnx.ParityCheck.runCross("fixtures/onnx/checkpoint_cross")
    assert(cres.length == graft.onnx.CheckpointFixture.crossPairs.length)
    assert(cres.forall(_.ok), cres.filterNot(_.ok).mkString("; "))
  }

  test("real all-mpnet-base-v2 parity (deployment-gated: set GRAFT_MPNET_DIR)") {
    // tools/export_mpnet_parity.py writes model.onnx + vocab.txt +
    // parity.tsv on a torch machine; this spec cancels in-sandbox exactly
    // like the Tesseract probe
    assume(sys.env.contains("GRAFT_MPNET_DIR"),
      "GRAFT_MPNET_DIR not set — run tools/export_mpnet_parity.py where torch is installed")
    val res = graft.onnx.ParityCheck.run(sys.env("GRAFT_MPNET_DIR"))
    // record the run: the report is the artifact a deployment keeps
    // (format pinned by fixtures/onnx/parity_report.sample.tsv)
    new java.io.File("target").mkdirs()
    graft.onnx.ParityCheck.writeReport(res, "target/mpnet_parity_report.tsv")
    assert(res.nonEmpty && res.forall(_.ok), res.filterNot(_.ok).mkString("; "))
  }
}
