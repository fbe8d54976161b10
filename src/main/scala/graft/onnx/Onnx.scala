package graft.onnx

import scala.collection.mutable

/** From-scratch ONNX model loader + executor (SURVEY §2.5 — closes the
  * V2/V3 real-model seam; reference: backend/embedding_service.py:52-62
  * runs all-mpnet-base-v2 through SentenceTransformers).
  *
  * The deployment story the reference implies — "drop a real model file
  * next to the engine" — cannot ship a runtime dependency here (the build
  * is deliberately zero-dep), so this implements the two PUBLIC formats
  * involved from first principles:
  *  - the protobuf wire encoding of `onnx.proto3` ([[ProtoReader]]), with
  *    the field numbers of ModelProto/GraphProto/NodeProto/TensorProto/
  *    AttributeProto hard-wired below;
  *  - a reference interpreter for the ONNX op subset that fixed-shape
  *    encoder/MLP exports use (see [[Ops.supported]]): elementwise math
  *    with numpy broadcasting, batched MatMul/Gemm, Gather, Transpose/
  *    Reshape/Concat/Unsqueeze/Squeeze, Softmax, reductions,
  *    LayerNormalization, Erf/Tanh/Sqrt/Pow, and the mask-building ops
  *    (Equal/Greater/Where/Expand/Slice — bool tensors run as int64 0/1).
  *
  * ONNX guarantees graph nodes arrive topologically sorted (a node's
  * inputs are graph inputs, initializers, or outputs of EARLIER nodes), so
  * execution is a single forward walk over the node list — no scheduler.
  *
  * Scope (declared): float32, int64 and bool (as int64 0/1) tensors;
  * single-graph models
  * (no If/Loop/Scan subgraphs); static shapes as produced by
  * `torch.onnx.export` with fixed batch/sequence sizes. Unknown ops fail
  * loudly with the supported list. This is a CORRECTNESS interpreter —
  * per-op array code, no SIMD/threading; at cluster scale the win is that
  * every partition embeds independently (`mapPartitions`), not per-core
  * kernel speed.
  */
object Onnx {

  /** Dense tensor: float32 or int64, row-major, dims == Array() is a scalar. */
  sealed trait Tensor {
    def dims: Vector[Int]
    def size: Int = dims.product
  }
  final case class FTensor(dims: Vector[Int], data: Array[Float]) extends Tensor {
    require(data.length == size, s"float tensor ${dims.mkString("x")} != ${data.length} values")
  }
  final case class LTensor(dims: Vector[Int], data: Array[Long]) extends Tensor {
    require(data.length == size, s"int64 tensor ${dims.mkString("x")} != ${data.length} values")
  }

  final case class Attr(
      i: Option[Long] = None,
      f: Option[Float] = None,
      s: Option[String] = None,
      ints: Vector[Long] = Vector.empty,
      floats: Vector[Float] = Vector.empty,
      t: Option[Tensor] = None,
  )

  final case class Node(opType: String, name: String, inputs: Vector[String],
      outputs: Vector[String], attrs: Map[String, Attr])

  final case class Graph(
      name: String,
      nodes: Vector[Node],
      initializers: Map[String, Tensor],
      inputNames: Vector[String],
      outputNames: Vector[String],
  ) {
    /** Graph inputs that need a runtime feed (some exporters also list
      * initializers as inputs; those don't).
      */
    def feedNames: Vector[String] = inputNames.filterNot(initializers.contains)

    /** Execute the graph on `feeds`; returns the declared graph outputs. */
    def run(feeds: Map[String, Tensor]): Map[String, Tensor] = {
      val missing = feedNames.filterNot(feeds.contains)
      require(missing.isEmpty, s"missing graph inputs: ${missing.mkString(", ")}")
      val env = mutable.Map[String, Tensor]() ++= initializers ++= feeds
      for (n <- nodes) Ops.exec(n, env)
      outputNames.map(o => o -> env.getOrElse(o,
        throw new IllegalStateException(s"graph output '$o' never produced"))).toMap
    }
  }

  /** IEEE 754 half → float (Java 17 lacks Float.float16ToFloat): sign,
    * 5-bit exponent with subnormal and inf/NaN handling, 10-bit mantissa.
    */
  def halfToFloat(bits: Int): Float = {
    val sign = (bits >>> 15) & 1
    val exp  = (bits >>> 10) & 0x1f
    val man  = bits & 0x3ff
    val f =
      if (exp == 0) {
        if (man == 0) 0f
        else (man / 1024f) * math.pow(2, -14).toFloat // subnormal
      } else if (exp == 0x1f) {
        if (man == 0) Float.PositiveInfinity else Float.NaN
      } else (1f + man / 1024f) * math.pow(2, exp - 15).toFloat
    if (sign == 1) -f else f
  }

  /** Parse an ONNX model file's bytes (ModelProto). */
  def load(bytes: Array[Byte]): Graph = {
    val m     = new ProtoReader(bytes, 0, bytes.length)
    var graph = Option.empty[Graph]
    while (m.hasNext) {
      val (field, wt) = m.readTag()
      field match {
        case 7 => graph = Some(parseGraph(m.readMessage())) // ModelProto.graph
        case _ => m.skip(wt)
      }
    }
    graph.getOrElse(throw new IllegalArgumentException("not an ONNX model (no graph)"))
  }

  def loadFile(path: String): Graph =
    load(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)))

  private def parseGraph(r: ProtoReader): Graph = {
    val nodes  = Vector.newBuilder[Node]
    val inits  = Map.newBuilder[String, Tensor]
    val ins    = Vector.newBuilder[String]
    val outs   = Vector.newBuilder[String]
    var name   = ""
    while (r.hasNext) {
      val (field, wt) = r.readTag()
      field match {
        case 1  => nodes += parseNode(r.readMessage())
        case 2  => name = r.readString()
        case 5  => val t = parseTensor(r.readMessage()); inits += t._1 -> t._2
        case 11 => ins += parseValueInfoName(r.readMessage())
        case 12 => outs += parseValueInfoName(r.readMessage())
        case _  => r.skip(wt)
      }
    }
    Graph(name, nodes.result(), inits.result(), ins.result(), outs.result())
  }

  private def parseValueInfoName(r: ProtoReader): String = {
    var name = ""
    while (r.hasNext) {
      val (field, wt) = r.readTag()
      if (field == 1) name = r.readString() else r.skip(wt)
    }
    name
  }

  private def parseNode(r: ProtoReader): Node = {
    val ins   = Vector.newBuilder[String]
    val outs  = Vector.newBuilder[String]
    val attrs = Map.newBuilder[String, Attr]
    var op    = ""
    var name  = ""
    while (r.hasNext) {
      val (field, wt) = r.readTag()
      field match {
        case 1 => ins += r.readString()
        case 2 => outs += r.readString()
        case 3 => name = r.readString()
        case 4 => op = r.readString()
        case 5 => val a = parseAttr(r.readMessage()); attrs += a._1 -> a._2
        case _ => r.skip(wt)
      }
    }
    Node(op, name, ins.result(), outs.result(), attrs.result())
  }

  private def parseAttr(r: ProtoReader): (String, Attr) = {
    var name = ""
    var a    = Attr()
    while (r.hasNext) {
      val (field, wt) = r.readTag()
      field match {
        case 1 => name = r.readString()
        case 2 => a = a.copy(f = Some(java.lang.Float.intBitsToFloat(r.readFixed32())))
        case 3 => a = a.copy(i = Some(r.readVarint()))
        case 4 => a = a.copy(s = Some(new String(r.readBytes(), java.nio.charset.StandardCharsets.UTF_8)))
        case 5 => a = a.copy(t = Some(parseTensor(r.readMessage())._2))
        case 7 => a = a.copy(floats = a.floats ++ r.floatsOf(wt))
        case 8 => a = a.copy(ints = a.ints ++ r.longsOf(wt))
        case _ => r.skip(wt)
      }
    }
    (name, a)
  }

  /** TensorProto → (name, tensor). Values arrive either typed
    * (float_data/int64_data/int32_data) or as little-endian raw_data.
    */
  private def parseTensor(r: ProtoReader): (String, Tensor) = {
    val dims   = Vector.newBuilder[Int]
    var dtype  = 1 // FLOAT
    var name   = ""
    val fdata  = Vector.newBuilder[Float]
    val ldata  = Vector.newBuilder[Long]
    var raw    = Array.empty[Byte]
    while (r.hasNext) {
      val (field, wt) = r.readTag()
      field match {
        case 1 => r.longsOf(wt).foreach(dims += _.toInt)
        case 2 => dtype = r.readVarint().toInt
        case 4 => fdata ++= r.floatsOf(wt)
        case 5 => ldata ++= r.longsOf(wt) // int32_data
        case 7 => ldata ++= r.longsOf(wt) // int64_data
        case 8 => name = r.readString()
        case 9 => raw = r.readBytes()
        case _ => r.skip(wt)
      }
    }
    val d = dims.result()
    val t: Tensor = dtype match {
      case 1 => // FLOAT
        val fs = fdata.result()
        val data =
          if (fs.nonEmpty) fs.toArray
          else {
            val bb = java.nio.ByteBuffer.wrap(raw).order(java.nio.ByteOrder.LITTLE_ENDIAN)
            Array.fill(raw.length / 4)(bb.getFloat())
          }
        FTensor(d, data)
      case 6 | 7 => // INT32 | INT64
        val ls = ldata.result()
        val data =
          if (ls.nonEmpty) ls.toArray
          else {
            val bb = java.nio.ByteBuffer.wrap(raw).order(java.nio.ByteOrder.LITTLE_ENDIAN)
            if (dtype == 7) Array.fill(raw.length / 8)(bb.getLong())
            else Array.fill(raw.length / 4)(bb.getInt().toLong)
          }
        LTensor(d, data)
      case 10 => // FLOAT16 — widened to float32 at load (half-precision
        // exports halve the file; the interpreter computes in f32 anyway).
        // Typed values ride int32_data as uint16 bit patterns per the spec.
        val ls = ldata.result()
        val data =
          if (ls.nonEmpty) ls.map(v => halfToFloat(v.toInt & 0xffff)).toArray
          else {
            val bb = java.nio.ByteBuffer.wrap(raw).order(java.nio.ByteOrder.LITTLE_ENDIAN)
            Array.fill(raw.length / 2)(halfToFloat(bb.getShort() & 0xffff))
          }
        FTensor(d, data)
      case 9 => // BOOL — runtime convention: int64 0/1 (see Ops: Equal/Where)
        val ls = ldata.result()
        val data =
          if (ls.nonEmpty) ls.toArray
          else raw.map(b => if (b == 0) 0L else 1L)
        LTensor(d, data)
      case other =>
        throw new IllegalArgumentException(
          s"tensor '$name': unsupported data_type $other (float32/16, int32/64 and bool only)")
    }
    (name, t)
  }
}
