package graft.onnx

import graft.onnx.Onnx.{Attr, FTensor, LTensor, Node, Tensor}

import scala.collection.mutable

/** Reference interpreter for the ONNX op subset fixed-shape encoder/MLP
  * exports use. Semantics follow the public ONNX operator spec (opset 13+
  * defaults); per-op notes inline where a default matters (Softmax axis,
  * keepdims, Unsqueeze axes moving from attribute to input, …).
  *
  * Numerics: float32 storage with float64 accumulation in reductions and
  * matmul (the same contract the repo's aggregations use); Erf uses the
  * Abramowitz–Stegun 7.1.26 rational approximation (|err| < 1.5e-7 —
  * below float32 resolution, so GELU built on it matches a torch export
  * to the last ulp that float32 can represent).
  */
private[onnx] object Ops {

  val supported: Set[String] = Set(
    "Add", "Sub", "Mul", "Div", "Pow", "MatMul", "Gemm", "Gather", "Transpose",
    "Reshape", "Concat", "Unsqueeze", "Squeeze", "Softmax", "ReduceMean",
    "ReduceSum", "LayerNormalization", "Erf", "Sqrt", "Tanh", "Relu",
    "Sigmoid", "Exp", "Log", "Neg", "Cast", "Constant", "Identity", "Shape",
    "Equal", "Greater", "Where", "Expand", "Slice")

  def exec(n: Node, env: mutable.Map[String, Tensor]): Unit = {
    def in(i: Int): Tensor = env.getOrElse(n.inputs(i),
      throw new IllegalStateException(s"${n.opType} '${n.name}': missing input '${n.inputs(i)}'"))
    def inOpt(i: Int): Option[Tensor] =
      if (i < n.inputs.length && n.inputs(i).nonEmpty) Some(in(i)) else None
    def f(i: Int): FTensor = in(i) match {
      case t: FTensor => t
      case _ => throw new IllegalArgumentException(s"${n.opType} '${n.name}': input $i must be float")
    }
    def l(i: Int): LTensor = in(i) match {
      case t: LTensor => t
      case _ => throw new IllegalArgumentException(s"${n.opType} '${n.name}': input $i must be int64")
    }
    def attr(name: String): Option[Attr] = n.attrs.get(name)
    def intAttr(name: String, dflt: Long): Long = attr(name).flatMap(_.i).getOrElse(dflt)
    def floatAttr(name: String, dflt: Float): Float = attr(name).flatMap(_.f).getOrElse(dflt)

    val out: Tensor = n.opType match {
      case "Add" => binary(f(0), f(1), _ + _)
      case "Sub" => binary(f(0), f(1), _ - _)
      case "Mul" => binary(f(0), f(1), _ * _)
      case "Div" => binary(f(0), f(1), _ / _)
      case "Pow" => binary(f(0), f(1), (a, b) => math.pow(a, b).toFloat)

      case "MatMul" => matmul(f(0), f(1))

      case "Gemm" =>
        val alpha  = floatAttr("alpha", 1f)
        val beta   = floatAttr("beta", 1f)
        val transA = intAttr("transA", 0) == 1
        val transB = intAttr("transB", 0) == 1
        val a0     = f(0); val b0 = f(1)
        require(a0.dims.length == 2 && b0.dims.length == 2, "Gemm needs 2-D inputs")
        val a  = if (transA) transpose2d(a0) else a0
        val b  = if (transB) transpose2d(b0) else b0
        val ab = matmul(a, b)
        val scaled = FTensor(ab.dims, ab.data.map(_ * alpha))
        inOpt(2) match {
          case Some(c: FTensor) if beta != 0f =>
            binary(scaled, FTensor(c.dims, c.data.map(_ * beta)), _ + _)
          case _ => scaled
        }

      case "Gather" =>
        val axis = intAttr("axis", 0).toInt
        gather(in(0), l(1), axis)

      case "Transpose" =>
        val x    = f(0)
        val perm = attr("perm").map(_.ints.map(_.toInt).toVector)
          .getOrElse(x.dims.indices.reverse.toVector)
        transpose(x, perm)

      case "Reshape" =>
        val x     = in(0)
        val shape = l(1).data.map(_.toInt)
        val dims  = resolveReshape(x.dims, shape.toVector)
        withDims(x, dims)

      case "Concat" =>
        val axis = norm(intAttr("axis", 0).toInt, f(0).dims.length)
        concat(n.inputs.map(env(_).asInstanceOf[FTensor]).toVector, axis)

      case "Unsqueeze" =>
        // opset 13 moved axes from attribute to input — accept both
        val x    = in(0)
        val nAxes = attr("axes").map(_.ints.length).getOrElse(l(1).data.length)
        // spec: negative axes normalize against the OUTPUT rank (in rank + #axes)
        val axes = attr("axes").map(_.ints).getOrElse(l(1).data.toVector)
          .map(a => norm(a.toInt, x.dims.length + nAxes)).sorted
        val dims = axes.foldLeft(x.dims)((d, a) => (d.take(a) :+ 1) ++ d.drop(a))
        withDims(x, dims)

      case "Squeeze" =>
        val x = in(0)
        val axes = attr("axes").map(_.ints).orElse(
          inOpt(1).map(_.asInstanceOf[LTensor].data.toVector)) match {
          case Some(as) => as.map(a => norm(a.toInt, x.dims.length)).toSet
          case None     => x.dims.zipWithIndex.collect { case (1, i) => i }.toSet
        }
        withDims(x, x.dims.zipWithIndex.collect { case (d, i) if !axes(i) => d })

      case "Softmax" =>
        // opset 13 default axis = -1 (the opset-1 flatten-to-2D form is not
        // modeled; exporters on current opsets emit the -1 default)
        softmax(f(0), norm(intAttr("axis", -1).toInt, f(0).dims.length))

      case "ReduceMean" => reduce(f(0), reduceAxes(f(0), attr("axes"), inOpt(1)),
        intAttr("keepdims", 1) == 1, mean = true)
      case "ReduceSum"  => reduce(f(0), reduceAxes(f(0), attr("axes"), inOpt(1)),
        intAttr("keepdims", 1) == 1, mean = false)

      case "LayerNormalization" =>
        layerNorm(f(0), f(1), inOpt(2).map(_.asInstanceOf[FTensor]),
          norm(intAttr("axis", -1).toInt, f(0).dims.length), floatAttr("epsilon", 1e-5f))

      case "Erf"     => unary(f(0), erf)
      case "Sqrt"    => unary(f(0), x => math.sqrt(x).toFloat)
      case "Tanh"    => unary(f(0), x => math.tanh(x).toFloat)
      case "Relu"    => unary(f(0), x => if (x > 0f) x else 0f)
      case "Sigmoid" => unary(f(0), x => (1.0 / (1.0 + math.exp(-x))).toFloat)
      case "Exp"     => unary(f(0), x => math.exp(x).toFloat)
      case "Log"     => unary(f(0), x => math.log(x).toFloat)
      case "Neg"     => unary(f(0), x => -x)

      case "Cast" =>
        val to = intAttr("to", 1).toInt // TensorProto.DataType
        (in(0), to) match {
          case (t: FTensor, 1)     => t
          case (t: LTensor, 6 | 7) => t
          case (t: FTensor, 6 | 7) => LTensor(t.dims, t.data.map(_.toLong))
          case (t: LTensor, 1)     => FTensor(t.dims, t.data.map(_.toFloat))
          case (_, other)          => throw new IllegalArgumentException(s"Cast to=$other unsupported")
        }

      case "Constant" =>
        attr("value").flatMap(_.t).getOrElse(
          throw new IllegalArgumentException("Constant without tensor value"))

      case "Identity" => in(0)

      // bool runtime convention: int64 0/1 (TensorProto BOOL parses to the
      // same) — what HF encoder exports build their attention masks with
      case "Equal" =>
        (in(0), in(1)) match {
          case (a: FTensor, b: FTensor) =>
            val dims = broadcastDims(a.dims, b.dims)
            val ia = bcast(dims, a.dims); val ib = bcast(dims, b.dims)
            LTensor(dims, Array.tabulate(dims.product)(i => if (a.data(ia(i)) == b.data(ib(i))) 1L else 0L))
          case (a: LTensor, b: LTensor) =>
            val dims = broadcastDims(a.dims, b.dims)
            val ia = bcast(dims, a.dims); val ib = bcast(dims, b.dims)
            LTensor(dims, Array.tabulate(dims.product)(i => if (a.data(ia(i)) == b.data(ib(i))) 1L else 0L))
          case _ => throw new IllegalArgumentException("Equal needs matching tensor kinds")
        }

      case "Greater" =>
        val a = f(0); val b = f(1)
        val dims = broadcastDims(a.dims, b.dims)
        val ia = bcast(dims, a.dims); val ib = bcast(dims, b.dims)
        LTensor(dims, Array.tabulate(dims.product)(i => if (a.data(ia(i)) > b.data(ib(i))) 1L else 0L))

      case "Where" =>
        val c = l(0)
        val dims0 = broadcastDims(c.dims, in(1).dims)
        val dims  = broadcastDims(dims0, in(2).dims)
        val ic = bcast(dims, c.dims)
        (in(1), in(2)) match {
          case (x: FTensor, y: FTensor) =>
            val ix = bcast(dims, x.dims); val iy = bcast(dims, y.dims)
            FTensor(dims, Array.tabulate(dims.product)(i =>
              if (c.data(ic(i)) != 0L) x.data(ix(i)) else y.data(iy(i))))
          case (x: LTensor, y: LTensor) =>
            val ix = bcast(dims, x.dims); val iy = bcast(dims, y.dims)
            LTensor(dims, Array.tabulate(dims.product)(i =>
              if (c.data(ic(i)) != 0L) x.data(ix(i)) else y.data(iy(i))))
          case _ => throw new IllegalArgumentException("Where branches need matching tensor kinds")
        }

      case "Expand" =>
        val shape = l(1).data.map(_.toInt).toVector
        in(0) match {
          case x: FTensor =>
            val dims = broadcastDims(x.dims, shape)
            val ix = bcast(dims, x.dims)
            FTensor(dims, Array.tabulate(dims.product)(i => x.data(ix(i))))
          case x: LTensor =>
            val dims = broadcastDims(x.dims, shape)
            val ix = bcast(dims, x.dims)
            LTensor(dims, Array.tabulate(dims.product)(i => x.data(ix(i))))
        }

      case "Slice" =>
        // opset 13 form: starts/ends/axes/steps as inputs; negative
        // starts/ends wrap, ends clamp, steps must be positive (declared —
        // reverse slicing doesn't occur in encoder exports)
        val x      = in(0)
        val starts = l(1).data
        val ends   = l(2).data
        val axes   = inOpt(3).map(_.asInstanceOf[LTensor].data.map(a => norm(a.toInt, x.dims.length)))
          .getOrElse(starts.indices.map(identity[Int]).toArray)
        val steps = inOpt(4).map(_.asInstanceOf[LTensor].data).getOrElse(Array.fill(starts.length)(1L))
        require(steps.forall(_ >= 1), s"Slice: negative steps unsupported (${steps.mkString(",")})")
        var dims = x.dims
        var lo   = Vector.fill(x.dims.length)(0)
        var st   = Vector.fill(x.dims.length)(1)
        for (k <- starts.indices) {
          val ax = axes(k); val d = x.dims(ax)
          val s0 = { val v = starts(k); (if (v < 0) v + d else v).max(0).min(d).toInt }
          val e0 = { val v = ends(k); (if (v < 0) v + d else v).max(0).min(d).toInt }
          val stp = steps(k).toInt
          lo = lo.updated(ax, s0)
          st = st.updated(ax, stp)
          dims = dims.updated(ax, math.max(0, (e0 - s0 + stp - 1) / stp))
        }
        val sIn  = strides(x.dims)
        val sOut = strides(dims)
        def srcOf(i: Int): Int = {
          var rem = i; var src = 0; var d = 0
          while (d < dims.length) {
            val c = rem / sOut(d); rem %= sOut(d)
            src += (lo(d) + c * st(d)) * sIn(d)
            d += 1
          }
          src
        }
        x match {
          case t: FTensor => FTensor(dims, Array.tabulate(dims.product)(i => t.data(srcOf(i))))
          case t: LTensor => LTensor(dims, Array.tabulate(dims.product)(i => t.data(srcOf(i))))
        }

      case "Shape" =>
        val d = in(0).dims
        LTensor(Vector(d.length), d.map(_.toLong).toArray)

      case other =>
        throw new IllegalArgumentException(
          s"unsupported ONNX op '$other' (node '${n.name}'); supported: ${supported.toSeq.sorted.mkString(", ")}")
    }
    env(n.outputs.head) = out
  }

  // ---- shape helpers ------------------------------------------------------

  private def norm(axis: Int, rank: Int): Int = if (axis < 0) axis + rank else axis

  private def withDims(t: Tensor, dims: Vector[Int]): Tensor = t match {
    case FTensor(_, d) => FTensor(dims, d)
    case LTensor(_, d) => LTensor(dims, d)
  }

  private def resolveReshape(from: Vector[Int], shape: Vector[Int]): Vector[Int] = {
    val withCopies = shape.zipWithIndex.map { case (s, i) => if (s == 0) from(i) else s }
    val total      = from.product
    val negIdx     = withCopies.indexOf(-1)
    if (negIdx < 0) withCopies
    else {
      val known = withCopies.filter(_ != -1).product
      withCopies.updated(negIdx, total / math.max(known, 1))
    }
  }

  private def strides(dims: Vector[Int]): Array[Int] = {
    val s = new Array[Int](dims.length)
    var acc = 1
    var i = dims.length - 1
    while (i >= 0) { s(i) = acc; acc *= dims(i); i -= 1 }
    s
  }

  // ---- elementwise with numpy broadcasting --------------------------------

  private def unary(x: FTensor, fn: Float => Float): FTensor =
    FTensor(x.dims, x.data.map(fn))

  private[onnx] def broadcastDims(a: Vector[Int], b: Vector[Int]): Vector[Int] = {
    val rank = math.max(a.length, b.length)
    val pa   = Vector.fill(rank - a.length)(1) ++ a
    val pb   = Vector.fill(rank - b.length)(1) ++ b
    pa.zip(pb).map { case (x, y) =>
      if (x == y || y == 1) x
      else if (x == 1) y
      else throw new IllegalArgumentException(
        s"cannot broadcast ${a.mkString("x")} with ${b.mkString("x")}")
    }
  }

  /** Flat-index mapper from a broadcast output shape back into an operand
    * (stride 0 on broadcast dimensions).
    */
  private def bcast(outDims: Vector[Int], inDims: Vector[Int]): Int => Int = {
    val rank = outDims.length
    val pad  = Vector.fill(rank - inDims.length)(1) ++ inDims
    val stIn = strides(pad)
    val eff  = pad.indices.map(i => if (pad(i) == 1 && outDims(i) != 1) 0 else stIn(i)).toArray
    val sOut = strides(outDims)
    (i: Int) => {
      var rem = i; var src = 0; var d = 0
      while (d < rank) {
        val c = rem / sOut(d); rem %= sOut(d)
        src += c * eff(d)
        d += 1
      }
      src
    }
  }

  private def binary(a: FTensor, b: FTensor, fn: (Float, Float) => Float): FTensor = {
    if (a.dims == b.dims) { // fast path: aligned
      val out = new Array[Float](a.data.length)
      var i = 0
      while (i < out.length) { out(i) = fn(a.data(i), b.data(i)); i += 1 }
      return FTensor(a.dims, out)
    }
    val dims = broadcastDims(a.dims, b.dims)
    val rank = dims.length
    // stride 0 on broadcast dimensions walks the smaller operand in place
    def bstrides(d: Vector[Int]): Array[Int] = {
      val pad = Vector.fill(rank - d.length)(1) ++ d
      val st  = strides(pad)
      pad.indices.map(i => if (pad(i) == 1 && dims(i) != 1) 0 else st(i)).toArray
    }
    val sa = bstrides(a.dims); val sb = bstrides(b.dims)
    val so = strides(dims)
    val out = new Array[Float](dims.product)
    var i = 0
    while (i < out.length) {
      var ia = 0; var ib = 0; var rem = i; var d = 0
      while (d < rank) {
        val c = rem / so(d); rem %= so(d)
        ia += c * sa(d); ib += c * sb(d)
        d += 1
      }
      out(i) = fn(a.data(ia), b.data(ib))
      i += 1
    }
    FTensor(dims, out)
  }

  // ---- matmul / transpose -------------------------------------------------

  private def transpose2d(x: FTensor): FTensor = transpose(x, Vector(1, 0))

  private def transpose(x: FTensor, perm: Vector[Int]): FTensor = {
    require(perm.length == x.dims.length && perm.sorted == x.dims.indices.toVector,
      s"bad perm ${perm.mkString(",")} for rank ${x.dims.length}")
    val dims = perm.map(x.dims)
    val sIn  = strides(x.dims)
    val sOut = strides(dims)
    val out  = new Array[Float](x.data.length)
    var i = 0
    while (i < out.length) {
      var src = 0; var rem = i; var d = 0
      while (d < dims.length) {
        val c = rem / sOut(d); rem %= sOut(d)
        src += c * sIn(perm(d))
        d += 1
      }
      out(i) = x.data(src)
      i += 1
    }
    FTensor(dims, out)
  }

  /** Batched MatMul per the ONNX/numpy contract: 1-D operands get a
    * temporary unit dim; batch dims broadcast; float64 accumulation.
    */
  private def matmul(a0: FTensor, b0: FTensor): FTensor = {
    val a = if (a0.dims.length == 1) FTensor(Vector(1, a0.dims(0)), a0.data) else a0
    val b = if (b0.dims.length == 1) FTensor(b0.dims :+ 1, b0.data) else b0
    val (m, k)  = (a.dims(a.dims.length - 2), a.dims.last)
    val (k2, p) = (b.dims(b.dims.length - 2), b.dims.last)
    require(k == k2, s"MatMul inner dims differ: ${a.dims.mkString("x")} vs ${b.dims.mkString("x")}")
    val batchDims = broadcastDims(a.dims.dropRight(2), b.dims.dropRight(2))
    val nBatch    = batchDims.product
    // Per-dimension broadcast mapping (stride 0 on singleton dims), right-aligned
    // against batchDims — a flat modulo is wrong for mixed shapes like [2,1]x[1,3].
    def batchStrides(opBatch: Vector[Int]): Array[Int] = {
      val pad = Vector.fill(batchDims.length - opBatch.length)(1) ++ opBatch
      val s   = new Array[Int](batchDims.length)
      var acc = 1
      var d = batchDims.length - 1
      while (d >= 0) { s(d) = if (pad(d) == 1) 0 else acc; acc *= pad(d); d -= 1 }
      s
    }
    val aStr = batchStrides(a.dims.dropRight(2))
    val bStr = batchStrides(b.dims.dropRight(2))
    val oStr = strides(if (batchDims.isEmpty) Vector(1) else batchDims)
    val out  = new Array[Float](nBatch * m * p)
    var bi = 0
    while (bi < nBatch) {
      // decompose bi over batchDims, gather each operand's batch offset
      var ai = 0; var bj = 0
      var rem = bi; var d = 0
      while (d < batchDims.length) {
        val c = rem / oStr(d); rem %= oStr(d)
        ai += c * aStr(d); bj += c * bStr(d)
        d += 1
      }
      val aOff = ai * m * k; val bOff = bj * k2 * p; val oOff = bi * m * p
      var r = 0
      while (r < m) {
        var c = 0
        while (c < p) {
          var acc = 0.0
          var t = 0
          while (t < k) { acc += a.data(aOff + r * k + t).toDouble * b.data(bOff + t * p + c); t += 1 }
          out(oOff + r * p + c) = acc.toFloat
          c += 1
        }
        r += 1
      }
      bi += 1
    }
    val dims = batchDims ++ Vector(m, p)
    val trimmed = // restore 1-D operand contract
      if (a0.dims.length == 1 && b0.dims.length == 1) Vector.empty[Int]
      else if (a0.dims.length == 1) dims.patch(dims.length - 2, Nil, 1)
      else if (b0.dims.length == 1) dims.dropRight(1)
      else dims
    FTensor(if (trimmed.isEmpty) Vector(1) else trimmed, out)
  }

  // ---- structural ---------------------------------------------------------

  private def gather(data: Tensor, idx: LTensor, axis0: Int): Tensor = {
    val axis  = norm(axis0, data.dims.length)
    val outer = data.dims.take(axis).product
    val ax    = data.dims(axis)
    val inner = data.dims.drop(axis + 1).product
    val dims  = data.dims.take(axis) ++ idx.dims ++ data.dims.drop(axis + 1)
    def run[T](src: Array[T], make: (Vector[Int], Array[T]) => Tensor)(
        implicit ct: scala.reflect.ClassTag[T]): Tensor = {
      val out = new Array[T](math.max(dims.product, 0))
      var o = 0
      var oi = 0
      while (oi < outer) {
        var ii = 0
        while (ii < idx.data.length) {
          val j0 = idx.data(ii)
          val j  = (if (j0 < 0) j0 + ax else j0).toInt
          require(j >= 0 && j < ax, s"Gather index $j0 out of range [0,$ax)")
          System.arraycopy(src, (oi * ax + j) * inner, out, o, inner)
          o += inner
          ii += 1
        }
        oi += 1
      }
      make(dims, out)
    }
    data match {
      case FTensor(_, d) => run[Float](d, FTensor.apply)
      case LTensor(_, d) => run[Long](d, LTensor.apply)
    }
  }

  private def concat(xs: Vector[FTensor], axis: Int): FTensor = {
    val dims  = xs.head.dims.updated(axis, xs.map(_.dims(axis)).sum)
    val outer = xs.head.dims.take(axis).product
    val inner = xs.head.dims.drop(axis + 1).product
    val out   = new Array[Float](dims.product)
    var o = 0
    var oi = 0
    while (oi < outer) {
      for (x <- xs) {
        val span = x.dims(axis) * inner
        System.arraycopy(x.data, oi * span, out, o, span)
        o += span
      }
      oi += 1
    }
    FTensor(dims, out)
  }

  // ---- math over axes -----------------------------------------------------

  private def softmax(x: FTensor, axis: Int): FTensor = {
    val ax    = x.dims(axis)
    val inner = x.dims.drop(axis + 1).product
    val outer = x.dims.take(axis).product
    val out   = new Array[Float](x.data.length)
    var oi = 0
    while (oi < outer) {
      var ii = 0
      while (ii < inner) {
        val base = oi * ax * inner + ii
        var mx = Float.NegativeInfinity
        var j = 0
        while (j < ax) { val v = x.data(base + j * inner); if (v > mx) mx = v; j += 1 }
        var sum = 0.0
        j = 0
        while (j < ax) { sum += math.exp((x.data(base + j * inner) - mx).toDouble); j += 1 }
        j = 0
        while (j < ax) {
          out(base + j * inner) = (math.exp((x.data(base + j * inner) - mx).toDouble) / sum).toFloat
          j += 1
        }
        ii += 1
      }
      oi += 1
    }
    FTensor(x.dims, out)
  }

  private def reduceAxes(x: FTensor, attr: Option[Attr], axesIn: Option[Tensor]): Seq[Int] = {
    val raw = attr.map(_.ints.map(_.toInt))
      .orElse(axesIn.map(_.asInstanceOf[LTensor].data.map(_.toInt).toSeq))
      .getOrElse(x.dims.indices)
    raw.map(norm(_, x.dims.length)).sorted
  }

  private def reduce(x: FTensor, axes: Seq[Int], keepdims: Boolean, mean: Boolean): FTensor = {
    val axisSet = axes.toSet
    val outDimsKept = x.dims.zipWithIndex.map { case (d, i) => if (axisSet(i)) 1 else d }
    val sIn  = strides(x.dims)
    val sOut = strides(outDimsKept)
    val out  = new Array[Double](outDimsKept.product)
    var i = 0
    while (i < x.data.length) {
      var o = 0; var rem = i; var d = 0
      while (d < x.dims.length) {
        val c = rem / sIn(d); rem %= sIn(d)
        if (!axisSet(d)) o += c * sOut(d)
        d += 1
      }
      out(o) += x.data(i)
      i += 1
    }
    val n = axes.map(x.dims(_)).product.toDouble
    val data = out.map(v => (if (mean) v / n else v).toFloat)
    val dims =
      if (keepdims) outDimsKept
      else x.dims.zipWithIndex.collect { case (d, i) if !axisSet(i) => d }
    FTensor(if (dims.isEmpty) Vector(1) else dims, data)
  }

  private def layerNorm(x: FTensor, scale: FTensor, bias: Option[FTensor],
      axis: Int, eps: Float): FTensor = {
    val inner = x.dims.drop(axis).product // normalized span
    val outer = x.data.length / inner
    val out   = new Array[Float](x.data.length)
    var oi = 0
    while (oi < outer) {
      val base = oi * inner
      var sum = 0.0
      var j = 0
      while (j < inner) { sum += x.data(base + j); j += 1 }
      val mu = sum / inner
      var varAcc = 0.0
      j = 0
      while (j < inner) { val d = x.data(base + j) - mu; varAcc += d * d; j += 1 }
      val inv = 1.0 / math.sqrt(varAcc / inner + eps)
      j = 0
      while (j < inner) {
        val nrm = ((x.data(base + j) - mu) * inv).toFloat
        out(base + j) = nrm * scale.data(j % scale.data.length) +
          bias.map(b => b.data(j % b.data.length)).getOrElse(0f)
        j += 1
      }
      oi += 1
    }
    FTensor(x.dims, out)
  }

  /** Abramowitz–Stegun 7.1.26: max abs error 1.5e-7, below float32 ulp. */
  private def erf(x: Float): Float = {
    val sign = if (x < 0) -1.0 else 1.0
    val ax   = math.abs(x.toDouble)
    val t    = 1.0 / (1.0 + 0.3275911 * ax)
    val y    = 1.0 - (((((1.061405429 * t - 1.453152027) * t) + 1.421413741) * t - 0.284496736) * t + 0.254829592) * t * math.exp(-ax * ax)
    (sign * y).toFloat
  }
}
