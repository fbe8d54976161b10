package graft.operators

/** UMAP (McInnes, Healy, Melville 2018, arXiv:1802.03426) — the reference's
  * M5 method (`umap.UMAP(n_components=3, random_state=42)`,
  * backend/dimensionality_reduction.py:101-105, i.e. umap-learn defaults:
  * n_neighbors=15, min_dist=0.1, spread=1.0, euclidean). Implemented from
  * the paper for driver-scale fits (row-capped like [[Hdbscan]] — the fit
  * sample is bounded, the TRANSFORM is distributed, see [[Ml.UmapReducer]]):
  *
  *  1. exact k-NN (the row cap makes O(n²·dim) acceptable; rows are
  *     embarrassingly parallel);
  *  2. smooth-kNN calibration: per point, ρ_i = nearest-neighbor distance
  *     and σ_i solved by bisection so Σ_j exp(−max(0, d_ij−ρ_i)/σ_i) =
  *     log₂(k) — the local fuzzy-neighborhood radius;
  *  3. fuzzy simplicial set: directed weights w(i→j) = exp(−max(0,
  *     d_ij−ρ_i)/σ_i), symmetrized with the probabilistic t-conorm
  *     w = w₁ + w₂ − w₁·w₂;
  *  4. the (a, b) curve is least-squares fitted to the min_dist/spread
  *     target Ψ(x) = 1 for x ≤ min_dist, exp(−(x−min_dist)/spread) after —
  *     same contract as umap-learn's `find_ab_params` (≈ (1.577, 0.895)
  *     at the defaults);
  *  5. init: PCA projection (deterministic, centred, scaled to ±10) plus
  *     seeded sub-1e-4 jitter — umap-learn's spectral init exists to seed a
  *     globally-sensible layout, which a PCA basis also provides, without
  *     an eigensolver dependence on graph connectivity;
  *  6. layout: SGD over the symmetric edge set (both directions, like the
  *     COO loop in umap-learn's `optimize_layout_euclidean`): attraction
  *     −2ab·d^{2(b−1)}/(1+a·d^{2b}) moving BOTH ends, `negativeSampleRate`
  *     uniform negatives per positive repulsing the head by
  *     2b/((0.001+d²)(1+a·d^{2b})), per-dimension gradient clip ±4,
  *     linearly decaying learning rate, per-edge sampling cadence
  *     ∝ edge weight (`make_epochs_per_sample` semantics).
  *
  * Deterministic for a fixed input order and seed: callers sort by id,
  * the RNG is an explicit xorshift, and the SGD loop is sequential.
  */
object Umap {

  final case class Params(
      nComponents: Int = 3,
      nNeighbors: Int = 15,
      minDist: Double = 0.1,
      spread: Double = 1.0,
      nEpochs: Int = 0, // 0 = auto: umap-learn's 500 small / 200 large rule
      negativeSampleRate: Int = 5,
      learningRate: Double = 1.0,
      seed: Long = 42L,
  ) {
    require(nComponents >= 1, s"nComponents must be >= 1: $nComponents")
    require(nNeighbors >= 2, s"nNeighbors must be >= 2: $nNeighbors")
    require(minDist >= 0 && spread > 0, s"bad minDist/spread: $minDist/$spread")
  }

  /** Fitted state needed to place NEW points: the fit sample's original
    * vectors and their embedding coordinates.
    */
  final case class Model(points: Array[Array[Double]], embedding: Array[Array[Double]], params: Params)

  /** Fit and return the n×nComponents embedding, row-aligned with `points`. */
  def fit(points: Array[Array[Double]], params: Params = Params()): Array[Array[Double]] =
    fitModel(points, params).embedding

  def fitModel(points: Array[Array[Double]], params: Params = Params()): Model = {
    val n = points.length
    if (n == 0) return Model(points, Array.empty, params)
    val outDim = params.nComponents
    if (n == 1) return Model(points, Array(Array.fill(outDim)(0.0)), params)
    val k = math.min(params.nNeighbors, n - 1)

    // 1. exact k-NN — rows are independent, so a parallel stream is
    // deterministic (each slot written once)
    val nnIdx  = new Array[Array[Int]](n)
    val nnDist = new Array[Array[Double]](n)
    java.util.stream.IntStream.range(0, n).parallel().forEach { i =>
      val pi = points(i)
      val ds = new Array[Double](n)
      var j = 0
      while (j < n) {
        val pj = points(j)
        var s = 0.0; var c = 0
        while (c < pi.length) { val t = pi(c) - pj(c); s += t * t; c += 1 }
        ds(j) = math.sqrt(s)
        j += 1
      }
      // primitive k-selection of the nearest excluding self (strict <
      // keeps the earlier index on ties — i.e. order by (distance, index),
      // deterministic); ascending scan + replace-the-max is O(n·k) with no
      // boxing, which matters at the row cap (n² rows × n-way argsort cost)
      val bIdx = new Array[Int](k)
      val bD   = new Array[Double](k)
      var filled = 0
      var maxAt  = 0
      var j2 = 0
      while (j2 < n) {
        if (j2 != i) {
          val d = ds(j2)
          if (filled < k) {
            bIdx(filled) = j2; bD(filled) = d
            if (filled == 0 || d >= bD(maxAt)) maxAt = filled
            filled += 1
          } else if (d < bD(maxAt)) {
            bIdx(maxAt) = j2; bD(maxAt) = d
            // >= prefers the later slot so fill-phase ties evict the larger
            // index first; tie order is deterministic either way, and tied
            // distances carry identical weights downstream
            var m = 0; var mi = 0
            while (m < k) { if (bD(m) >= bD(mi)) mi = m; m += 1 }
            maxAt = mi
          }
        }
        j2 += 1
      }
      val order = Array.range(0, filled).sortBy(s2 => (bD(s2), bIdx(s2)))
      nnIdx(i) = order.map(bIdx)
      nnDist(i) = order.map(bD)
    }

    // 2. smooth-kNN: rho = nearest positive distance, sigma by bisection
    val target = math.log(k) / math.log(2.0)
    val rho    = new Array[Double](n)
    val sigma  = new Array[Double](n)
    var i = 0
    while (i < n) {
      val ds = nnDist(i)
      rho(i) = ds.find(_ > 0.0).getOrElse(0.0)
      var lo = 0.0; var hi = Double.PositiveInfinity; var mid = 1.0
      var it = 0
      while (it < 64) {
        var psum = 0.0; var j = 0
        while (j < ds.length) { val d = ds(j) - rho(i); psum += (if (d <= 0) 1.0 else math.exp(-d / mid)); j += 1 }
        if (math.abs(psum - target) < 1e-5) it = 64
        else {
          if (psum > target) { hi = mid; mid = (lo + hi) / 2 }
          else { lo = mid; mid = if (hi.isInfinity) mid * 2 else (lo + hi) / 2 }
          it += 1
        }
      }
      // umap-learn floors sigma at 1e-3 × mean neighbor distance so an
      // all-duplicates neighborhood can't collapse the kernel to a delta
      val mean = ds.sum / ds.length
      sigma(i) = math.max(mid, 1e-3 * math.max(mean, 1e-12))
      i += 1
    }

    // 3. fuzzy simplicial set, t-conorm symmetrized; both directions kept
    // for the SGD loop (matches the COO iteration in umap-learn)
    val directed = new java.util.HashMap[Long, Double]()
    i = 0
    while (i < n) {
      var j = 0
      while (j < nnIdx(i).length) {
        val d = math.max(0.0, nnDist(i)(j) - rho(i))
        directed.put(i.toLong * n + nnIdx(i)(j), math.exp(-d / sigma(i)))
        j += 1
      }
      i += 1
    }
    val headsB = Array.newBuilder[Int]
    val tailsB = Array.newBuilder[Int]
    val wB     = Array.newBuilder[Double]
    val keys   = directed.keySet.toArray(new Array[java.lang.Long](0)).map(_.longValue).sorted
    keys.foreach { key =>
      val ki = (key / n).toInt; val kj = (key % n).toInt
      if (ki < kj || !directed.containsKey(kj.toLong * n + ki)) {
        val w1 = directed.get(key)
        val w2 = Option(directed.get(kj.toLong * n + ki)).getOrElse(0.0)
        val w  = w1 + w2 - w1 * w2
        if (w > 0) {
          headsB += ki; tailsB += kj; wB += w
          headsB += kj; tailsB += ki; wB += w
        }
      }
    }
    val heads = headsB.result(); val tails = tailsB.result(); val ws = wB.result()

    // 4. (a, b) from min_dist/spread (memoized — the grid search depends
    // only on the two parameters, not the data)
    val (a, b) = abCache.computeIfAbsent((params.minDist, params.spread),
      k2 => fitAb(k2._1, k2._2))

    // 5. PCA init: centred projection, scaled to ±10, seeded jitter
    val emb  = new Array[Double](n * outDim)
    val dim  = points(0).length
    val mean = new Array[Double](dim)
    points.foreach { p => var c = 0; while (c < dim) { mean(c) += p(c); c += 1 } }
    locally { var c = 0; while (c < dim) { mean(c) /= n; c += 1 } }
    val comps = Ml.pcFit(points, math.min(outDim, dim))
    var rng   = if (params.seed == 0) 0x9E3779B97F4A7C15L else params.seed
    def nextLong(): Long = {
      rng ^= rng >>> 12; rng ^= rng << 25; rng ^= rng >>> 27; rng * 0x2545F4914F6CDD1DL
    }
    def nextDouble(): Double = (nextLong() >>> 11) * 1.1102230246251565e-16
    i = 0
    while (i < n) {
      var d = 0
      while (d < outDim) {
        var v = 0.0
        if (d < comps.length) {
          var c = 0
          while (c < dim) { v += (points(i)(c) - mean(c)) * comps(d)(c); c += 1 }
        }
        emb(i * outDim + d) = v
        d += 1
      }
      i += 1
    }
    var maxAbs = 1e-12
    emb.foreach(v => maxAbs = math.max(maxAbs, math.abs(v)))
    i = 0
    while (i < emb.length) { emb(i) = emb(i) / maxAbs * 10.0 + (nextDouble() - 0.5) * 1e-4; i += 1 }

    // 6. SGD layout
    val nEpochs = if (params.nEpochs > 0) params.nEpochs else if (n <= 10000) 500 else 200
    val wMax    = ws.foldLeft(1e-12)(math.max)
    val epochsPerSample = ws.map(w => wMax / w)
    val epochsPerNeg    = epochsPerSample.map(_ / params.negativeSampleRate)
    val nextSample      = epochsPerSample.clone()
    val nextNeg         = epochsPerNeg.clone()
    // The layout loop is THE hot path (positives + 5× negatives per edge
    // per cadence ≈ 10⁷–10⁸ events at the row cap): the 3-D case — the
    // Reducer3D contract — is unrolled with a single Math.pow per event
    // (d²·d^{2(b−1)} = d^{2b} reuses one pow; clip bounds written out).
    def clip4(v: Double): Double = if (v > 4.0) 4.0 else if (v < -4.0) -4.0 else v
    var epoch = 0
    while (epoch < nEpochs) {
      val alpha = params.learningRate * (1.0 - epoch.toDouble / nEpochs)
      var e = 0
      while (e < heads.length) {
        if (nextSample(e) <= epoch) {
          val hi = heads(e) * outDim; val ti = tails(e) * outDim
          if (outDim == 3) {
            val dx = emb(hi) - emb(ti); val dy = emb(hi + 1) - emb(ti + 1); val dz = emb(hi + 2) - emb(ti + 2)
            val d2 = dx * dx + dy * dy + dz * dz
            if (d2 > 0.0) {
              val pb1   = math.pow(d2, b - 1.0)
              val coeff = -2.0 * a * b * pb1 / (a * pb1 * d2 + 1.0)
              val gx = clip4(coeff * dx) * alpha; val gy = clip4(coeff * dy) * alpha; val gz = clip4(coeff * dz) * alpha
              emb(hi) += gx; emb(hi + 1) += gy; emb(hi + 2) += gz
              emb(ti) -= gx; emb(ti + 1) -= gy; emb(ti + 2) -= gz
            }
          } else {
            var d2 = 0.0
            locally { var d = 0; while (d < outDim) { val t = emb(hi + d) - emb(ti + d); d2 += t * t; d += 1 } }
            if (d2 > 0.0) {
              val pb1   = math.pow(d2, b - 1.0)
              val coeff = -2.0 * a * b * pb1 / (a * pb1 * d2 + 1.0)
              var d = 0
              while (d < outDim) {
                val g = clip4(coeff * (emb(hi + d) - emb(ti + d)))
                emb(hi + d) += alpha * g
                emb(ti + d) -= alpha * g
                d += 1
              }
            }
          }
          nextSample(e) += epochsPerSample(e)
          val nNeg = ((epoch - nextNeg(e)) / epochsPerNeg(e)).toInt
          var s = 0
          while (s < nNeg) {
            val t = ((nextLong() >>> 33) % n).toInt
            if (t != heads(e)) {
              val oi = t * outDim
              if (outDim == 3) {
                val dx = emb(hi) - emb(oi); val dy = emb(hi + 1) - emb(oi + 1); val dz = emb(hi + 2) - emb(oi + 2)
                val nd2 = dx * dx + dy * dy + dz * dz
                if (nd2 > 0.0) {
                  val coeff = 2.0 * b / ((0.001 + nd2) * (a * math.pow(nd2, b) + 1.0))
                  emb(hi) += clip4(coeff * dx) * alpha
                  emb(hi + 1) += clip4(coeff * dy) * alpha
                  emb(hi + 2) += clip4(coeff * dz) * alpha
                } else { // coincident distinct points: fixed symmetric push
                  emb(hi) += 4.0 * alpha; emb(hi + 1) += 4.0 * alpha; emb(hi + 2) += 4.0 * alpha
                }
              } else {
                var nd2 = 0.0
                locally { var d = 0; while (d < outDim) { val x = emb(hi + d) - emb(oi + d); nd2 += x * x; d += 1 } }
                var d = 0
                while (d < outDim) {
                  val g =
                    if (nd2 > 0.0) {
                      val coeff = 2.0 * b / ((0.001 + nd2) * (a * math.pow(nd2, b) + 1.0))
                      clip4(coeff * (emb(hi + d) - emb(oi + d)))
                    } else 4.0
                  emb(hi + d) += alpha * g
                  d += 1
                }
              }
            }
            s += 1
          }
          nextNeg(e) += nNeg * epochsPerNeg(e)
        }
        e += 1
      }
      epoch += 1
    }
    Model(points, Array.tabulate(n)(r => Array.tabulate(outDim)(d => emb(r * outDim + d))), params)
  }

  /** Place a new point with a fitted model: smooth-weighted average of its
    * `nNeighbors` nearest fit points' embeddings — the initialization step
    * of umap-learn's `transform` (its per-batch refinement epochs are
    * omitted; at that stage points move ≪ inter-cluster distances). Pure
    * per-row math → safe to broadcast the model and map partitions.
    */
  def transform(model: Model, p: Array[Double]): Array[Double] = {
    val n = model.points.length
    val outDim = model.params.nComponents
    if (n == 0) return Array.fill(outDim)(0.0)
    val k  = math.min(model.params.nNeighbors, n)
    val ds = new Array[Double](n)
    var i = 0
    while (i < n) {
      val q = model.points(i)
      var s = 0.0; var c = 0
      while (c < q.length) { val t = p(c) - q(c); s += t * t; c += 1 }
      ds(i) = math.sqrt(s)
      i += 1
    }
    val order = Array.range(0, n).sortBy(j => (ds(j), j)).take(k)
    val dMin  = ds(order(0))
    val scale = math.max(order.map(ds).sum / k, 1e-12)
    val out   = new Array[Double](outDim)
    var wSum  = 0.0
    order.foreach { j =>
      val w = math.exp(-(ds(j) - dMin) / scale)
      wSum += w
      var d = 0
      while (d < outDim) { out(d) += w * model.embedding(j)(d); d += 1 }
    }
    var d = 0
    while (d < outDim) { out(d) /= wSum; d += 1 }
    out
  }

  private val abCache =
    new java.util.concurrent.ConcurrentHashMap[(Double, Double), (Double, Double)]()

  /** Least-squares (a, b) for f(x) = 1/(1 + a·x^{2b}) against the
    * min_dist/spread membership target — `find_ab_params` semantics.
    * Coarse log/linear grid then two local refinements; deterministic.
    */
  private[graft] def fitAb(minDist: Double, spread: Double): (Double, Double) = {
    val m  = 300
    val xs = Array.tabulate(m)(i => (i + 1) * 3.0 * spread / m)
    val ys = xs.map(x => if (x < minDist) 1.0 else math.exp(-(x - minDist) / spread))
    def sse(a: Double, b: Double): Double = {
      var s = 0.0; var i = 0
      while (i < m) { val f = 1.0 / (1.0 + a * math.pow(xs(i), 2 * b)); val d = f - ys(i); s += d * d; i += 1 }
      s
    }
    var best = (1.0, 1.0); var bestS = Double.MaxValue
    var b = 0.1
    while (b <= 2.5) {
      var a = 0.05
      while (a <= 25.0) {
        val s = sse(a, b)
        if (s < bestS) { bestS = s; best = (a, b) }
        a *= 1.08
      }
      b += 0.02
    }
    var pass = 0
    while (pass < 2) {
      val (a0, b0) = best
      var b2 = b0 * 0.95
      while (b2 <= b0 * 1.05) {
        var a2 = a0 * 0.85
        while (a2 <= a0 * 1.18) {
          val s = sse(a2, b2)
          if (s < bestS) { bestS = s; best = (a2, b2) }
          a2 *= 1.005
        }
        b2 += b0 * 0.002
      }
      pass += 1
    }
    best
  }
}
