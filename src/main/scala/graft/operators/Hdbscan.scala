package graft.operators

import scala.collection.mutable

/** HDBSCAN* (Campello/Moulavi/Sander 2013) with Excess-of-Mass cluster
  * selection — the reference's actual clustering semantics
  * (backend/clustering.py:55-60: `hdbscan.HDBSCAN(min_cluster_size=5,
  * min_samples=3, metric='euclidean', cluster_selection_method='eom')`).
  * [[Ml.KMeansClusterer]] remains M1's oracled default (its noise contract
  * is closed-form checkable); this closes the SEMANTIC gap on
  * non-spherical / variable-density corpora, where centroid assignment and
  * density clustering genuinely disagree.
  *
  * Pipeline, all exact (no space-tree approximations — the driver fit is
  * row-capped, see [[HdbscanClusterer]]):
  *  1. core distance: distance to the `minSamples`-th nearest other point
  *     (the generic-path convention in the hdbscan library:
  *     `np.partition(distance_matrix, min_points)[min_points]` with self's
  *     zero at index 0);
  *  2. mutual reachability: mr(a,b) = max(core(a), core(b), d(a,b));
  *  3. MST of the implicit mutual-reachability graph — Prim's, O(n²) time,
  *     O(n) memory, no n×n matrix;
  *  4. single-linkage dendrogram from ascending MST edges (union-find);
  *  5. condensed tree at `minClusterSize` (small side falls out as points,
  *     big side continues as the same cluster; two big sides = true split);
  *  6. stability S(C) = Σ_p (λ_p − λ_birth(C)), λ = 1/distance; EoM keeps
  *     C iff S(C) exceeds the sum of its children's kept mass, root always
  *     deferring to children (`allow_single_cluster=False`, the
  *     reference's default).
  *
  * Returns per-point labels densely renumbered in condensed-tree birth
  * order; −1 = noise. Deterministic for a fixed input order — callers sort
  * by id so partition order can't leak in.
  */
object Hdbscan {

  def fit(points: Array[Array[Double]], minClusterSize: Int = 5, minSamples: Int = 3): Array[Int] = {
    val n = points.length
    require(minClusterSize >= 2, s"minClusterSize must be >= 2: $minClusterSize")
    require(minSamples >= 1, s"minSamples must be >= 1: $minSamples")
    // the reference's small-input early return (clustering.py:45-48)
    if (n < minClusterSize) return Array.fill(n)(-1)

    def dist(a: Int, b: Int): Double = {
      val pa = points(a); val pb = points(b)
      var s = 0.0; var i = 0
      while (i < pa.length) { val t = pa(i) - pb(i); s += t * t; i += 1 }
      math.sqrt(s)
    }

    // 1. core distances: k-th smallest distance to another point. Rows are
    // independent, so they fan out across cores (the Umap.knn pattern),
    // and the order statistic comes from a bounded k-best scan (O(n·k),
    // k = minSamples is tiny) instead of materializing and FULL-sorting an
    // (n−1)-array per row — at the 4096×768 fit cap the old form was
    // ~17M distance evals plus 4096 serial O(n log n) sorts on one thread.
    // Deterministic under parallelism: the k smallest VALUES are a unique
    // multiset, so their max (the core distance) is order-independent.
    val k = math.min(minSamples, n - 1)
    val core = new Array[Double](n)
    java.util.stream.IntStream.range(0, n).parallel().forEach { i =>
      val best = Array.fill(k)(Double.PositiveInfinity)
      var worst = Double.PositiveInfinity // = max(best): the running k-th smallest
      var wIdx  = 0
      var j = 0
      while (j < n) {
        if (j != i) {
          val d = dist(i, j)
          if (d < worst) {
            best(wIdx) = d
            worst = best(0); wIdx = 0
            var t = 1
            while (t < k) { if (best(t) > worst) { worst = best(t); wIdx = t }; t += 1 }
          }
        }
        j += 1
      }
      core(i) = worst
    }
    def mr(a: Int, b: Int): Double = math.max(dist(a, b), math.max(core(a), core(b)))

    // 3. Prim MST over the implicit mutual-reachability graph
    val inTree = new Array[Boolean](n)
    val bestW  = Array.fill(n)(Double.PositiveInfinity)
    val bestP  = new Array[Int](n)
    inTree(0) = true
    var j = 1
    while (j < n) { bestW(j) = mr(0, j); bestP(j) = 0; j += 1 }
    val edges = new Array[(Double, Int, Int)](n - 1) // (weight, u, v)
    var added = 0
    while (added < n - 1) {
      var pick = -1; var pw = Double.PositiveInfinity
      var i = 0
      while (i < n) { if (!inTree(i) && bestW(i) < pw) { pw = bestW(i); pick = i }; i += 1 }
      edges(added) = (pw, bestP(pick), pick)
      inTree(pick) = true
      added += 1
      i = 0
      while (i < n) {
        if (!inTree(i)) { val w = mr(pick, i); if (w < bestW(i)) { bestW(i) = w; bestP(i) = pick } }
        i += 1
      }
    }

    // 4. single-linkage dendrogram: nodes 0..n-1 = points, n..2n-2 = merges
    java.util.Arrays.sort(edges, Ordering.by((e: (Double, Int, Int)) => e._1))
    val slLeft  = new Array[Int](2 * n - 1)
    val slRight = new Array[Int](2 * n - 1)
    val slDist  = new Array[Double](2 * n - 1)
    val slSize  = new Array[Int](2 * n - 1)
    java.util.Arrays.fill(slSize, 0, n, 1)
    val comp = Array.tabulate(2 * n - 1)(identity) // union-find with path compression
    def find(x: Int): Int = { var r = x; while (comp(r) != r) r = comp(r); var c = x; while (comp(c) != r) { val nx = comp(c); comp(c) = r; c = nx }; r }
    var next = n
    edges.foreach { case (w, u, v) =>
      val (ru, rv) = (find(u), find(v))
      slLeft(next) = ru; slRight(next) = rv; slDist(next) = w
      slSize(next) = slSize(ru) + slSize(rv)
      comp(ru) = next; comp(rv) = next
      next += 1
    }
    val root = 2 * n - 2

    // 5. condensed tree. Clusters get sequential ids in birth order;
    //    cluster 0 is the root (birth λ = 0).
    def lambdaOf(d: Double): Double = 1.0 / math.max(d, 1e-300)
    val cParent = mutable.ArrayBuffer[Int](-1)
    val cBirth  = mutable.ArrayBuffer[Double](0.0)
    val pointCluster = Array.fill(n)(-1)
    val pointLambda  = new Array[Double](n)
    def leavesOf(node: Int): Iterator[Int] =
      if (node < n) Iterator.single(node)
      else {
        val stack = mutable.ArrayDeque(node)
        Iterator.continually {
          var out = -1
          while (out < 0 && stack.nonEmpty) {
            val t = stack.removeLast()
            if (t < n) out = t
            else { stack.append(slLeft(t)); stack.append(slRight(t)) }
          }
          out
        }.takeWhile(_ >= 0)
      }
    // root-down walk: (sl node, owning condensed cluster). Invariant:
    // every queued node is a MERGE of size >= minClusterSize >= 2 — the
    // root by the n >= minClusterSize early return, children only when
    // their side clears minClusterSize — so a leaf point is never popped:
    // points leave the walk exclusively through the fall-out paths below,
    // each assigning a FINITE pointLambda (lambdaOf caps at 1e300 via the
    // 1e-300 floor; coincident points land on that cap).
    val walk = mutable.ArrayDeque((root, 0))
    while (walk.nonEmpty) {
      val (node, cid) = walk.removeLast()
      val lam = lambdaOf(slDist(node))
      val (l, r) = (slLeft(node), slRight(node))
      val (ls, rs) = (slSize(l), slSize(r))
      if (ls >= minClusterSize && rs >= minClusterSize) {
        // true split: two children born here
        val cl = cParent.length; cParent += cid; cBirth += lam
        val cr = cParent.length; cParent += cid; cBirth += lam
        walk.append((l, cl)); walk.append((r, cr))
      } else if (ls >= minClusterSize) {
        leavesOf(r).foreach { p => pointCluster(p) = cid; pointLambda(p) = lam }
        walk.append((l, cid))
      } else if (rs >= minClusterSize) {
        leavesOf(l).foreach { p => pointCluster(p) = cid; pointLambda(p) = lam }
        walk.append((r, cid))
      } else {
        // cluster dissolves: everything falls out here
        (leavesOf(l) ++ leavesOf(r)).foreach { p => pointCluster(p) = cid; pointLambda(p) = lam }
      }
    }

    // 6. stability + EoM selection (children first: ids are topological)
    val nC = cParent.length
    val stability = new Array[Double](nC)
    var p = 0
    while (p < n) {
      // pointLambda is always finite (see the walk invariant), so the
      // contribution needs no infinity guard
      val c = pointCluster(p)
      stability(c) += pointLambda(p) - cBirth(c)
      p += 1
    }
    val sizeOf = new Array[Int](nC)
    p = 0
    while (p < n) { sizeOf(pointCluster(p)) += 1; p += 1 }
    var c = nC - 1
    while (c >= 1) { sizeOf(cParent(c)) += sizeOf(c); c -= 1 }
    c = nC - 1
    while (c >= 1) {
      stability(cParent(c)) += (cBirth(c) - cBirth(cParent(c))) * sizeOf(c)
      c -= 1
    }
    val kept      = new Array[Boolean](nC)
    val keptValue = new Array[Double](nC)
    c = nC - 1
    while (c >= 0) {
      val hasChildren = (c + 1 until nC).exists(cParent(_) == c)
      val childrenVal = (c + 1 until nC).iterator.filter(cParent(_) == c).map(keptValue).sum
      if (c == 0) keptValue(c) = childrenVal // root never selected
      else if (!hasChildren || stability(c) >= childrenVal) { kept(c) = true; keptValue(c) = stability(c) }
      else keptValue(c) = childrenVal
      c -= 1
    }
    // disjointness: a kept ancestor suppresses kept descendants
    c = 1
    while (c < nC) {
      var a = cParent(c)
      var covered = false
      while (a > 0 && !covered) { covered = kept(a); a = cParent(a) }
      if (covered) kept(c) = false
      c += 1
    }

    // 7. labels: the kept cluster on each point's ancestor chain
    val labelOf = mutable.Map.empty[Int, Int]
    c = 0
    while (c < nC) { if (kept(c)) labelOf(c) = labelOf.size; c += 1 }
    Array.tabulate(n) { i =>
      var cc = pointCluster(i)
      var lab = -1
      while (cc >= 0 && lab < 0) { if (kept(cc)) lab = labelOf(cc); cc = cParent(cc) }
      lab
    }
  }
}
