package graft.operators

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.feature.PCA
import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Clustering + dimensionality reduction (SURVEY §2.6).
  *
  * M3/M4 — PCA to 3-D mirrors the reference's sklearn flow
  * (backend/dimensionality_reduction.py:50-158), including the n<3 rule:
  * with fewer samples than components, fit min(n, 3) components and zero-pad
  * the missing coordinates. MLlib's PCA is the distributed drop-in — the
  * covariance/SVD runs as a treeAggregate over partitions, so it scales with
  * executors instead of collecting vectors to the driver.
  *
  * M1 — the reference clusters with HDBSCAN (backend/clustering.py:17-70),
  * which has no scalable JVM analog; per SURVEY §7.2 the declared deviation
  * is a [[Clusterer]] seam with a KMeans-family default. Noise semantics
  * (−1 labels) are reproduced by distance-threshold marking, and the
  * adaptive sizing thresholds (3/5/10 at 50/200 chunks,
  * backend/main.py:795-801) live in [[adaptiveMinClusterSize]].
  */
object Ml {

  /** The reference's adaptive min_cluster_size (backend/main.py:795-801). */
  def adaptiveMinClusterSize(corpusSize: Long): Int =
    if (corpusSize < 50) 3 else if (corpusSize < 200) 5 else 10

  /** Top-k principal components of a small in-memory sample: covariance +
    * breeze eigSym on the driver. Mirrors the reference's own in-proc
    * sklearn fit (dimensionality_reduction.py:50-158) for corpora within
    * the driver byte budget — MLlib's multi-job covariance fit costs ~10
    * scheduler round-trips that dominate at interactive scale. Each
    * eigenvector's sign is fixed (largest-|component| positive) so the fit
    * is deterministic; like MLlib, projection does NOT re-center.
    */
  private[operators] def pcFit(pts0: Array[Array[Double]], k: Int): Array[Array[Double]] = {
    import breeze.linalg.{eigSym, DenseMatrix}
    // Hash-sorted so mean/covariance accumulation doesn't depend on
    // collect order (same rationale as lloydFit).
    val pts = pts0.sortBy(p => pointHash(p, 0L))
    val n   = pts.length
    val dim = pts.head.length
    val mean = new Array[Double](dim)
    pts.foreach { p => var i = 0; while (i < dim) { mean(i) += p(i); i += 1 } }
    var i = 0
    while (i < dim) { mean(i) /= n; i += 1 }
    val cov = DenseMatrix.zeros[Double](dim, dim)
    pts.foreach { p =>
      var a = 0
      while (a < dim) {
        val da = p(a) - mean(a)
        var b = a
        while (b < dim) { cov(a, b) += da * (p(b) - mean(b)); b += 1 }
        a += 1
      }
    }
    for (a <- 0 until dim; b <- a until dim) {
      val v = cov(a, b) / math.max(n - 1, 1); cov(a, b) = v; cov(b, a) = v
    }
    val es = eigSym(cov) // eigenvalues ascending
    (0 until math.min(k, dim)).map { j =>
      val c    = es.eigenvectors(::, dim - 1 - j)
      val arr  = Array.tabulate(dim)(c(_))
      val imax = arr.indices.maxBy(i2 => math.abs(arr(i2)))
      if (arr(imax) < 0) arr.map(-_) else arr
    }.toArray
  }

  /** Shared driver-fit sampler: one cheap dim probe + one bounded
    * limit(budget+1) collect of the vector column (position 0) plus any
    * `extra` columns. Returns (dim, Some(rows)) when the whole input fits
    * the byte budget (rows × dim × 8 ≤ maxBytes), (dim, None) when it
    * doesn't — callers then take the distributed-fit path. A single
    * definition keeps the fit sites (kmeans, IVF, PCA fit/project) from
    * drifting apart.
    */
  private[operators] def driverRows(
      df: DataFrame, vecCol: String, maxBytes: Long,
      extra: Seq[org.apache.spark.sql.Column] = Nil,
  ): (Int, Option[Array[org.apache.spark.sql.Row]]) = {
    // null vectors are excluded throughout: a null in the first row would
    // NPE the dim probe, and a null later would crash the fit loops — rows
    // without a vector simply don't participate in fits
    val nonNull = df.where(col(vecCol).isNotNull)
    val head = nonNull.select(org.apache.spark.sql.functions.size(col(vecCol))).limit(1).collect()
    if (head.isEmpty) return (0, Some(Array.empty))
    val dim     = head(0).getInt(0)
    val maxRows = (maxBytes / (8L * math.max(dim, 1))).min(Int.MaxValue - 1L).toInt
    val rows = nonNull.select(col(vecCol).cast("array<double>") +: extra: _*).limit(maxRows + 1).collect()
    (dim, if (rows.length <= maxRows) Some(rows) else None)
  }

  private[operators] def driverVectors(df: DataFrame, vecCol: String, maxBytes: Long): (Int, Option[Array[Array[Double]]]) = {
    val (dim, rows) = driverRows(df, vecCol, maxBytes)
    (dim, rows.map(_.map(_.getSeq[Double](0).toArray)))
  }

  /** M3 — fit+transform to 3-D with the reference's zero-pad rule. Output:
    * idCol, x, y, z.
    *
    * Corpora within the driver byte budget fit via [[pcFit]] (one bounded
    * collect) and project DISTRIBUTED as codegen'd dot products; larger
    * corpora fit via MLlib's treeAggregate covariance — same contract,
    * scale-appropriate plan either way.
    */
  def pca3d(df: DataFrame, vecCol: String, idCol: String, maxDriverFitBytes: Long = 64L << 20): DataFrame = {
    import graft.functions.VectorExpressions.dotFast
    driverVectors(df, vecCol, maxDriverFitBytes) match {
      case (_, Some(pts)) if pts.isEmpty => df.sparkSession.emptyDataFrame
      case (_, Some(pts)) =>
        val cs = pcFit(pts, math.min(pts.length, 3))
        val v  = col(vecCol).cast("array<double>")
        def coord(i: Int) = if (i < cs.length) dotFast(v, typedLit(cs(i).toSeq)) else lit(0.0)
        df.select(col(idCol), coord(0).as("x"), coord(1).as("y"), coord(2).as("z"))
      case (_, None) =>
        val withVec = df.withColumn("__v", array_to_vector(col(vecCol).cast("array<double>")))
        val model   = new PCA().setK(3).setInputCol("__v").setOutputCol("__pca").fit(withVec)
        val arr     = vector_to_array(col("__pca"))
        model.transform(withVec)
          .select(col(idCol), element_at(arr, 1).as("x"), element_at(arr, 2).as("y"), element_at(arr, 3).as("z"))
    }
  }

  /** 3-D projection seam for M5. The reference supports method='umap'
    * (dimensionality_reduction.py:101-105) but falls back to PCA when
    * umap-learn is absent (dimensionality_reduction.py:41-48); unknown
    * method strings also fall back (dimensionality_reduction.py:36-38).
    * Both fallbacks are reproduced: PCA is the bound default (the
    * reference's shipped state), and [[UmapReducer]] — a real from-scratch
    * [[Umap]] — is what binding the seam looks like with the library
    * "installed".
    */
  trait Reducer3D extends Serializable {
    def name: String
    def project(df: DataFrame, vecCol: String, idCol: String): DataFrame
  }

  object PcaReducer extends Reducer3D {
    val name = "pca"
    def project(df: DataFrame, vecCol: String, idCol: String): DataFrame = pca3d(df, vecCol, idCol)
  }

  /** M5 — real UMAP behind the seam. Fit is driver-side and row-capped
    * (the reference's own fit is a single in-process umap-learn call on a
    * collected embedding list, main.py's cluster/visualize path — same
    * shape); corpora over the cap fit on a deterministic hash-sample and
    * every row is then placed DISTRIBUTED by [[Umap.transform]] (broadcast
    * model, pure per-row math — scales with executors). Inputs with fewer
    * rows than components take the reference's tiny-input PCA zero-pad path
    * (dimensionality_reduction.py:66-82).
    */
  final class UmapReducer(
      maxFitRows: Int = 4096,
      params: Umap.Params = Umap.Params(),
  ) extends Reducer3D {
    val name = "umap"

    def project(df: DataFrame, vecCol: String, idCol: String): DataFrame = {
      val spark = df.sparkSession
      import spark.implicits._
      require(params.nComponents == 3, "Reducer3D contract is 3 output dims")
      val nonNull = df.where(col(vecCol).isNotNull && col(idCol).isNotNull)
        .select(col(idCol).cast("long").as("__id"), col(vecCol).cast("array<double>").as("__v"))
      val head = nonNull.limit(maxFitRows + 1).collect()
      if (head.isEmpty) return df.sparkSession.emptyDataFrame
      if (head.length < 3) return pca3d(df, vecCol, idCol) // reference tiny-input rule
      def toFrame(ids: Array[Long], emb: Array[Array[Double]]) =
        ids.zip(emb).toSeq.map { case (id, e) => (id, e(0), e(1), e(2)) }
          .toDF("__id", "x", "y", "z")
          .select(col("__id").as(idCol), col("x"), col("y"), col("z"))
      if (head.length <= maxFitRows) {
        val rows = head.sortBy(_.getLong(0))
        val m    = Umap.fitModel(rows.map(_.getSeq[Double](1).toArray), params)
        toFrame(rows.map(_.getLong(0)), m.embedding)
      } else {
        // over the cap: deterministic hash-sampled fit (same recipe as
        // HdbscanClusterer), then a broadcast transform over every row.
        // The cap cut is an ORDERED limit on (bucket, id) — a plain
        // limit() truncates in partition-arrival order, which varies
        // run-to-run whenever the bucket filter passes more than
        // maxFitRows rows (certain for corpora past NumBuckets*maxFitRows,
        // where keepBp floors at 1), silently breaking the determinism
        // contract. orderBy+limit is TakeOrderedAndProject: a per-partition
        // heap, never a full sort; bucket-first keeps the kept set
        // hash-uniform instead of biased toward small ids.
        val total  = nonNull.count()
        val keepBp = math.max(1L, maxFitRows.toLong * Sampling.NumBuckets / total)
        val sampled = nonNull.where(Sampling.bucket(col("__id")) < keepBp)
          .orderBy(Sampling.bucket(col("__id")), col("__id"))
          .limit(maxFitRows).collect().sortBy(_.getLong(0))
        val model = Umap.fitModel(sampled.map(_.getSeq[Double](1).toArray), params)
        val bc    = spark.sparkContext.broadcast(model)
        nonNull.as[(Long, Seq[Double])].map { case (id, v) =>
          val e = Umap.transform(bc.value, v.toArray)
          (id, e(0), e(1), e(2))
        }.toDF("__id", "x", "y", "z")
          .select(col("__id").as(idCol), col("x"), col("y"), col("z"))
      }
    }
  }

  /** M5 — method selection with the reference's double fallback: unknown
    * method → pca; method='umap' with no bound implementation → pca
    * (pass `Some(new UmapReducer())` to bind the real one).
    */
  def reducerFor(method: String, umap: Option[Reducer3D] = None): Reducer3D =
    method.toLowerCase(java.util.Locale.ROOT) match {
      case "pca"  => PcaReducer
      case "umap" => umap.getOrElse(PcaReducer)
      case _      => PcaReducer
    }

  /** M4 — project new vectors with an already-fitted model (the reference's
    * transform-single-query path): fit on `fitDf`, apply to `applyDf`.
    */
  def pcaProject(fitDf: DataFrame, applyDf: DataFrame, vecCol: String, idCol: String, maxDriverFitBytes: Long = 64L << 20): DataFrame = {
    import graft.functions.VectorExpressions.dotFast
    driverVectors(fitDf, vecCol, maxDriverFitBytes) match {
      case (_, Some(pts)) if pts.isEmpty => fitDf.sparkSession.emptyDataFrame
      case (_, Some(pts)) =>
        // min(n,3) like pca3d: with fewer samples than components the extra
        // eigenvectors are null-space garbage — those coords zero-pad instead
        val cs = pcFit(pts, math.min(pts.length, 3))
        val v  = col(vecCol).cast("array<double>")
        def coord(i: Int) = if (i < cs.length) dotFast(v, typedLit(cs(i).toSeq)) else lit(0.0)
        applyDf.select(col(idCol), coord(0).as("x"), coord(1).as("y"), coord(2).as("z"))
      case (_, None) =>
        transformPca(fitPca(fitDf, vecCol, 3), applyDf, vecCol, idCol)
    }
  }

  /** M6 — model persistence (reference pickles the fitted reducer,
    * backend/dimensionality_reduction.py:160-187; MLlib writers are the
    * native equivalent and cluster-readable).
    */
  def fitPca(df: DataFrame, vecCol: String, k: Int): org.apache.spark.ml.feature.PCAModel =
    new PCA().setK(k).setInputCol("__v").setOutputCol("__pca")
      .fit(df.withColumn("__v", array_to_vector(col(vecCol).cast("array<double>"))))

  def savePca(model: org.apache.spark.ml.feature.PCAModel, path: String): Unit =
    model.write.overwrite().save(path)

  def loadPca(path: String): org.apache.spark.ml.feature.PCAModel =
    org.apache.spark.ml.feature.PCAModel.load(path)

  /** Apply a (fitted or reloaded) PCA model to an array column → (id, x, y, z). */
  def transformPca(
      model: org.apache.spark.ml.feature.PCAModel, df: DataFrame, vecCol: String, idCol: String,
  ): DataFrame = {
    val arr = vector_to_array(col("__pca"))
    model.transform(df.withColumn("__v", array_to_vector(col(vecCol).cast("array<double>"))))
      .select(col(idCol), element_at(arr, 1).as("x"), element_at(arr, 2).as("y"), element_at(arr, 3).as("z"))
  }

  /** M1 seam — pluggable clusterer returning (idCol, label) with −1 noise. */
  trait Clusterer extends Serializable {
    def cluster(df: DataFrame, vecCol: String, idCol: String): DataFrame
  }

  /** Nearest centroid + squared distance (shared by the driver-fit paths). */
  private[operators] def nearestCentroid(p: Array[Double], cs: Array[Array[Double]]): (Int, Double) = {
    var best = 0; var bestD = Double.MaxValue; var c = 0
    while (c < cs.length) {
      var d = 0.0; var i = 0
      while (i < p.length) { val t = p(i) - cs(c)(i); d += t * t; i += 1 }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    (best, bestD)
  }

  /** Content hash of a point, salted by `seed` — the basis for ORDER-
    * INDEPENDENT centroid seeding: `collect()` row order is not stable
    * across executors/runs on a real cluster, so any seeding keyed on
    * collection order (index shuffle, "first k") silently makes the fit
    * nondeterministic at scale. Hashing coordinates makes the same point
    * set produce the same centroids regardless of arrival order.
    */
  private def pointHash(p: Array[Double], seed: Long): Long = {
    var h = seed ^ 1125899906842597L
    var i = 0
    while (i < p.length) { h = h * 31 + java.lang.Double.doubleToLongBits(p(i)); i += 1 }
    h
  }

  /** Seeded Lloyd's iterations on in-memory points — the driver-side fit
    * used when a corpus (or sample) is small enough that MLlib's per-
    * iteration scheduler round-trips dominate (SURVEY §2.6 option (c):
    * driver-local fit + distributed broadcast assignment). Initial
    * centroids are the k distinct points with the smallest salted content
    * hash (see [[pointHash]]), so the fit is a pure function of the point
    * SET, not the collect order.
    */
  private[operators] def lloydFit(points: Array[Array[Double]], k: Int, seed: Long, maxIter: Int = 20): Array[Array[Double]] = {
    val kEff   = math.min(k, points.length)
    // Equal hashes are either identical points (either copy is the same
    // centroid) or ~2^-64 collisions, so hash order alone is deterministic.
    val sorted = points.sortBy(p => pointHash(p, seed))
    val seeds  = sorted.iterator.map(_.toSeq).distinct.take(kEff).map(_.toArray).toArray
    var centroids = (if (seeds.length < kEff) seeds ++ sorted.take(kEff - seeds.length) else seeds)
      .map(_.clone())
    val dim       = points.headOption.map(_.length).getOrElse(0)
    var it        = 0
    var moved     = true
    // Accumulate in hash order within FIXED index chunks, merged in chunk
    // order: FP addition is non-associative, so the reduction tree must be a
    // function of the point set alone — chunk boundaries come from indices
    // into the hash-sorted array, never from thread scheduling. The chunks
    // themselves run in parallel (assignment is the O(n·k·dim) hot loop; at
    // the 64 MB driver budget a serial pass costs ~0.5 s per fit).
    val chunkSize = 4096
    val nChunks   = (sorted.length + chunkSize - 1) / chunkSize
    while (it < maxIter && moved) {
      val cs       = centroids
      val partials = new Array[(Array[Array[Double]], Array[Long])](nChunks)
      import scala.collection.parallel.CollectionConverters._
      (0 until nChunks).par.foreach { ci =>
        val lo = ci * chunkSize
        val hi = math.min(lo + chunkSize, sorted.length)
        val s  = Array.fill(kEff)(new Array[Double](dim))
        val n  = new Array[Long](kEff)
        var j  = lo
        while (j < hi) {
          val p      = sorted(j)
          val (c, _) = nearestCentroid(p, cs)
          n(c) += 1
          var i = 0; while (i < dim) { s(c)(i) += p(i); i += 1 }
          j += 1
        }
        partials(ci) = (s, n)
      }
      val sums   = Array.fill(kEff)(new Array[Double](dim))
      val counts = new Array[Long](kEff)
      partials.foreach { case (s, n) =>
        var c = 0
        while (c < kEff) {
          counts(c) += n(c)
          var i = 0; while (i < dim) { sums(c)(i) += s(c)(i); i += 1 }
          c += 1
        }
      }
      val next = Array.tabulate(kEff) { c =>
        if (counts(c) == 0) centroids(c)
        else { val m = new Array[Double](dim); var i = 0; while (i < dim) { m(i) = sums(c)(i) / counts(c); i += 1 }; m }
      }
      moved = next.zip(centroids).exists { case (a, b) => !java.util.Arrays.equals(a, b) }
      centroids = next
      it += 1
    }
    centroids
  }

  /** §3.3 — the full analytics job as ONE lineage: cluster → TF-IDF naming →
    * join-update write-back. The reference runs this as scroll-all →
    * in-process HDBSCAN → per-point HTTP set_payload loop
    * (backend/main.py:781-830, the known O(n) anti-pattern); here the
    * write-back is a single broadcast join (S15) and naming is the
    * distributed TF-IDF agg (A6), so the whole job is three shuffles
    * regardless of corpus size.
    */
  def clusterAndName(
      chunks: DataFrame,
      vecCol: String,
      idCol: String,
      textCol: String,
      clusterer: Clusterer,
  ): DataFrame = clusterAndName(chunks, chunks, vecCol, idCol, textCol, clusterer)

  /** Split-input form: vectors and texts arrive as separate frames joined on
    * `idCol`. When they live in separate tables (the storage layout — vectors
    * in the index, text in the registry), this keeps the vecs⋈texts join out
    * of the clustering leg entirely: the fit reads only `vecs`, and the text
    * corpus is touched exactly once, by the naming aggregation. `n_clusters`
    * for the idf denominator comes from the label frame (id+label only), not
    * another pass over the text corpus.
    */
  def clusterAndName(
      vecs: DataFrame,
      texts: DataFrame,
      vecCol: String,
      idCol: String,
      textCol: String,
      clusterer: Clusterer,
  ): DataFrame = {
    val labels  = clusterer.cluster(vecs, vecCol, idCol)
    val labeled = texts.join(labels, Seq(idCol))
    val names = Aggs.tfidfKeywords(
      labeled.where(col("label") =!= -1), "label", textCol,
      nLabelsFrom = Some(labels.where(col("label") =!= -1)),
    ).withColumnRenamed("label", "__nl")
    labeled
      .join(broadcast(names), labeled("label") === col("__nl"), "left")
      .withColumn("cluster_name",
        when(col("label") === -1, lit("Uncategorized")).otherwise(coalesce(col("cluster_name"), concat(lit("Cluster "), col("label")))))
      .drop("__nl")
  }

  /** Default KMeans-family clusterer (declared HDBSCAN deviation): k fixed,
    * rows farther than `noiseQuantile` of the distance distribution from
    * their centroid are marked −1 (noise), echoing HDBSCAN's outlier
    * semantics without its density model.
    *
    * Two fit paths, same contract:
    *  - corpora within the driver-fit BYTE budget (rows × dim × 8 ≤
    *    `maxDriverFitBytes`, so a 768-d corpus collects 12× fewer rows than
    *    a 64-d one — the budget is what actually bounds driver heap) fit
    *    with seeded Lloyd's iterations on the driver — the reference's own
    *    in-proc shape (SURVEY §2.6 option (c)); at 2k points MLlib's ~25
    *    driver-roundtrip jobs cost ~8 s of pure scheduling, the local fit
    *    microseconds;
    *  - larger corpora fit distributed via MLlib KMeans, with assignment +
    *    noise-marking as broadcast-centroid expressions (no collect).
    */
  /** M1 at the reference's ACTUAL semantics: HDBSCAN* with EoM selection
    * (backend/clustering.py:50-60) via [[Hdbscan.fit]]. KMeansClusterer
    * stays the oracled default (closed-form noise contract); this closes
    * the declared density-semantics deviation for corpora where it
    * matters.
    *
    * Fit is driver-side and row-capped — HDBSCAN's mutual-reachability MST
    * is inherently O(n²) without space trees, and the reference itself
    * scrolls every vector into one process to fit. Corpora over the cap
    * fit on a deterministic hash-sample and assign the rest DISTRIBUTED to
    * the label of the nearest fitted point (the shape of hdbscan's own
    * `approximate_predict`; a declared approximation — boundary points may
    * differ from a full fit).
    */
  object HdbscanClusterer {
    /** The reference's corpus-size-adaptive min_cluster_size
      * (backend/main.py:795-801): 3 below 50 chunks, 5 below 200, else 10.
      */
    def adaptiveMinClusterSize(totalChunks: Long): Int =
      if (totalChunks < 50) 3 else if (totalChunks < 200) 5 else 10
  }

  final class HdbscanClusterer(
      minClusterSize: Int = 5,
      minSamples: Int = 3,
      maxFitRows: Int = 4096,
  ) extends Clusterer {

    override def cluster(df: DataFrame, vecCol: String, idCol: String): DataFrame = {
      val spark = df.sparkSession
      import spark.implicits._
      val nonNull = df.where(col(vecCol).isNotNull && col(idCol).isNotNull)
        .select(col(idCol).cast("long").as("__id"), col(vecCol).cast("array<double>").as("__v"))
      val head = nonNull.limit(maxFitRows + 1).collect()
      if (head.isEmpty) return df.select(col(idCol), lit(-1).as("label")).where(lit(false))
      if (head.length <= maxFitRows) {
        // whole corpus fits: exact HDBSCAN, id-sorted so partition order
        // can't perturb the labeling
        val rows   = head.sortBy(_.getLong(0))
        val pts    = rows.map(_.getSeq[Double](1).toArray)
        val labels = Hdbscan.fit(pts, minClusterSize, minSamples)
        rows.map(_.getLong(0)).zip(labels).toSeq.toDF("__id", "label")
          .select(col("__id").as(idCol), col("label"))
      } else {
        // over the cap: deterministic hash-sample of ~maxFitRows for the
        // fit (portable hash of the id — stable across runs/partitioning).
        // Ordered limit on (bucket, id), NOT a bare limit(): see
        // UmapReducer — arrival-order truncation made the fit sample (and
        // so labels and names) vary across runs of the identical corpus.
        val total = nonNull.count()
        val keepBp = math.max(1L, maxFitRows.toLong * Sampling.NumBuckets / total)
        val sampled = nonNull.where(Sampling.bucket(col("__id")) < keepBp)
          .orderBy(Sampling.bucket(col("__id")), col("__id"))
          .limit(maxFitRows).collect().sortBy(_.getLong(0))
        val pts    = sampled.map(_.getSeq[Double](1).toArray)
        val labels = Hdbscan.fit(pts, minClusterSize, minSamples)
        val fitted = pts.zip(labels)
        val bc     = spark.sparkContext.broadcast(fitted)
        nonNull.as[(Long, Seq[Double])].map { case (id, v) =>
          val arr = v.toArray
          var best = -1; var bestD = Double.MaxValue
          var i = 0
          while (i < bc.value.length) {
            val q = bc.value(i)._1
            var d = 0.0; var j = 0
            while (j < arr.length) { val t = arr(j) - q(j); d += t * t; j += 1 }
            if (d < bestD) { bestD = d; best = bc.value(i)._2 }
            i += 1
          }
          (id, best)
        }.toDF("__id", "label")
          .select(col("__id").as(idCol), col("label"))
      }
    }
  }

  final class KMeansClusterer(
      k: Int,
      seed: Long = 42L,
      noiseQuantile: Double = 0.95,
      maxDriverFitBytes: Long = 64L << 20,
  ) extends Clusterer {

    override def cluster(df: DataFrame, vecCol: String, idCol: String): DataFrame = {
      val spark = df.sparkSession
      // One bounded collect decides the fit path AND provides the data: if
      // limit(budget+1) comes back within budget, that IS the whole corpus
      // (no separate count job; the fit is collect-order-independent).
      val sampled = Ml.driverRows(df, vecCol, maxDriverFitBytes, Seq(col(idCol).cast("long")))._2
      if (sampled.exists(_.isEmpty)) return df.select(col(idCol), lit(-1).as("label")).where(lit(false))
      if (sampled.isDefined) {
        // Driver fit, driver assignment (the corpus is already small).
        val rows = sampled.get
        val pts  = rows.map(_.getSeq[Double](0).toArray)
        val cs   = Ml.lloydFit(pts, k, seed)
        val assigned = rows.zip(pts).map { case (r, p) =>
          val (c, d) = Ml.nearestCentroid(p, cs); (r.getLong(1), c, math.sqrt(d))
        }
        val cut = {
          val ds = assigned.map(_._3).sorted
          ds(math.min(ds.length - 1, (noiseQuantile * ds.length).toInt))
        }
        import spark.implicits._
        assigned.toSeq.toDF("__id", "__c", "__d")
          .select(col("__id").as(idCol), when(col("__d") > cut, -1).otherwise(col("__c")).as("label"))
      } else {
        val withVec = df.withColumn("__v", array_to_vector(col(vecCol).cast("array<double>")))
        val model = new KMeans().setK(k).setSeed(seed).setFeaturesCol("__v").setPredictionCol("__label")
          .setDistanceMeasure("euclidean").fit(withVec)
        val assigned = model.transform(withVec)
        val centers  = model.clusterCenters.map(_.toArray.toSeq)
        val centerCol = element_at(typedLit(centers), col("__label") + 1)
        val dist   = sqrt(graft.functions.VectorOps.sqDist(col(vecCol).cast("array<double>"), centerCol))
        val scored = assigned.withColumn("__dist", dist)
        val cut    = scored.stat.approxQuantile("__dist", Array(noiseQuantile), 0.001).head
        scored.select(col(idCol), when(col("__dist") > cut, -1).otherwise(col("__label")).as("label"))
      }
    }
  }
}
