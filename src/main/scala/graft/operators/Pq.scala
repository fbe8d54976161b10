package graft.operators

import graft.functions.PqExpressions
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Product quantization — the sub-int8 ANN memory tier (Jégou et al. 2011;
  * the faiss IVF-PQ composition the reference gets from Qdrant's quantizer
  * config, backend/vector_db.py:41). SQ8 stores dim bytes/vector; PQ stores
  * `m` bytes (64-d, m=8 → 8 B, a further 8× under SQ8), at the cost of a
  * coarser score that needs an exact re-rank for top-k parity.
  *
  * Scale shape:
  *  - **fit** is a bounded driver-sample problem (codebooks are corpus
  *    SHAPE, like IVF centroids — Ivf.assign's rationale): m independent
  *    subspace k-means over ≤`maxDriverFitBytes` of sampled rows.
  *  - **encode** is a narrow codegen'd projection ([[PqExpressions.pqEncode]]
  *    — codebooks ride a reference object, not the plan), so a 100 TB corpus
  *    encodes in one scan with no shuffle.
  *  - **search** scores codes with a codegen'd table lookup
  *    ([[PqExpressions.pqAdc]] — the query's m×ksub inner-product table is
  *    computed once on the driver) and plans `TakeOrderedAndProject`, the
  *    same no-global-sort top-k as [[Search.topK]]; the optional refine
  *    re-ranks only the ADC top k·`refine` rows exactly.
  */
object Pq {

  final case class Model(codebooks: Array[Array[Array[Double]]]) {
    def m: Int    = codebooks.length
    def ksub: Int = codebooks.headOption.map(_.length).getOrElse(0)
    def dsub: Int = codebooks.headOption.flatMap(_.headOption).map(_.length).getOrElse(0)

    /** Row-major flat copy for the codegen'd encode expression. */
    lazy val flat: Array[Double] = {
      val out = new Array[Double](m * ksub * dsub)
      var j = 0
      while (j < m) {
        var c = 0
        while (c < ksub) {
          System.arraycopy(codebooks(j)(c), 0, out, (j * ksub + c) * dsub, dsub)
          c += 1
        }
        j += 1
      }
      out
    }

    /** ADC lookup table for one query: table[j·ksub+c] = q̂_j · codebook_jc
      * (q̂ = L2-normalized query), so Σ_j table[j][code_j] ≈ cosine(q, v).
      */
    def adcTable(queryVec: Seq[Double]): Array[Double] = {
      val q  = queryVec.toArray
      var nn = 0.0
      var i  = 0
      while (i < q.length) { nn += q(i) * q(i); i += 1 }
      val inv = if (nn > 0) 1.0 / math.sqrt(nn) else 0.0
      val out = new Array[Double](m * ksub)
      var j = 0
      while (j < m) {
        var c = 0
        while (c < ksub) {
          val cb  = codebooks(j)(c)
          var dot = 0.0
          var t   = 0
          while (t < dsub) {
            val idx = j * dsub + t
            if (idx < q.length) dot += q(idx) * inv * cb(t)
            t += 1
          }
          out(j * ksub + c) = dot
          c += 1
        }
        j += 1
      }
      out
    }
  }

  /** Fit m×ksub codebooks on a bounded driver sample. `dim % m == 0`
    * required — ragged subspaces silently skew the distance metric toward
    * the wider ones. Vectors are L2-normalized before slicing (cosine
    * geometry); ksub caps at the sample size per [[Ml.lloydFit]].
    */
  def fit(
      df: DataFrame,
      vecCol: String,
      m: Int,
      ksub: Int = 256,
      seed: Long = 42L,
      maxDriverFitBytes: Long = 64L << 20,
  ): Model = {
    val (dim, direct) = Ml.driverVectors(df, vecCol, maxDriverFitBytes)
    val pts = direct.getOrElse {
      // over budget: seeded sample down to the byte budget, like Ivf's
      // 256-per-list training budget — PQ codebooks are determined by a
      // small sample just as well
      val budgetRows = math.max(1L, maxDriverFitBytes / math.max(1, dim * 8L))
      val total      = df.count()
      val fraction   = math.min(1.0, budgetRows.toDouble / math.max(1L, total))
      df.select(col(vecCol).cast("array<double>").as("__v"))
        .where(col("__v").isNotNull)
        .sample(withReplacement = false, fraction, seed)
        .limit(budgetRows.toInt)
        .collect()
        .map(_.getSeq[Double](0).toArray)
    }
    require(pts.nonEmpty, "Pq.fit needs a non-empty corpus")
    require(m > 0 && dim % m == 0, s"dim $dim must divide by m=$m subspaces")
    val dsub = dim / m
    val normed = pts.map { p =>
      var nn = 0.0
      var i  = 0
      while (i < p.length) { nn += p(i) * p(i); i += 1 }
      val inv = if (nn > 0) 1.0 / math.sqrt(nn) else 0.0
      p.map(_ * inv)
    }
    val books = Array.tabulate(m) { j =>
      val sub = normed.map(_.slice(j * dsub, (j + 1) * dsub))
      // seed varies per subspace so identical subspace distributions don't
      // produce identical (correlated) centroid orderings
      Ml.lloydFit(sub, ksub, seed + j)
    }
    // lloydFit caps k at the sample size; keep the books rectangular
    val kEff = books.map(_.length).min
    Model(books.map(_.take(kEff)))
  }

  /** Append the m-byte PQ code column (narrow, codegen'd). */
  def pqTable(df: DataFrame, vecCol: String, model: Model, codesCol: String = "pq_codes"): DataFrame = {
    require(!df.columns.contains(codesCol), s"input already has a '$codesCol' column")
    df.withColumn(codesCol,
      PqExpressions.pqEncode(col(vecCol).cast("array<double>"), model.flat, model.m, model.ksub, model.dsub))
  }

  /** ADC top-k over codes only — no float vectors touched. Ties broken by
    * `idCol` for determinism (quantized scores tie far more often than
    * exact ones — whole code-identical groups share one score).
    */
  def topKOnCodes(
      coded: DataFrame,
      codesCol: String,
      idCol: String,
      queryVec: Seq[Double],
      k: Int,
      model: Model,
      filters: Seq[Column] = Nil,
  ): DataFrame = {
    val scored = coded.withColumn("score",
      PqExpressions.pqAdc(col(codesCol), model.adcTable(queryVec), model.ksub))
    filters.foldLeft(scored)((d, f) => d.where(f))
      .orderBy(desc("score"), col(idCol))
      .limit(k)
  }

  /** ADC candidate generation + EXACT re-rank: take the ADC top k·`refine`
    * (a `TakeOrderedAndProject`, so only k·refine rows survive), then score
    * those exactly against the float vectors and keep the true top-k. This
    * is the standard PQ recall recovery — the coarse score only has to keep
    * the true neighbors inside a small candidate set, not order them.
    */
  def topKRefined(
      coded: DataFrame,
      vecCol: String,
      codesCol: String,
      idCol: String,
      queryVec: Seq[Double],
      k: Int,
      model: Model,
      refine: Int = 4,
      filters: Seq[Column] = Nil,
  ): DataFrame = {
    val candidates = topKOnCodes(coded, codesCol, idCol, queryVec, k * refine, model, filters)
      .drop("score")
    Search.topK(candidates, vecCol, idCol, queryVec, k)
  }

  // ---- IVF-PQ: the faiss IVFPQ(+refine) composition ----------------------

  /** TWO list-partitioned stores, not one: the hot CODES store (id + m-byte
    * code — the only thing an ADC probe reads) and the cold FLOAT store
    * (same `list_id` layout). A single combined store would drag the float
    * column through every probe scan; with the split, the probe reads
    * nProbe/nList of the code files and the refine reads nProbe/nList of
    * the float files FILTERED to k·refine candidate ids — both legs
    * partition-pruned, which is the whole 100 TB point.
    */
  private val ivfPqCache =
    new java.util.concurrent.ConcurrentHashMap[String, (DataFrame, DataFrame, Ivf.Model, Model)]()

  /** Per-JVM token, same rationale as Ivf's registry: two JVMs sharing a
    * tmp dir must not overwrite each other's live stores.
    */
  private val jvmToken = java.util.UUID.randomUUID().toString.take(8)

  def ivfPqIndexFor(
      df: DataFrame,
      vecCol: String,
      idCol: String,
      nList: Int,
      m: Int,
      ksub: Int,
      cacheKey: String,
  ): (DataFrame, DataFrame, Ivf.Model, Model) =
    ivfPqCache.computeIfAbsent(cacheKey, _ => {
      val pqm              = fit(df, vecCol, m, ksub)
      val (assigned, ivfm) = Ivf.assign(df, vecCol, nList)
      val coded            = pqTable(assigned, vecCol, pqm)
      val root = sys.props("java.io.tmpdir") + s"/graft-ivfpq/$jvmToken/" + java.lang.Long.toHexString(
        (scala.util.hashing.MurmurHash3.stringHash(cacheKey, 42).toLong << 32) |
          (scala.util.hashing.MurmurHash3.stringHash(cacheKey, 4242).toLong & 0xffffffffL))
      Ivf.clusterByDir(coded.select(col(idCol), col("pq_codes"), col("list_id")))
        .write.mode("overwrite").partitionBy("list_id").parquet(root + "/codes")
      Ivf.clusterByDir(assigned).write.mode("overwrite").partitionBy("list_id").parquet(root + "/floats")
      val s = df.sparkSession
      (s.read.parquet(root + "/codes"), s.read.parquet(root + "/floats"), ivfm, pqm)
    })

  // ---- persistent IVF-PQ store + incremental maintenance ----------------

  /** Underscore prefix: Spark's file index ignores the sidecar. */
  private val CodebooksFile = "_pq_codebooks.txt"

  /** Monotonic store-version sidecar (VERDICT r15 task 2) — the
    * filesystem-INDEPENDENT freshness token: [[writeStore]] stamps 1 and
    * every [[applyDelta]] that changed any list bumps it AFTER both swaps
    * complete, so a reader cache (e.g. [[graft.plans.PqAutoProbe]]) keyed
    * on the version is correct on object stores whose prefixes report no
    * directory mtime (S3) and on filesystems with coarse (1 s) mtime
    * ticks where a same-tick rewrite is mtime-invisible (ADVICE r15).
    * Absent file = a pre-version store; readers fall back to mtimes and
    * the first applyDelta self-upgrades it (absent reads as 1, bump
    * writes 2). Same temp-file + rename discipline as the codebooks: a
    * concurrent reader never sees a partial token.
    */
  private[graft] val VersionFile = "_graft_version"

  /** Fail-closed version reader: None = no/unreadable sidecar. */
  def readVersion(conf: org.apache.hadoop.conf.Configuration, root: String): Option[Long] =
    scala.util.Try {
      val p  = new org.apache.hadoop.fs.Path(root, VersionFile)
      val fs = p.getFileSystem(conf)
      val in = fs.open(p)
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines().next().trim.toLong
      finally in.close()
    }.toOption

  private def writeVersion(
      conf: org.apache.hadoop.conf.Configuration, root: String, v: Long): Unit = {
    val dir = new org.apache.hadoop.fs.Path(root)
    val fs  = dir.getFileSystem(conf)
    fs.mkdirs(dir)
    val p   = new org.apache.hadoop.fs.Path(dir, VersionFile)
    val tmp = new org.apache.hadoop.fs.Path(dir, VersionFile + ".tmp")
    val w   = new java.io.PrintWriter(fs.create(tmp, true))
    try w.println(v.toString) finally w.close()
    if (w.checkError()) {
      fs.delete(tmp, false)
      throw new java.io.IOException(s"version sidecar write failed: $tmp")
    }
    fs.delete(p, false)
    fs.rename(tmp, p)
  }

  /** Persist the PQ codebooks beside the store — what makes an IVF-PQ
    * store durable and self-describing like its IVF (`_graft_centroids
    * .txt`) and HNSW (`_hnsw_meta`) siblings: without it the codebooks
    * lived only in [[ivfPqIndexFor]]'s JVM cache, so the compressed-tier
    * store could not be reopened, let alone incrementally maintained.
    * Format: one `m,ksub,dsub` header line, then m·ksub lines of dsub
    * comma-separated doubles (Double.toString round-trips exactly).
    * Temp-file + rename so a concurrent reader never sees a partial file.
    */
  private def writeCodebooks(conf: org.apache.hadoop.conf.Configuration, root: String, model: Model): Unit = {
    val dir = new org.apache.hadoop.fs.Path(root)
    val fs  = dir.getFileSystem(conf)
    fs.mkdirs(dir)
    val p   = new org.apache.hadoop.fs.Path(dir, CodebooksFile)
    val tmp = new org.apache.hadoop.fs.Path(dir, CodebooksFile + ".tmp")
    val w   = new java.io.PrintWriter(fs.create(tmp, true))
    try {
      w.println(s"${model.m},${model.ksub},${model.dsub}")
      model.codebooks.foreach(_.foreach(entry => w.println(entry.mkString(","))))
    } finally w.close()
    if (w.checkError()) {
      fs.delete(tmp, false)
      throw new java.io.IOException(s"codebook sidecar write failed: $tmp")
    }
    fs.delete(p, false)
    fs.rename(tmp, p)
  }

  /** Fail-closed reader ([[Ivf.readCentroids]]'s contract): a torn or
    * ragged sidecar yields None, never an exception.
    */
  def readCodebooks(spark: org.apache.spark.sql.SparkSession, root: String): Option[Model] = {
    val p  = new org.apache.hadoop.fs.Path(root, CodebooksFile)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    scala.util.Try {
      val in = fs.open(p)
      try {
        val lines = scala.io.Source.fromInputStream(in, "UTF-8").getLines().toArray
        val Array(m, ksub, dsub) = lines.head.split(",").map(_.toInt)
        val entries = lines.drop(1).map(_.split(",").map(_.toDouble))
        if (entries.length != m * ksub || entries.exists(_.length != dsub)) None
        else Some(Model(Array.tabulate(m)(j => Array.tabulate(ksub)(c => entries(j * ksub + c)))))
      } finally in.close()
    }.toOption.flatten
  }

  /** Write a durable two-store IVF-PQ index at `root`: `root/codes` (id +
    * m-byte code, list-partitioned — the hot probe store), `root/floats`
    * (the cold exact-rerank store, SAME list layout, carrying the IVF
    * sidecar so it is auto-probe-discoverable like any IVF store), and the
    * codebook sidecar at the root. This is [[ivfPqIndexFor]]'s layout made
    * persistent + self-describing — reopen with [[readStore]], maintain
    * with [[applyDelta]].
    */
  def writeStore(
      df: DataFrame,
      vecCol: String,
      idCol: String,
      root: String,
      nList: Int,
      m: Int,
      ksub: Int = 256,
      seed: Long = 42L,
  ): Unit = {
    // Project to exactly (id, vec) before assignment: applyDelta rebuilds
    // added rows from only these two columns, so a floats store persisted
    // with payload columns could be created but never maintained
    // (`assigned.select(floats.columns…)` would throw). Payload belongs in
    // the source table, joined back by id after the probe.
    val proj             = df.select(col(idCol), col(vecCol))
    val pqm              = fit(proj, vecCol, m, ksub, seed)
    val (assigned, ivfm) = Ivf.assign(proj, vecCol, nList, seed = seed)
    val coded            = pqTable(assigned, vecCol, pqm)
    Ivf.clusterByDir(coded.select(col(idCol), col("pq_codes"), col("list_id")))
      .write.mode("overwrite").partitionBy("list_id").parquet(root + "/codes")
    Ivf.writeIndexed(assigned, root + "/floats", ivfm, vecCol)
    val conf = df.sparkSession.sparkContext.hadoopConfiguration
    writeCodebooks(conf, root, pqm)
    writeVersion(conf, root, 1L)
  }

  /** Reopen a [[writeStore]] store: (codes, floats, ivf model, pq model). */
  def readStore(
      spark: org.apache.spark.sql.SparkSession,
      root: String,
  ): (DataFrame, DataFrame, Ivf.Model, Model) = {
    val conf = spark.sparkContext.hadoopConfiguration
    val st = Ivf.readCentroids(root + "/floats", conf).getOrElse(
      throw new IllegalStateException(s"no IVF sidecar under $root/floats — not a PQ store?"))
    val pqm = readCodebooks(spark, root).getOrElse(
      throw new IllegalStateException(s"no codebook sidecar under $root — not a PQ store?"))
    (spark.read.parquet(root + "/codes"), spark.read.parquet(root + "/floats"), st.model, pqm)
  }

  /** Recrawl maintenance for the two-store layout — [[Ivf.applyDelta]]'s
    * contract (removals + id-keyed upsert additions, affected-list-only
    * rewrite, staged `.delta` write + per-list swap, crashed-swap recovery
    * at entry) applied to BOTH stores in one pass: added rows assign their
    * list with the STORED centroids and encode with the STORED codebooks
    * (no refit — drift is [[Ivf.maintain]]'s job on the floats store), and
    * only the affected `list_id=` directories of either store are read or
    * written.
    *
    * Cross-store ordering: the FLOAT store swaps first. A crash between
    * the two swaps leaves codes one delta stale, which degrades gracefully
    * — removed ids may still surface as CANDIDATES but the rerank join
    * against the already-swapped floats drops them (no ghost results), and
    * fresh ids are invisible until the replayed batch completes the codes
    * swap. The reverse order could serve a candidate whose float row does
    * not exist yet, silently vacating a result slot. Replays are
    * idempotent (upsert semantics on both stores) AND self-healing: the
    * affected-list detection locates removals in BOTH stores, so lists
    * whose floats swap completed before the crash still get their codes
    * rewritten on the replay (floats-only detection would orphan those
    * removed ids in codes permanently).
    *
    * Returns the number of affected lists.
    */
  def applyDelta(
      spark: org.apache.spark.sql.SparkSession,
      root: String,
      removedIds: DataFrame,
      added: DataFrame,
      vecCol: String,
      idCol: String,
  ): Long = {
    val conf = spark.sparkContext.hadoopConfiguration
    val fs   = new org.apache.hadoop.fs.Path(root).getFileSystem(conf)
    // complete any crashed swap on EITHER store before listing files
    Ivf.recoverDeltaSwap(fs, new org.apache.hadoop.fs.Path(root + "/floats"),
      new org.apache.hadoop.fs.Path(root + "/floats.delta"), "list_id=")
    Ivf.recoverDeltaSwap(fs, new org.apache.hadoop.fs.Path(root + "/codes"),
      new org.apache.hadoop.fs.Path(root + "/codes.delta"), "list_id=")
    val (codes, floats, ivfm, pqm) = readStore(spark, root)
    require(added.columns.contains(vecCol),
      s"added frame must carry the store's float column '$vecCol' (has: ${added.columns.mkString(", ")})")
    val dupAdds = added.groupBy(col(idCol)).count().where(col("count") > 1).limit(1).count()
    require(dupAdds == 0, s"Pq.applyDelta: duplicate ids within `added` (column $idCol)")
    // upsert semantics: stored rows with an added id vacate first
    val rem = removedIds.select(col(idCol)).union(added.select(col(idCol))).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val assigned = Ivf.withListId(added.select(col(idCol), col(vecCol)), ivfm, vecCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // affected lists: one bounded-by-nList collect. Removed rows are
      // located in BOTH stores, not just floats — after a crash between
      // the floats swap and the codes swap, a replayed batch would find
      // nothing left to remove in floats for the already-swapped lists and
      // silently leave the removed ids in codes FOREVER (permanent stale
      // candidates eating k·refine slots); the codes-side scan makes the
      // replay self-healing at the cost of one column-pruned scan of the
      // narrow code store.
      val affected = floats.select(col(idCol), col("list_id"))
        .join(rem, Seq(idCol), "left_semi")
        .select("list_id")
        .union(codes.select(col(idCol), col("list_id"))
          .join(rem, Seq(idCol), "left_semi")
          .select("list_id"))
        .union(assigned.select("list_id"))
        .distinct().collect().map(_.getInt(0)).sorted
      if (affected.isEmpty) return 0L
      val lists = affected.map(Integer.valueOf).toIndexedSeq

      val keptF = floats.where(col("list_id").isin(lists: _*)).join(rem, Seq(idCol), "left_anti")
      val newF  = assigned.select(floats.columns.map(col).toIndexedSeq: _*)
      val keptC = codes.where(col("list_id").isin(lists: _*)).join(rem, Seq(idCol), "left_anti")
      val newC  = pqTable(assigned, vecCol, pqm)
        .select(col(idCol), col("pq_codes"), col("list_id"))

      def stageAndSwap(sub: String, frame: DataFrame): Unit = {
        val tmp = new org.apache.hadoop.fs.Path(root + s"/$sub.delta")
        Ivf.clusterByDir(frame).write.mode("overwrite").partitionBy("list_id").parquet(tmp.toString)
        Ivf.assertCommitMarker(fs, tmp)
        affected.foreach { l =>
          val dst = new org.apache.hadoop.fs.Path(root + s"/$sub", s"list_id=$l")
          val src = new org.apache.hadoop.fs.Path(tmp, s"list_id=$l")
          fs.delete(dst, true)
          if (fs.exists(src)) fs.rename(src, dst)
        }
        fs.delete(tmp, true)
      }
      // floats FIRST (see ordering rationale above)
      stageAndSwap("floats", keptF.unionByName(newF))
      stageAndSwap("codes", keptC.unionByName(newC.select(codes.columns.map(col).toIndexedSeq: _*)))
      // version bump LAST: a crash before this line leaves the token one
      // behind, and the batch's replay (idempotent, self-healing swaps
      // above) lands the bump — caches are never told "fresh" about a
      // store whose swaps haven't completed. Pre-version stores read as 1
      // and self-upgrade here.
      writeVersion(conf, root, readVersion(conf, root).getOrElse(1L) + 1L)
      affected.length.toLong
    } finally {
      rem.unpersist(); assigned.unpersist()
    }
  }

  /** Probe: prune lists → ADC top k·refine over codes → exact re-rank of
    * just those candidates against the float store (pruned to the SAME
    * lists — a candidate's vector lives in the list its code came from).
    *
    * FILTERED search runs behind the same CARDINALITY GATE as
    * [[Ivf.search]]/[[Hnsw.searchIndex]] (the reference's canonical query
    * is filtered k-NN — backend/vector_db.py:131-170, and the compressed
    * store is exactly what a 100 TB deployment runs it on): `filters` are
    * predicates over `payload` (carrying `payloadIdCol` + the filter
    * columns — the code store holds only ids and codes). The probe
    * compensates selectivity by WIDENING (nProbe ← ceil(nProbe/sel), so
    * the expected allowed candidate mass is preserved), with the
    * allowed-id semi-join landing on the PRUNED code scan BEFORE the ADC
    * top-k·refine cut — filtering after the cut would silently shrink the
    * candidate pool instead of the corpus. When the widened probe reaches
    * nList (a full scan anyway), the gate routes to the strictly-cheaper
    * EXACT branch: brute-force float-precision [[Search.topK]] over the
    * allowed survivors — exact by construction, no recall cliff, and it
    * reads floats only for rows that pass (few, by the gate's own
    * premise). `sel == 0` degenerates into that exact branch and returns
    * empty for free. `selectivityHint` skips the estimate scan, same
    * contract as the other gates. With `filters` empty the body is the
    * pre-gate implementation verbatim.
    */
  def searchIvfPq(
      codes: DataFrame,
      floats: DataFrame,
      ivfModel: Ivf.Model,
      pqModel: Model,
      vecCol: String,
      idCol: String,
      queryVec: Seq[Double],
      k: Int,
      nProbe: Int,
      refine: Int = 4,
      filters: Seq[Column] = Nil,
      payload: DataFrame = null,
      payloadIdCol: String = "id",
      selectivityHint: Double = Double.NaN,
  ): DataFrame = {
    var nP = math.min(nProbe, ivfModel.centroids.length)
    var allowed: DataFrame = null
    if (filters.nonEmpty) {
      require(payload != null,
        "filtered searchIvfPq needs the payload frame carrying payloadIdCol + the filter " +
          "columns (the code store holds only ids and codes)")
      val pred = filters.reduce(_ && _)
      val sel  = Search.estimatedSelectivity(payload, pred, selectivityHint)
      // ceil(nP/0) = Infinity >= nList: the nothing-passes case rides the
      // exact branch and returns empty with the right schema for free
      val widened = if (sel == 0d) Double.PositiveInfinity else math.ceil(nP.toDouble / sel)
      val allowedIds = payload.where(pred).select(col(payloadIdCol).as("__aid"))
      if (widened >= ivfModel.centroids.length)
        return Search.topK(
          floats.join(allowedIds, col(idCol) === col("__aid"), "left_semi"),
          vecCol, idCol, queryVec, k)
      nP = widened.toInt
      allowed = allowedIds
    }
    val lists = ivfModel.probeLists(queryVec, nP)
    val prunedCodes = codes.where(col("list_id").isin(lists: _*))
    val gatedCodes =
      if (allowed == null) prunedCodes
      else prunedCodes.join(allowed, col(idCol) === col("__aid"), "left_semi")
    val cand = topKOnCodes(gatedCodes, "pq_codes", idCol, queryVec, k * refine, pqModel)
      .select(idCol)
    Search.topK(
      floats.where(col("list_id").isin(lists: _*)).join(broadcast(cand), Seq(idCol)),
      vecCol, idCol, queryVec, k)
  }

  /** Batch ANN against the IVF-PQ store — the k-NN JOIN form of
    * [[searchIvfPq]] ([[Ivf.knnJoin]]'s shape on the compressed tier): a
    * pipeline attaching neighbors to a whole query FRAME must not pay |q|
    * job launches, so queries fan out to their nProbe lists as narrow
    * rows, candidates equi-join on `list_id`, and the ADC scoring runs as
    * ONE codegen'd pass ([[graft.functions.PqAdcPair]] — the single-query
    * path's driver-precomputed lookup table cannot exist when the query
    * is a COLUMN; the pair form reproduces its arithmetic bit for bit, so
    * the batch ranks candidates exactly as per-query probes would).
    *
    *  1. fan-out: |q|·nProbe narrow (query_id, qvec, list_id) rows, no
    *     driver collect of data;
    *  2. candidate stage reads ONLY the code store (m bytes/vector),
    *     volume |q|·n·(nProbe/nList); per-query ADC top k·refine via the
    *     map-side-combined [[graft.functions.TopKScored]] — the shuffle
    *     carries ≤ k·refine rows per (query, partition);
    *  3. exact re-rank: the bounded candidate frame joins the FLOAT
    *     store pruned to the batch's probed-list UNION (one bounded
    *     driver collect of list ids, the same class as shard-id lists —
    *     static partition pruning; diverse query batches degrade to all
    *     lists, the documented plateau) + the query vectors re-join by
    *     id; exact cosine, then the final top-k per query.
    *
    * FILTERED batch search — the same cardinality gate as [[searchIvfPq]]:
    * `filters` over `payload`, probe WIDENED by 1/sel with the allowed-id
    * semi-join landing on the candidate frame BEFORE the ADC cut, exact
    * fallback (brute-force [[Search.knnJoin]] over allowed float rows)
    * when the widened probe reaches nList. One gate decision per batch;
    * `selectivityHint` skips the estimate scan.
    *
    * Output: (query_id, neighbor_id, score, rank) — [[Search.knnJoin]]'s
    * contract, scores float-precision from the re-rank.
    */
  def knnJoinIvfPq(
      codes: DataFrame,
      floats: DataFrame,
      ivfModel: Ivf.Model,
      pqModel: Model,
      queries: DataFrame,
      queryVecCol: String,
      queryIdCol: String,
      vecCol: String,
      idCol: String,
      k: Int,
      nProbe: Int,
      refine: Int = 4,
      excludeSelf: Boolean = true,
      filters: Seq[Column] = Nil,
      payload: DataFrame = null,
      payloadIdCol: String = "id",
      selectivityHint: Double = Double.NaN,
  ): DataFrame = {
    import graft.functions.VectorOps._
    val spark = codes.sparkSession
    import spark.implicits._
    require(ivfModel.centroids.nonEmpty, "knnJoinIvfPq needs a fitted index (empty centroid set)")
    var nP = math.min(nProbe, ivfModel.centroids.length)
    var allowed: DataFrame = null
    if (filters.nonEmpty) {
      require(payload != null,
        "filtered knnJoinIvfPq needs the payload frame carrying payloadIdCol + the filter " +
          "columns (the code store holds only ids and codes)")
      val pred = filters.reduce(_ && _)
      val sel  = Search.estimatedSelectivity(payload, pred, selectivityHint)
      val widened = if (sel == 0d) Double.PositiveInfinity else math.ceil(nP.toDouble / sel)
      val allowedIds = payload.where(pred).select(col(payloadIdCol).cast("long").as("__aid"))
      if (widened >= ivfModel.centroids.length)
        // exact branch: brute-force float-precision join over the allowed
        // survivors — ids pre-cast to long so both branches emit ONE schema
        return Search.knnJoin(
          queries.select(col(queryIdCol).cast("long").as(queryIdCol), col(queryVecCol)),
          floats.select(col(idCol).cast("long").as(idCol), col(vecCol)).join(
            allowedIds, col(idCol) === col("__aid"), "left_semi"),
          queryVecCol, queryIdCol, vecCol, idCol, k, excludeSelf)
      nP = widened.toInt
      allowed = allowedIds
    }
    val bcModel = spark.sparkContext.broadcast(ivfModel)
    val nPF     = nP
    val fanned = graft.Par.fanOut(
      queries.select(col(queryIdCol).cast("long").as("query_id"), asDouble(col(queryVecCol)).as("__qv")))
      .as[(Long, Seq[Double])]
      .flatMap { case (qid, v) =>
        bcModel.value.probeLists(v, nPF).iterator.map(l => (qid, v, l))
      }
      .toDF("query_id", "__qv", "list_id")
    val candBase = codes
      .select(col(idCol).cast("long").as("neighbor_id"), col("pq_codes"), col("list_id"))
      .join(fanned, Seq("list_id"))
      .where(if (excludeSelf) col("query_id") =!= col("neighbor_id") else lit(true))
    val gated =
      if (allowed == null) candBase
      else candBase.join(allowed, col("neighbor_id") === col("__aid"), "left_semi")
    val scored = gated.select(col("query_id"), col("neighbor_id"),
      graft.functions.PqExpressions.pqAdcPair(col("pq_codes"), col("__qv"),
        pqModel.flat, pqModel.m, pqModel.ksub, pqModel.dsub).as("__adc"))
    val topC = graft.functions.TopKScored.udafFor(k * refine)
    val cands = scored
      .groupBy("query_id")
      .agg(topC(col("neighbor_id"), col("__adc")).as("nns"))
      .select(col("query_id"), explode(col("nns")).as("nn"))
      .select(col("query_id"), col("nn.id").as("neighbor_id"))
    // probed-list union: bounded by nList (list IDS, never data rows) —
    // prunes the float store's re-rank scan to the lists any query probed
    val probedLists = fanned.select("list_id").distinct().as[Int].collect().toSeq
    val qv = queries.select(col(queryIdCol).cast("long").as("query_id"),
      asDouble(col(queryVecCol)).as("__qv2"))
    val rer = cands
      .join(floats.where(col("list_id").isin(probedLists: _*))
        .select(col(idCol).cast("long").as("neighbor_id"), asDouble(col(vecCol)).as("__cv")),
        Seq("neighbor_id"))
      .join(qv, Seq("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        graft.functions.VectorExpressions.cosineFast(col("__cv"), col("__qv2")).as("score"))
      .where(col("score").isNotNull && !isnan(col("score")))
    val topk = graft.functions.TopKScored.udafFor(k)
    rer
      .groupBy("query_id")
      .agg(topk(col("neighbor_id"), col("score")).as("nns"))
      .select(col("query_id"), posexplode(col("nns")).as(Seq("pos", "nn")))
      .select(
        col("query_id"),
        col("nn.id").as("neighbor_id"),
        col("nn.score").as("score"),
        (col("pos") + 1).as("rank"),
      )
  }
}
