package graft

import graft.operators._
import graft.streaming.{EventWindows, Sessions}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Scaling-curve harness: generates seeded synthetic corpora at 1×/4×/16×
  * of the sf0.1 sizes (documents / embeddings / events) under /tmp, then
  * times the flagship operators warm at each scale. The point is the SHAPE
  * of the curve, not the absolute numbers: a linear-plan operator should
  * scale ~linearly in rows on fixed parallelism, and anything super-linear
  * is a candidate-explosion or shuffle problem that 100 TB would amplify.
  * Results feed SCALE.md.
  *
  * Usage: runMain graft.ScaleBench [maxScale] [opName...]  (default 16, all ops)
  */
object ScaleBench {

  /** recrawl_maintain's pre-built store per scale (see the catalog entry). */
  private val recrawlStores = scala.collection.concurrent.TrieMap.empty[Int, String]

  /** ivf_refit's pre-built store per scale (see the catalog entry). */
  private val refitStores = scala.collection.concurrent.TrieMap.empty[Int, String]

  /** hnsw_reshard's pre-built store per scale (see the catalog entry). */
  private val reshardStores = scala.collection.concurrent.TrieMap.empty[Int, String]
  private val maintainIvfStores = scala.collection.concurrent.TrieMap.empty[Int, String]

  /** Shared per-scale 8-shard HNSW store (hnsw_maintain + hnsw_knn_join
    * rows): ONE builder so the two consumers can't silently diverge on
    * the store shape they share through the cache.
    */
  private val sharedHnswStores = scala.collection.concurrent.TrieMap.empty[Int, (String, Long)]
  private def sharedHnswStore(scale: Int, vecs: org.apache.spark.sql.DataFrame): (String, Long) =
    sharedHnswStores.getOrElseUpdate(scale, {
      val p = java.nio.file.Files.createTempDirectory("sb-hnsw8").toString + "/store"
      graft.operators.Hnsw.writeIndex(
        vecs.select(org.apache.spark.sql.functions.col("vec_id"),
          org.apache.spark.sql.functions.col("embedding")),
        "embedding", "vec_id", p, nShards = 8)
      // corpus size rides the cache so hnsw_maintain's timed closure does
      // not pay a second full count on top of maintain's own store count —
      // the row claims to measure the per-round DECISION cost only
      (p, vecs.count())
    })

  /** Per-scale Graph.Context for the *_ctx amortized rows: builds (and
    * pins statics) on first use within a scale, closed by the per-scale
    * loop before clearCache so the pinned frames release through the
    * context's own discipline, not a global cache sweep.
    */
  private val graphCtxs = scala.collection.concurrent.TrieMap.empty[Int, graft.operators.Graph.Context]
  private def graphCtx(scale: Int, docs: org.apache.spark.sql.DataFrame): graft.operators.Graph.Context =
    graphCtxs.getOrElseUpdate(scale, {
      import org.apache.spark.sql.functions._
      val e = docs.select(col("doc_id").as("src"),
        pmod(hash(col("doc_id") * 31L), lit(500L * scale)).as("dst"))
      graft.operators.Graph.context(e, "src", "dst")
    })
  /** Per-scale context over the decade-chain CC graph — cc_ctx's pinned
    * labeling, apples-to-apples with the conn_components / cc_driver
    * one-shot rows (same graph, same node frame).
    */
  private val ccCtxs = scala.collection.concurrent.TrieMap.empty[Int, graft.operators.Graph.Context]
  private def ccCtx(scale: Int, docs: org.apache.spark.sql.DataFrame): graft.operators.Graph.Context =
    ccCtxs.getOrElseUpdate(scale, {
      import org.apache.spark.sql.functions._
      val e = docs.where(col("doc_id") % 10 =!= 9)
        .select(col("doc_id").as("u"), (col("doc_id") + 1).as("v"))
      graft.operators.Graph.context(e, "u", "v")
    })

  private def closeGraphCtx(scale: Int): Unit = {
    graphCtxs.remove(scale).foreach(_.close())
    ccCtxs.remove(scale).foreach(_.close())
  }

  /** onnx_embed's model.onnx + vocab.txt fixture, written once per JVM. */
  private lazy val onnxFixture: (String, String) =
    graft.onnx.TinyMpnet.writeTo(java.nio.file.Files.createTempDirectory("sb-onnx").toString)

  /** onnx_rerank's cross-encoder fixture, written once per JVM. */
  private lazy val crossFixture: (String, String) =
    graft.onnx.TinyMpnet.writeCrossTo(java.nio.file.Files.createTempDirectory("sb-cross").toString)

  /** recrawl_768's pre-built store per scale (see the 768d-tier entry). */
  private val recrawl768Stores = scala.collection.concurrent.TrieMap.empty[Int, String]

  private val Vocab = (0 until 1000).map("w" + _)

  /** Seeded synthetic tables, written as parquet so scans are storage-real.
    * ~2% of documents are exact duplicates of a boilerplate text (dedup
    * realism); embeddings are deterministic pseudo-random 64-d vectors;
    * events spread over ~200 users per unit scale with mixed gaps.
    */
  private def gen(spark: SparkSession, scale: Int, root: String): (DataFrame, DataFrame, DataFrame) = {
    val dir = s"$root/s$scale"
    val nDocs = 5000L * scale
    val nVec  = 2000L * scale
    val nEv   = 100000L * scale
    if (!new java.io.File(s"$dir/_done").exists()) {
      val words = typedLit(Vocab)
      // 2% of docs are exact duplicates, in FIXED-SIZE groups (~4 members)
      // with group texts that share no shingles ACROSS groups: a common
      // prefix would make every dup doc a J≈0.6 near-dup of every other
      // and the candidate output quadratic in corpus size (a megacluster —
      // the pathology maxBucketSize exists for), drowning the curve.
      val nGroups = math.max(nDocs / 200, 1L)
      val gid     = pmod(hash(col("id")), lit(nGroups))
      spark.range(nDocs).select(
        col("id").as("doc_id"),
        when(col("id") % 50 === 0,
          concat_ws(" ", transform(sequence(lit(0), lit(7)),
            i => element_at(words, (pmod(hash(gid * 8 + i), lit(1000)) + 1).cast("int")))))
          .otherwise(concat_ws(" ",
            transform(sequence(lit(0), lit(49) + pmod(hash(col("id")), lit(50))),
              i => element_at(words, (pmod(hash(col("id") * 131 + i), lit(1000)) + 1).cast("int"))))).as("text"),
      ).write.mode("overwrite").parquet(s"$dir/documents")
      spark.range(nVec).select(
        col("id").as("vec_id"),
        transform(sequence(lit(1), lit(64)),
          j => (pmod(hash(col("id") * 64 + j), lit(2000)) - 1000).cast("double") / 1000.0).as("embedding"),
      ).write.mode("overwrite").parquet(s"$dir/embeddings")
      spark.range(nEv).select(
        col("id").as("event_id"),
        pmod(hash(col("id")), lit(200 * scale)).as("user_id"),
        timestamp_micros(lit(1700000000000000L) + col("id") * 137000L).as("ts"),
        (pmod(hash(col("id") * 7), lit(10000)).cast("double") / 100.0).as("value"),
        element_at(typedLit(Seq("click", "view", "buy")), (pmod(hash(col("id") * 13), lit(3)) + 1).cast("int")).as("event_type"),
      ).write.mode("overwrite").parquet(s"$dir/events")
      new java.io.File(s"$dir/_done").createNewFile()
    }
    (
      spark.read.parquet(s"$dir/documents"),
      spark.read.parquet(s"$dir/embeddings"),
      spark.read.parquet(s"$dir/events"),
    )
  }

  /** 768-d corpus at the reference's real embedding shape (all-mpnet-base-v2
    * is 768-d, `backend/vector_db.py:41`; capacity claim 100k+ docs,
    * `README.md:881`): 25k×scale vectors in ~200 latent clusters (center
    * amplitude 1.0, per-vector noise 0.5 — enough cluster structure for IVF
    * to be meaningful, enough noise that sign-LSH band slices don't collapse
    * a whole cluster into one bucket), with 2% exact duplicates (id ≡ 1
    * mod 50 copies id−1's vector) so near-dup verification has real work.
    */
  private def gen768(spark: SparkSession, scale: Int, root: String): DataFrame = {
    val dir = s"$root/d768-s$scale"
    if (!new java.io.File(s"$dir/_done").exists()) {
      val src = when(col("id") % 50 === 1, col("id") - 1).otherwise(col("id"))
      val c   = pmod(src, lit(200))
      spark.range(25000L * scale).select(
        col("id").as("vec_id"),
        transform(sequence(lit(1), lit(768)), j =>
          (pmod(hash(c * 768 + j), lit(2000)) - 1000).cast("double") / 1000.0 +
            (pmod(hash(src * 768 + j, lit(77)), lit(2000)) - 1000).cast("double") / 2000.0).as("embedding"),
      ).write.mode("overwrite").parquet(s"$dir/embeddings")
      new java.io.File(s"$dir/_done").createNewFile()
    }
    spark.read.parquet(s"$dir/embeddings")
  }

  /** The reference-shape tier: v1/v5/v6/v7/d7/m1/m3 at 768-d, 25k and 100k
    * rows. 100k×768×8 B = 614 MB ≫ the 64 MB driver-fit budget, so this
    * exercises exactly the paths the small tier cannot: the MLlib
    * distributed fits (kmeans, PCA), the >32-list broadcast+mapPartitions
    * IVF assignment, and IVF recall at nList≈√n.
    */
  private def run768(spark: SparkSession, maxScale: Int, onlyOps: Set[String] = Set.empty): Unit = {
    import spark.implicits._
    val root = sys.props("java.io.tmpdir") + "/graft-scale"
    val qvCache = new java.util.concurrent.ConcurrentHashMap[Int, Seq[Double]]()
    val pqCache = new java.util.concurrent.ConcurrentHashMap[Int, (Pq.Model, org.apache.spark.sql.DataFrame)]()
    // round 15: the PERSISTENT two-store IVF-PQ index (sidecars on disk) —
    // what PqAutoProbe detects; built once per scale, survives across runs
    // in one boot via the sidecar existence check
    val pqStoreCache = new java.util.concurrent.ConcurrentHashMap[Int, (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame, Ivf.Model, Pq.Model)]()
    def pqStore(scale: Int, vecs: org.apache.spark.sql.DataFrame, nList: Int) =
      pqStoreCache.computeIfAbsent(scale, _ => {
        val dir = root + s"/pqstore768-$scale"
        val sidecar = new org.apache.hadoop.fs.Path(dir, "_pq_codebooks.txt")
        val fs = sidecar.getFileSystem(spark.sparkContext.hadoopConfiguration)
        if (!fs.exists(sidecar))
          Pq.writeStore(vecs, "embedding", "vec_id", dir, nList, m = 96, ksub = 64)
        Pq.readStore(spark, dir)
      })
    for (scale <- Seq(1, 4).filter(_ <= maxScale)) {
      val vecs   = gen768(spark, scale, root)
      val n      = 25000L * scale
      val nList  = math.max(32, math.sqrt(n.toDouble).toInt) // 158 / 316
      val nProbe = math.max(8, nList / 10)
      val qVec   = qvCache.computeIfAbsent(scale,
        _ => vecs.where(col("vec_id") === 7).select("embedding").head.getSeq[Double](0))
      def index() = Ivf.indexFor(vecs, "embedding", nList, cacheKey = s"scale768-$scale")
      val exactIds = Search.topK(vecs, "embedding", "vec_id", qVec, 10)
        .select("vec_id").as[Long].collect().toSet
      // filtered-search fixtures: a synthetic payload (vec_id mod 100 as
      // the percent band) and per-band filtered brute-force baselines,
      // computed lazily once per scale
      val filtPayload = vecs.select(col("vec_id"), pmod(col("vec_id"), lit(100)).as("pct"))
      val filtExactCache = new java.util.concurrent.ConcurrentHashMap[Int, Set[Long]]()
      def filtExact(band: Int): Set[Long] = filtExactCache.computeIfAbsent(band, _ =>
        Search.topK(vecs.where(pmod(col("vec_id"), lit(100)) < band),
          "embedding", "vec_id", qVec, 10)
          .select("vec_id").as[Long].collect().toSet)
      // batch-join truth for the filtered 50% band (64 queries × top-10),
      // computed once per scale so the fknn rows time the OPERATOR, not
      // the brute-force baseline
      lazy val fknnTruth50: Set[(Long, Long)] = Search.knnJoin(
        vecs.where(col("vec_id") < 64),
        vecs.where(pmod(col("vec_id"), lit(100)) < 50), "embedding", "vec_id",
        "embedding", "vec_id", 10)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
      val ops: Seq[(String, () => Long)] = Seq(
        "cosine_topk_768"  -> (() => Search.topK(vecs, "embedding", "vec_id", qVec, 10).count()),
        // round 15 (PqAutoProbe at the reference shape): build the
        // PERSISTENT store once (build row prices it), then the explicit
        // probe and the DECLARATIVE rewrite — their warm prices should be
        // indistinguishable (the rule's cost is driver-side plan surgery)
        // and both recall-gated against the exact ids
        "pq_store_build_768" -> (() => { pqStore(scale, vecs, nList); 1L }),
        "pq_store_probe_768" -> (() => {
          val (codes, floats, ivfm, pqm) = pqStore(scale, vecs, nList)
          Pq.searchIvfPq(codes, floats, ivfm, pqm, "embedding", "vec_id", qVec, 10,
            nProbe, refine = 32)
            .select("vec_id").as[Long].collect().count(exactIds).toLong
        }),
        "pq_auto_probe_768" -> (() => {
          val (_, floats, _, _) = pqStore(scale, vecs, nList)
          val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
          val prev    = classic.experimental.extraOptimizations
          classic.experimental.extraOptimizations = prev :+ graft.plans.PqAutoProbe(spark)
          spark.conf.set("spark.graft.pq.autoProbe", "true")
          spark.conf.set("spark.graft.pq.nProbe", nProbe.toString)
          spark.conf.set("spark.graft.pq.refine", "32")
          try Search.topK(floats, "embedding", "vec_id", qVec, 10)
            .select("vec_id").as[Long].collect().count(exactIds).toLong
          finally {
            spark.conf.unset("spark.graft.pq.autoProbe")
            spark.conf.unset("spark.graft.pq.nProbe")
            spark.conf.unset("spark.graft.pq.refine")
            classic.experimental.extraOptimizations = prev
          }
        }),
        "knn_join_32q_768" -> (() => Search.knnJoin(vecs.where(col("vec_id") < 32), vecs,
          "embedding", "vec_id", "embedding", "vec_id", 10).count()),
        // round-13 v38 at the real shape: the FILTERED IVF batch join (50%
        // band → probe widened ×2, allowed semi-join on the BOUNDED
        // candidate frame). Compare against ivf_knn_join_768 below: the
        // filter should add only the narrow semi-join + the wider probe.
        "ivf_fknn_join_768" -> (() => {
          val (indexed, model) = index()
          Ivf.knnJoin(indexed, model, vecs.where(col("vec_id") < 64), "embedding", "vec_id",
            "embedding", "vec_id", 10, nProbe,
            filters = Seq(col("pct") < 50), payload = filtPayload, payloadIdCol = "vec_id").count()
        }),
        // first call builds (kmeans fit at the MLlib path + partitioned store
        // write); the warm rep is a pure cache hit — the cold/warm delta IS
        // the build cost
        "ivf_build_768"    -> (() => { index(); 1L }),
        // rows = recall@10 vs exact — the v6 gate (≥8) at the real shape
        "ivf_probe_768"    -> (() => {
          val (indexed, model) = index()
          Ivf.search(indexed, model, "embedding", "vec_id", qVec, 10, nProbe)
            .select("vec_id").as[Long].collect().count(exactIds).toLong
        }),
        // v7: the declarative sort-by-cosine + limit, rewritten by
        // IvfAutoProbe into the pruned probe — same recall gate
        "auto_probe_768"   -> (() => {
          val (indexed, _) = index()
          val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
          val prev    = classic.experimental.extraOptimizations
          classic.experimental.extraOptimizations = prev :+ graft.plans.IvfAutoProbe(spark)
          spark.conf.set("spark.graft.ivf.autoProbe", "true")
          spark.conf.set("spark.graft.ivf.nProbe", nProbe.toString)
          try
            Search.topK(indexed, "embedding", "vec_id", qVec, 10)
              .select("vec_id").as[Long].collect().count(exactIds).toLong
          finally {
            classic.experimental.extraOptimizations = prev
            spark.conf.unset("spark.graft.ivf.autoProbe")
            spark.conf.unset("spark.graft.ivf.nProbe")
          }
        }),
        // round-9 p9 at the REAL shape: one recrawl maintenance round
        // against a 768-d store with nList≈√n (the store builds once per
        // scale on the cold rep via the MLlib distributed fit; the warm
        // rep is the selective rewrite only — upserts keep it idempotent).
        // ~0.2% planted churn: the cost to watch is affected-list location
        // + the sliver of partitions rewritten, not the corpus.
        "recrawl_768" -> (() => {
          val path = recrawl768Stores.getOrElseUpdate(scale, {
            val p = java.nio.file.Files.createTempDirectory("sb-recrawl768").toString + "/store"
            val (assigned, model) = Ivf.assign(vecs, "embedding", nList)
            Ivf.writeIndexed(assigned, p, model, "embedding")
            p
          })
          val removed = vecs.where(col("vec_id") % 499 === 0).select("vec_id")
          val added = vecs.where(col("vec_id") % 997 === 0)
            .select(col("vec_id"), transform(col("embedding"), x => -x).as("embedding"))
            .unionByName(vecs.where(col("vec_id") % 991 === 0)
              .select((col("vec_id") + 10000000L).as("vec_id"), reverse(col("embedding")).as("embedding")))
          Ivf.applyDelta(spark, path, removed, added, "vec_id")
        }),
        // batch ANN at the real shape: 64 queries × nProbe lists against
        // the store — the |q|·n·(nProbe/nList) candidate cap in action
        "ivf_knn_join_768" -> (() => {
          val (indexed, model) = index()
          Ivf.knnJoin(indexed, model, vecs.where(col("vec_id") < 64),
            "embedding", "vec_id", "embedding", "vec_id", 10, nProbe).count()
        }),
        // round 16 (v56): the adaptive batch join — each query's probe
        // width from its own centroid-margin cut instead of the fixed
        // nProbe. Compare against ivf_knn_join_768: the price difference
        // is the per-query geometry (two centroid rankings per query in
        // the fan-out task) plus whatever widths the margin actually
        // yields on this corpus; rows = 640 either way (64 × top-10).
        "ivf_knn_join_adaptive_768" -> (() => {
          val (indexed, model) = index()
          Ivf.knnJoinAdaptive(indexed, model, vecs.where(col("vec_id") < 64),
            "embedding", "vec_id", "embedding", "vec_id", 10, margin = 0.15,
            excludeSelf = false).count()
        }),
        // SQ8 at the real shape: top-k from int8 codes (4-8x smaller scan)
        // vs the float search; rows = recall@10 (gate >= 8)
        "sq8_topk_768" -> (() => {
          val qt = Quant.sq8Table(vecs, "embedding")
          Quant.topKOnCodes(qt, "codes", "vec_id", qVec, 10)
            .select("vec_id").as[Long].collect().count(exactIds).toLong
        }),
        // PQ at the real shape: 96 B/vector (64x under float64), ADC scan +
        // exact refine; rows = recall@10 vs the float search (gate >= 8).
        // Fit memoized per scale (an index is built once, probed many
        // times — the cold/warm delta is the fit+encode cost, like
        // ivf_build); ksub=64 per 8-d subspace (the PqSpec 768-d setting).
        "pq_refined_768" -> (() => {
          val (pqm, coded) = pqCache.computeIfAbsent(scale, _ => {
            val m = Pq.fit(vecs, "embedding", m = 96, ksub = 64)
            (m, Pq.pqTable(vecs, "embedding", m))
          })
          // refine=32: the corpus has ~125-vector latent clusters whose
          // MEMBERS the coarse score can't order (codebooks encode cluster
          // identity, not intra-cluster noise) — the candidate pool must
          // cover the query's cluster. 320 of 25k rows = 1.3% re-ranked.
          Pq.topKRefined(coded, "embedding", "pq_codes", "vec_id", qVec, 10, pqm, refine = 32)
            .select("vec_id").as[Long].collect().count(exactIds).toLong
        }),
        // v20 at the real shape: Hamming top-C over packed sign bits
        // (12 longs = 96 B/vector, 64x under float64, xor+popcount
        // codegen) + exact rerank of the C survivors; rows = recall@10
        // (gate >= 8). C=400 (1.6% of 25k) for the same reason as
        // pq_refined's refine=32: sign bits can't order the ~125-member
        // latent clusters internally, so the pool must cover the query's
        // whole cluster — C=50 measured 5/10 here, 400 restores 10/10
        // while the rerank still reads <2% of the float rows.
        "bq_topk_768" -> (() => Quant.topKBinaryRerank(
          vecs, "embedding", "vec_id", qVec, 10, 400)
          .select("vec_id").as[Long].collect().count(exactIds).toLong),
        // v24 at the real shape: the corpus-proportional cost is the exact
        // top-200 candidate scan (TakeOrderedAndProject); the greedy MMR
        // rerank is bounded (N + N²/2 rows) and scale-invariant, so this
        // curve should track the plain topK curve
        "mmr_768" -> (() => Search.mmrTopK(
          vecs, "embedding", "vec_id", qVec, 10, 200, 0.5).count()),
        // v19 at the real shape, split like ivf_build/ivf_probe: the graph
        // is built ONCE into the row-per-node store (cold/warm delta = the
        // O(n·log n) per-shard construction — 4 shards so per-shard size
        // grows with scale), and the recurring cost is searchIndex: scan
        // the store, rebuild each shard's adjacency in its task, beam
        // search. rows = recall@10 vs the float search (gate >= 8).
        "hnsw_build_768" -> (() => {
          Hnsw.indexFor(vecs, "embedding", "vec_id", cacheKey = s"scale768-hnsw-$scale",
            nShards = 4); 1L
        }),
        "hnsw_search_768" -> (() => {
          val idx = Hnsw.indexFor(vecs, "embedding", "vec_id",
            cacheKey = s"scale768-hnsw-$scale", nShards = 4)
          Hnsw.searchIndex(idx, qVec, "vec_id", 10)
            .select("vec_id").as[Long].collect().count(exactIds).toLong
        }),
        // round 13: FILTERED search at the real shape, one op per
        // selectivity band — the filtered-ANN recall cliff is
        // selectivity-dependent, so the gate must hold across the sweep.
        // rows = recall@10 vs the FILTERED brute force (gate >= 8 on the
        // beam bands; the 1% band trips the cardinality gate's exact
        // branch — needEf 6400 > maxEf 4096 — so its gate is == 10).
        // round 15: the DECLARATIVE filtered paths at the reference shape —
        // the rules' price must track the explicit gated calls they rewrite
        // to (the estimate scan is the only addition; hint-able)
        "ivf_filt50_768" -> (() => {
          val (indexed, model) = index()
          Ivf.search(indexed, model, "embedding", "vec_id", qVec, 10, nProbe,
            filters = Seq(pmod(col("vec_id"), lit(100)) < 50))
            .select("vec_id").as[Long].collect().count(filtExact(50)).toLong
        }),
        "ivf_auto_filt50_768" -> (() => {
          val (indexed, _) = index()
          val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
          val prev    = classic.experimental.extraOptimizations
          classic.experimental.extraOptimizations = prev :+ graft.plans.IvfAutoProbe(spark)
          spark.conf.set("spark.graft.ivf.autoProbe", "true")
          spark.conf.set("spark.graft.ivf.nProbe", nProbe.toString)
          try Search.topK(indexed, "embedding", "vec_id", qVec, 10,
            Seq(pmod(col("vec_id"), lit(100)) < 50))
            .select("vec_id").as[Long].collect().count(filtExact(50)).toLong
          finally {
            spark.conf.unset("spark.graft.ivf.autoProbe")
            spark.conf.unset("spark.graft.ivf.nProbe")
            classic.experimental.extraOptimizations = prev
          }
        }),
        // round 16: the HYDRATED declarative filtered probe — the same
        // sel-50% predicate but living in a JOINED metadata table, gated
        // by IvfAutoProbe's hydration path (sel = |allowed| / |store
        // rows|, one metadata count + one metadata-weight store count per
        // planning). Must track ivf_auto_filt50_768 (the store-carrier
        // declarative form): same widened width, same probed lists; the
        // deltas are the two gate count jobs + the user's own hydration
        // join riding the pruned scan.
        "ivf_hyd_filt50_768" -> (() => {
          val (indexed, _) = index()
          val meta = vecs.select(col("vec_id").as("mid"),
            pmod(col("vec_id"), lit(100)).as("pct"))
          val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
          val prev    = classic.experimental.extraOptimizations
          classic.experimental.extraOptimizations = prev :+ graft.plans.IvfAutoProbe(spark)
          spark.conf.set("spark.graft.ivf.autoProbe", "true")
          spark.conf.set("spark.graft.ivf.nProbe", nProbe.toString)
          try Search.topK(indexed.join(meta, col("vec_id") === col("mid")),
            "embedding", "vec_id", qVec, 10, Seq(col("pct") < 50))
            .select("vec_id").as[Long].collect().count(filtExact(50)).toLong
          finally {
            spark.conf.unset("spark.graft.ivf.autoProbe")
            spark.conf.unset("spark.graft.ivf.nProbe")
            classic.experimental.extraOptimizations = prev
          }
        }),
        "hnsw_auto_filt50_768" -> (() => {
          val idx = Hnsw.indexFor(vecs, "embedding", "vec_id",
            cacheKey = s"scale768-hnsw-$scale", nShards = 4)
          val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
          val prev    = classic.experimental.extraOptimizations
          classic.experimental.extraOptimizations = prev :+ graft.plans.HnswAutoProbe(spark)
          spark.conf.set("spark.graft.hnsw.autoProbe", "true")
          spark.conf.set("spark.graft.hnsw.efSearch", "64")
          try Search.topK(idx, "vec", "id", qVec, 10,
            Seq(pmod(col("id"), lit(100)) < 50))
            .select("id").as[Long].collect().count(filtExact(50)).toLong
          finally {
            spark.conf.unset("spark.graft.hnsw.autoProbe")
            spark.conf.unset("spark.graft.hnsw.efSearch")
            classic.experimental.extraOptimizations = prev
          }
        }),
        "hnsw_filt50_768" -> (() => {
          val idx = Hnsw.indexFor(vecs, "embedding", "vec_id",
            cacheKey = s"scale768-hnsw-$scale", nShards = 4)
          Hnsw.searchIndex(idx, qVec, "vec_id", 10, efSearch = 64,
            filters = Seq(pmod(col("vec_id"), lit(100)) < 50), payload = filtPayload)
            .select("vec_id").as[Long].collect().count(filtExact(50)).toLong
        }),
        "hnsw_filt10_768" -> (() => {
          val idx = Hnsw.indexFor(vecs, "embedding", "vec_id",
            cacheKey = s"scale768-hnsw-$scale", nShards = 4)
          Hnsw.searchIndex(idx, qVec, "vec_id", 10, efSearch = 64,
            filters = Seq(pmod(col("vec_id"), lit(100)) < 10), payload = filtPayload)
            .select("vec_id").as[Long].collect().count(filtExact(10)).toLong
        }),
        "hnsw_filt1_768" -> (() => {
          val idx = Hnsw.indexFor(vecs, "embedding", "vec_id",
            cacheKey = s"scale768-hnsw-$scale", nShards = 4)
          Hnsw.searchIndex(idx, qVec, "vec_id", 10, efSearch = 64,
            filters = Seq(pmod(col("vec_id"), lit(100)) < 1), payload = filtPayload)
            .select("vec_id").as[Long].collect().count(filtExact(1)).toLong
        }),
        // round 14: the FILTERED sweep on the QUANTIZED stores — the v39/
        // v40 cardinality gate at the real shape, one op per selectivity
        // band, same bands as the HNSW sweep above so the two families'
        // cliffs compare directly. rows = recall@10 vs the FILTERED brute
        // force. 50%: probe widened ×2 (stays pruned). 10%: widened to
        // ~nList — an almost-full probe, the honest cost of a selective
        // predicate on a pruned store. 1%: trips the exact branch
        // (ceil(nProbe/0.01) ≫ nList) → float-precision brute force over
        // the ~n/100 survivors, gate == 10 by construction.
        "ivfpq_filt50_768" -> (() => {
          val (codes, floats, ivfm, pqm) = Pq.ivfPqIndexFor(
            vecs, "embedding", "vec_id", nList, m = 96, ksub = 64,
            cacheKey = s"scale768-ivfpq-$scale")
          Pq.searchIvfPq(codes, floats, ivfm, pqm, "embedding", "vec_id", qVec, 10,
            nProbe, refine = 32,
            filters = Seq(pmod(col("vec_id"), lit(100)) < 50),
            payload = filtPayload, payloadIdCol = "vec_id")
            .select("vec_id").as[Long].collect().count(filtExact(50)).toLong
        }),
        "ivfpq_filt10_768" -> (() => {
          val (codes, floats, ivfm, pqm) = Pq.ivfPqIndexFor(
            vecs, "embedding", "vec_id", nList, m = 96, ksub = 64,
            cacheKey = s"scale768-ivfpq-$scale")
          Pq.searchIvfPq(codes, floats, ivfm, pqm, "embedding", "vec_id", qVec, 10,
            nProbe, refine = 32,
            filters = Seq(pmod(col("vec_id"), lit(100)) < 10),
            payload = filtPayload, payloadIdCol = "vec_id")
            .select("vec_id").as[Long].collect().count(filtExact(10)).toLong
        }),
        "ivfpq_filt1_768" -> (() => {
          val (codes, floats, ivfm, pqm) = Pq.ivfPqIndexFor(
            vecs, "embedding", "vec_id", nList, m = 96, ksub = 64,
            cacheKey = s"scale768-ivfpq-$scale")
          Pq.searchIvfPq(codes, floats, ivfm, pqm, "embedding", "vec_id", qVec, 10,
            nProbe, refine = 32,
            filters = Seq(pmod(col("vec_id"), lit(100)) < 1),
            payload = filtPayload, payloadIdCol = "vec_id")
            .select("vec_id").as[Long].collect().count(filtExact(1)).toLong
        }),
        // round 14: the FILTERED batch join on the compressed tier — 64
        // queries through Pq.knnJoinIvfPq's widened probe + pair-form ADC
        // + probed-list-pruned float rerank; compare ivf_fknn_join_768
        // (float store, same batch): the PQ candidate stage reads m bytes
        // per vector instead of 6 KB. rows = matched truth pairs vs the
        // filtered brute-force join (gate: >= 60%).
        "ivfpq_fknn_join_768" -> (() => {
          val (c768, f768, ivfm, pqm) = Pq.ivfPqIndexFor(
            vecs, "embedding", "vec_id", nList, m = 96, ksub = 64,
            cacheKey = s"scale768-ivfpq-$scale")
          val qs = vecs.where(col("vec_id") < 64)
          val got = Pq.knnJoinIvfPq(c768, f768, ivfm, pqm, qs,
            "embedding", "vec_id", "embedding", "vec_id", 10, nProbe, refine = 32,
            filters = Seq(pmod(col("vec_id"), lit(100)) < 50),
            payload = filtPayload, payloadIdCol = "vec_id")
            .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
          (got & fknnTruth50).size.toLong
        }),
        "ivfsq8_filt50_768" -> (() => {
          val qt = Quant.sq8Table(vecs.select(col("vec_id"), col("embedding")), "embedding")
            .select("vec_id", "codes")
          val (indexed, model) = Ivf.indexFor(qt, "codes", nList,
            cacheKey = s"scale768-sq8-$scale")
          Ivf.search(indexed, model, "codes", "vec_id", qVec, 10, nProbe,
            filters = Seq(pmod(col("vec_id"), lit(100)) < 50),
            payload = filtPayload, payloadIdCol = "vec_id",
            routeVec = Quant.sq8QueryCodes(qVec))
            .select("vec_id").as[Long].collect().count(filtExact(50)).toLong
        }),
        "ivfsq8_filt10_768" -> (() => {
          val qt = Quant.sq8Table(vecs.select(col("vec_id"), col("embedding")), "embedding")
            .select("vec_id", "codes")
          val (indexed, model) = Ivf.indexFor(qt, "codes", nList,
            cacheKey = s"scale768-sq8-$scale")
          Ivf.search(indexed, model, "codes", "vec_id", qVec, 10, nProbe,
            filters = Seq(pmod(col("vec_id"), lit(100)) < 10),
            payload = filtPayload, payloadIdCol = "vec_id",
            routeVec = Quant.sq8QueryCodes(qVec))
            .select("vec_id").as[Long].collect().count(filtExact(10)).toLong
        }),
        "ivfsq8_filt1_768" -> (() => {
          val qt = Quant.sq8Table(vecs.select(col("vec_id"), col("embedding")), "embedding")
            .select("vec_id", "codes")
          val (indexed, model) = Ivf.indexFor(qt, "codes", nList,
            cacheKey = s"scale768-sq8-$scale")
          Ivf.search(indexed, model, "codes", "vec_id", qVec, 10, nProbe,
            filters = Seq(pmod(col("vec_id"), lit(100)) < 1),
            payload = filtPayload, payloadIdCol = "vec_id",
            routeVec = Quant.sq8QueryCodes(qVec))
            .select("vec_id").as[Long].collect().count(filtExact(1)).toLong
        }),
        // d7 at 768-d: banded sign-LSH candidates + exact-cosine verify;
        // expected rows ≈ n/50 planted dup pairs (cos = 1 ≥ 0.99)
        "embed_neardup_768" -> (() => Dedup.embeddingNearDupPairs(
          vecs, "vec_id", "embedding", 0.99, dim = 768, numBits = 64, bands = 4).count()),
        // m1/m3 on the MLlib path (614 MB @100k breaks the driver budget)
        "kmeans_mllib_768" -> (() => new Ml.KMeansClusterer(10)
          .cluster(vecs, "embedding", "vec_id").groupBy("label").count().count()),
        "pca3d_mllib_768"  -> (() => Ml.pca3d(vecs, "embedding", "vec_id").count()),
        // m5 at the real shape: 25k/100k rows ≫ the 4096 fit cap → hash-
        // sampled driver fit + broadcast per-row transform (the scale path;
        // transform cost is the n×cap×dim distance sweep, embarrassingly
        // parallel). rows = corpus size (1:1 placement).
        "umap_sampled_768" -> (() => new Ml.UmapReducer()
          .project(vecs, "embedding", "vec_id").count()),
        // m7 past the 4096-row fit cap at 768-d (round 11): hash-sampled
        // driver fit + broadcast nearest-fitted-point assignment. The
        // INVARIANT gate rides in `rows`: the corpus's planted exact-dup
        // pairs (id ≡ 1 mod 50 copies id−1's vector) must land in the
        // same cluster — identical input through a deterministic
        // assignment — so rows = # dup pairs whose labels DISAGREE and
        // the gate is rows == 0. Parity at the crossover itself (cap−1
        // vs cap+1 behavior) is DistributedFitSpec's job; this row prices
        // the real shape.
        "hdbscan_sampled_768" -> (() => {
          val labels = new Ml.HdbscanClusterer(minClusterSize = 5, minSamples = 3)
            .cluster(vecs, "embedding", "vec_id")
          val a = labels.select(col("vec_id"), col("label"))
          val pairs = vecs.where(col("vec_id") % 50 === 1)
            .select(col("vec_id"), (col("vec_id") - 1).as("src_id"))
          pairs.join(a, "vec_id")
            .join(a.select(col("vec_id").as("src_id"), col("label").as("src_label")), "src_id")
            .where(col("label") =!= col("src_label")).count()
        }),
        // round 16 (VERDICT r15 task 5): PER-QUERY heterogeneous filters
        // at the reference shape — 64 queries in 8 predicate classes of
        // mixed selectivity (100%…1%: broad bands keep the widened pruned
        // probe, the 2%/1% bands trip the gate's exact branch) through
        // Search.perQueryFiltered over the gated IVF batch join. The cost
        // to watch is the per-GROUP plan fan-out: 8 gated joins + 8
        // estimate scans REGARDLESS of |q| — flat in queries, linear in
        // predicate classes. rows = 640 (64 × top-10; every band holds
        // ≥ 10 allowed rows at scale 1).
        "per_query_filt_768" -> (() => {
          val (indexed, model) = index()
          val qs = vecs.where(col("vec_id") < 64)
            .select(col("vec_id").as("qid"), col("embedding").as("qvec"),
              concat(lit("g"), pmod(col("vec_id"), lit(8))).as("band"))
          val bands  = Seq(100, 75, 50, 25, 10, 5, 2, 1)
          val groups = bands.zipWithIndex.map { case (b, i) =>
            s"g$i" -> Seq(col("pct") < b) }
          Search.perQueryFiltered(qs, "band", groups, (q, f) =>
            Ivf.knnJoin(indexed, model, q, "qvec", "qid", "embedding", "vec_id",
              10, nProbe, excludeSelf = false,
              filters = f, payload = filtPayload, payloadIdCol = "vec_id")).count()
        }),
        // round 16 (v50 at the reference shape): the DECLARATIVE batch-ANN
        // window over 64 queries × the store, rewritten by KnnJoinAuto into
        // the gated Ivf.knnJoin — its warm price must track
        // ivf_knn_join_768 (the explicit call it substitutes; the rule's
        // own cost is driver-side plan surgery + the cached centroid
        // sidecar read). Without the rule this query is a |q|·n cartesian.
        "knn_join_auto_768" -> (() => {
          val (indexed, _) = index()
          val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
          val prev    = classic.experimental.extraOptimizations
          classic.experimental.extraOptimizations = prev :+ graft.plans.KnnJoinAuto(spark)
          spark.conf.set("spark.graft.ivf.autoProbe", "true")
          spark.conf.set("spark.graft.ivf.nProbe", nProbe.toString)
          try {
            val w = org.apache.spark.sql.expressions.Window
              .partitionBy("qid").orderBy(desc("score"), col("vec_id"))
            vecs.where(col("vec_id") < 64)
              .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
              .crossJoin(indexed)
              .withColumn("score", graft.functions.VectorExpressions.cosineFast(
                col("embedding").cast("array<double>"), col("qvec").cast("array<double>")))
              .withColumn("rank", row_number().over(w))
              .where(col("rank") <= 10)
              .select("qid", "vec_id", "score", "rank").count()
          } finally {
            spark.conf.unset("spark.graft.ivf.autoProbe")
            spark.conf.unset("spark.graft.ivf.nProbe")
            classic.experimental.extraOptimizations = prev
          }
        }),
        // round 16: the EXPLICIT twin of per_query_auto_768 — the same 8
        // equality classes (12.5% each; the gate widens every group's
        // probe to ~nList, the honest mid-selectivity price) through
        // Search.perQueryFiltered directly. per_query_auto_768 minus this
        // row is the RULE's own overhead (plan surgery + one bounded
        // distinct scan); the workload is identical by construction.
        "per_query_eq_768" -> (() => {
          val (indexed, model) = Ivf.indexFor(
            vecs.withColumn("cls", pmod(col("vec_id"), lit(8)).cast("int")),
            "embedding", nList, cacheKey = s"scale768-cls-$scale")
          val qs = vecs.where(col("vec_id") < 64)
            .select(col("vec_id").as("qid"), col("embedding").as("qvec"),
              pmod(col("vec_id"), lit(8)).cast("string").as("band"))
          val groups = (0 until 8).map(v => v.toString -> Seq(col("cls") === lit(v)))
          Search.perQueryFiltered(qs, "band", groups, (q, f) =>
            Ivf.knnJoin(indexed, model, q, "qvec", "qid", "embedding", "vec_id",
              10, nProbe, excludeSelf = false, filters = f,
              payload = indexed.select("vec_id", "cls"), payloadIdCol = "vec_id")).count()
        }),
        // round 16 (v52 at the reference shape): the DECLARATIVE spelling
        // of per-query filters — knn_join_auto_768's window with a JOIN
        // CONDITION store.cls = queries.want (8 equality classes, 12.5%
        // each). KnnJoinAuto enumerates the distinct key tuples (ONE
        // bounded scan of the 64-row queries side) and routes through
        // Search.perQueryFiltered: 8 gated joins + 8 estimate scans
        // REGARDLESS of |q|. The warm price must track
        // per_query_filt_768's shape — |classes| × a per-group floor,
        // flat in queries — the rule itself adds only plan surgery.
        // rows = 640 (64 × top-10; every class holds ≥ 10 rows).
        "per_query_auto_768" -> (() => {
          val (indexed, _) = Ivf.indexFor(
            vecs.withColumn("cls", pmod(col("vec_id"), lit(8)).cast("int")),
            "embedding", nList, cacheKey = s"scale768-cls-$scale")
          val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
          val prev    = classic.experimental.extraOptimizations
          classic.experimental.extraOptimizations = prev :+ graft.plans.KnnJoinAuto(spark)
          spark.conf.set("spark.graft.ivf.autoProbe", "true")
          spark.conf.set("spark.graft.ivf.nProbe", nProbe.toString)
          try {
            val w = org.apache.spark.sql.expressions.Window
              .partitionBy("qid").orderBy(desc("score"), col("vec_id"))
            vecs.where(col("vec_id") < 64)
              .select(col("vec_id").as("qid"), col("embedding").as("qvec"),
                pmod(col("vec_id"), lit(8)).cast("int").as("want"))
              .join(indexed, col("cls") === col("want"))
              .withColumn("score", graft.functions.VectorExpressions.cosineFast(
                col("embedding").cast("array<double>"), col("qvec").cast("array<double>")))
              .withColumn("rank", row_number().over(w))
              .where(col("rank") <= 10)
              .select("qid", "vec_id", "score", "rank").count()
          } finally {
            spark.conf.unset("spark.graft.ivf.autoProbe")
            spark.conf.unset("spark.graft.ivf.nProbe")
            classic.experimental.extraOptimizations = prev
          }
        }),
      )
      val selected = if (onlyOps.isEmpty) ops else ops.filter(o => onlyOps.contains(o._1))
      selected.foreach { case (name, run) =>
        val tc0 = System.nanoTime(); run(); val cold = (System.nanoTime() - tc0) / 1e9
        val t0 = System.nanoTime(); val rows = run(); val warm = (System.nanoTime() - t0) / 1e9
        println(f"""{"op":"$name","dim":768,"scale":$scale,"n":$n,"sec":$warm%.3f,"cold":$cold%.3f,"rows":$rows}""")
      }
      spark.catalog.clearCache()
    }
  }

  /** Churn-proportionality tier (round 11): the recrawl lifecycle's cost
    * claim — maintenance cost ∝ churn, never corpus — measured on BOTH
    * axes for BOTH store families at the 768-d reference shape:
    *
    *  - corpus axis, FIXED churn: scales 1× and 4× (25k / 100k
    *    vectors). Expected shape: near-FLAT. IVF rewrites only the
    *    churn-touched list partitions; HNSW only the churn-touched
    *    shards — PROVIDED the rows-per-shard budget is held constant as
    *    the corpus grows (shards multiply, shard size doesn't), which is
    *    the production contract ([[Hnsw.RowsPerShard]]); this tier
    *    scales the budget down to 3125 rows/shard so 25k–100k corpora
    *    span 8–32 shards the way 100 TB spans thousands.
    *  - churn axis, FIXED corpus (4× = 100k): IVF churn 32/256/2048 —
    *    expected ~LINEAR in the affected-LIST footprint until it
    *    saturates (every list touched → full rewrite, the documented
    *    plateau). HNSW churn 4/16/128 — each touched shard is a
    *    bounded-size rebuild, and random ids HASH-SCATTER across
    *    shards, so cost ∝ min(churn, nShards) shards: linear while
    *    churn < nShards, plateaued at the full-corpus rebuild beyond.
    *    That scatter is the honest design limit: tiny-churn maintenance
    *    is cheap, bulk churn should go through reshard/rebuild instead.
    *
    * Each measurement applies a FRESH disjoint delta (new residue class,
    * new id range) so reps never re-insert existing ids; the store
    * accumulates ≤0.1% extra rows over the whole tier. Rep 0 is the
    * JIT/plan-warm cold rep, the printed `sec` is rep 1. Results feed
    * SCALE.md's churn-curve table (VERDICT r10 task 4).
    */
  private def runChurn(spark: SparkSession, maxScale: Int,
      families: Set[String] = Set.empty): Unit = {
    val root   = sys.props("java.io.tmpdir") + "/graft-scale"
    val stores = scala.collection.mutable.Map.empty[(String, Int), String]
    def ivfStore(scale: Int): String = stores.getOrElseUpdate(("ivf", scale), {
      val vecs  = gen768(spark, scale, root)
      val nList = math.max(32, math.sqrt(25000.0 * scale).toInt)
      val p = java.nio.file.Files.createTempDirectory(s"sb-churn-ivf$scale").toString + "/store"
      val (assigned, model) = Ivf.assign(vecs, "embedding", nList)
      Ivf.writeIndexed(assigned, p, model, "embedding")
      p
    })
    // constant 3125 rows/shard across scales — the RowsPerShard contract
    // at tier size (25k -> 8 shards, 100k -> 32)
    def hnswStore(scale: Int): String = stores.getOrElseUpdate(("hnsw", scale), {
      val vecs = gen768(spark, scale, root)
      val p = java.nio.file.Files.createTempDirectory(s"sb-churn-hnsw$scale").toString + "/store"
      Hnsw.writeIndex(vecs, "embedding", "vec_id", p, nShards = 8 * scale)
      p
    })
    // round 14: the compressed tier's maintenance path (Pq.applyDelta
    // rewrites affected lists of BOTH stores — codes AND floats — so its
    // churn curve should track ivf_apply_delta at roughly the float
    // store's cost plus the narrow codes rewrite)
    def pqStore(scale: Int): String = stores.getOrElseUpdate(("pq", scale), {
      val vecs  = gen768(spark, scale, root)
      val nList = math.max(32, math.sqrt(25000.0 * scale).toInt)
      val p = java.nio.file.Files.createTempDirectory(s"sb-churn-pq$scale").toString + "/store"
      Pq.writeStore(vecs, "embedding", "vec_id", p, nList, m = 96, ksub = 64)
      p
    })
    // fresh disjoint delta per (scale, churn, round): removals from one
    // residue class, inserts into an unused id range
    var round = 0
    def delta(scale: Int, churn: Int): (DataFrame, DataFrame) = {
      val vecs = gen768(spark, scale, root)
      val n    = 25000L * scale
      val half = math.max(1, churn / 2)
      val step = math.max(2L, n / half)
      round += 1
      val removed = vecs.where(pmod(col("vec_id"), lit(step)) === (round % step))
        .select("vec_id")
      val added = vecs.where(pmod(col("vec_id"), lit(step)) === ((round + 1) % step))
        .select((col("vec_id") + 10000000L * round).as("vec_id"),
          reverse(col("embedding")).as("embedding"))
      (removed, added)
    }
    def measure(family: String, scale: Int, churn: Int): Unit = {
      val apply: () => Long = family match {
        case "ivf" => () => {
          val (rem, add) = delta(scale, churn)
          Ivf.applyDelta(spark, ivfStore(scale), rem, add, "vec_id")
        }
        case "pq" => () => {
          val (rem, add) = delta(scale, churn)
          Pq.applyDelta(spark, pqStore(scale), rem, add, "embedding", "vec_id")
        }
        case _ => () => {
          val (rem, add) = delta(scale, churn)
          Hnsw.applyDelta(spark, hnswStore(scale), rem, add, "embedding", "vec_id").toLong
        }
      }
      apply() // cold: JIT + plan + store-open
      val t0 = System.nanoTime(); val rows = apply(); val sec = (System.nanoTime() - t0) / 1e9
      println(f"""{"op":"${family}_apply_delta","mode":"churn","scale":$scale,"n":${25000L * scale},"churn":$churn,"sec":$sec%.3f,"rows":$rows}""")
    }
    val hi = math.min(4, maxScale)
    def want(f: String) = families.isEmpty || families.contains(f)
    // IVF: churn lands in lists (hundreds of them), so the interesting
    // churn range is tens-to-thousands. HNSW: churn lands in SHARDS
    // (8–32 here), so the linear range is churn < nShards — single-digit
    // deltas on the corpus axis, 4/16/128 on the churn axis (128 ≫ 32
    // shards pins the plateau).
    // corpus axis extends a decade past the churn-axis scale (16× = 400k
    // 768-d vectors) — the flat-curve claim is exactly the one that must
    // survive the corpus growing under a FIXED delta
    if (want("ivf")) {
      for (scale <- Seq(1, 4, 16).filter(_ <= maxScale).distinct) measure("ivf", scale, 128)
      for (churn <- Seq(32, 256, 2048)) measure("ivf", hi, churn)
    }
    if (want("hnsw")) {
      for (scale <- Seq(1, 4, 16).filter(_ <= maxScale).distinct) measure("hnsw", scale, 4)
      for (churn <- Seq(4, 16, 128)) measure("hnsw", hi, churn)
    }
    if (want("pq")) {
      for (scale <- Seq(1, 4).filter(_ <= maxScale).distinct) measure("pq", scale, 128)
      for (churn <- Seq(32, 256, 2048)) measure("pq", hi, churn)
    }
  }

  /** Memory-pressure tier: the dedup/CC/semdedup pipeline at 16× under a
    * capped memory budget, asserting completion-by-spilling rather than
    * OOM. The 128 GiB sandbox never exercises the spill paths the 100 TB
    * design depends on (execution memory per task on a real executor is a
    * few hundred MB); `spark.testing.memory` is Spark's own knob for
    * simulating a small heap — the UnifiedMemoryManager budgets execution +
    * storage against it, so sorts and aggregations spill exactly as they
    * would on a memory-tight executor, while the actual JVM heap keeps
    * test-harness allocations safe. A SparkListener totals the observed
    * spill; the run FAILS (exit 1) if nothing spilled, because then the
    * tier proved nothing.
    */
  private def runLowmem(scale: Int): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-scale-lowmem")
      // 512 MB budget: ~(512−300)·0.6 ≈ 127 MB usable, half of it execution,
      // across 4 cores → ~16 MB per task before a sort/agg must spill
      .config("spark.testing.memory", (512L << 20).toString)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    @volatile var spilledMem  = 0L
    @volatile var spilledDisk = 0L
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        spilledMem += sc.stageInfo.taskMetrics.memoryBytesSpilled
        spilledDisk += sc.stageInfo.taskMetrics.diskBytesSpilled
      }
    })
    val root             = sys.props("java.io.tmpdir") + "/graft-scale"
    val (docs, vecs, _)  = gen(spark, scale, root)
    val ops: Seq[(String, () => Long)] = Seq(
      "exact_dedup"     -> (() => Dedup.exactDupGroups(docs, "doc_id", "text").count()),
      "lsh_jaccard"     -> (() => {
        val cand = Dedup.minHashCandidates(docs, "doc_id", "text", 3, 16, 8)
        Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.8, Some(cand)).count()
      }),
      "conn_components" -> (() => {
        val ids = docs.select(col("doc_id"))
        val e = ids.where(col("doc_id") % 10 =!= 9)
          .select(col("doc_id").as("u"), (col("doc_id") + 1).as("v"))
        Dedup.connectedComponents(ids, e, "doc_id", "u", "v", maxDriverEdges = 0L).count()
      }),
      "semdedup"        -> (() => {
        val pairs = Dedup.embeddingNearDupPairs(vecs, "vec_id", "embedding", 0.99, 64, 32, 4)
          .select("id_a", "id_b")
        Dedup.connectedComponents(vecs.select("vec_id"), pairs, "vec_id", "id_a", "id_b")
          .where(col("id") === col("component")).count()
      }),
      "repeated_spans"  -> (() => Dedup.repeatedSpans(docs, "doc_id", "text", 4).count()),
      "cut_spans"       -> (() => { Dedup.cutRepeatedSpans(docs, "doc_id", "text", 4)
        .agg(sum(col("n_cut")), sum(length(col("cleaned")))).head(); 1L }),
      // x32's shape (round 11): the KN bigram model fit is a pair-stream
      // groupBy over every adjacent token pair in the corpus. Under the
      // 512 MB budget the pair aggregation must go external — and it
      // does, PROVIDED materialize=false: the materialize=true variant
      // localCheckpoints the tok/pair/bigram frames, and checkpoint
      // blocks are unevictable storage that crowds the unified pool
      // until a downstream aggregation can't acquire its first page
      // (measured here: AGGREGATE_OUT_OF_MEMORY at 16 MB/task). That is
      // the knob's documented trade — cache for recompute — so the
      // memory-tight configuration runs the recompute side.
      "kn_surprisal"    -> (() => graft.functions.TextOps.knBigramSurprisal(docs, "doc_id", "text",
        materialize = false).agg(sum("n_pairs")).head().getLong(0)),
    )
    ops.foreach { case (name, run) =>
      val t0 = System.nanoTime(); val rows = run(); val sec = (System.nanoTime() - t0) / 1e9
      println(f"""{"op":"$name","mode":"lowmem","scale":$scale,"sec":$sec%.3f,"rows":$rows}""")
    }
    println(s"""{"mode":"lowmem","scale":$scale,"spilled_mem_bytes":$spilledMem,"spilled_disk_bytes":$spilledDisk}""")
    spark.stop()
    if (spilledMem == 0L && spilledDisk == 0L) {
      System.err.println("lowmem tier observed ZERO spill — budget too generous to prove anything")
      sys.exit(1)
    }
  }

  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("lowmem")) {
      runLowmem(args.drop(1).headOption.map(_.toInt).getOrElse(16))
      return
    }
    if (args.headOption.contains("768d")) {
      val spark = Engine.session("graft-scale-768")
      run768(spark, args.drop(1).headOption.map(_.toInt).getOrElse(4), args.drop(2).toSet)
      spark.stop()
      return
    }
    if (args.headOption.contains("churn")) {
      val spark = Engine.session("graft-scale-churn")
      runChurn(spark, args.drop(1).headOption.map(_.toInt).getOrElse(4), args.drop(2).toSet)
      spark.stop()
      return
    }
    val maxScale = args.headOption.map(_.toInt).getOrElse(16)
    // trailing args = op-name filter (dev iteration on a few curves)
    val onlyOps  = args.drop(1).toSet
    // 64× (320k docs / 128k vecs / 6.4M events) is the round-12 decade
    // extension for the dedup/ANN flagships — pass 64 to include it
    val scales   = Seq(1, 4, 16, 64).filter(_ <= maxScale)
    val root     = sys.props("java.io.tmpdir") + "/graft-scale"
    val spark    = Engine.session("graft-scale")
    val qVec     = Embedder.default.embed("scaling probe query").map(_.toDouble).toSeq

    for (scale <- scales) {
      val (docs, vecs, events) = gen(spark, scale, root)
      val ops: Seq[(String, () => Long)] = Seq(
        "exact_dedup"     -> (() => Dedup.exactDupGroups(docs, "doc_id", "text").count()),
        "minhash_cand"    -> (() => Dedup.minHashCandidates(docs, "doc_id", "text", 3, 16, 8).count()),
        "lsh_jaccard"     -> (() => {
          val cand = Dedup.minHashCandidates(docs, "doc_id", "text", 3, 16, 8)
          Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.8, Some(cand)).count()
        }),
        "simhash_neardup" -> (() => Dedup.simHashNearDupPairs(docs, "doc_id", "text", 3, 4).count()),
        // mergeable sketch family over events: per-(type, batch) HLL+KLL
        // build then rollup — output is O(groups), the shuffle carries one
        // live buffer per partition per group; should be scan-bound linear
        "sketch_registry" -> (() => {
          val ev = events.withColumn("batch", pmod(col("event_id"), lit(16L)))
          val hll = Sketches.mergeSketches(
            Sketches.distinctSketches(ev, Seq("event_type", "batch"), "user_id"),
            Seq("event_type"))
          val kll = Sketches.mergeQuantileSketches(
            Sketches.quantileSketches(ev, Seq("event_type", "batch"), "value"),
            Seq("event_type"), Seq(0.5, 0.99))
          hll.join(kll, "event_type").count()
        }),
        // theta slice-overlap across event types (sketch build dominates)
        "theta_overlap"   -> (() => Sketches.sliceOverlap(
          Sketches.setSketches(events, Seq("event_type"), "user_id"), "event_type").count()),
        // concat-and-chunk packing: one hash shuffle + bounded per-shard window
        "pack_concat"     -> (() => Packing.packConcat(
          docs.select(col("doc_id"), (length(col("text")) / 5).cast("long").as("n_tok")),
          "doc_id", "n_tok", 2048, nShards = 8).agg(max("seq_last")).count()),
        // u13: histogram-edge bucketing + in-bucket batching (round 11) —
        // one scan into the length histogram, broadcast join back, the
        // batching windows partition by bucket
        "length_buckets"  -> (() => Packing.lengthBuckets(
          docs.select(col("doc_id"), length(col("text")).as("len")),
          "doc_id", "len", nBuckets = 8, batchSize = 32)
          .agg(sum("pad")).head().getLong(0)),
        // x38: one struct-max/min aggregate over scale-proportional
        // prompt groups (~10 candidates each)
        "dpo_pairs"       -> (() => Chat.preferencePairs(
          docs.select(pmod(col("doc_id"), lit(math.max(5000L * scale / 10, 1L))).as("prompt_id"),
            col("doc_id"), (length(col("text")) % 97).cast("double").as("score")),
          "prompt_id", "doc_id", "score", minMargin = 1.0).count()),
        // x40: the normalization chain is a single codegen'd projection —
        // this row should track raw scan throughput
        "normalize"       -> (() => docs.select(
          graft.functions.TextOps.normalizeText(col("text")).as("n"))
          .agg(sum(length(col("n")))).head().getLong(0)),
        // x39: calibration binning is one scan into a 10-row aggregate
        "calibration"     -> (() => graft.operators.Eval.calibrationBins(
          docs.select(((length(col("text")) % 100) / 100.0).as("score"),
            (col("doc_id") % 2).cast("int").as("label")),
          "score", "label", 10).count()),
        // dq1 (round 12): five row rules share ONE scan + a uniqueness
        // key aggregate — should track raw scan throughput
        "dq_expectations" -> (() => {
          import graft.operators.Expectations._
          graft.operators.Expectations.evaluate(docs, Seq(
            NotNull("text"), InRange("doc_id", 0, 1e12),
            Matches("text", "^[\\s\\S]*$"), MaxNullFraction("text", 0.5),
            Unique(Seq("doc_id")))).count()
        }),
        // dq2/dq3 (round 12): quasi-keyed aggregates + rollup over events
        "dq_kanonymity"   -> (() => {
          val q = events.select(col("event_type"), (col("user_id") % 37).as("g"),
            floor(col("value")).cast("long").as("vb"))
          graft.operators.Expectations.kAnonymity(q, Seq("event_type", "g", "vb"), 5).count()
        }),
        "cosine_topk"     -> (() => Search.topK(vecs, "embedding", "vec_id", qVec, 10).count()),
        // round-10 v27: group shuffle builds the token bags, then ONE
        // fused maxsim pass + TakeOrderedAndProject — linear in vectors
        "late_interaction" -> (() => {
          val q = Seq((0 until 64).map(i => math.sin(i * 0.3)), (0 until 64).map(i => math.cos(i * 0.5) - 0.1))
          val docs64 = vecs.groupBy((col("vec_id") % 512).as("doc_id"))
            .agg(collect_list(col("embedding").cast("array<double>")).as("tok_vecs"))
          Search.lateInteractionTopK(docs64, "tok_vecs", "doc_id", q, 10).count()
        }),
        // round-10 v28: BM25 recall (filtered token stream) + a
        // 100-candidate-bounded rerank — stage 2 cost is constant in corpus
        "rerank_topk"     -> (() => Rank.rerankTopK(
          docs, "doc_id", "text", Seq("w17", "w256", "w901"), 10, 100).count()),
        "knn_join_32q"    -> (() => Search.knnJoin(vecs.where(col("vec_id") < 32), vecs, "embedding", "vec_id", "embedding", "vec_id", 10).count()),
        "ivf_probe"       -> (() => {
          val (indexed, model) = Ivf.indexFor(vecs, "embedding", 32, cacheKey = s"scale$scale")
          Ivf.search(indexed, model, "embedding", "vec_id", qVec, 10, 4).count()
        }),
        // v9: batch ANN — 64 queries broadcast against the list-pruned
        // store; candidate cap is |q|·n·(nProbe/nList) regardless of scale
        "ivf_knn_join"    -> (() => {
          val (indexed, model) = Ivf.indexFor(vecs, "embedding", 32, cacheKey = s"scale$scale")
          Ivf.knnJoin(indexed, model, vecs.where(col("vec_id") < 64),
            "embedding", "vec_id", "embedding", "vec_id", 10, 4).count()
        }),
        // v19: shard-local HNSW with the rows-per-shard contract held
        // constant (nShards = scale → 2k rows/shard at every scale, the
        // way 100 TB spans thousands of shards); search is per-shard beam
        // + TakeOrderedAndProject merge
        "hnsw_search"     -> (() => {
          val idx = Hnsw.indexFor(vecs, "embedding", "vec_id",
            cacheKey = s"scale-hnsw-$scale", nShards = math.max(1, scale))
          Hnsw.searchIndex(idx, qVec, "vec_id", 10).count()
        }),
        // round-9 p9: one recrawl maintenance round against a corpus-scale
        // store — the delta (and therefore the embed + rewrite work) is
        // FIXED-size while the corpus grows, so the curve should flatten
        // toward the diff's (id, hash) full-outer join cost
        "recrawl_maintain" -> (() => {
          val oldDocs = docs.select("doc_id", "text")
          // store built once per scale (the pre-existing state); the timed
          // warm rep is diff + delta embed + selective rewrite only —
          // applyDelta's upsert semantics make the re-apply idempotent
          val path = recrawlStores.getOrElseUpdate(scale, {
            val p = java.nio.file.Files.createTempDirectory("sb-recrawl").toString + "/store"
            val emb = Embedder.embedText(spark, oldDocs, "doc_id", "text").toDF()
              .select(col("id").as("doc_id"), col("embedding"))
            val (assigned, model) = Ivf.assign(emb, "embedding", 32)
            Ivf.writeIndexed(assigned, p, model, "embedding")
            p
          })
          val newDocs = oldDocs.where(!(col("doc_id") % 997 === 0))
            .withColumn("text", when(col("doc_id") % 991 === 0,
              concat(col("text"), lit(" updated"))).otherwise(col("text")))
            .unionByName(oldDocs.where(col("doc_id") % 983 === 0)
              .select((col("doc_id") + 10000000L).as("doc_id"), concat(lit("fresh "), col("text")).as("text")))
          val (diff, touched) = Recrawl.maintainIvf(spark, path, oldDocs, newDocs, "doc_id", "text")
          val n = diff.where(col("status") =!= "unchanged").count()
          diff.unpersist()
          n + touched
        }),
        // round-10: centroid-drift lifecycle — driftStats is ONE
        // column-pruned scan + an nList-row aggregate; refit is a scan +
        // bounded fit sample + one partitioned rewrite. Both should track
        // corpus rows ~linearly: refit is the amortized slow path whose
        // cost applyDelta's selective rewrites avoid paying per delta.
        "ivf_refit"       -> (() => {
          val path = refitStores.getOrElseUpdate(scale, {
            val p = java.nio.file.Files.createTempDirectory("sb-refit").toString + "/store"
            val (assigned, model) = Ivf.assign(vecs.select(col("vec_id"), col("embedding")), "embedding", 32)
            Ivf.writeIndexed(assigned, p, model, "embedding")
            p
          })
          val lists = Ivf.driftStats(spark, path).count()
          Ivf.refit(spark, path)
          lists
        }),
        // round-10 v29: the HNSW twin — shardStats is one column-pruned
        // scan; reshard is a full re-route + rebuild (the initial build
        // cost, paid only when occupancy says so). Should track the
        // hnsw_build curve, not the corpus-squared anything.
        "hnsw_reshard"    -> (() => {
          val path = reshardStores.getOrElseUpdate(scale, {
            val p = java.nio.file.Files.createTempDirectory("sb-reshard").toString + "/store"
            Hnsw.writeIndex(vecs.select(col("vec_id"), col("embedding")),
              "embedding", "vec_id", p, nShards = 8)
            p
          })
          val shards = Hnsw.shardStats(spark, path).count()
          Hnsw.reshard(spark, path, nShards = 12)
          shards
        }),
        // round-13 v34/v35: the maintain policies in STEADY STATE — a
        // healthy store, verdict noop, so the row measures the per-round
        // DECISION cost a pipeline pays every maintenance cycle (one
        // column-pruned count / one driftStats aggregate). The act legs
        // are the ivf_refit / hnsw_reshard rows above — maintain adds
        // only the audit on top of them when the verdict fires.
        "hnsw_maintain"   -> (() => {
          val (path, n) = sharedHnswStore(scale, vecs)
          // rowsPerShard = ceil(n/8) → target 8 == current → noop
          Hnsw.maintain(spark, path, rowsPerShard = (n + 7) / 8).count()
        }),
        "ivf_maintain"    -> (() => {
          val path = maintainIvfStores.getOrElseUpdate(scale, {
            val p = java.nio.file.Files.createTempDirectory("sb-imaint").toString + "/store"
            val (assigned, model) = Ivf.assign(vecs.select(col("vec_id"), col("embedding")), "embedding", 8)
            Ivf.writeIndexed(assigned, p, model, "embedding")
            p
          })
          // a fresh seeded fit stays under a skewMax sized to the list
          // count → noop; the v35 oracle/spec covers the act leg
          Ivf.maintain(spark, path, skewMax = 8.0).count()
        }),
        // round-13 v36: batch ANN join — store co-location amortizes over
        // the batch, per-task graphs rebuild once; should grow with corpus
        // (graph size) and stay flat in the (fixed-fraction) query count.
        "hnsw_knn_join"   -> (() => {
          val idx = spark.read.parquet(sharedHnswStore(scale, vecs)._1)
          Hnsw.knnJoin(idx, vecs.where(col("vec_id") % 50 === 0), "embedding", "vec_id",
            10, efSearch = 64).count()
        }),
        // round-13 u18: audit + join; the audit carries (key, count) only,
        // so the row should track the salted_agg curve plus the join.
        "auto_join"       -> (() => {
          val dim = events.select(col("event_type")).distinct()
            .select(col("event_type"), length(col("event_type")).cast("long").as("tl"))
          Skew.autoJoin(events.select("event_type", "value"), dim, "event_type",
            nBuckets = 32)._1.count()
        }),
        "sessionize"      -> (() => Sessions.sessionize(events, 30).count()),
        "tumbling_window" -> (() => EventWindows.tumbling(events, "ts", "10 minutes").count()),
        "salted_agg"      -> (() => Skew.saltedAggregate(events, "event_type", 8,
          partials = Seq(count(lit(1)).as("pc")), merges = Seq(sum(col("pc")).cast("long").as("n"))).count()),
        "chunk_embed"     -> (() => {
          val chunks = Chunker.chunk(spark, docs.withColumn("lang", lit("en"))).toDF()
          Embedder.embedText(spark, chunks, "doc_id", "text").toDF().count()
        }),
        // round-9 v25: two filtered-token-stream BM25 passes + a
        // fbDocs-bounded expansion agg — should scale like 2× plain bm25
        "bm25_rm3"        -> (() => Rank.bm25Rm3(
          docs, "doc_id", "text", Seq("w17", "w256", "w901"),
          fbDocs = 10, fbTerms = 5).count()),
        // round-9 c6: per-row flatMap (split + token-set sims + reassembly
        // all inside the row) — should track the plain chunker's linear
        // scan curve with a constant-factor tokenization overhead
        "semantic_chunk"  -> (() => Chunker.semanticChunks(
          spark,
          docs.select(col("doc_id"), concat_ws(" ",
            concat(substring(col("text"), 1, 200), lit(".")),
            lit("Subscribe to our newsletter today!"),
            concat(substring(col("text"), 201, 200), lit("."))).as("text")),
          "doc_id", "text", 0.2).count()),
        // round-9: the REAL-model path through the same mapPartitions seam —
        // the from-scratch ONNX runtime running the in-repo mpnet-shaped
        // 2-layer export per batch (WordPiece ids, padded batch, masked
        // attention, mean-pool). rows/sec here is the embedding seam's
        // measured cost; a production 12-layer/384-wide model multiplies
        // the per-token FLOPs, not the plan shape.
        "onnx_embed"      -> (() => {
          val chunks = Chunker.chunk(spark, docs.withColumn("lang", lit("en"))).toDF()
          Embedder.embedText(spark, chunks, "doc_id", "text",
            new graft.onnx.OnnxEmbedder(onnxFixture._1, onnxFixture._2, graft.onnx.TinyMpnet.hidden))
            .toDF().count()
        }),
        // round-10: the model-backed precision stage — stage 1 scans the
        // corpus (bm25), stage 2 runs the ONNX cross-encoder over ≤50
        // candidates, so the model cost must stay CONSTANT as the corpus
        // grows (the whole point of the two-stage split)
        "onnx_rerank"     -> (() => Rank.rerankTopKWith(
          docs, "doc_id", "text", Seq("w17", "w256"), "w17 w256",
          new graft.onnx.OnnxCrossEncoder(crossFixture._1, crossFixture._2),
          k = 10, nCandidates = 50).count()),
        // round-10 v30: rank-capped (query, doc) join + per-query
        // aggregates — linear in run size, window only over qrels
        "eval_metrics"    -> (() => {
          val run = docs.select((col("doc_id") % 1000).as("query_id"),
            col("doc_id"), (pmod(hash(col("doc_id")), lit(10)) + 1).as("rank"))
          val qrels = docs.where(col("doc_id") % 7 === 0)
            .select((col("doc_id") % 1000).as("query_id"), col("doc_id"), lit(1).as("rel"))
          Eval.rankingMetrics(run, qrels, 10).count()
        }),
        // round-10 x31: one URL-keyed window + group-by over the event log
        "recrawl_schedule" -> (() => Recrawl.schedule(
          events.select(concat(lit("u"), col("user_id").cast("string")).as("url"),
            col("ts"), col("event_type").as("sig")),
          "url", "ts", "sig", java.time.Instant.ofEpochSecond(1800000000L)).count()),
        // round-10 x32: x10's relational shape + one extra count table —
        // should track bigram_surprisal's curve
        "kn_surprisal"    -> (() => graft.functions.TextOps
          .knBigramSurprisal(docs, "doc_id", "text", materialize = true).count()),
        // round-10 x33: pure per-row projection — linear scan, no shuffle
        "chat_render"     -> (() => {
          val sentinel = "\u0001"
          val sents = split(regexp_replace(col("text"),
            "([.!?])[ \t\r\n]+", "$1" + sentinel), sentinel)
          val turns = transform(slice(sents, 1, 6), (c, i) =>
            struct(when(i % 2 === 0, "user").otherwise("assistant").as("role"), c.as("content")))
          Chat.render(docs.withColumn("turns", turns), "doc_id", "turns").count()
        }),
        // round-10 x35: hash cuts + substr concat — pure projection
        "fim"             -> (() => graft.functions.TextOps
          .fimTransform(docs, "doc_id", "text").count()),
        // round-10 x36: one narrow explode + id-keyed aggregates
        "code_switch"     -> (() => graft.functions.TextOps
          .codeSwitchStats(docs, "doc_id", "text").count()),
        // round-10 x34: codegen argmin projection + one cluster-keyed
        // shuffle shared by both windows
        "prototype_prune" -> (() => {
          val protos = Seq.tabulate(4)(k => Seq.tabulate(64)(j => if (j % 4 == k) 1.0 else 0.0))
          Sampling.prototypePrune(vecs, "vec_id", "embedding", protos, 0.25).count()
        }),
        // split-input form: the fit leg reads only the embedding table,
        // texts are the (16x larger) documents joined once by the naming agg
        "cluster_naming"  -> (() => Ml.clusterAndName(
          vecs, docs.select(col("doc_id").as("vec_id"), col("text")),
          "embedding", "vec_id", "text", new Ml.KMeansClusterer(5)).count()),
        "asof_join"       -> (() => {
          val l = events.where(col("event_type") === "buy").select(col("event_id"), col("user_id"), col("ts"))
          val r = events.where(col("event_type") === "view")
            .select(col("user_id"), col("ts").as("view_ts"), col("event_id").as("view_id"))
          Joins.asofJoin(l, r, "user_id", "ts", "view_ts").count()
        }),
        "range_join"      -> (() => {
          // value ∈ [0, 100): 20 quadratic bands cover it; binWidth 5
          val bands = spark.range(20).select(
            col("id").as("band_id"),
            (col("id") * col("id") * lit(0.25)).as("lo"),
            ((col("id") + 1) * (col("id") + 1) * lit(0.25)).as("hi"))
          Joins.rangeJoin(events.select("value"), "value", bands, "lo", "hi", 5.0).count()
        }),
        "quantiles"       -> (() => Aggs.discreteQuantiles(
          events.select(col("event_type"), round(col("value"), 0).cast("long").as("v")),
          "event_type", "v", Seq((1, 2, "p50"), (19, 20, "p95"))).count()),
        "hash_split"      -> (() => Sampling.hashSplit(docs, "doc_id",
          Seq("train" -> 8000, "val" -> 1000, "test" -> 1000)).groupBy("split").count().count()),
        // 32 streams so the prefix-sum windows use the parallelism
        "seq_packing"     -> (() => Packing.packByBudget(
          docs.select(col("doc_id"), pmod(col("doc_id"), lit(32)).as("stream"),
            graft.functions.TextOps.tokenCount(col("text")).cast("long").as("n")),
          "doc_id", "n", 512L, "stream").groupBy("stream", "pack_id").count().count()),
        // head() COLLECTS the aggregated value, forcing the regexp chain —
        // .agg(...).count() would let ColumnPruning empty the inner
        // aggregate and time a bare row count
        "scrub_pii"       -> (() => { docs
          .select(length(graft.functions.TextOps.scrubPii(col("text"))).as("l"))
          .agg(sum(col("l"))).head().getLong(0); 1L }),
        // decade chains: constant rounds, per-round work linear in nodes.
        // maxDriverEdges=0 pins the DISTRIBUTED loop (the 100 TB path this
        // curve exists to measure); cc_driver times the union-find fast path
        // on the same graph (72k edges at 16× still well under budget)
        "conn_components" -> (() => {
          val ids = docs.select(col("doc_id"))
          val e = ids.where(col("doc_id") % 10 =!= 9)
            .select(col("doc_id").as("u"), (col("doc_id") + 1).as("v"))
          Dedup.connectedComponents(ids, e, "doc_id", "u", "v", maxDriverEdges = 0L).count()
        }),
        "cc_driver"       -> (() => {
          val ids = docs.select(col("doc_id"))
          val e = ids.where(col("doc_id") % 10 =!= 9)
            .select(col("doc_id").as("u"), (col("doc_id") + 1).as("v"))
          Dedup.connectedComponents(ids, e, "doc_id", "u", "v").count()
        }),
        // round-15 (VERDICT r14 task 4): the Context-amortized CC column —
        // same graph and node frame as cc_driver/conn_components, but the
        // labeling pins on the COLD rep and warm reps pay one distinct +
        // anti-join for the singletons, the standing-dedup-corpus price
        "cc_ctx"          -> (() => {
          val ctx = ccCtx(scale, docs)
          val r = ctx.connectedComponents(docs.select(col("doc_id")), "doc_id")
          val n = r.count()
          org.apache.spark.sql.GraftBridge.unpersistLocalCheckpoint(r)
          n
        }),
        // new-batch = every 16th doc; the Bloom gate should route the
        // overwhelmingly-duplicate batch into the confirm join and the
        // fresh rows around it
        "bloom_incremental" -> (() => Dedup.bloomIncrementalFlags(
          docs.where(col("doc_id") % 16 =!= 0),
          docs.where(col("doc_id") % 16 === 0),
          "doc_id", "text").where(col("is_new")).count()),
        "bigram_surprisal" -> (() => graft.functions.TextOps
          .bigramSurprisal(docs, "doc_id", "text", materialize = true).count()),
        "trigram_surprisal" -> (() => graft.functions.TextOps
          .trigramSurprisal(docs, "doc_id", "text", materialize = true).count()),
        // 2000·scale vectors: ≥4× is over the 4096 fit cap → hash-sampled
        // fit + broadcast transform (the scale path)
        "umap_project"    -> (() => new Ml.UmapReducer()
          .project(vecs, "embedding", "vec_id").count()),
        "incr_neardup"    -> (() => {
          val newBatch = docs.where(col("doc_id") % 16 === 0)
            .select((col("doc_id") + 10000000L).as("doc_id"), col("text"))
          Dedup.incrementalCandidates(
            Dedup.lshBuckets(newBatch, "doc_id", "text", 3, 16, 8),
            Dedup.lshBuckets(docs, "doc_id", "text", 3, 16, 8)).count()
        }),
        "mean_pool"       -> (() => Aggs.meanPoolVectors(
          vecs.select((col("vec_id") % 500).as("g"), col("embedding")), "g", "embedding").count()),
        "profile_hll"     -> (() => Profile.profile(events,
          numericCols = Seq("event_id", "user_id", "value"), stringCols = Seq("event_type")).count()),
        "quantile_bkts"   -> (() => Aggs.quantileBuckets(
          events.select(col("event_id"), round(col("value"), 0).cast("long").as("v")), "v", 10)
          .groupBy("bucket").count().count()),
        // budget scales with the corpus so the fractions stay constant
        // across scales; c0's 30% share upsamples (~2.4 epochs), the rest
        // downsample — both paths timed
        "mix_to_budget"   -> (() => Mixing.mixToBudget(
          docs.select(col("doc_id"),
            concat(lit("c"), pmod(col("doc_id"), lit(8))).as("cls"),
            length(col("text")).cast("long").as("sz")),
          "cls", "doc_id", "sz",
          ("c0" -> 3000) +: (1 until 8).map(i => s"c$i" -> 1000),
          1500000L * scale).count()),
        "keep_best"       -> (() => Dedup.keepBestBy(
          docs.select(col("doc_id").as("id"), Dedup.exactKey(col("text")).as("component"),
            length(col("text")).cast("long").as("sc")),
          "id", "component", "sc").where(col("keep")).count()),
        // sum(pos) forces the rank window (a bare count would let Catalyst
        // prune it); 64 shards = 64 sort tasks
        "shuffle_shards"  -> (() => { Sampling.shuffleShards(docs.select("doc_id"), "doc_id", 64)
          .agg(sum(col("pos"))).head(); 1L }),
        "group_split"     -> (() => Sampling.groupSplit(
          docs.select(col("doc_id"), pmod(hash(col("doc_id")), lit(1000)).cast("string").as("grp")),
          "grp", "doc_id", Seq("train" -> 8000, "val" -> 1000, "test" -> 1000))
          .groupBy("split").count().count()),
        "bm25"            -> (() => Rank.bm25(docs, "doc_id", "text",
          Seq("w1", "w17", "w303", "w555")).count()),
        // round-6 adds: span dedup / quality gates / line-level dedup -------
        // repeats come from the planted dup groups (identical texts ⇒ every
        // gram repeated); cost shape = the heavy-hash count shuffle, linear
        "repeated_spans"  -> (() => Dedup.repeatedSpans(docs, "doc_id", "text", 4).count()),
        // cut step: the ~2% planted dups take the reassembly branch, the
        // other 98% take the scan-only branch (sum forces cleaned text)
        "cut_spans"       -> (() => { Dedup.cutRepeatedSpans(docs, "doc_id", "text", 4)
          .agg(sum(col("n_cut")), sum(length(col("cleaned")))).head(); 1L }),
        // filter on the pass gate forces every rule column to evaluate
        "gopher_quality"  -> (() => graft.functions.TextOps.withGopherQuality(docs, "text")
          .where(col("gopher.gopher_pass")).count()),
        // synthesized multi-line docs: a corpus-wide header + 7 rotating
        // tails clear minDocs, body lines are (mostly) unique
        "boilerplate_lines" -> (() => Dedup.removeBoilerplateLines(
          docs.select(col("doc_id"), concat_ws("\n", lit("shared header"), col("text"),
            concat(lit("tail "), pmod(col("doc_id"), lit(7)))).as("text")),
          "doc_id", "text", 5).agg(sum(col("n_kept"))).head().getLong(0)),
        // d17 shape: 3-para docs, one global boilerplate para + a shared
        // group-of-100 para — keeper table is O(distinct paras)
        "paragraph_dedup" -> (() => Dedup.dedupParagraphs(
          docs.select(col("doc_id"), concat_ws("\n\n", col("text"),
            lit("subscribe to our newsletter"),
            concat(lit("group para "), expr("doc_id div 100"))).as("text")),
          "doc_id", "text").agg(sum(col("n_kept"))).head().getLong(0)),
        // round-8 d20: sentence-granularity first-wins — same keeper-table
        // shape as paragraph_dedup at ~8x the rows per doc
        "sentence_dedup" -> (() => Dedup.dedupSentences(
          docs.select(col("doc_id"), concat_ws(" ",
            concat(substring(col("text"), 1, 40), lit(".")),
            lit("Subscribe to our newsletter today!"),
            concat(lit("Group quote "), expr("doc_id div 100"), lit("!")),
            col("text")).as("text")),
          "doc_id", "text").agg(sum(col("n_kept"))).head().getLong(0)),
        // round-8 w5: per-group rollup — one partial+final agg, state is
        // |groups| rows; must stay flat at any corpus size
        "quality_monitor" -> (() => graft.streaming.QualityMonitor
          .monitor(docs.withColumn("source", concat(lit("s"), pmod(col("doc_id"), lit(20)))), "source", "text")
          .count()),
        // round-8 d21: full-outer hash compare of two snapshots — only
        // (id, md5) rows shuffle, never text; linear in ids
        "snapshot_diff" -> (() => Dedup.snapshotDiff(
          docs,
          docs.where(pmod(col("doc_id"), lit(97)) =!= 1)
            .select(col("doc_id"),
              when(pmod(col("doc_id"), lit(13)) === 0, concat(col("text"), lit(" [r]")))
                .otherwise(col("text")).as("text")),
          "doc_id", "text").groupBy("status").count().count()),
        // round-8 x28: 4-pattern scrub + 4 independent counts — 8 regex
        // passes, pure projection, must stay scan-bound flat
        "pii_battery" -> (() => { docs
          .select(graft.functions.TextOps.piiCounts(
            concat(col("text"), lit(" u@example.com https://x.example.com 10.0.0.1 call 555-123-4567"))).as("c"),
            length(graft.functions.TextOps.scrubPiiAll(col("text"))).as("l"))
          .agg(sum(col("l")), sum(col("c.n_emails"))).head().getLong(0); 1L }),
        // d19: df-capped fingerprint self-join — pair volume bounded by
        // maxDf^2 per fingerprint regardless of corpus size
        "winnow_pairs" -> (() => Dedup.winnowOverlapPairs(
          docs, "doc_id", "text", 4, 5, minShared = 3, maxDf = 10).count()),
        // d18: codegen'd winnowing expression — scan-bound flat like mlm_mask
        "winnow_fps" -> (() => docs
          .select(size(graft.functions.TextOps.winnowFingerprints(col("text"), 4, 5)).cast("long").as("n"))
          .agg(sum(col("n"))).head().getLong(0)),
        // x26: counts from a 2% reference slice, whole corpus scored —
        // score side dominates; the count tables stay slice-sized
        "ref_surprisal" -> (() => graft.functions.TextOps.trigramSurprisalAgainst(
          docs.where(col("doc_id") % 50 === 7), docs, "doc_id", "text",
          materialize = true).count()),
        // x25: pure per-row HOF projections — must be scan-bound flat
        "mlm_mask" -> (() => graft.functions.TextOps.mlmMask(docs, "doc_id", "text")
          .agg(sum(col("n_masked"))).head().getLong(0)),
        // x24: bench = 2% of the corpus, grams broadcast; corpus one scan
        "contamination_frac" -> (() => Dedup.contaminationFraction(
          docs, docs.where(col("doc_id") % 50 === 7).select(col("text").as("btext")),
          "doc_id", "text", "btext", 8, 0.1).where(col("contaminated")).count()),
        // x23: rules-side group selection + one host equi-join per URL
        "robots_gate" -> (() => {
          import spark.implicits._
          val robots = (0 until 50).map(i => (s"host$i.example.com",
            s"User-agent: *\nDisallow: /private\nAllow: /private/ok\nUser-agent: bot\nDisallow: /p$i/\n")).toDF("host", "txt")
          val urls = docs.select(col("doc_id"), concat(lit("https://host"),
            pmod(col("doc_id"), lit(50)), lit(".example.com/p"),
            pmod(col("doc_id"), lit(70)), lit("/page"), col("doc_id")).as("url"))
          Urls.withRobotsAllowed(urls, "url", Urls.robotsRules(robots, "host", "txt"),
            "bot", Seq("doc_id")).where(!col("allowed")).count()
        }),
        // sum over the struct field forces the line filters (count would prune)
        "c4_line_clean"   -> (() => { docs
          .select(graft.functions.TextOps.c4LineClean(col("text")).getField("n_kept").cast("long").as("k"))
          .agg(sum(col("k"))).head().getLong(0) }),
        // weighted sample: grouped A-ES take over 8 synthetic classes
        "weighted_take"   -> (() => Sampling.weightedTake(
          docs.select(col("doc_id"), pmod(col("doc_id"), lit(8)).as("cls"),
            length(col("text")).cast("double").as("w")),
          "doc_id", "w", 50, Seq("cls")).count()),
        // contrastive triplets over the twinned corpus (twins = positives)
        "contrastive"     -> (() => {
          val c = vecs.unionByName(
            vecs.select((col("vec_id") + 100000000L).as("vec_id"), col("embedding")))
          Contrastive.triplets(c, "vec_id", "embedding", 0.99, 0.3, 1,
            dim = 64, numBits = 32, bands = 4).count()
        }),
        // p6 composition: LSH-bucketed cosine pairs → CC → canonical keepers
        "semdedup"        -> (() => {
          val pairs = Dedup.embeddingNearDupPairs(vecs, "vec_id", "embedding", 0.99, 64, 32, 4)
            .select("id_a", "id_b")
          Dedup.connectedComponents(vecs.select("vec_id"), pairs, "vec_id", "id_a", "id_b")
            .where(col("id") === col("component")).count()
        }),
        // round-7: DSIR selection — target = the planted-duplicate slice's
        // vocabulary flavor (docs ≡ 0 mod 50), raw = everything; cost shape
        // = two map-side-combined gram aggs + one id-keyed sum shuffle
        "dsir_resample"   -> (() => Dsir.resample(
          docs, "doc_id", "text",
          docs.where(col("doc_id") % 50 === 0).select("text"), "text",
          1000).count()),
        // round-7: graph / interval / URL / HTML additions ----------------
        // 3 unrolled power iterations over a hash link graph (~10 targets
        // per hub): per-round cost = one join + one map-side-combined
        // groupBy; the curve should track edge count linearly
        "pagerank"        -> (() => {
          val e = docs.select(col("doc_id").as("src"),
            pmod(hash(col("doc_id") * 31L), lit(500L * scale)).as("dst"))
          Graph.pagerank(e, "src", "dst", iters = 3).count()
        }),
        // round-8 g3: degree-ordered triangle counting — wedge volume is
        // bounded by orientation out-degree (O(sqrt m)); hash graph plants
        // chain+skip triangles linearly in docs
        "triangles" -> (() => {
          val chain = docs.where(pmod(col("doc_id"), lit(7)) =!= 6)
            .select(col("doc_id").as("src"), (col("doc_id") + 1).as("dst"))
          val skip = docs.where(pmod(col("doc_id"), lit(5)) < 3)
            .select(col("doc_id").as("src"), (col("doc_id") + 2).as("dst"))
          Graph.triangleCounts(chain.unionByName(skip), "src", "dst")
            .agg(sum(col("n_triangles"))).head().getLong(0)
        }),
        // round-14 (VERDICT r13 tasks 3+7): the Context-amortized column —
        // the standing-corpus caller's price. The context (and its pinned
        // edge/node/degree statics) builds on the COLD rep via the
        // per-scale cache; the warm rep prices the per-call iterate work
        // alone, the number the one-shot rows paid extra for after the
        // r13 honest cache release. Results are localCheckpoints, dropped
        // after counting so reps don't accumulate blocks.
        "pagerank_ctx" -> (() => {
          val ctx = graphCtx(scale, docs)
          val r = ctx.pagerank(iters = 3)
          val n = r.count()
          org.apache.spark.sql.GraftBridge.unpersistLocalCheckpoint(r)
          n
        }),
        "pagerank_redist_ctx" -> (() => {
          val ctx = graphCtx(scale, docs)
          val r = ctx.pagerank(iters = 3, redistributeDangling = true)
          val n = r.count()
          org.apache.spark.sql.GraftBridge.unpersistLocalCheckpoint(r)
          n
        }),
        "label_propagation_ctx" -> (() => {
          val ctx = graphCtx(scale, docs)
          val r = ctx.labelPropagation(iters = 3)
          val n = r.count()
          org.apache.spark.sql.GraftBridge.unpersistLocalCheckpoint(r)
          n
        }),
        // round-8: full Page et al. variant — adds one scalar reduce +
        // broadcast per round over the persisted iterate; curve should
        // stay within ~1.5x of plain pagerank
        "pagerank_redist" -> (() => {
          val e = docs.select(col("doc_id").as("src"),
            pmod(hash(col("doc_id") * 31L), lit(500L * scale)).as("dst"))
          Graph.pagerank(e, "src", "dst", iters = 3, redistributeDangling = true).count()
        }),
        // round-9 g6: synchronous LPA — per round one edge⋈labels join on
        // the pre-partitioned undirected set + two map-side-combined
        // groupBys; vote volume = edge count, labels = node count
        "label_propagation" -> (() => {
          val e = docs.select(col("doc_id").as("src"),
            pmod(hash(col("doc_id") * 31L), lit(500L * scale)).as("dst"))
          Graph.labelPropagation(e, "src", "dst", iters = 3).count()
        }),
        // round-9 g5: tolerance-terminated variant — eager per-round
        // localCheckpoint + one L1-delta scalar agg; rounds-run depends on
        // the graph's mixing, not its size, so the curve tracks pagerank
        "pagerank_converged" -> (() => {
          val e = docs.select(col("doc_id").as("src"),
            pmod(hash(col("doc_id") * 31L), lit(500L * scale)).as("dst"))
          Graph.pagerankConverged(e, "src", "dst", tol = 0.001, maxIters = 12).count()
        }),
        // SCD2 interval build over the event log: ONE shuffle (the
        // (user, ts) window chain); output ~= change rows
        "scd2_intervals"  -> (() => Joins.scd2(
          events.select(col("user_id"), col("ts").cast("long").as("ts"),
            col("event_id"), col("event_type")),
          "user_id", "ts", "event_id", "event_type").count()),
        // canonicalize + canonical-key dedup over 5 URL variants per page:
        // per-row HOF projections + one groupBy
        "url_dedup"       -> (() => {
          val baseId = expr("cast(doc_id div 5 as string)")
          val v = pmod(col("doc_id"), lit(5))
          val url = when(v === 0, concat(lit("https://www.example.com/articles/"), baseId))
            .when(v === 1, concat(lit("https://www.example.com/articles/"), baseId, lit("/?utm_source=feed")))
            .when(v === 2, concat(lit("https://www.example.com/articles/"), baseId, lit("#s")))
            .when(v === 3, concat(lit("HTTPS://WWW.Example.COM:443/articles/"), baseId, lit("/")))
            .otherwise(concat(lit("https://www.example.com/articles/"), baseId, lit("?b=2&a=1")))
          docs.select(col("doc_id")).withColumn("canon", Urls.canonicalize(url))
            .groupBy("canon").agg(min("doc_id")).count()
        }),
        // suffix-explode blocklist join: flag computed on distinct hosts
        // (500 per scale unit here), corpus joins back on host
        "domain_filter"   -> (() => {
          val url = concat(lit("https://h"), pmod(hash(col("doc_id")), lit(500L * scale)),
            lit(".example."), element_at(typedLit(Seq("com", "org", "net")),
              (pmod(col("doc_id"), lit(3)) + 1).cast("int")), lit("/p/"), col("doc_id"))
          val block = {
            import spark.implicits._
            (0 until 64).map(i => s"h$i.example.com").toDF("domain")
          }
          Urls.withDomainBlocked(docs.select(col("doc_id")).withColumn("url", url),
            "url", block, "domain").where(col("blocked")).count()
        }),
        // size-derived temperature shares: the |classes|-row pow/normalize
        // + the same broadcast epoch tail as mix_to_budget
        "temperature_mix" -> (() => Mixing.temperatureMix(
          docs.select(col("doc_id"),
            concat(lit("c"), pmod(col("doc_id"), lit(8))).as("cls"),
            length(col("text")).cast("long").as("sz")),
          "cls", "doc_id", "sz", 0.5, 1500000L * scale).count()),
        // HTML wrap + extract + link density: pure regex chain, linear in
        // bytes (sum forces both derived columns)
        "html_extract"    -> (() => {
          val html = concat(lit("<html><head><script>var x=1;</script></head><body><nav><a href=\"/\">Home</a> <a href=\"/d\">Docs</a></nav><p>"),
            col("text"), lit("</p><footer><a href=\"/a\">About</a></footer></body></html>"))
          docs.select(
            length(graft.functions.TextOps.htmlText(html)).as("l"),
            graft.functions.TextOps.htmlLinkDensityBp(html).as("d"))
            .agg(sum(col("l")), sum(col("d"))).head(); 1L
        }),
        "hybrid_rrf"      -> (() => {
          val w = org.apache.spark.sql.expressions.Window.orderBy(desc("score"), col("id"))
          val bmLeg = Rank.bm25(docs, "doc_id", "text", Seq("w1", "w17", "w303"))
            .select(col("doc_id").as("id"), col("score"))
            .orderBy(desc("score"), col("id")).limit(50)
            .withColumn("rank", row_number().over(w)).select("id", "rank")
          val cosLeg = Search.topK(vecs, "embedding", "vec_id", qVec, 50)
            .select(col("vec_id").as("id"), col("score"))
            .withColumn("rank", row_number().over(w)).select("id", "rank")
          Rank.rrfFuse(Seq(bmLeg, cosLeg), "id", "rank").count()
        }),
      )
      val selected = if (onlyOps.isEmpty) ops else ops.filter(o => onlyOps.contains(o._1))
      selected.foreach { case (name, run) =>
        run() // cold: codegen + index build etc.
        val t0 = System.nanoTime(); val rows = run(); val warm = (System.nanoTime() - t0) / 1e9
        println(f"""{"op":"$name","scale":$scale,"sec":$warm%.3f,"rows":$rows}""")
      }
      closeGraphCtx(scale)
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
