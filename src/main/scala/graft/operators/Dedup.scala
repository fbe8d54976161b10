package graft.operators

import graft.functions.TextOps
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Deduplication operators for large-scale text corpora — the training-data
  * pipeline additions on top of the reference's surface (SURVEY §7.1-8).
  *
  * All stages are codegen'd column expressions; the only shuffles are the
  * final groupBy/join on the dedup key — exactly the shuffles the algorithms
  * require. Designed so each stage scales linearly: per-row signatures are
  * narrow, candidate generation shuffles signatures (tiny) not documents,
  * and pairwise verification only ever runs on LSH-pruned candidate pairs.
  */
object Dedup {

  /** Exact dedup key: md5 of the raw text. */
  def exactKey(text: Column): Column = md5(text)

  /** Exact-duplicate groups: key → count + representative (min id).
    * Map-side partial agg makes this one cheap shuffle of (key, id).
    */
  def exactDupGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(exactKey(col(textCol)).as("text_hash"))
      .agg(count(lit(1)).as("n_docs"), min(col(idCol)).as("keep_id"))
      .where(col("n_docs") > 1)

  /** Snapshot delta — what changed between two corpus snapshots (the
    * incremental-crawl bookkeeping every recurring pipeline runs before
    * deciding what to re-embed / re-score): per id, `added` (new only),
    * `removed` (old only), `changed` (both, content hash differs) or
    * `unchanged`. Content identity is [[exactKey]] over the text, so a
    * recrawl that returns byte-identical pages costs nothing downstream.
    *
    * One full-outer equi-join on the id — both sides shuffle ONCE by id
    * and only (id, 16-byte hash) rows move, never text. Output: (idCol,
    * status, old_hash, new_hash); `unchanged` rows are included so the
    * result partitions the id universe (callers filter, the filter
    * pushes into the join output).
    */
  def snapshotDiff(
      oldDocs: DataFrame, newDocs: DataFrame, idCol: String, textCol: String,
  ): DataFrame = {
    // presence is carried by explicit per-side flags, NOT by hash nullness:
    // exactKey(null) is null, so a row PRESENT in both snapshots with a
    // NULL text on one side would otherwise be misread as added/removed —
    // and a row with NULL text on BOTH sides as added instead of unchanged
    // (null-safe <=> handles that last pair on the changed test).
    val o = oldDocs.select(col(idCol), exactKey(col(textCol)).as("old_hash"),
      lit(true).as("__in_old"))
    val n = newDocs.select(col(idCol), exactKey(col(textCol)).as("new_hash"),
      lit(true).as("__in_new"))
    o.join(n, Seq(idCol), "full_outer")
      .select(col(idCol),
        when(col("__in_old").isNull, lit("added"))
          .when(col("__in_new").isNull, lit("removed"))
          .when(!(col("old_hash") <=> col("new_hash")), lit("changed"))
          .otherwise(lit("unchanged")).as("status"),
        col("old_hash"), col("new_hash"))
  }

  /** Incremental EXACT dedup with a Bloom pre-filter: flag every batch row
    * as new-vs-already-in-corpus without shuffling the batch against the
    * corpus in the common clean-batch case.
    *
    *  1. one treeAggregate pass folds the corpus's md5 fingerprints into a
    *     Bloom filter (`fpp` default 1%), broadcast to executors;
    *  2. batch rows whose fingerprint the filter rejects are DEFINITELY new
    *     (Bloom has no false negatives) — they never touch a join;
    *  3. the `mightContain` survivors (true dups + ~fpp false positives)
    *     are resolved EXACTLY by a semi-join against the corpus
    *     fingerprints, so the output is exact regardless of fpp.
    *
    * At scale the candidate side is ≈ dups + fpp·|batch|: for a mostly-new
    * batch AQE broadcasts it, which removes the corpus-side shuffle
    * entirely; a stored fingerprint table bucketed by fingerprint makes
    * the confirm join co-located even when the batch is dup-heavy. The
    * filter itself is reusable across batches (`BloomFilter.writeTo` /
    * `readFrom`) — build once per corpus compaction, not per batch.
    *
    * Output: (idCol, is_new). `idCol` must be unique within the batch.
    * The mightContain probe is a Scala UDF by necessity (no builtin
    * expression evaluates a broadcast Bloom filter); it gates only the
    * cheap md5-string stream, never a wide row.
    */
  def bloomIncrementalFlags(
      corpus: DataFrame,
      batch: DataFrame,
      idCol: String,
      textCol: String,
      expectedItems: Long = 0L,
      fpp: Double = 0.01,
  ): DataFrame = {
    require(fpp > 0 && fpp < 1, s"fpp must be in (0, 1): $fpp")
    val spark = corpus.sparkSession
    val cFp   = corpus.select(exactKey(col(textCol)).as("__fp"))
    val items = if (expectedItems > 0) expectedItems else math.max(cFp.count(), 1L)
    val bcBf  = spark.sparkContext.broadcast(cFp.stat.bloomFilter("__fp", items, fpp))
    val might = udf { (s: String) => s != null && bcBf.value.mightContainString(s) }
    val bFp   = batch.select(col(idCol), exactKey(col(textCol)).as("__fp"))
    val dupIds = bFp.where(might(col("__fp")))
      .join(cFp, Seq("__fp"), "left_semi")
      .select(col(idCol))
    bFp.join(dupIds.withColumn("__dup", lit(true)), Seq(idCol), "left")
      .select(col(idCol), coalesce(!col("__dup"), lit(true)).as("is_new"))
  }

  /** Distinct word shingles of a text column (dedup signature input). */
  def shingleSet(text: Column, shingleSize: Int): Column =
    array_distinct(TextOps.wordShingles(TextOps.tokens(text), shingleSize))

  /** Benchmark decontamination: ids of corpus documents sharing ANY
    * `shingleSize`-gram with the benchmark set — the standard eval-leakage
    * sweep a training pipeline runs before a data release (an eval question
    * quoted verbatim inside a crawled page must knock that page out).
    *
    * The benchmark side is small by definition (eval suites are thousands
    * of rows, the corpus is the 100 TB side), so AQE broadcasts its
    * exploded distinct n-grams at runtime (the distinct's shuffle gives it
    * an exact size) and the corpus-side semi-join is map-side — the corpus
    * shuffles NOTHING; the whole sweep is one scan. The hint is
    * deliberately NOT forced: a benchmark past the broadcast threshold
    * degrades to a plain shuffled semi-join of (gram, id) pairs, never
    * pairs-of-documents — a forced broadcast() would OOM the driver there
    * instead of degrading.
    *
    * Output: distinct (idCol) of contaminated corpus docs.
    */
  def contaminatedIds(
      corpus: DataFrame,
      benchmark: DataFrame,
      idCol: String,
      textCol: String,
      benchTextCol: String,
      shingleSize: Int = 8,
  ): DataFrame = {
    require(shingleSize >= 1, s"shingleSize must be >= 1: $shingleSize")
    val benchGrams = benchmark
      .select(explode(shingleSet(col(benchTextCol), shingleSize)).as("__g")).distinct()
    corpus
      .select(col(idCol), explode(shingleSet(col(textCol), shingleSize)).as("__g"))
      .join(benchGrams, Seq("__g"), "left_semi")
      .select(idCol).distinct()
  }

  /** Fractional decontamination (the Llama/GPT-4-report refinement of
    * [[contaminatedIds]]'s any-gram knockout): per corpus doc, the share
    * of its DISTINCT `shingleSize`-grams that appear anywhere in the
    * benchmark set, flagged against `maxOverlap`. A page quoting one eval
    * question verbatim and a page that merely shares a common idiom both
    * hit ≥1 gram — only the ratio separates them, which is why modern
    * release pipelines gate on overlap fraction, not membership.
    *
    * Same scale contract as [[contaminatedIds]]: benchmark grams are the
    * small side (AQE-broadcast by measured size, not a forced hint, so a
    * huge benchmark really does degrade to a shuffled (gram) join instead
    * of OOMing the driver — never doc pairs), the corpus is scanned ONCE, and the
    * per-doc ratio is a map-side-combined count over the exploded grams —
    * no distinct-shuffle of the corpus, no window. Docs too short to form
    * a single gram have overlap 0 (nothing to leak).
    *
    * Output: (idCol, n_grams, n_matched, overlap, contaminated).
    */
  def contaminationFraction(
      corpus: DataFrame,
      benchmark: DataFrame,
      idCol: String,
      textCol: String,
      benchTextCol: String,
      shingleSize: Int = 8,
      maxOverlap: Double = 0.1,
  ): DataFrame = {
    require(shingleSize >= 1, s"shingleSize must be >= 1: $shingleSize")
    require(maxOverlap >= 0 && maxOverlap <= 1, s"maxOverlap must be in [0, 1]: $maxOverlap")
    val benchGrams = benchmark
      .select(explode(shingleSet(col(benchTextCol), shingleSize)).as("__g")).distinct()
      .withColumn("__hit", lit(true))
    corpus
      // shingleSet is already distinct per doc, so the exploded rows are
      // unique (id, gram) pairs — counts need no dedup shuffle
      .select(col(idCol), explode_outer(shingleSet(col(textCol), shingleSize)).as("__g"))
      .join(benchGrams, Seq("__g"), "left")
      .groupBy(idCol)
      .agg(
        count(col("__g")).as("n_grams"),
        count(col("__hit")).as("n_matched"))
      .withColumn("overlap",
        when(col("n_grams") === 0, lit(0.0))
          .otherwise(col("n_matched").cast("double") / col("n_grams")))
      .withColumn("contaminated", col("overlap") > maxOverlap)
  }

  /** (id, shingles) via a typed map — JIT-compiled tokenize+shingle, same
    * semantics as [[shingleSet]] (verified by the d4 oracle), ~50x faster
    * than the interpreted higher-order expression on long texts.
    */
  private def shingledTyped(df: DataFrame, idCol: String, textCol: String, shingleSize: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    graft.Par.fanOut(df.select(col(idCol).cast("long").as("id"), col(textCol).as("text")))
      .as[(Long, String)]
      .map { case (id, text) =>
        val toks = if (text == null) Array.empty[String]
          else text.toLowerCase(java.util.Locale.ROOT).split("[^a-z0-9]+").filter(_.nonEmpty)
        val sh = if (toks.length < shingleSize) Array.empty[String]
          else toks.sliding(shingleSize).map(_.mkString(" ")).toArray.distinct
        (id, sh)
      }
      .toDF("id", "shingles")
  }

  /** Deterministic odd affine multipliers for the derive-k-hashes-from-one
    * MinHash trick (splitmix-style expansion of the seed index).
    */
  private def mixConstants(n: Int): Array[(Long, Long)] =
    Array.tabulate(n) { k =>
      var z = (k + 1).toLong * 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      (z | 1L, z ^ (z >>> 31))
    }

  /** Per-document (band, band_hash) rows, computed in plain JIT-compiled
    * Scala. The nested-higher-order-function form of this (transform inside
    * transform) runs interpreted per element in Spark and measured ~16 ms per
    * document; this loop is ~0.1 ms. Tokenization mirrors TextOps.tokens.
    *
    * Shingles are hashed NUMERICALLY (one murmur per token, then an FNV-style
    * combine over the k-token window) — building shingle strings allocated
    * ~3 short-lived strings per token and made signature generation the
    * dominant cost of the whole LSH pipeline at the 100k-doc scale. A
    * shingle's 64-bit hash is a pure function of its token sequence, so the
    * identical-shingle-set ⇒ identical-signature completeness guarantee (d5)
    * is unchanged, and the d3 oracle inlines constants from this same
    * function. One base hash per shingle, k-th hash derived affinely — the
    * standard one-hash MinHash family.
    */
  private[operators] def minHashBandRows(
      id: Long, text: String, shingleSize: Int, numHashes: Int, bands: Int,
  ): Iterator[(Long, Int, Long)] = {
    import scala.util.hashing.MurmurHash3
    val toks = if (text == null) Array.empty[String]
      else text.toLowerCase(java.util.Locale.ROOT).split("[^a-z0-9]+").filter(_.nonEmpty)
    if (toks.length < shingleSize) return Iterator.empty
    val tokHash = new Array[Long](toks.length)
    var i = 0
    while (i < toks.length) {
      tokHash(i) = (MurmurHash3.stringHash(toks(i), 42).toLong << 32) |
        (MurmurHash3.stringHash(toks(i), 4242).toLong & 0xffffffffL)
      i += 1
    }
    val nSh      = toks.length - shingleSize + 1
    val shHashes = new Array[Long](nSh)
    i = 0
    while (i < nSh) {
      var h = 1469598103934665603L
      var j = 0
      while (j < shingleSize) { h = (h ^ tokHash(i + j)) * 1099511628211L; j += 1 }
      shHashes(i) = h
      i += 1
    }
    java.util.Arrays.sort(shHashes) // dedupe without boxing into a Set
    val consts = mixConstants(numHashes)
    val sig    = Array.fill(numHashes)(Long.MaxValue)
    i = 0
    while (i < nSh) {
      if (i == 0 || shHashes(i) != shHashes(i - 1)) {
        val base = shHashes(i)
        var k = 0
        while (k < numHashes) {
          val h = base * consts(k)._1 + consts(k)._2
          if (h < sig(k)) sig(k) = h
          k += 1
        }
      }
      i += 1
    }
    val rows = numHashes / bands
    (0 until bands).iterator.map { b =>
      var bh = 1125899906842597L
      var r  = 0
      while (r < rows) { bh = bh * 31 + sig(b * rows + r); r += 1 }
      (id, b, bh)
    }
  }

  /** LSH banding: split the signature into `bands` bands and hash each band;
    * docs sharing any (band_index, band_hash) become candidate pairs.
    * Emits (id, band, band_hash) — the only thing shuffled is this tiny
    * triple, never the documents. Signature generation is a narrow typed
    * flatMap (no shuffle, model-free, JIT-compiled).
    *
    * Docs with zero shingles (fewer than shingleSize tokens) are excluded:
    * they would all share the degenerate all-MaxValue signature and collapse
    * into one quadratic bucket of false candidates.
    */
  def lshBuckets(df: DataFrame, idCol: String, textCol: String, shingleSize: Int = 3, numHashes: Int = 16, bands: Int = 4): DataFrame = {
    // bands must tile the signature exactly — integer division would
    // silently ignore trailing hashes (a different S-curve than requested);
    // bands > numHashes would give 0-row bands where EVERY doc shares one
    // constant band hash, so every bucket blows the cap and the stage
    // silently returns zero candidates.
    require(bands >= 1 && numHashes % bands == 0,
      s"bands must divide numHashes exactly: numHashes=$numHashes, bands=$bands")
    val spark = df.sparkSession
    import spark.implicits._
    graft.Par.fanOut(df.select(col(idCol).cast("long").as("id"), col(textCol).as("text")))
      .as[(Long, String)]
      .flatMap { case (id, text) => minHashBandRows(id, text, shingleSize, numHashes, bands) }
      .toDF("id", "band", "band_hash")
  }

  /** MinHash-LSH candidate pairs (id_a < id_b), deduped across bands.
    *
    * `maxBucketSize` caps pathological hot buckets (e.g. boilerplate shared
    * by millions of docs): buckets larger than the cap are dropped before
    * pairing, bounding the worst case at cap² per bucket instead of n².
    *
    * Pairs form inside each bucket from a collected member list rather than
    * a bucket self-join: Spark doesn't CSE identical subplans across a
    * self-join, so the join shape ran signature generation twice, and the
    * collected list is ≤ maxBucketSize ids (the join's build side for a hot
    * key held the same rows). The cross-band distinct() stays — a pair can
    * surface in several surviving buckets (first-band attribution can't be
    * decided locally here, because a pair's earlier shared band may have
    * been a dropped hot bucket).
    */
  def minHashCandidates(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleSize: Int = 3,
      numHashes: Int = 16,
      bands: Int = 4,
      maxBucketSize: Int = 10000,
  ): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    lshBuckets(df, idCol, textCol, shingleSize, numHashes, bands)
      .withColumn("bucket_n", count(lit(1)).over(org.apache.spark.sql.expressions.Window.partitionBy("band", "band_hash")))
      .where(col("bucket_n") <= maxBucketSize)
      .groupBy("band", "band_hash")
      .agg(collect_list(col("id")).as("members"))
      .where(size(col("members")) > 1)
      .select(col("members"))
      .as[Seq[Long]]
      .flatMap { members =>
        val m = members.toArray
        java.util.Arrays.sort(m)
        for {
          i <- Iterator.range(0, m.length)
          j <- Iterator.range(i + 1, m.length)
          if m(i) != m(j)
        } yield (m(i), m(j))
      }
      .toDF("id_a", "id_b")
      .distinct()
  }

  /** Exact n-gram Jaccard similarity: jaccard = |A∩B| / (|A|+|B|−|A∩B|).
    *
    * With `candidates` (id_a, id_b — e.g. [[minHashCandidates]] output), the
    * scalable path: join each side's shingle set onto the candidate pairs and
    * intersect per pair — work is O(|candidates|), never all-pairs, and only
    * candidate rows carry shingle arrays through a shuffle.
    *
    * Without `candidates`, falls back to the exact exploded self-join keyed
    * on the shingle — quadratic on frequent shingles; use only at oracle/test
    * scale or on a pre-pruned corpus.
    */
  def ngramJaccardPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleSize: Int,
      threshold: Double,
      candidates: Option[DataFrame] = None,
  ): DataFrame = {
    val shingled = shingledTyped(df, idCol, textCol, shingleSize)
    candidates match {
      case Some(cand) =>
        val a = shingled.select(col("id").as("id_a"), col("shingles").as("sh_a"))
        val b = shingled.select(col("id").as("id_b"), col("shingles").as("sh_b"))
        cand.select("id_a", "id_b")
          .join(a, Seq("id_a"))
          .join(b, Seq("id_b"))
          .withColumn("n_inter", size(array_intersect(col("sh_a"), col("sh_b"))))
          .withColumn("n_a", size(col("sh_a")))
          .withColumn("n_b", size(col("sh_b")))
          // 0/0 guard: a candidate pair where BOTH docs have zero shingles
          // (each shorter than shingleSize — possible when candidates came
          // from another generator or a different shingle size) is 0/0 =
          // NaN, and Spark sorts NaN ABOVE every double, so `NaN >=
          // threshold` would emit the pair as a duplicate. Jaccard(∅,∅)
          // is defined as 0 here: no shared content is no evidence.
          .withColumn("jaccard",
            when(col("n_a") + col("n_b") - col("n_inter") === 0, lit(0.0))
              .otherwise(col("n_inter").cast("double") / (col("n_a") + col("n_b") - col("n_inter"))))
          .where(col("jaccard") >= threshold)
          .select("id_a", "id_b", "n_inter", "n_a", "n_b", "jaccard")
      case None =>
        val sizes    = shingled.select(col("id"), size(col("shingles")).as("n"))
        val exploded = shingled.select(col("id"), explode(col("shingles")).as("sh"))
        val e2       = exploded.select(col("sh"), col("id").as("id_b"))
        val inter = exploded
          .join(e2, Seq("sh"))
          .where(col("id") < col("id_b"))
          .groupBy(col("id").as("id_a"), col("id_b"))
          .agg(count(lit(1)).as("n_inter"))
        inter
          .join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("n", "n_a"), Seq("id_a"))
          .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("n", "n_b"), Seq("id_b"))
          .withColumn("jaccard", col("n_inter").cast("double") / (col("n_a") + col("n_b") - col("n_inter")))
          .where(col("jaccard") >= threshold)
          .select("id_a", "id_b", "n_inter", "n_a", "n_b", "jaccard")
    }
  }

  /** The 64 bit masks (1L << j) as an array literal — shift-by-column isn't
    * a Spark builtin, masking with a literal array is, and it keeps the whole
    * signature a single expression tree.
    */
  private val bitMasks: Column = typedLit((0 until 64).map(j => 1L << j))

  /** 64-bit SimHash over tokens: per bit, sum ±1 votes from each token's
    * xxhash64; sign of the vote → bit. Near-dups differ in few bits.
    * Pure expression work per row.
    */
  def simHash(text: Column): Column = {
    val toks = TextOps.tokens(text)
    val votes = aggregate(
      toks,
      array_repeat(lit(0L), 64),
      (acc, t) =>
        zip_with(
          acc,
          transform(bitMasks, m => when(xxhash64(t).bitwiseAND(m) =!= 0, lit(1L)).otherwise(lit(-1L))),
          (a, b) => a + b,
        ),
    )
    aggregate(
      zip_with(votes, bitMasks, (v, m) => when(v > 0, m).otherwise(lit(0L))),
      lit(0L),
      (a, b) => a.bitwiseOR(b),
    )
  }

  /** Population count (codegen'd builtin). */
  def popCount(x: Column): Column = bit_count(x).cast("int")

  /** Hamming distance between two simhash values. */
  def hammingDist(a: Column, b: Column): Column = popCount(a.bitwiseXOR(b))

  /** Banded hamming index over 64-bit simhashes: split into `bands` bit
    * slices; two docs within hamming distance < `bands` of each other must
    * share at least one identical band (pigeonhole), so bucketing on
    * (band, slice) finds all pairs with hamming ≤ bands−1 — no pairwise
    * scan. Candidates are then exact-verified with [[hammingDist]].
    * Only (id, band, slice) triples shuffle.
    */
  /** 64-bit SimHash in plain Scala (JIT-compiled; the expression form in
    * [[simHash]] runs ~64 interpreted lambda evals per token).
    *
    * NOT bit-compatible with [[simHash]]: this votes with [[simTokenHash]]
    * (a murmur3 pair), the expression form with Spark's xxhash64 — same
    * algorithm, different hash family, different signatures for the same
    * text. Each is self-consistent with its own pair generator and oracle
    * (d6 uses the expression form end-to-end, d8 this one); never compare
    * signatures ACROSS the two forms — hamming distances between families
    * are meaningless.
    */
  def simHash64(text: String): Long = {
    val toks = if (text == null) Array.empty[String]
      else text.toLowerCase(java.util.Locale.ROOT).split("[^a-z0-9]+").filter(_.nonEmpty)
    val votes = new Array[Int](64)
    toks.foreach { t =>
      val h = simTokenHash(t)
      var j = 0
      while (j < 64) { if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1; j += 1 }
    }
    var sig = 0L
    var j = 0
    while (j < 64) { if (votes(j) > 0) sig |= (1L << j); j += 1 }
    sig
  }

  /** The per-token 64-bit hash [[simHash64]] votes with. Public so oracle
    * SQL can inline it as a literal per closed-vocabulary token: over a
    * known token set, the whole simhash is SQL-computable from these
    * constants ((a&b)|(a&c)|(b&c) is the 3-token majority vote), which is
    * what turns d6/d8 into hash-equality-checked queries.
    */
  def simTokenHash(t: String): Long = {
    import scala.util.hashing.MurmurHash3
    (MurmurHash3.stringHash(t, 7).toLong << 32) |
      (MurmurHash3.stringHash(t, 777).toLong & 0xffffffffL)
  }

  /** The LSH band hashes of one text, computed with the exact production
    * function ([[minHashBandRows]]). Public for the same oracle-inlining
    * strategy as [[simTokenHash]]: for texts drawn from a closed vocabulary,
    * the DuckDB oracle inlines these per-text constants and reproduces the
    * candidate join declaratively.
    */
  def bandHashesFor(text: String, shingleSize: Int, numHashes: Int, bands: Int): Seq[Long] =
    minHashBandRows(0L, text, shingleSize, numHashes, bands).map(_._3).toSeq

  /** maxBucketSize guards the one scale hazard of the bucketed shape: a
    * degenerate key (think: millions of empty or boilerplate documents whose
    * identical signatures share every band slice) materializes as ONE
    * collect_list row in one task. Buckets above the cap are dropped before
    * collection — their members are so mutually similar that downstream
    * dedup treats them as one exact-dup class anyway (d1's job), while the
    * O(cap²) bound keeps every task finite. With a finite cap, pair
    * attribution switches from "first matching band" to "any surviving
    * band + dropDuplicates": a pair's first shared band may have been a
    * dropped hot bucket, which a task deciding locally cannot know
    * (cf. minHashCandidates, which makes the same trade).
    */
  def simHashNearDupPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxHamming: Int,
      bands: Int = 4,
      maxBucketSize: Int = Int.MaxValue,
  ): DataFrame = {
    require(maxHamming < bands, s"pigeonhole guarantee needs maxHamming < bands (got $maxHamming >= $bands)")
    require(maxBucketSize > 1, s"maxBucketSize must allow pairs: $maxBucketSize")
    val bits  = 64 / bands
    val mask  = if (bits == 64) -1L else (1L << bits) - 1
    val spark = df.sparkSession
    import spark.implicits._
    // One pass computes the signature AND its band slices; buckets form via
    // groupBy, not a self-join — Spark does not CSE identical subplans
    // across a self-join, so the old (buckets ⋈ buckets) shape ran the
    // whole tokenize+SimHash subtree twice. Only (band, slice, id, sig)
    // quads shuffle; the texts never do.
    val buckets = graft.Par.fanOut(df.select(col(idCol).cast("long").as("id"), col(textCol).as("text")))
      .as[(Long, String)]
      .flatMap { case (id, text) =>
        val sig = simHash64(text)
        Iterator.range(0, bands).map(b => (b, (sig >>> (b * bits)) & mask, id, sig))
      }
      .toDF("band", "slice", "id", "sig")
    // Pairs are emitted from their FIRST matching band only, so each
    // near-dup pair appears exactly once and no distinct() shuffle is
    // needed over the (up to bands×) redundant pair stream. Per-bucket
    // work is O(|bucket|²) either way; collect_list holds one bucket per
    // task, which is the same memory the old join's build side needed for
    // a hot (band, slice) key.
    val capped =
      if (maxBucketSize == Int.MaxValue) buckets
      else buckets
        .withColumn("__bn", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy("band", "slice")))
        .where(col("__bn") <= maxBucketSize)
        .drop("__bn")
    val pairs = capped.groupBy("band", "slice")
      .agg(collect_list(struct(col("id").as("_1"), col("sig").as("_2"))).as("members"))
      .where(size(col("members")) > 1)
      .select(col("band"), col("members"))
      .as[(Int, Seq[(Long, Long)])]
      .flatMap { case (band, members) =>
        val m = members.toArray
        for {
          i <- Iterator.range(0, m.length)
          j <- Iterator.range(i + 1, m.length)
          idA  = math.min(m(i)._1, m(j)._1)
          idB  = math.max(m(i)._1, m(j)._1)
          dist = java.lang.Long.bitCount(m(i)._2 ^ m(j)._2)
          if idA < idB && dist <= maxHamming
          // uncapped: first-band attribution makes each pair unique with no
          // extra shuffle; capped: any surviving band emits, deduped below
          if maxBucketSize != Int.MaxValue ||
            firstMatchingBand(m(i)._2, m(j)._2, bands, bits, mask) == band
        } yield (idA, idB, dist)
      }
      .toDF("id_a", "id_b", "hamming")
    if (maxBucketSize == Int.MaxValue) pairs
    else pairs.dropDuplicates("id_a", "id_b") // hamming is sig-determined, identical across bands
  }

  /** Smallest band index on which two signatures share an identical slice
    * (−1 if none) — the canonical band a candidate pair is attributed to.
    */
  private def firstMatchingBand(a: Long, b: Long, bands: Int, bits: Int, mask: Long): Int = {
    var band = 0
    while (band < bands) {
      if (((a >>> (band * bits)) & mask) == ((b >>> (band * bits)) & mask)) return band
      band += 1
    }
    -1
  }

  /** Deterministic ±1 sign-projection vectors for embedding LSH — derived
    * from murmur3 so Spark and the DuckDB oracle can inline the exact same
    * literals. Row j is the j-th hyperplane.
    */
  def signProjections(dim: Int, numBits: Int): Seq[Seq[Double]] = {
    import scala.util.hashing.MurmurHash3
    (0 until numBits).map { j =>
      (0 until dim).map { i =>
        if (((MurmurHash3.stringHash(s"graft_proj_${j}_$i", 42) >>> 31) & 1) == 0) 1.0 else -1.0
      }
    }
  }

  /** Banded sign-bit LSH buckets over an embedding column: bit j = sign of
    * the dot product with fixed hyperplane j; `numBits` bits split into
    * `bands` bands; rows sharing any (band, band-bit-pattern) are candidates.
    * Only (id, band, pattern) triples are shuffled — never the vectors.
    *
    * Sign bits are computed in a typed flatMap (JIT-compiled): the
    * expression-tree form (numBits separate dot-product expressions in one
    * projection) blows past the codegen method budget beyond ~32 bits and
    * falls back to interpreted eval. The loop accumulates each dot in the
    * same sequential order as the codegen'd [[graft.functions
    * .VectorExpressions.dotFast]], so the bit patterns are identical.
    */
  def embeddingCandidates(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      numBits: Int = 16,
      bands: Int = 4,
      maxBucketSize: Int = 10000,
  ): DataFrame = {
    require(numBits <= 64, s"sign signature packs into a Long: numBits <= 64 (got $numBits)")
    // bands must tile the signature EXACTLY: integer division would
    // otherwise silently ignore trailing bits (changing the LSH S-curve
    // from the requested one) — or, for bands > numBits, give 0-bit slices
    // where every row lands in ONE constant bucket that the cap then
    // drops, returning zero candidates corpus-wide with no error.
    require(bands >= 1 && numBits % bands == 0,
      s"bands must divide numBits exactly: numBits=$numBits, bands=$bands")
    require(maxBucketSize > 1, s"maxBucketSize must allow pairs: $maxBucketSize")
    val rowsPerBand = numBits / bands
    val mask        = if (rowsPerBand == 64) -1L else (1L << rowsPerBand) - 1
    val projs: Array[Array[Double]] = signProjections(dim, numBits).map(_.toArray).toArray
    val spark = df.sparkSession
    import spark.implicits._
    // Null ids/vectors are excluded up front: they can't be near-dup
    // candidates (the old expression form dropped their pairs at the
    // threshold filter anyway), and the typed encoder would crash on them.
    //
    // Buckets form via groupBy + first-matching-band attribution (the
    // simHashNearDupPairs shape): the old buckets⋈buckets self-join ran the
    // numBits×dim projection flatMap TWICE (Spark does not CSE identical
    // subplans across a self-join) and needed a distinct() shuffle over the
    // up-to-bands× redundant pair stream. Here each pair is emitted from
    // its first matching band only — one signature pass, no distinct.
    val buckets = graft.Par.fanOut(df
      .where(col(idCol).isNotNull && col(vecCol).isNotNull)
      .select(col(idCol).cast("long").as("id"), col(vecCol).cast("array<double>").as("v")))
      .as[(Long, Seq[Double])]
      .flatMap { case (id, vSeq) =>
        val v   = vSeq.toArray
        var sig = 0L
        var j   = 0
        while (j < numBits) {
          val p = projs(j)
          val n = math.min(v.length, p.length)
          var dot = 0.0
          var i = 0
          while (i < n) { dot += v(i) * p(i); i += 1 }
          if (dot > 0) sig |= (1L << j)
          j += 1
        }
        Iterator.range(0, bands).map(b => (b, (sig >>> (b * rowsPerBand)) & mask, id, sig))
      }
      .toDF("band", "slice", "id", "sig")
    // maxBucketSize mirrors the simHashNearDupPairs contract, in BOTH its
    // halves: (1) the cap is enforced by a window COUNT before collect_list
    // — filtering on size(members) afterwards would still buffer a
    // corpus-scale boilerplate bucket in one agg buffer, the exact memory
    // hazard the cap exists to prevent; (2) with a finite cap, attribution
    // switches from "first matching band" to "any surviving band +
    // dropDuplicates": a pair whose FIRST shared band was a dropped hot
    // bucket would otherwise never be emitted from the surviving bands
    // (a task deciding locally cannot know another band's bucket was cut).
    val capped =
      if (maxBucketSize == Int.MaxValue) buckets
      else buckets
        .withColumn("__bn", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy("band", "slice")))
        .where(col("__bn") <= maxBucketSize)
        .drop("__bn")
    val pairs = capped.groupBy("band", "slice")
      .agg(collect_list(struct(col("id").as("_1"), col("sig").as("_2"))).as("members"))
      .where(size(col("members")) > 1)
      .select(col("band"), col("members"))
      .as[(Int, Seq[(Long, Long)])]
      .flatMap { case (band, members) =>
        val m = members.toArray
        for {
          i <- Iterator.range(0, m.length)
          j <- Iterator.range(i + 1, m.length)
          if m(i)._1 != m(j)._1
          if maxBucketSize != Int.MaxValue ||
            firstMatchingBand(m(i)._2, m(j)._2, bands, rowsPerBand, mask) == band
        } yield (math.min(m(i)._1, m(j)._1), math.max(m(i)._1, m(j)._1))
      }
      .toDF("id_a", "id_b")
    if (maxBucketSize == Int.MaxValue) pairs
    else pairs.dropDuplicates("id_a", "id_b")
  }

  /** Embedding-cosine near-duplicate pairs: banded sign-bit LSH candidate
    * generation ([[embeddingCandidates]]) followed by exact-cosine
    * verification of candidate pairs only. No all-pairs join anywhere:
    * the largest shuffle is |candidates| rows each carrying two vectors.
    */
  def embeddingNearDupPairs(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double,
      dim: Int,
      numBits: Int = 16,
      bands: Int = 4,
      maxBucketSize: Int = 10000,
  ): DataFrame = {
    import graft.functions.VectorOps._
    val cand = embeddingCandidates(df, idCol, vecCol, dim, numBits, bands, maxBucketSize)
    val va   = df.select(col(idCol).as("id_a"), asDouble(col(vecCol)).as("va"))
    val vb   = df.select(col(idCol).as("id_b"), asDouble(col(vecCol)).as("vb"))
    cand
      .join(va, Seq("id_a"))
      .join(vb, Seq("id_b"))
      .withColumn("cos", graft.functions.VectorExpressions.cosineFast(col("va"), col("vb")))
      .where(col("cos") >= threshold)
      .select("id_a", "id_b", "cos")
  }

  /** Incremental near-dup candidates: match a NEW batch against an existing
    * corpus's stored band rows without re-signaturing the corpus. At scale
    * the corpus's `lshBuckets` output lives as a parquet signature store
    * (the MinHash analog of the IVF store): each incoming batch computes
    * only ITS OWN signatures and equi-joins the store on (band, band_hash) —
    * work per batch is O(batch) signature compute + a join keyed on band
    * hashes, never a re-scan of the 100 TB corpus text.
    *
    * `maxBucketSize` bounds the corpus side of each bucket join (boilerplate
    * buckets grow forever in an append-only store; the window-count filter
    * drops them, same contract as [[minHashCandidates]]).
    *
    * Output: (new_id, corpus_id) distinct candidate pairs — verify with
    * [[ngramJaccardPairs]] over the unioned frames.
    */
  def incrementalCandidates(
      newBand: DataFrame,
      corpusBand: DataFrame,
      maxBucketSize: Int = 10000,
  ): DataFrame = {
    val corpusCapped = corpusBand
      .withColumn("__bn", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("band", "band_hash")))
      .where(col("__bn") <= maxBucketSize)
      .select(col("band"), col("band_hash"), col("id").as("corpus_id"))
    newBand.select(col("band"), col("band_hash"), col("id").as("new_id"))
      .join(corpusCapped, Seq("band", "band_hash"))
      .select(col("new_id"), col("corpus_id"))
      .distinct()
  }

  /** Connected components over a near-dup pair stream — the step that turns
    * pairwise candidates (d3–d8) into dedup CLUSTERS, from which a pipeline
    * keeps one canonical document per component (min id here). Spark has no
    * built-in CC; this is distributed min-label propagation with pointer
    * jumping, the Hash-to-Min / large-star–small-star family (Kiveris et
    * al., "Connected Components in MapReduce and Beyond", SoCC'14):
    *
    *  1. neighbor-min: label(u) ← min(label(u), min over neighbors
    *     label(v)) — one join + one map-side-combined groupBy per round.
    *  2. pointer jumping: label(u) ← label(label(u)) — collapses chains in
    *     O(log diameter) rounds instead of O(diameter).
    *
    * Each round localCheckpoints (lineage would otherwise double per round).
    * Convergence detection rides the checkpoint jobs themselves: a change-
    * counting accumulator is bumped inside each pass's projection, so a
    * round costs exactly its propagation jobs — no separate isEmpty/count
    * action per round (at graph sizes where per-job overhead dominates,
    * those extra actions were ~25% of the loop's wall time). Graphs of
    * near-dup clusters have tiny diameters, so this typically runs 2–4
    * rounds. Only (id, label) pairs shuffle; edges are re-joined from their
    * (checkpointed) frame. Superseded rounds' checkpoint blocks are freed
    * eagerly rather than waiting on the GC-driven ContextCleaner.
    *
    * `nodes` may include isolated ids (they become singleton components).
    * Output: (id, component) with component = min id of the cluster.
    *
    * Fails LOUDLY if maxIters ran out before the fixpoint: a truncated
    * labeling splits real clusters and is indistinguishable from a correct
    * one by inspection. Callers that want the partial result anyway use
    * [[connectedComponentsStats]] and read `converged` themselves.
    */
  def connectedComponents(
      nodes: DataFrame,
      edges: DataFrame,
      idCol: String,
      srcCol: String,
      dstCol: String,
      maxIters: Int = 20,
      maxDriverEdges: Long = 500000L,
  ): DataFrame = {
    val (out, stats) =
      connectedComponentsStats(nodes, edges, idCol, srcCol, dstCol, maxIters, maxDriverEdges)
    require(stats.converged,
      s"connected components did not converge within maxIters=$maxIters rounds — " +
        "the labeling would be truncated (clusters split); raise maxIters")
    out
  }

  /** Loop telemetry for tests and tuning: rounds run and Spark jobs issued
    * by the propagation loop (checkpoint materializations, excluding the
    * two input checkpoints). `converged = false` means maxIters ran out
    * BEFORE the fixpoint — the labeling is truncated (distant chain
    * members still carry intermediate labels) and must not be trusted.
    * A run whose final allowed round still made changes gets a
    * verification-only probe (≤2 extra jobs, counted here) so landing
    * EXACTLY on the fixpoint at round maxIters reports converged=true
    * rather than hard-failing a correct labeling. The driver union-find
    * path is always exact, hence always converged.
    */
  final case class CcStats(rounds: Int, jobs: Int, converged: Boolean = true)

  /** [[connectedComponents]], returning the result plus [[CcStats]].
    *
    * Two execution paths behind one contract (the same dual-path shape as
    * the ML driver-fit byte budget):
    *  - **driver union-find** when the edge set fits `maxDriverEdges`
    *    (one bounded `limit(n+1).collect()` decides AND provides the
    *    edges): path-halving union-find labels every edge-touching node in
    *    one pass, the labels broadcast back, and singleton nodes rejoin
    *    via a broadcast anti-join — ONE Spark job instead of ~3 per
    *    propagation round. Dedup edge sets are pair lists of *duplicates*,
    *    tiny relative to the corpus, so this is the common case even at
    *    large corpus sizes.
    *  - **distributed label propagation** (neighbor-min + double pointer
    *    jumping, accumulator-fused convergence) beyond the budget — the
    *    100 TB path; `maxDriverEdges = 0` forces it (tests, curve
    *    measurement).
    * Outputs are identical: component = min id reachable; nodes without
    * edges are singletons. Null edge endpoints never label anything on
    * either path.
    */
  def connectedComponentsStats(
      nodes: DataFrame,
      edges: DataFrame,
      idCol: String,
      srcCol: String,
      dstCol: String,
      maxIters: Int = 20,
      maxDriverEdges: Long = 500000L,
  ): (DataFrame, CcStats) = {
    import org.apache.spark.sql.GraftBridge
    val spark = nodes.sparkSession
    // Null-endpoint filter applied ONCE here so both paths share it: an
    // unfiltered distributed pass would emit a spurious (null, null) row.
    val sym = edges.select(col(srcCol).cast("long").as("u"), col(dstCol).cast("long").as("v"))
      .where(col("u").isNotNull && col("v").isNotNull)
    if (maxDriverEdges > 0) {
      val cap = math.min(maxDriverEdges + 1, Int.MaxValue - 1L).toInt
      val lim = sym.limit(cap).collect()
      if (lim.length <= maxDriverEdges) {
        val ids    = new scala.collection.mutable.ArrayBuffer[Long]()
        val index  = new java.util.HashMap[Long, Integer]()
        val parent = new scala.collection.mutable.ArrayBuffer[Int]()
        val size   = new scala.collection.mutable.ArrayBuffer[Int]()
        def idOf(x: Long): Int = {
          val e = index.get(x)
          if (e != null) e.intValue()
          else {
            val i = ids.length
            index.put(x, i); ids += x; parent += i; size += 1
            i
          }
        }
        def find(a: Int): Int = {
          var r = a
          while (parent(r) != r) r = parent(r)
          var c = a
          while (parent(c) != r) { val n = parent(c); parent(c) = r; c = n }
          r
        }
        lim.foreach { r =>
          val (ra, rb) = (find(idOf(r.getLong(0))), find(idOf(r.getLong(1))))
          if (ra != rb) {
            val (big, small) = if (size(ra) >= size(rb)) (ra, rb) else (rb, ra)
            parent(small) = big
            size(big) += size(small)
          }
        }
        val minOf = new java.util.HashMap[Integer, java.lang.Long]()
        ids.indices.foreach { i =>
          val r   = find(i)
          val cur = minOf.get(r)
          if (cur == null || ids(i) < cur) minOf.put(r, ids(i))
        }
        import spark.implicits._
        val edgeLabels = ids.indices.map(i => (ids(i), minOf.get(find(i)).longValue())).toDF("id", "component")
        val edgeIds    = ids.toSeq.map(Tuple1(_)).toDF("id")
        val singles = nodes.select(col(idCol).cast("long").as("id")).distinct()
          .join(broadcast(edgeIds), Seq("id"), "left_anti")
          .select(col("id"), col("id").as("component"))
        return (edgeLabels.unionByName(singles).toDF("id", "component"), CcStats(0, 1))
      }
    }
    val und = sym.unionByName(sym.select(col("v").as("u"), col("u").as("v")))
      .localCheckpoint(true)
    val allNodes = nodes.select(col(idCol).cast("long").as("id")).distinct()
      .localCheckpoint(true)
    // Change tracking: `bump` wraps each pass's new label and counts rows
    // where it differs from the pass's input label, so the eager checkpoint
    // job doubles as the convergence check. Nondeterministic so Catalyst
    // never collapses or duplicates it. A task retry can only over-count,
    // and an over-count only costs one extra (no-op) round — never a wrong
    // answer.
    val acc  = spark.sparkContext.longAccumulator("graft_cc_changed")
    val bump = udf { (next: Long, prev: Long) =>
      if (next != prev) acc.add(1L); next
    }.asNondeterministic()
    var jobs = 0
    def materialize(fr: DataFrame): (DataFrame, Long) = {
      val before = acc.value
      val ck     = fr.localCheckpoint(true)
      jobs += 1
      (ck, acc.value - before)
    }
    // Only nodes that touch an edge enter the propagation loop: in a dedup
    // corpus the overwhelming majority of documents pair with nothing, and
    // they are singleton components by definition — keeping them in the
    // loop would size every round's joins by the corpus instead of by the
    // (much smaller) duplicated subset. They rejoin as singletons at the end.
    val edgeNodes = und.select(col("u").as("id")).distinct()
    var labels = edgeNodes
      .withColumn("component", col("id"))
      .localCheckpoint(true)
    // 1. neighbor-min: label(u) ← min over neighbors — join + map-side-
    // combined groupBy. Checkpointed before the first hop for the same
    // no-CSE reason as between hops: an unmaterialized stepped would embed
    // the neighbor-min join+agg into BOTH branches of the hop's self-join.
    def step(from: DataFrame): DataFrame = {
      val viaNeighbors = und
        .join(from.withColumnRenamed("id", "v"), Seq("v"))
        .groupBy(col("u").as("id"))
        .agg(min(col("component")).as("n_min"))
      from.join(viaNeighbors, Seq("id"), "left")
        .select(col("id"),
          bump(least(col("component"), coalesce(col("n_min"), col("component"))), col("component")).as("component"))
    }
    // 2. pointer jumping: label(u) ← label(label(u)) — a cheap self-join on
    // the compact (id, label) frame; each hop doubles the collapse distance,
    // so chains converge in O(log diameter) hops. Spark does not CSE a
    // self-joined subplan, so each hop is checkpointed before the next.
    def jumpOnce(fr: DataFrame): DataFrame = fr.alias("a")
      .join(fr.select(col("id").as("component"), col("component").as("jump")).alias("b"), Seq("component"), "left")
      .select(col("id"),
        bump(least(col("component"), coalesce(col("jump"), col("component"))), col("component")).as("component"))
    var iter       = 0
    var converged  = false
    var jumpStable = false // is `labels` a fixpoint of jumpOnce?
    while (iter < maxIters && !converged) {
      val prev              = labels
      val (stepped, nStep)  = materialize(step(prev))
      if (nStep == 0 && jumpStable) {
        // neighbor-min stable AND already jump-stable → the full round is a
        // no-op: converged at the cost of ONE job, keeping prev as labels.
        converged = true
        GraftBridge.unpersistLocalCheckpoint(stepped)
      } else {
        val (j1, nJ1) = materialize(jumpOnce(stepped))
        if (nJ1 == 0) {
          // jumpOnce is a pure function of its frame: f(x)=x ⇒ f(f(x))=x,
          // so the second hop is skipped.
          labels = j1; jumpStable = true
          converged = nStep == 0
        } else {
          val (j2, nJ2) = materialize(jumpOnce(j1))
          labels = j2; jumpStable = nJ2 == 0
          GraftBridge.unpersistLocalCheckpoint(j1)
        }
        GraftBridge.unpersistLocalCheckpoint(stepped)
        GraftBridge.unpersistLocalCheckpoint(prev)
      }
      iter += 1
    }
    // Boundary probe: a run whose FINAL allowed round still made changes can
    // nonetheless have LANDED exactly on the fixpoint (e.g. a path graph
    // needing precisely maxIters rounds) — the loop above cannot tell,
    // because convergence is only observed as a round that changes nothing.
    // Verify before reporting converged=false (which [[connectedComponents]]
    // turns into a hard failure on a labeling that may be exact): replay the
    // round's two checks against the final labels, discarding the probe
    // frames — verification only, the labeling never moves past maxIters.
    // Costs ≤2 jobs and only on the at-maxIters edge; a converged loop
    // skips it entirely.
    if (!converged && iter == maxIters) {
      val (probeS, nPS) = materialize(step(labels))
      GraftBridge.unpersistLocalCheckpoint(probeS)
      if (nPS == 0) {
        if (jumpStable) converged = true
        else {
          val (probeJ, nPJ) = materialize(jumpOnce(labels))
          GraftBridge.unpersistLocalCheckpoint(probeJ)
          converged = nPJ == 0
        }
      }
    }
    // The returned frame still reads lazily from `labels` and `allNodes` —
    // those two (plus nothing else) stay persisted until the caller's
    // references are GC'd. `und` is loop-only and freed here.
    GraftBridge.unpersistLocalCheckpoint(und)
    val singletons = allNodes.join(labels.select("id"), Seq("id"), "left_anti")
      .withColumn("component", col("id"))
    // toDF re-aliases the union's output with fresh attribute ids: a
    // join+aggregate placed directly on this Union trips a Spark 4.1
    // constraint-rewrite NoSuchElementException (UnionBase.rewriteConstraints
    // can look up an attribute absent from a child's output map). A bare
    // projection barrier costs nothing and immunizes every consumer.
    (labels.unionByName(singletons).toDF("id", "component"), CcStats(iter, jobs, converged))
  }

  /** Incremental connected components — fold a batch of NEW edges (and new
    * nodes) into an existing (id, component) labeling without touching the
    * historical edge set: the maintenance step of a streaming dedup
    * pipeline, where [[connectedComponents]] ran once over the corpus and
    * each arriving batch contributes a few duplicate pairs.
    *
    * Key fact: a valid labeling IS the historical graph, contracted —
    * every old component behaves as one super-node. So:
    *  1. map each new-edge endpoint to its current component label (left
    *     join against the labeling; unseen ids label themselves);
    *  2. run [[connectedComponents]] over the CONTRACTED graph — its node
    *     count is |labels touched by new edges| + |new ids|, tiny relative
    *     to the corpus, so the driver union-find fast path almost always
    *     takes it in one job;
    *  3. broadcast the contraction's relabeling back over the corpus
    *     labeling (left join; untouched components map to themselves).
    * The corpus shuffles ONCE (step 3's join is broadcast, so in practice
    * it never shuffles at all); historical edges are never re-read.
    *
    * Component ids stay canonical (min member id) because the contracted
    * CC relabels by min over component LABELS, which are themselves min
    * member ids. Output: (id, component) covering all old ids plus any new
    * ids introduced by the batch.
    */
  def incrementalComponents(
      labels: DataFrame,
      newEdges: DataFrame,
      idCol: String,
      componentCol: String,
      srcCol: String,
      dstCol: String,
  ): DataFrame = {
    val lab = labels.select(col(idCol).cast("long").as("id"), col(componentCol).cast("long").as("component"))
    // null endpoints carry no connectivity — the same guard
    // connectedComponentsStats applies; unfiltered, a null src/dst would
    // survive the coalesce (null label, null fallback), enter
    // contractedNodes, pass both left_anti joins (null never equi-matches)
    // and emit a garbage (null, null) labeling row
    val e = newEdges.select(col(srcCol).cast("long").as("u"), col(dstCol).cast("long").as("v"))
      .where(col("u").isNotNull && col("v").isNotNull)
    // endpoints → current labels (unknown ids are their own component)
    val lu = lab.select(col("id").as("u"), col("component").as("cu"))
    val lv = lab.select(col("id").as("v"), col("component").as("cv"))
    val contractedEdges = e
      .join(lu, Seq("u"), "left").join(lv, Seq("v"), "left")
      .select(coalesce(col("cu"), col("u")).as("u"), coalesce(col("cv"), col("v")).as("v"))
    val contractedNodes = contractedEdges.select(col("u").as("id"))
      .unionByName(contractedEdges.select(col("v").as("id"))).distinct()
    val relabel = connectedComponents(contractedNodes, contractedEdges, "id", "u", "v")
      .select(col("id").as("component"), col("component").as("__new"))
    // new ids that weren't in the labeling join the output labeled by the
    // contraction result directly
    val newIds = contractedNodes
      .join(lab.select(col("component").as("id")).distinct(), Seq("id"), "left_anti")
      .join(lab.select(col("id")), Seq("id"), "left_anti")
      .select(col("id"), col("id").as("component"))
    lab.unionByName(newIds)
      .join(broadcast(relabel), Seq("component"), "left")
      .select(col("id"), coalesce(col("__new"), col("component")).as("component"))
  }

  /** Canonical selection: flag ONE keeper per cluster by the BEST score —
    * "keep the longest / highest-quality copy", the usual refinement over
    * min-id keeps once a quality signal exists. Adds a boolean `keep`.
    *
    * The argmax is a map-side-combined struct-max agg, NOT a per-cluster
    * window: boilerplate-heavy corpora produce degenerate giant clusters,
    * and a window would serialize each through one task while the combiner
    * reduces them map-side. The winner comes back via a co-partitioned
    * equi-join on the component key.
    *
    * Ties break to the smallest id (max of (score, -id) — ids at
    * Long.MinValue would wrap, document ids are nonnegative in practice);
    * null and NaN scores lose to any real score.
    */
  def keepBestBy(
      clusters: DataFrame, idCol: String, componentCol: String, scoreCol: String,
  ): DataFrame = {
    val names = clusters.columns.toSet
    Seq("__m", "__keep_id", "__c", "keep").foreach(c =>
      require(!names.contains(c), s"input already has a '$c' column"))
    // null AND NaN both mean "no usable score" — NaN sorts ABOVE every
    // real double in Spark's ordering, so without this fold a single
    // NaN-scored row (0.0/0.0 from an upstream quality signal) would win
    // its cluster and the junk copy would become the canonical keeper
    val sRaw = col(scoreCol).cast("double")
    val s = when(sRaw.isNull || isnan(sRaw), lit(Double.NegativeInfinity)).otherwise(sRaw)
    val keepers = clusters
      .groupBy(col(componentCol).as("__c"))
      .agg(max(struct(s.as("s"), (-col(idCol)).as("ni"))).as("__m"))
      .select(col("__c"), (-col("__m.ni")).as("__keep_id"))
    // null-safe join: a null component (md5 of a null text, an unlabeled
    // row) is one cluster, not silently dropped rows
    clusters
      .join(keepers, col(componentCol) <=> col("__c"))
      .withColumn("keep", col(idCol) === col("__keep_id"))
      .drop("__keep_id", "__c")
  }

  /** Cross-corpus boilerplate line removal — the line-level dedup step of
    * C4/RefinedWeb-style pipelines: a LINE appearing in ≥ `minDocs`
    * DISTINCT documents (nav bars, cookie banners, license headers) is
    * removed from every document; document text is reassembled in original
    * line order. Complements [[TextOps.c4LineClean]] (per-line heuristics,
    * no corpus state) with the corpus-frequency signal.
    *
    * Scale shape — nothing ever shuffles document text except the final
    * per-document reassembly:
    *  - frequency pass shuffles (md5(line), doc_id) pairs, distinct-ed
    *    (map-side partial) so a line repeated inside one document counts
    *    once; the count that follows is map-side combined;
    *  - removal is a left-anti EQUI-join on the 16-byte line hash —
    *    co-partitioned with the frequency output, and the boilerplate side
    *    holds only lines that cleared `minDocs` (tiny vs the corpus), so
    *    AQE typically broadcasts it;
    *  - reassembly is ONE shuffle keyed by doc id (collect_list of
    *    (pos, line) structs, sorted in the reducer via array_sort — a
    *    window-free group agg, so combiners still apply).
    *
    * Blank lines are never boilerplate (kept verbatim); a document whose
    * every line is removed survives with empty text, not a dropped row.
    * Output: (idCol, cleaned, n_lines, n_kept).
    */
  def removeBoilerplateLines(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      minDocs: Int,
  ): DataFrame = {
    require(minDocs >= 2, s"minDocs must be at least 2: $minDocs")
    val names = docs.columns.toSet
    Seq("__id", "__bid", "__pos", "__line", "__h", "cleaned", "n_lines", "n_kept").foreach(c =>
      require(!names.contains(c), s"input already has a '$c' column"))
    // coalesce to "": split(NULL) yields NO rows, which would drop a
    // NULL-text document from the output entirely, violating the
    // one-row-per-input-doc contract. split("") is [""], so the doc
    // survives with empty text.
    val lines = docs.select(col(idCol).as("__id"),
      posexplode(split(coalesce(col(textCol), lit("")), "\n")).as(Seq("__pos", "__line")))
    val boiler = lines
      .where(length(trim(col("__line"))) > 0)
      .select(md5(col("__line")).as("__h"), col("__id").as("__bid"))
      .distinct()
      .groupBy("__h").agg(count(lit(1)).as("__nd"))
      .where(col("__nd") >= minDocs)
      .select("__h")
    // LEFT join (not anti) so the same pass counts total lines: collect_list
    // skips the nulls the `when` produces for boilerplate lines, so one
    // groupBy yields cleaned text, n_lines and n_kept — no second corpus
    // scan and no final doc-level join. Every doc has >= 1 line (split of ""
    // is [""]), so no document can drop out of the group-by.
    lines
      .join(boiler, md5(col("__line")) === boiler("__h"), "left")
      .groupBy(col("__id"))
      .agg(
        concat_ws("\n",
          transform(
            array_sort(collect_list(when(col("__h").isNull, struct(col("__pos"), col("__line"))))),
            s => s.getField("__line"))).as("cleaned"),
        count(lit(1)).as("n_lines"),
        count(when(col("__h").isNull, 1)).as("n_kept"),
      )
      .select(col("__id").as(idCol), col("cleaned"), col("n_lines"), col("n_kept"))
  }

  /** Winnowing overlap pairs — MOSS's second half (Schleimer 2003 §2):
    * document pairs sharing ≥ `minShared` winnowing fingerprints
    * ([[graft.functions.TextOps.winnowFingerprints]]). Because winnowing
    * guarantees a shared fingerprint for any shared run of k+w−1 tokens,
    * this finds COPIED-PASSAGE overlap (plagiarism, syndication, licence
    * boilerplate) that whole-doc MinHash dilutes away on long documents.
    *
    * Scale shape — same discipline as [[minHashCandidates]]:
    *  - only the SAMPLED fingerprints explode (≈ 2/(w+1) of the k-grams);
    *  - ubiquitous fingerprints are df-capped (`maxDf`) before the
    *    self-join — a fingerprint in >maxDf docs is corpus boilerplate,
    *    not evidence of pairwise copying, and would explode O(df²) pairs;
    *    df = 1 fingerprints are dropped too (nothing to pair);
    *  - the pair count per fingerprint is then ≤ maxDf², and the
    *    (a, b) groupBy is map-side combined.
    * Output: (a, b, n_shared) with a < b.
    */
  def winnowOverlapPairs(
      docs: DataFrame, idCol: String, textCol: String,
      k: Int = 4, window: Int = 5, minShared: Int = 2, maxDf: Int = 10,
  ): DataFrame = {
    require(minShared >= 1, s"minShared must be >= 1: $minShared")
    require(maxDf >= 2, s"maxDf must be >= 2: $maxDf")
    // The fingerprint projection is the expensive stage and feeds THREE
    // plan branches (the df-agg and both sides of the self-join); without
    // materialization AQE broadcasts the joins, no exchange is ever
    // reused, and the corpus scan + explode runs once PER BRANCH. Persist
    // (memory, spilling to disk) so it computes exactly once — the cached
    // unit is the sampled fingerprints, ≈ 2/(w+1) of the k-grams, ~50
    // bytes/row; the ContextCleaner reclaims it when the result DataFrame
    // is unreferenced.
    val fps = docs.select(col(idCol).as("a"),
      explode(graft.functions.TextOps.winnowFingerprints(col(textCol), k, window)).as("__fp"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // fingerprints are distinct per doc already (winnowFingerprints ends
    // in array_distinct), so df is a plain count
    val rare = fps.groupBy("__fp")
      .agg(count(lit(1)).as("__df"))
      .where(col("__df") >= 2 && col("__df") <= maxDf)
      .select("__fp")
    val f2 = fps.join(rare, Seq("__fp"))
    f2.join(f2.select(col("__fp"), col("a").as("b")), Seq("__fp"))
      .where(col("a") < col("b"))
      .groupBy("a", "b")
      .agg(count(lit(1)).as("n_shared"))
      .where(col("n_shared") >= minShared)
  }

  /** Cross-corpus exact PARAGRAPH dedup — the paragraph-granularity pass of
    * MassiveText/Gopher (Rae 2021 §A.1.2 removes exact duplicate paragraphs
    * corpus-wide, not just documents): every occurrence of a paragraph
    * after its global first is removed, and documents are reassembled in
    * original paragraph order. Sits between [[exactKey]] (whole-doc) and
    * [[removeBoilerplateLines]] (line-level, frequency-gated): paragraphs
    * dedup on FIRST-WINS identity, not a ≥ minDocs frequency threshold.
    *
    * First-wins is the global min of (doc id, paragraph position) per
    * paragraph hash — deterministic under any partitioning. Whitespace-only
    * paragraphs are document structure, never duplicates — kept verbatim.
    *
    * Scale shape (mirrors [[removeBoilerplateLines]]):
    *  - paragraphs split on `\n{2,}`; the keeper table shuffles
    *    (16-byte md5, id, pos) — never paragraph text — with a map-side-
    *    combined struct-min;
    *  - the flag is an equi-join on the hash, co-partitioned with the
    *    keeper agg (both O(distinct paragraphs) — no broadcast assumption);
    *  - reassembly is ONE shuffle keyed by doc id (array_sort over
    *    collected (pos, para) structs — window-free, combiners apply).
    * A NULL-text document survives as one empty paragraph (kept), and a
    * document whose every paragraph is removed survives with empty text.
    * Output: (idCol, cleaned, n_paras, n_kept).
    */
  def dedupParagraphs(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val names = docs.columns.toSet
    Seq("__id", "__pos", "__para", "__h", "__first", "__keep", "cleaned", "n_paras", "n_kept")
      .foreach(c => require(!names.contains(c), s"input already has a '$c' column"))
    val paras = docs.select(col(idCol).as("__id"),
      posexplode(split(coalesce(col(textCol), lit("")), "\n{2,}")).as(Seq("__pos", "__para")))
    val firsts = paras
      .where(length(trim(col("__para"))) > 0)
      .groupBy(md5(col("__para")).as("__h"))
      .agg(min(struct(col("__id").as("i"), col("__pos").as("p"))).as("__first"))
    paras
      .join(firsts, md5(col("__para")) === firsts("__h"), "left")
      .withColumn("__keep", col("__h").isNull ||
        (col("__first").getField("i") === col("__id") && col("__first").getField("p") === col("__pos")))
      .groupBy(col("__id"))
      .agg(
        concat_ws("\n\n",
          transform(
            array_sort(collect_list(when(col("__keep"), struct(col("__pos"), col("__para"))))),
            s => s.getField("__para"))).as("cleaned"),
        count(lit(1)).as("n_paras"),
        count(when(col("__keep"), 1)).as("n_kept"),
      )
      .select(col("__id").as(idCol), col("cleaned"), col("n_paras"), col("n_kept"))
  }

  /** Cross-corpus exact SENTENCE dedup — the sentence-granularity member of
    * the exact-dedup ladder (whole-doc [[exactKey]] → paragraph
    * [[dedupParagraphs]] → sentence → line [[removeBoilerplateLines]]):
    * every occurrence of a sentence after its global first is removed,
    * documents reassembled in original sentence order. Catches the
    * syndication/quote granularity paragraph dedup misses (a copied
    * sentence embedded in an otherwise-novel paragraph).
    *
    * The splitter is deliberately RE2-safe and SQL-portable (no
    * lookbehind, unlike the reference chunker's sentence regex): a
    * sentinel is inserted after every terminal-punctuation + whitespace
    * boundary (`([.!?])\s+` with an explicit space class) and the text
    * splits on the sentinel — the DuckDB oracle replays it with the same
    * two regex calls. Reassembly joins with a single space (the boundary
    * whitespace is normalized — documented, mirrors the "\n\n" rejoin of
    * the paragraph form). First-wins identity, whitespace-only sentences
    * kept verbatim, NULL text survives as one empty sentence — all
    * exactly as [[dedupParagraphs]]; same scale shape (hash-keyed
    * struct-min shuffle, equi-join flag, one window-free reassembly
    * shuffle).
    *
    * Output: (idCol, cleaned, n_sents, n_kept).
    */
  def dedupSentences(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val names = docs.columns.toSet
    Seq("__id", "__pos", "__sent", "__h", "__first", "__keep", "cleaned", "n_sents", "n_kept")
      .foreach(c => require(!names.contains(c), s"input already has a '$c' column"))
    val sentinel = "\u0001"
    val sentsCol = split(
      regexp_replace(coalesce(col(textCol), lit("")), "([.!?])[ \t\r\n]+", "$1" + sentinel),
      sentinel)
    val sents = docs.select(col(idCol).as("__id"),
      posexplode(sentsCol).as(Seq("__pos", "__sent")))
    val firsts = sents
      .where(length(trim(col("__sent"))) > 0)
      .groupBy(md5(col("__sent")).as("__h"))
      .agg(min(struct(col("__id").as("i"), col("__pos").as("p"))).as("__first"))
    sents
      .join(firsts, md5(col("__sent")) === firsts("__h"), "left")
      .withColumn("__keep", col("__h").isNull ||
        (col("__first").getField("i") === col("__id") && col("__first").getField("p") === col("__pos")))
      .groupBy(col("__id"))
      .agg(
        concat_ws(" ",
          transform(
            array_sort(collect_list(when(col("__keep"), struct(col("__pos"), col("__sent"))))),
            s => s.getField("__sent"))).as("cleaned"),
        count(lit(1)).as("n_sents"),
        count(when(col("__keep"), 1)).as("n_kept"),
      )
      .select(col("__id").as(idCol), col("cleaned"), col("n_sents"), col("n_kept"))
  }

  /** Repeated-substring span detection — the relational form of ExactSubstr
    * dedup (Lee et al. 2022, "Deduplicating Training Data Makes Language
    * Models Better"): find every maximal token span that is part of some
    * `k`-token substring occurring ≥ `minOccurrences` times in the corpus.
    * The reference method builds a corpus-wide suffix array (inherently
    * single-machine); the same flagged-span output falls out of pure
    * relational algebra: a span is repeated iff every `k`-gram inside it is
    * repeated, so flagging repeated `k`-grams and merging overlaps
    * reconstructs exactly the maximal repeated regions at `k`-token
    * resolution.
    *
    * Scale shape:
    *  1. per-row: tokenize, hash each positional `k`-gram (md5 of the
    *     space-joined window — chosen over xxhash64 so the DuckDB oracle
    *     can replay it; the hash never leaves the pipeline);
    *  2. ONE map-side-combined shuffle of (gram_hash → count) — grams
    *     shuffle as 16-byte hashes, never text;
    *  3. the surviving "heavy" hashes (duplicated grams only — tiny vs the
    *     corpus, AQE broadcasts them) semi-join back against the positional
    *     gram stream;
    *  4. overlap merge is a gaps-and-islands window PARTITIONED BY DOC —
    *     a partition never holds more than one document's flagged grams,
    *     so the window is bounded by document length at any corpus size.
    *
    * `crossDocOnly=true` counts DISTINCT documents instead of occurrences
    * (intra-document repetition stops counting — the decontamination-style
    * variant); the extra `distinct` is map-side partial on (hash, id).
    *
    * Output: one row per merged span — (idCol, span_start, span_end)
    * inclusive token indices, plus span_tokens = span_end − span_start + 1.
    * Documents with < `k` tokens produce no grams and never appear.
    */
  def repeatedSpans(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      k: Int,
      minOccurrences: Int = 2,
      crossDocOnly: Boolean = false,
  ): DataFrame = {
    require(k >= 2, s"k must be at least 2: $k")
    require(minOccurrences >= 2, s"minOccurrences must be at least 2: $minOccurrences")
    val toks = docs.select(col(idCol).as("__id"), TextOps.tokens(col(textCol)).as("__toks"))
      .where(size(col("__toks")) >= k)
      .select(col("__id"), posexplode(TextOps.wordShingles(col("__toks"), k)).as(Seq("__pos", "__gram")))
      .select(col("__id"), col("__pos"), md5(col("__gram")).as("__gh"))
    val heavy =
      if (crossDocOnly)
        toks.select("__gh", "__id").distinct()
          .groupBy("__gh").agg(count(lit(1)).as("__n"))
          .where(col("__n") >= minOccurrences).select("__gh")
      else
        toks.groupBy("__gh").agg(count(lit(1)).as("__n"))
          .where(col("__n") >= minOccurrences).select("__gh")
    val flagged = toks.join(heavy, Seq("__gh"), "left_semi")
      .select(col("__id"), col("__pos").as("__s"), (col("__pos") + k - 1).as("__e"))
    // gaps-and-islands: a gram starts a new span iff it begins past the
    // running max end (+1: adjacent spans are one contiguous repeated region)
    val W = org.apache.spark.sql.expressions.Window
    val w = W.partitionBy("__id").orderBy("__s")
    val islands = flagged
      .withColumn("__prev_e", max(col("__e")).over(w.rowsBetween(W.unboundedPreceding, -1)))
      .withColumn("__new", when(col("__prev_e").isNull || col("__s") > col("__prev_e") + 1, 1L).otherwise(0L))
      .withColumn("__island", sum(col("__new")).over(w.rowsBetween(W.unboundedPreceding, 0)))
    islands.groupBy(col("__id"), col("__island"))
      .agg(min(col("__s")).as("span_start"), max(col("__e")).as("span_end"))
      .select(
        col("__id").as(idCol),
        col("span_start").cast("long").as("span_start"),
        col("span_end").cast("long").as("span_end"),
        (col("span_end") - col("span_start") + 1).cast("long").as("span_tokens"),
      )
  }

  /** The cut step completing ExactSubstr dedup: remove every token covered
    * by a [[repeatedSpans]] span and reassemble the remaining token stream
    * in order (Lee et al. 2022 drop ALL copies of a duplicated substring —
    * they report the simpler policy costs nothing downstream; "keep first
    * occurrence" would need a global occurrence order, i.e. one more
    * corpus-wide sort). Output text is the rebuilt TOKEN stream (the same
    * canonicalized space the spans were computed in), not the original
    * formatting.
    *
    * Scale shape — only affected documents ever shuffle:
    *  - documents with no flagged span (the overwhelming majority of a
    *    typical corpus) take a scan-only branch: tokens are rejoined
    *    per-row, nothing explodes and nothing shuffles;
    *  - affected documents explode to (id, pos, token), LEFT-join the
    *    covered-position set (equi-join on (id, pos), co-partitioned), and
    *    reassemble in ONE group-by (collect_list skips cut tokens via the
    *    null trick, counts ride along — same pattern as
    *    [[removeBoilerplateLines]]);
    *  - the affected-id set and covered positions are bounded by total
    *    flagged span length, tiny vs the corpus, so AQE broadcasts them.
    *
    * Output: (idCol, cleaned, n_tokens, n_cut) — n_tokens counts the
    * ORIGINAL token stream; n_cut of them were removed.
    */
  def cutRepeatedSpans(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      k: Int,
      minOccurrences: Int = 2,
      crossDocOnly: Boolean = false,
  ): DataFrame = {
    val names = docs.columns.toSet
    Seq("__cid", "__cpos", "__toks", "__pos", "__tok", "cleaned", "n_tokens", "n_cut").foreach(c =>
      require(!names.contains(c), s"input already has a '$c' column"))
    val spans = repeatedSpans(docs, idCol, textCol, k, minOccurrences, crossDocOnly)
    // covered feeds TWO branches (the affected-id anti/semi gates and the
    // rebuild join); without materialization the whole repeatedSpans
    // pipeline — the expensive gram-count shuffle — runs once per branch.
    // The cached unit is the flagged (id, pos) set, bounded by total
    // flagged span length, tiny vs the corpus (same persist discipline as
    // winnowOverlapPairs / pagerank).
    val covered = spans.select(
      col(idCol).as("__cid"),
      explode(sequence(col("span_start"), col("span_end"))).as("__cpos"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // null text coalesces to '' (the removeBoilerplateLines contract):
    // Tokenize is null-propagating, so an uncoalesced NULL-text doc would
    // report n_tokens = null instead of 0 and poison downstream cut ratios
    val toks = docs.select(col(idCol),
      TextOps.tokens(coalesce(col(textCol), lit(""))).as("__toks"))
    val affectedIds = covered.select(col("__cid")).distinct()
    val untouched = toks.join(affectedIds, col(idCol) === col("__cid"), "left_anti")
      .select(
        col(idCol),
        concat_ws(" ", col("__toks")).as("cleaned"),
        size(col("__toks")).cast("long").as("n_tokens"),
        lit(0L).as("n_cut"),
      )
    val rebuilt = toks.join(affectedIds, col(idCol) === col("__cid"), "left_semi")
      .select(col(idCol), posexplode(col("__toks")).as(Seq("__pos", "__tok")))
      .join(covered, col(idCol) === col("__cid") && col("__pos") === col("__cpos"), "left")
      .groupBy(col(idCol))
      .agg(
        concat_ws(" ",
          transform(
            array_sort(collect_list(when(col("__cid").isNull, struct(col("__pos"), col("__tok"))))),
            s => s.getField("__tok"))).as("cleaned"),
        count(lit(1)).as("n_tokens"),
        count(col("__cid")).as("n_cut"),
      )
    untouched.unionByName(rebuilt)
  }
}
