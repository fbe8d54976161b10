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
  * narrow, candidate generation shuffles signatures (tiny) not documents.
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

  /** MinHash signature: for each of `numHashes` seeds, the min over the
    * document's distinct shingles of xxhash64(shingle, seed). Pure
    * per-row expression work — no shuffle, no MLlib model fit.
    */
  def minHashSignature(text: Column, shingleSize: Int, numHashes: Int): Column = {
    val shingles = array_distinct(TextOps.wordShingles(TextOps.tokens(text), shingleSize))
    transform(
      sequence(lit(0), lit(numHashes - 1)),
      seed =>
        when(size(shingles) === 0, lit(Long.MaxValue))
          .otherwise(array_min(transform(shingles, s => xxhash64(s, seed)))),
    )
  }

  /** LSH banding: split the signature into `bands` bands and hash each band;
    * docs sharing any (band_index, band_hash) become candidate pairs.
    * Emits (band, band_hash, id) — the only thing shuffled is this tiny
    * triple, never the documents.
    */
  def lshBuckets(df: DataFrame, idCol: String, textCol: String, shingleSize: Int = 3, numHashes: Int = 16, bands: Int = 4): DataFrame = {
    val rows = numHashes / bands
    val sig  = minHashSignature(col(textCol), shingleSize, numHashes)
    df.select(col(idCol).as("id"), sig.as("sig"))
      .select(
        col("id"),
        posexplode(
          transform(
            sequence(lit(0), lit(bands - 1)),
            b => xxhash64(array_join(transform(sequence(lit(0), lit(rows - 1)), r => element_at(col("sig"), b * rows + r + 1)), "_")),
          )
        ).as(Seq("band", "band_hash")),
      )
  }

  /** MinHash-LSH candidate pairs (id_a < id_b), deduped across bands. */
  def minHashCandidates(df: DataFrame, idCol: String, textCol: String, shingleSize: Int = 3, numHashes: Int = 16, bands: Int = 4): DataFrame = {
    val b  = lshBuckets(df, idCol, textCol, shingleSize, numHashes, bands)
    val b2 = b.select(col("band"), col("band_hash"), col("id").as("id_b"))
    b.join(b2, Seq("band", "band_hash"))
      .where(col("id") < col("id_b"))
      .select(col("id").as("id_a"), col("id_b"))
      .distinct()
  }

  /** Exact n-gram Jaccard similarity for candidate verification / oracle
    * checking: explode distinct shingles, self-join on shingle, then
    * jaccard = |A∩B| / (|A| + |B| − |A∩B|). The join key is the shingle —
    * at scale, apply AFTER LSH candidate pruning (pass candidates to
    * restrict) or on a salted top-frequency-filtered shingle set.
    */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String, shingleSize: Int, threshold: Double): DataFrame = {
    val shingled = df.select(
      col(idCol).as("id"),
      array_distinct(TextOps.wordShingles(TextOps.tokens(col(textCol)), shingleSize)).as("shingles"),
    )
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

  /** Population count via mask array (portable across Spark minor versions). */
  def popCount(x: Column): Column =
    aggregate(transform(bitMasks, m => when(x.bitwiseAND(m) =!= 0, lit(1)).otherwise(lit(0))), lit(0), (a, b) => a + b)

  /** Hamming distance between two simhash values. */
  def hammingDist(a: Column, b: Column): Column = popCount(a.bitwiseXOR(b))

  /** Embedding-cosine near-duplicate pairs via bucketed candidate generation:
    * bucket = sign-bits of a few random-ish projections (cheap LSH), verify
    * candidates with exact cosine ≥ threshold.
    */
  def embeddingNearDupPairs(df: DataFrame, idCol: String, vecCol: String, threshold: Double): DataFrame = {
    import graft.functions.VectorOps._
    val v  = df.select(col(idCol).as("id_a"), asDouble(col(vecCol)).as("va"))
    val v2 = df.select(col(idCol).as("id_b"), asDouble(col(vecCol)).as("vb"))
    v.join(v2, col("id_a") < col("id_b"))
      .withColumn("cos", cosine(col("va"), col("vb")))
      .where(col("cos") >= threshold)
      .select("id_a", "id_b", "cos")
  }
}
