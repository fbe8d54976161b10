package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** BPE vocabulary LEARNING (Sennrich 2016) — training a tokenizer from the
  * corpus, the step upstream of every token-counting operator.
  *
  * The scale structure matters more than the loop: the corpus is scanned
  * ONCE to build the word-frequency table (map-side-combined groupBy), and
  * every merge round after that runs over the VOCAB table only — |distinct
  * words| rows, millions at web scale, never the corpus. At 100 TB the
  * canonical practice is a hash-sampled word count ([[Sampling.hashSample]]
  * upstream) — merge quality converges long before the full count does.
  *
  * Word symbol state is a BRACKETED string `[d][a][t][a]` rather than an
  * array: applying merge (a,b) is then `replace("[a][b]" → "[ab]")`, whose
  * left-to-right non-overlapping semantics are exactly BPE's greedy
  * application (`[a][a][a]` → `[aa][a]`, never `[a][aa]`) AND exactly what
  * SQL `replace` does — which is what makes every learning round
  * independently replayable by the DuckDB oracle.
  *
  * Pair counting is the classic per-occurrence count (adjacent positions,
  * overlaps included: `aaa` contributes (a,a) twice, weighted by word
  * frequency). Argmax tie-break: (count desc, a asc, b asc) — fully
  * deterministic.
  */
object Bpe {

  final case class Merge(rank: Int, a: String, b: String, count: Long)

  /** One corpus scan → (word, freq). Words are the repo's canonical
    * tokenization (lowercased runs of [a-z0-9]).
    */
  def wordFreqs(docs: DataFrame, textCol: String): DataFrame =
    docs
      .select(explode(filter(split(lower(coalesce(col(textCol), lit(""))), "[^a-z0-9]+"),
        t => length(t) > 0)).as("word"))
      .groupBy("word")
      .agg(count(lit(1)).as("freq"))

  /** `data` → `[d][a][t][a]`. */
  def bracketed(word: String): String =
    word.map(c => s"[$c]").mkString

  private def symbols(bracketed: String): Array[String] =
    if (bracketed.length < 2) Array.empty
    else bracketed.substring(1, bracketed.length - 1).split("\\]\\[", -1)

  /** Greedy left-to-right non-overlapping application of ONE merge —
    * the `replace` semantics shared with the SQL oracle.
    */
  def applyMerge(bracketedWord: String, a: String, b: String): String =
    bracketedWord.replace(s"[$a][$b]", s"[$a$b]")

  /** Learn `k` merges from a (word, freq) table. Driver path when the vocab
    * fits `maxDriverWords` (single collect, in-memory rounds — the common
    * case: even web-scale corpora have ~10^7 distinct words); distributed
    * rounds otherwise (per round: one adjacent-pair aggregation over the
    * vocab table + a 1-row argmax collect + a broadcast-free map). Both
    * paths are spec-pinned identical.
    */
  def learn(wordFreqs: DataFrame, k: Int, maxDriverWords: Long = 2000000L): Seq[Merge] = {
    require(k >= 0, s"k must be nonnegative: $k")
    val probe = wordFreqs.limit((maxDriverWords + 1).toInt).collect()
    if (probe.length <= maxDriverWords) {
      learnDriver(probe.map(r => (r.getString(0), r.getLong(1))), k)
    } else learnDistributed(wordFreqs, k)
  }

  /** In-memory rounds over the collected vocab. */
  private def learnDriver(words: Array[(String, Long)], k: Int): Seq[Merge] = {
    var vocab  = words.map { case (w, f) => (bracketed(w), f) }
    val merges = collection.mutable.ArrayBuffer.empty[Merge]
    var r = 0
    while (r < k) {
      val counts = collection.mutable.HashMap.empty[(String, String), Long]
      vocab.foreach { case (bw, f) =>
        val syms = symbols(bw)
        var i = 0
        while (i < syms.length - 1) {
          val key = (syms(i), syms(i + 1))
          counts(key) = counts.getOrElse(key, 0L) + f
          i += 1
        }
      }
      if (counts.isEmpty) return merges.toSeq
      val ((a, b), c) = counts.minBy { case ((x, y), n) => (-n, x, y) }
      merges += Merge(r, a, b, c)
      vocab = vocab.map { case (bw, f) => (applyMerge(bw, a, b), f) }
      r += 1
    }
    merges.toSeq
  }

  /** Distributed rounds: the vocab table lives as a DataFrame; each round
    * is one pair aggregation + one 1-row collect + one projection. Lineage
    * is cut with a localCheckpoint every few rounds so the plan doesn't
    * grow linearly in k.
    */
  private def learnDistributed(wordFreqs: DataFrame, k: Int): Seq[Merge] = {
    val spark = wordFreqs.sparkSession
    val brk   = udf((w: String) => bracketed(w))
    val syms  = udf((bw: String) => symbols(bw).toSeq)
    val appl  = udf((bw: String, a: String, b: String) => applyMerge(bw, a, b))
    var vocab = wordFreqs.select(brk(col("word")).as("bw"), col("freq")).cache()
    val merges = collection.mutable.ArrayBuffer.empty[Merge]
    var r = 0
    while (r < k) {
      val best = vocab
        .select(syms(col("bw")).as("s"), col("freq"))
        .select(posexplode(col("s")).as(Seq("i", "a")), col("s"), col("freq"))
        .where(col("i") < size(col("s")) - 1)
        .select(col("a"), col("s")(col("i") + 1).as("b"), col("freq"))
        .groupBy("a", "b")
        .agg(sum("freq").as("cnt"))
        .orderBy(desc("cnt"), col("a"), col("b"))
        .limit(1)
        .collect()
      if (best.isEmpty) { vocab.unpersist(); return merges.toSeq }
      val row = best.head
      val (a, b, c) = (row.getString(0), row.getString(1), row.getLong(2))
      merges += Merge(r, a, b, c)
      val next = vocab.select(appl(col("bw"), lit(a), lit(b)).as("bw"), col("freq"))
      val mat  = (if ((r + 1) % 4 == 0) next.localCheckpoint(true) else next).cache()
      mat.count()
      vocab.unpersist()
      vocab = mat
      r += 1
    }
    vocab.unpersist()
    merges.toSeq
  }

  /** Segment one word with learned merges applied in rank order. */
  def segment(word: String, merges: Seq[Merge]): Seq[String] = {
    var bw = bracketed(word)
    merges.foreach(m => bw = applyMerge(bw, m.a, m.b))
    symbols(bw).toSeq
  }

  /** Tokenize a corpus with the learned vocabulary: one narrow pass, the
    * merge list rides the closure (KBs). Output: input + `bpe_tokens`
    * (array) + `bpe_n_tokens`.
    */
  def encode(docs: DataFrame, textCol: String, merges: Seq[Merge]): DataFrame = {
    val ms  = merges.sortBy(_.rank).map(m => (m.a, m.b)).toArray
    val seg = udf((text: String) => {
      val words = Option(text).getOrElse("").toLowerCase(java.util.Locale.ROOT).split("[^a-z0-9]+").filter(_.nonEmpty)
      words.flatMap { w =>
        var bw = bracketed(w)
        var i = 0
        while (i < ms.length) { bw = applyMerge(bw, ms(i)._1, ms(i)._2); i += 1 }
        symbols(bw)
      }.toSeq
    })
    docs
      .withColumn("bpe_tokens", seg(col(textCol)))
      .withColumn("bpe_n_tokens", size(col("bpe_tokens")).cast("long"))
  }

  /** The learned merge table as a DataFrame (rank, a, b, count) — the
    * artifact a query or a registry persists.
    */
  def mergeTable(spark: org.apache.spark.sql.SparkSession, merges: Seq[Merge]): DataFrame = {
    import spark.implicits._
    merges.toDF("rank", "a", "b", "count")
  }
}
