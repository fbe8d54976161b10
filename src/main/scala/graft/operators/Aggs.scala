package graft.operators

import graft.functions.TextOps
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** The reference's aggregation surface (SURVEY §2.4). All of these ride
  * Spark's partial+final aggregation (map-side combine before the shuffle)
  * for free — the reference computes them as driver-side Python loops over a
  * full scroll (e.g. backend/main.py:886-911), which is exactly the
  * collect-and-loop shape we must not reproduce.
  */
object Aggs {

  /** A1 — distinct cluster ids + names, sorted by id
    * (backend/main.py:886-911). The reference's dict is last-write-wins over
    * scroll order; we declare the deterministic variant: max name per id.
    */
  def distinctClusters(chunks: DataFrame, labelCol: String, nameCol: String): DataFrame =
    chunks
      .where(col(labelCol).isNotNull)
      .groupBy(col(labelCol).as("cluster"))
      .agg(max(col(nameCol)).as("cluster_name"))
      .orderBy("cluster")

  /** A3 — cluster stats: n_clusters excludes the −1 noise label, n_noise
    * counts it (backend/clustering.py:64-66; backend/main.py:833-834).
    */
  def clusterStats(chunks: DataFrame, labelCol: String): DataFrame =
    chunks.agg(
      countDistinct(when(col(labelCol) =!= -1, col(labelCol))).as("n_clusters"),
      count(when(col(labelCol) === -1, 1)).as("n_noise"),
    )

  /** A4 — members-per-group as a deterministic sorted list rendered to csv
    * (backend/filesystem_db.py:135-149; NULL group key → literal "null").
    */
  def groupToList(df: DataFrame, keyCol: String, memberCol: String): DataFrame =
    df.groupBy(coalesce(col(keyCol).cast("string"), lit("null")).as("group_key"))
      .agg(
        array_join(transform(sort_array(collect_list(col(memberCol))), _.cast("string")), ",").as("members"),
        count(lit(1)).as("n_members"),
      )
      .orderBy("group_key")

  /** A7 — document registry: the maintained per-document summary the
    * reference keeps in documents.json (backend/document_registry.py:180-207),
    * derivable as one aggregation over chunks.
    */
  def registry(chunks: DataFrame, docCol: String, orderCol: String): DataFrame =
    chunks
      .groupBy(col(docCol).as("document_id"))
      .agg(
        count(lit(1)).as("total_chunks"),
        min(col(orderCol)).as("first_chunk"),
        max(col(orderCol)).as("last_chunk"),
      )
      .orderBy("document_id")

  /** A6/M2/T5 — per-cluster TF-IDF top-k keywords, the cluster-naming chain
    * (backend/clustering.py:100-147): unigram+bigram terms, tf = term count
    * in the cluster corpus, idf = ln(n_clusters / df), top-k by score with a
    * deterministic (score desc, term asc) tie-break, joined " & " in Title
    * Case; declared deviation from sklearn's TfidfVectorizer: plain ln idf,
    * no min_df/max_df/max_features pruning — the selection is fully
    * distributed instead of per-cluster sklearn fits.
    */
  def tfidfKeywords(
      docs: DataFrame, labelCol: String, textCol: String, topK: Int = 3, minTf: Int = 2,
      nLabelsFrom: Option[DataFrame] = None,
  ): DataFrame = {
    // Tokens materialize in their own projection: referenced twice below
    // (unigrams + bigram shingles), and higher-order functions are
    // interpreted with no CSE — inlining would tokenize every text twice.
    // fanOut spreads tokenize+explode+partial-agg across the cluster when
    // the corpus arrives as a handful of input splits.
    val withToks = graft.Par.fanOut(docs.select(col(labelCol).as("label"), col(textCol).as("__text")))
      .select(col("label"), TextOps.tokens(col("__text")).as("__toks"))
    val terms = withToks.select(
      col("label"),
      explode(concat(col("__toks"), TextOps.wordShingles(col("__toks"), 2))).as("term"),
    )
    // minTf mirrors the reference's TfidfVectorizer(min_df=2)
    // (backend/clustering.py:118-128): once-seen terms can't be keywords, and
    // pruning them before the doc-frequency window drops most of the bigram
    // tail from the shuffle.
    val tf = terms.groupBy("label", "term").agg(count(lit(1)).as("tf"))
      .where(col("tf") >= minTf)
    // df rides a window over tf instead of a re-aggregation + self-join, and
    // n_labels comes from the (un-exploded) input — Spark does not CSE
    // identical subplans across a self-join, so the old
    // tf⋈groupBy(term)⋈countDistinct shape tokenized and exploded the whole
    // corpus three times. n_labels over the input also matches the reference
    // more closely: idf's n is the number of cluster corpora handed to the
    // vectorizer (backend/clustering.py:118-128), not the number that happen
    // to retain a min_df-surviving term.
    // Callers that already hold a compact (id,label) frame pass it via
    // nLabelsFrom so this scalar doesn't cost a second scan of the corpus.
    val nLabels = nLabelsFrom.getOrElse(docs).select(countDistinct(col(labelCol)).as("n_labels"))
    val scored = tf
      .withColumn("df", count(lit(1)).over(Window.partitionBy("term")))
      .crossJoin(broadcast(nLabels))
      .withColumn("tfidf", col("tf") * log(col("n_labels").cast("double") / col("df")))
    val w = Window.partitionBy("label").orderBy(desc("tfidf"), asc("term"))
    scored
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= topK)
      .groupBy("label")
      .agg(
        array_join(transform(sort_array(collect_list(struct(col("rk"), col("term")))), s => initcap(s("term"))), " & ")
          .as("cluster_name")
      )
      .orderBy("label")
  }

  /** V8 — mean-pool vector aggregation: average a group's vectors
    * element-wise (chunk embeddings → one document embedding, the standard
    * doc-representation op). Distributed form: posexplode to (group, pos,
    * value), aggregate per (group, pos) — partial+final, map-side combined —
    * then reassemble the array in position order. Nothing buffers whole
    * vector sets: the shuffle carries (group, pos, partial sum) rows, so a
    * group with a million chunks costs the same per-dimension row count as
    * one with ten. An `aggregate()`-HOF elementwise sum would buffer per-row
    * arrays through an interpreted fold; the exploded form stays in codegen.
    */
  def meanPoolVectors(df: DataFrame, groupCol: String, vecCol: String): DataFrame =
    df.select(col(groupCol), posexplode(col(vecCol).cast("array<double>")).as(Seq("__pos", "__v")))
      .groupBy(col(groupCol), col("__pos"))
      .agg(avg(col("__v")).as("__m"))
      .groupBy(col(groupCol))
      .agg(transform(
        array_sort(collect_list(struct(col("__pos"), col("__m")))), s => s("__m")).as("mean_vec"))

  /** X9 — quantile bucketing: assign every row to one of `nBuckets`
    * curriculum/stratification buckets by where its value falls among the
    * EXACT k/nBuckets quantile thresholds. The scale-right replacement for
    * `ntile() OVER (ORDER BY v)`, which funnels the entire table through a
    * single-partition window: here the thresholds come from the
    * bounded-domain histogram (cf. [[discreteQuantiles]]) and the assignment
    * is a broadcast of one nBuckets-length array + a pure projection.
    *
    * Thresholds use the quantile_disc rule (smallest value whose cumulative
    * count reaches ceil(k·n/nBuckets)); a row lands in the lowest bucket
    * whose threshold is >= its value, so ties on a threshold collapse
    * downward deterministically — reproducible across engines, unlike
    * ntile's positional remainder rule under equal values. The global
    * cumulative window runs over the HISTOGRAM (|distinct values| rows,
    * bounded by assumption), not the data.
    *
    * Output: input columns + `bucket` in [1, nBuckets] (null value → null).
    *
    * The bounded-domain precondition is ENFORCED, not assumed, and the
    * enforcement is free: the histogram is fetched with a distributed
    * `orderBy().limit(cutoff+1)` (TakeOrdered — no window, no extra probe
    * scan), thresholds are computed exactly on the driver from the ≤cutoff
    * sorted rows, and a histogram that overflows the cutoff switches to
    * `percentile_approx` — approximate within the sketch's documented
    * bound, fully distributed.
    */
  def quantileBuckets(
      df: DataFrame, valCol: String, nBuckets: Int, ndvCutoff: Int = 65536,
  ): DataFrame = {
    require(nBuckets >= 2, s"need at least 2 buckets: $nBuckets")
    val rows = df.where(col(valCol).isNotNull)
      .groupBy(col(valCol).as("__v")).agg(count(lit(1)).as("__c"))
      .orderBy("__v").limit(ndvCutoff + 1).collect()
    def assign(ts: Column): DataFrame =
      df.withColumn("bucket",
        when(col(valCol).isNull, lit(null))
          .otherwise(lit(1) + size(filter(ts, t => t < col(valCol)))))
    if (rows.length > ndvCutoff) {
      val fracs = array((1 to nBuckets).map(k => lit(k.toDouble / nBuckets)): _*)
      val sketch = df.where(col(valCol).isNotNull)
        .agg(percentile_approx(col(valCol), fracs, lit(10000)).as("__ts"))
      df.crossJoin(broadcast(sketch))
        .withColumn("bucket",
          when(col(valCol).isNull, lit(null))
            .otherwise(lit(1) + size(filter(col("__ts"), t => t < col(valCol)))))
        .drop("__ts")
    } else if (rows.isEmpty) {
      // no non-null values: bucket value is vacuous (only nulls exist)
      df.withColumn("bucket", when(col(valCol).isNull, lit(null)).otherwise(lit(1)))
    } else {
      // exact quantile_disc thresholds from the sorted histogram — plain
      // driver arithmetic over ≤cutoff rows, broadcast back as a literal
      val n = rows.iterator.map(_.getLong(1)).sum
      val cums = rows.scanLeft(0L)((acc, r) => acc + r.getLong(1)).tail
      val ts = (1 to nBuckets).map { k =>
        val need = (n * k + nBuckets - 1) / nBuckets
        val i    = cums.indexWhere(_ >= need)
        rows(if (i < 0) rows.length - 1 else i).get(0)
      }
      assign(array(ts.map(lit(_)): _*))
    }
  }

  /** A11 — EXACT per-group discrete quantiles over a bounded-cardinality
    * value domain, the scale-right way: aggregate a (group, value) histogram
    * (partial-combined map-side, so the shuffle is |groups|×|values| rows no
    * matter how many input rows), cumulative-sum it with a window, and pick
    * the smallest value whose cumulative count reaches ceil(q·n) — exactly
    * DuckDB's `quantile_disc` element rule, so the whole thing is
    * oracle-checkable. A naive exact percentile (`percentile()`) buffers
    * every raw value per group and dies at scale; a histogram of a bounded
    * domain (quantities, scores, ratings, token counts) never does.
    *
    * Quantiles are (numerator, denominator, outputName) integer pairs so the
    * rank threshold ceil(q·n) = (n·num + den − 1) div den stays in exact
    * integer arithmetic — no float rank boundary to disagree with an oracle
    * over.
    *
    * As in [[quantileBuckets]], the bounded-domain precondition is enforced
    * at zero extra cost: the (group, value) histogram arrives via a
    * distributed `orderBy().limit(cutoff+1)` (TakeOrdered — no window, no
    * probe scan), per-group ranks resolve exactly on the driver, and an
    * overflowing histogram switches to a plain `percentile_approx`
    * aggregation — one map-side-combined shuffle, approximate within the
    * sketch's bound.
    */
  def discreteQuantiles(
      df: DataFrame, groupCol: String, valCol: String,
      qs: Seq[(Int, Int, String)],
      ndvCutoff: Int = 65536,
  ): DataFrame = {
    val spark = df.sparkSession
    // NULL values are excluded, matching quantile_disc (and every SQL
    // quantile): a NULL histogram row would sort first and inflate every
    // rank threshold.
    val hist = df.where(col(valCol).isNotNull)
      .groupBy(col(groupCol), col(valCol).as("__v"))
      .agg(count(lit(1)).as("__c"))
    val rows = hist.orderBy(col(groupCol), col("__v")).limit(ndvCutoff + 1).collect()
    if (rows.length > ndvCutoff) {
      val aggs = count(lit(1)).as("n") +: qs.map { case (num, den, name) =>
        percentile_approx(col(valCol), lit(num.toDouble / den), lit(10000)).as(name)
      }
      return df.where(col(valCol).isNotNull)
        .groupBy(groupCol).agg(aggs.head, aggs.tail: _*)
    }
    // exact per-group quantile_disc rule over the group-contiguous sorted
    // rows: rank threshold ceil(q·n) = (n·num + den − 1) div den in integer
    // arithmetic, value = first histogram row reaching it
    val vType  = hist.schema("__v").dataType
    val schema = org.apache.spark.sql.types.StructType(
      hist.schema.head +:
        org.apache.spark.sql.types.StructField("n", org.apache.spark.sql.types.LongType, nullable = false) +:
        qs.map { case (_, _, name) => org.apache.spark.sql.types.StructField(name, vType, nullable = true) })
    val out = new java.util.ArrayList[org.apache.spark.sql.Row]()
    var i = 0
    while (i < rows.length) {
      var j = i
      while (j < rows.length && rows(j).get(0) == rows(i).get(0)) j += 1
      val group = rows.slice(i, j)
      val n     = group.iterator.map(_.getLong(2)).sum
      val cums  = group.scanLeft(0L)((acc, r) => acc + r.getLong(2)).tail
      val quants = qs.map { case (num, den, _) =>
        val need = (n * num + den - 1) / den
        val at   = cums.indexWhere(_ >= need)
        group(if (at < 0) group.length - 1 else at).get(1)
      }
      out.add(org.apache.spark.sql.Row.fromSeq(rows(i).get(0) +: n +: quants))
      i = j
    }
    spark.createDataFrame(out, schema)
  }
}
