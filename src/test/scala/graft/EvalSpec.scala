package graft

import graft.operators.Eval
import org.scalatest.funsuite.AnyFunSuite

/** Hand-computed trec_eval contract for Eval.rankingMetrics: recall@k over
  * the FULL relevant count, reciprocal rank, exponential-gain nDCG with
  * the ideal ranking from the qrels' own grades, inner-join evaluation
  * scope, and the duplicate-judgment guard.
  */
class EvalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val log2 = (x: Double) => math.log(x) / math.log(2.0)

  test("recall, RR and nDCG match hand computation; zero-hit and run-absent queries score zero") {
    // q1: ranks (d9 irrelevant, d1 grade 2, d2 grade 1); d3 (grade 1) missed
    // q2: judged but nothing relevant retrieved
    // q3: judged but absent from the run entirely
    // q9: in the run but unjudged -> not evaluated
    val run = Seq(
      (1L, 9L, 1), (1L, 1L, 2), (1L, 2L, 3),
      (2L, 1L, 1), (2L, 2L, 2),
      (9L, 1L, 1),
    ).toDF("query_id", "doc_id", "rank")
    val qrels = Seq(
      (1L, 1L, 2), (1L, 2L, 1), (1L, 3L, 1),
      (2L, 77L, 1),
      (3L, 5L, 2),
    ).toDF("query_id", "doc_id", "rel")

    val m = Eval.rankingMetrics(run, qrels, 3)
      .orderBy("query_id")
      .as[(Long, Long, Double, Double, Double)]
      .collect()
    assert(m.map(_._1).toSeq == Seq(1L, 2L, 3L)) // q9 unjudged -> excluded

    val (q1, q2, q3) = (m(0), m(1), m(2))
    assert(q1._2 == 3L && math.abs(q1._3 - 2.0 / 3.0) < 1e-12)
    assert(math.abs(q1._4 - 0.5) < 1e-12) // first relevant at rank 2
    val dcg  = 3.0 / log2(3.0) + 1.0 / log2(4.0)
    val idcg = 3.0 / log2(2.0) + 1.0 / log2(3.0) + 1.0 / log2(4.0)
    assert(math.abs(q1._5 - dcg / idcg) < 1e-12)

    assert(q2 == ((2L, 1L, 0.0, 0.0, 0.0)))
    assert(q3 == ((3L, 1L, 0.0, 0.0, 0.0)))
  }

  test("rank cap: hits beyond k contribute nothing") {
    val run   = Seq((1L, 1L, 1), (1L, 2L, 5)).toDF("query_id", "doc_id", "rank")
    val qrels = Seq((1L, 1L, 1), (1L, 2L, 1)).toDF("query_id", "doc_id", "rel")
    val row = Eval.rankingMetrics(run, qrels, 3)
      .as[(Long, Long, Double, Double, Double)].head()
    assert(math.abs(row._3 - 0.5) < 1e-12) // d2 at rank 5 is outside k=3
    assert(row._4 == 1.0)
  }

  test("property: a run that ranks by grade is perfect (recall 1 within k, RR 1, nDCG 1); metrics stay in [0,1]") {
    // 30 queries, each with 1..5 graded docs; the run presents them
    // best-grade-first — the ideal ordering by construction
    val qrels = (1 to 30).flatMap { q =>
      (0 until (q % 5 + 1)).map(i => (q.toLong, (q * 100 + i).toLong, 3 - (i % 3)))
    }
    val run = qrels.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      rows.sortBy(r => (-r._3, r._2)).zipWithIndex.map { case ((q, d, _), i) => (q, d, i + 1) }
    }
    val m = Eval.rankingMetrics(
      run.toDF("query_id", "doc_id", "rank"),
      qrels.toDF("query_id", "doc_id", "rel"), 10)
      .as[(Long, Long, Double, Double, Double)].collect()
    assert(m.length == 30)
    for ((q, nRel, rec, rr, ndcg) <- m) {
      assert(rec == 1.0, s"q$q recall")   // every query has <= 5 relevant, k = 10
      assert(rr == 1.0, s"q$q rr")        // best doc first
      assert(math.abs(ndcg - 1.0) < 1e-12, s"q$q ndcg: $ndcg")
      assert(nRel >= 1 && rec >= 0 && rec <= 1 && rr >= 0 && rr <= 1 && ndcg <= 1 + 1e-12)
    }
  }

  /** The duplicate guards are INLINE raise_error expressions (no eager
    * validation scans), so they surface at materialization wrapped in
    * Spark's task-failure chain.
    */
  private def chainOf(e: Throwable): String =
    Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
      .map(t => String.valueOf(t.getMessage)).mkString(" | ")

  test("duplicate (query, doc) judgments are rejected") {
    val run   = Seq((1L, 1L, 1)).toDF("query_id", "doc_id", "rank")
    val qrels = Seq((1L, 1L, 1), (1L, 1L, 2)).toDF("query_id", "doc_id", "rel")
    val e = intercept[Exception](Eval.rankingMetrics(run, qrels, 3).collect())
    assert(chainOf(e).contains("duplicate"), chainOf(e))
    // two grade-0 rows for one (q, d) are still conflicting judgments
    val qrels0 = Seq((1L, 1L, 0), (1L, 1L, 0), (1L, 1L, 1)).toDF("query_id", "doc_id", "rel")
    val e0 = intercept[Exception](Eval.rankingMetrics(run, qrels0, 3).collect())
    assert(chainOf(e0).contains("duplicate"), chainOf(e0))
  }

  test("duplicate (query, doc) rows in the run top-k are rejected; past-k duplicates are not") {
    val qrels = Seq((1L, 1L, 1)).toDF("query_id", "doc_id", "rel")
    val dup   = Seq((1L, 1L, 1), (1L, 1L, 2)).toDF("query_id", "doc_id", "rank")
    val e = intercept[Exception](Eval.rankingMetrics(dup, qrels, 3).collect())
    assert(chainOf(e).contains("run top-"), chainOf(e))
    // the duplicate sits past the rank cap: no metric can see it
    val ok = Seq((1L, 1L, 1), (1L, 1L, 9)).toDF("query_id", "doc_id", "rank")
    val m = Eval.rankingMetrics(ok, qrels, 3)
      .select("recall_at_k", "rr_at_k").as[(Double, Double)].head()
    assert(m == ((1.0, 1.0)))
  }

  /** Replicates the operator's portable permutation mixer (31-bit
    * xorshift-multiply) for the hand-computed sign-test cases below.
    */
  private def sign(qid: Long, j: Long, perms: Long = 256L): Long = {
    var x = (qid * perms + j) & 0x7FFFFFFFL
    x ^= x >> 16; x = (x * 73244475L) & 0x7FFFFFFFL
    x ^= x >> 16; x = (x * 73244475L) & 0x7FFFFFFFL
    x ^= x >> 16
    if (x % 2 == 0) 1L else -1L
  }

  test("pairedSignificance: identical systems give p = 1.0 (every permutation ties T_obs = 0)") {
    val per = (0 until 8).map(q => (q.toLong, 0.5 + q * 0.01, 0.5 + q * 0.01))
      .toDF("query_id", "a", "b")
    val r = Eval.pairedSignificance(per, "query_id", "a", "b", 256)
      .as[(Long, Long, Long, Long, Double)].head()
    assert(r == ((8L, 0L, 256L, 256L, 1.0)))
  }

  test("pairedSignificance: hand-replayed permutation distribution on known deltas") {
    // deltas in bp: treatment - baseline = (+100, +200, -50, +400)
    val per = Seq(
      (1L, 0.50, 0.51), (2L, 0.30, 0.32), (3L, 0.20, 0.195), (4L, 0.10, 0.14))
      .toDF("query_id", "a", "b")
    val deltas = Map(1L -> 100L, 2L -> 200L, 3L -> -50L, 4L -> 400L)
    val tObs = deltas.values.sum // 650
    val nExtreme = (1L to 256L).count { j =>
      math.abs(deltas.map { case (q, dl) => sign(q, j) * dl }.sum) >= math.abs(tObs)
    }.toLong
    val r = Eval.pairedSignificance(per, "query_id", "a", "b", 256)
      .as[(Long, Long, Long, Long, Double)].head()
    assert(r._1 == 4L && r._2 == tObs && r._3 == nExtreme && r._4 == 256L)
    assert(math.abs(r._5 - (nExtreme + 1.0) / 257.0) < 1e-12)
    // the schedule must actually flip signs: some permutation disagrees
    assert(nExtreme < 256L)
  }

  test("pairedSignificance: scale invariance — multiplying every delta by a constant keeps n_extreme and p") {
    // |T_j| >= |T_obs| is homogeneous in the deltas, so any positive
    // scaling of the per-query gaps must leave the decision unchanged
    val base = Seq((1L, 0.10, 0.13), (2L, 0.20, 0.26), (3L, 0.40, 0.38), (4L, 0.50, 0.59))
    def run(scale: Double) = Eval.pairedSignificance(
      base.map { case (q, a, b) => (q, a * scale, (a + (b - a)) * scale) }
        .toDF("query_id", "a", "b"), "query_id", "a", "b", 128)
      .select("n_extreme", "p_value").as[(Long, Double)].head()
    // 2x scaling doubles every basis-point delta exactly (the bp values
    // stay integral), so the permutation decision is identical
    assert(run(1.0) == run(2.0))
  }

  test("pairedSignificance qid stage is distributed: 1e5-row delta table sorts across >1 task, qids are exact ranks") {
    val n = 100000
    val per = spark.range(0, n).selectExpr(
      // scrambled keys so rank != arrival order
      "cast(id * 48271 % 100003 as long) as query_id",
      "0.5 as a", "cast(0.5 + (id % 7) * 0.001 as double) as b")
    // AQE rightly coalesces a few-MB range exchange to one partition —
    // switch coalescing off so the probe sees the sort's native
    // parallelism (what a 10^6-topic table would keep at scale)
    val key = "spark.sql.adaptive.coalescePartitions.enabled"
    val prev = spark.conf.get(key)
    val parts = try {
      spark.conf.set(key, "false")
      Eval.deltaQids(per, "query_id", "a", "b", 256).rdd.getNumPartitions
    } finally spark.conf.set(key, prev)
    assert(parts > 1, s"qid assignment must not funnel through one task: $parts partitions")
    val d = Eval.deltaQids(per, "query_id", "a", "b", 256)
    val rows = d.orderBy("__qid").as[(Long, Long)].collect()
    assert(rows.length == n)
    assert(rows.head._1 == 1L && rows.last._1 == n.toLong)
    assert(rows.map(_._1).toSeq == (1L to n.toLong))
  }

  test("pairedSignificance qids match the rank-by-key contract on a small table") {
    val per = Seq((30L, 0.1, 0.2), (10L, 0.3, 0.25), (20L, 0.4, 0.4))
      .toDF("query_id", "a", "b")
    val got = Eval.deltaQids(per, "query_id", "a", "b", 256)
      .orderBy("__qid").as[(Long, Long)].collect().toSeq
    // ranks by key: 10 -> 1 (delta -500bp), 20 -> 2 (0), 30 -> 3 (+1000bp)
    assert(got == Seq((1L, -500L), (2L, 0L), (3L, 1000L)))
  }

  test("pairedSignificance rejects a qid * permutations product past the 31-bit mix domain") {
    // P = 2^20 caps injective qids at (2^31 - 1 - P) / P = 2046 — 3000
    // queries must fail loud instead of silently correlating schedules
    val per = spark.range(0, 3000).selectExpr(
      "id as query_id", "0.5 as a", "0.6 as b")
    val e = intercept[Exception] {
      Eval.deltaQids(per, "query_id", "a", "b", 1 << 20).collect()
    }
    val chain = Iterator.iterate[Throwable](e)(_.getCause).takeWhile(_ != null)
      .map(t => String.valueOf(t.getMessage)).mkString(" | ")
    assert(chain.contains("injective"), s"expected the injectivity guard, got: $chain")
  }

  test("calibrationBins: hand-computed bins, edge scores, ECE/MCE weighting, range guard") {
    // bin 0 (scores .0x): 2 rows, mean .05, 0 positives -> gap .05
    // bin 5 (.55, .55):   2 rows, both positive        -> gap .45
    // bin 9: score 1.0 lands in the LAST bin (least-clamp), gap 0
    val scored = Seq(
      (0.04, 0), (0.06, 0),
      (0.55, 1), (0.55, 1),
      (1.00, 1),
    ).toDF("score", "label")
    val bins = Eval.calibrationBins(scored, "score", "label", 10)
      .orderBy("bin")
      .as[(Long, Long, Double, Double, Double)].collect().toSeq
    assert(bins.map(b => (b._1, b._2)) == Seq((0L, 2L), (5L, 2L), (9L, 1L)))
    val byBin = bins.map(b => b._1 -> b).toMap
    assert(math.abs(byBin(0L)._3 - 0.05) < 1e-12 && byBin(0L)._4 == 0.0)
    assert(math.abs(byBin(0L)._5 - 0.05) < 1e-12)
    assert(math.abs(byBin(5L)._5 - 0.45) < 1e-12)
    assert(byBin(9L)._3 == 1.0 && byBin(9L)._4 == 1.0 && byBin(9L)._5 == 0.0)
    // ECE = (2*.05 + 2*.45 + 1*0) / 5 = 0.2 ; MCE = .45
    val (n, ece, mce) = Eval.calibrationSummary(
      Eval.calibrationBins(scored, "score", "label", 10))
      .as[(Long, Double, Double)].head()
    assert(n == 5L && math.abs(ece - 0.2) < 1e-12 && math.abs(mce - 0.45) < 1e-12)
    // out-of-range scores fail loudly (inline, at materialization)
    val e = intercept[Exception](
      Eval.calibrationBins(Seq((1.2, 1)).toDF("score", "label"), "score", "label", 10).collect())
    assert(chainOf(e).contains("[0,1]"), chainOf(e))
  }

  test("pairedSignificance: deterministic across runs, duplicate query keys rejected") {
    val per = Seq((1L, 0.1, 0.9), (2L, 0.2, 0.8), (3L, 0.3, 0.7)).toDF("query_id", "a", "b")
    val r1 = Eval.pairedSignificance(per, "query_id", "a", "b").collect().toSeq
    val r2 = Eval.pairedSignificance(per, "query_id", "a", "b").collect().toSeq
    assert(r1 == r2)
    val dup = Seq((1L, 0.1, 0.9), (1L, 0.2, 0.8)).toDF("query_id", "a", "b")
    val e = intercept[Exception](
      Eval.pairedSignificance(dup, "query_id", "a", "b").collect())
    assert(chainOf(e).contains("duplicate"), chainOf(e))
  }
}
