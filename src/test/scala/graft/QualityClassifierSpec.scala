package graft

import graft.operators.QualityClassifier
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Discriminative quality filter: separable vocabularies must separate,
  * scores are probabilities, the AUC identity is correct on a known case.
  */
class QualityClassifierSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Two token distributions: "curated" docs draw from vocab A+shared,
    * "raw" from vocab B+shared — separable but overlapping.
    */
  private lazy val corpus = (0 until 600).map { i =>
    val label  = i % 3 == 0
    val vocab  = if (label) Seq("insight", "method", "evidence", "study") else Seq("click", "cheap", "buy", "offer")
    val shared = Seq("the", "data", "spark", "row")
    val words  = (0 until 30).map { j =>
      val pool = if (j % 2 == 0) vocab else shared
      // well-mixed deterministic pick — a linear (i, j) formula couples word
      // choice to id parity, which made the id-parity train/eval split see
      // DISJOINT vocabularies (constant scores, AUC 0.5)
      pool(math.floorMod(scala.util.hashing.MurmurHash3.stringHash(s"$i:$j"), pool.length))
    }
    (i.toLong, words.mkString(" "), if (label) 1 else 0)
  }.toDF("id", "text", "label")

  test("separable vocabularies give AUC >= 0.95 on held-out docs") {
    val train = corpus.where(col("id") % 2 === 0)
    val eval  = corpus.where(col("id") % 2 === 1)
    val t      = QualityClassifier.train(train, "text", "label")
    val scored = QualityClassifier.score(t, eval, "text")
    val row = QualityClassifier.auc(scored, "label", "quality_score").collect().head
    assert(row.getAs[Double]("auc") >= 0.95, s"auc ${row.getAs[Double]("auc")}")
    assert(row.getAs[Long]("n_pos") + row.getAs[Long]("n_neg") == 300)
  }

  test("scores are probabilities and input columns survive") {
    val t      = QualityClassifier.train(corpus, "text", "label")
    val scored = QualityClassifier.score(t, corpus, "text")
    assert(scored.columns.toSet == Set("id", "text", "label", "quality_score"))
    val mm = scored.agg(min("quality_score"), max("quality_score")).collect().head
    assert(mm.getDouble(0) >= 0.0 && mm.getDouble(1) <= 1.0)
  }

  test("auc identity: a perfect scorer gives 1.0, an inverted scorer 0.0") {
    val df = Seq((1.0, 1), (0.9, 1), (0.2, 0), (0.1, 0)).toDF("s", "y")
    assert(QualityClassifier.auc(df, "y", "s").collect().head.getAs[Double]("auc") == 1.0)
    val inv = Seq((0.1, 1), (0.2, 1), (0.9, 0), (1.0, 0)).toDF("s", "y")
    assert(QualityClassifier.auc(inv, "y", "s").collect().head.getAs[Double]("auc") == 0.0)
  }

  test("auc midrank tie contract: tied scores contribute the mean of the ranks they span") {
    // scores: 0.1(y=0), 0.5(y=0), 0.5(y=1), 0.5(y=1), 0.9(y=1)
    // midranks: 0.1→1; the 0.5 group spans ranks 2-4 → midrank 3; 0.9→5
    // R+ = 3 + 3 + 5 = 11; AUC = (11 − 3·4/2) / (3·2) = 5/6
    val df = Seq((0.1, 0), (0.5, 0), (0.5, 1), (0.5, 1), (0.9, 1)).toDF("s", "y")
    val r  = QualityClassifier.auc(df, "y", "s").collect().head
    assert(math.abs(r.getAs[Double]("auc") - 5.0 / 6.0) < 1e-12, r.toString)
    assert(r.getAs[Long]("n_pos") == 3 && r.getAs[Long]("n_neg") == 2)
    // all-tied scores = coin flip: AUC exactly 0.5
    val flat = Seq((0.7, 1), (0.7, 0), (0.7, 1), (0.7, 0)).toDF("s", "y")
    assert(QualityClassifier.auc(flat, "y", "s").collect().head.getAs[Double]("auc") == 0.5)
    // degenerate single-class input: AUC undefined → null, counts exact
    val onec = Seq((0.3, 1), (0.8, 1)).toDF("s", "y")
    val or   = QualityClassifier.auc(onec, "y", "s").collect().head
    assert(or.isNullAt(or.fieldIndex("auc")) && or.getAs[Long]("n_neg") == 0)
  }

  test("auc is distributed: 1e5-row scored frame spans >1 task and matches the local rank-sum") {
    // deterministic synthetic with heavy ties (1000 distinct scores) —
    // the shape that must NOT funnel through one single-partition window
    val n = 100000
    val rows = spark.range(n.toLong).select(
      (pmod(col("id") * 2654435761L, lit(100000L)).cast("double") / 100.0).cast("double").as("bucketed"),
      col("id"))
      .select((floor(col("bucketed")).cast("double") / 1000.0).as("s"),
        (pmod(col("id") * 48271L, lit(997L)) <
          (floor(col("bucketed")) + lit(200.0)).cast("long")).cast("int").as("y"),
        col("id"))
    val local = rows.select("s", "y").as[(Double, Int)].collect()
    // local midrank rank-sum replay
    val byScore = local.groupBy(_._1).toSeq.sortBy(_._1)
    var cumb = 0.0; var rpos = 0.0
    val npos = local.count(_._2 == 1).toDouble
    byScore.foreach { case (_, g) =>
      val c = g.length.toDouble
      rpos += g.count(_._2 == 1) * (cumb + (c + 1.0) / 2.0)
      cumb += c
    }
    val want = (rpos - npos * (npos + 1.0) / 2.0) / (npos * (n - npos))
    val r = QualityClassifier.auc(rows, "y", "s").collect().head
    assert(math.abs(r.getAs[Double]("auc") - want) < 1e-9,
      s"got ${r.getAs[Double]("auc")} want $want")
    assert(r.getAs[Long]("n_pos") == npos.toLong)
    // cross-partition offset math: with AQE's small-exchange coalescing off
    // the histogram genuinely spans several range partitions, and the
    // per-partition prefix offsets must still land on the exact rank-sum
    val coalesceKey = "spark.sql.adaptive.coalescePartitions.enabled"
    val prev = spark.conf.get(coalesceKey)
    try {
      spark.conf.set(coalesceKey, "false")
      val r2 = QualityClassifier.auc(rows, "y", "s").collect().head
      assert(math.abs(r2.getAs[Double]("auc") - want) < 1e-9,
        s"multi-partition got ${r2.getAs[Double]("auc")} want $want")
    } finally spark.conf.set(coalesceKey, prev)
  }

  test("reserved-column guard") {
    val bad = corpus.withColumn("__features", lit(1))
    intercept[IllegalArgumentException] {
      QualityClassifier.train(bad, "text", "label")
    }
  }
}
