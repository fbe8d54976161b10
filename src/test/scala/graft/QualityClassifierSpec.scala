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

  test("reserved-column guard") {
    val bad = corpus.withColumn("__features", lit(1))
    intercept[IllegalArgumentException] {
      QualityClassifier.train(bad, "text", "label")
    }
  }
}
