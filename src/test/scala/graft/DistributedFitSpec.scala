package graft

import graft.operators.{Embedder, Ivf, Ml}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The distributed (MLlib) fit branches are the ones that actually run at
  * 100 TB, but every test corpus fits the default 64 MB driver budget and
  * would exercise only the driver-fit branch — so these tests force the
  * budget to 1 byte and drive the MLlib paths end-to-end.
  */
class DistributedFitSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val df =
    (0L until 60L).map(i => (i, Embedder.default.embed(s"point $i group ${i % 3}"))).toDF("id", "vec")

  test("KMeansClusterer over budget falls back to MLlib with the same label contract") {
    val labels = new Ml.KMeansClusterer(3, maxDriverFitBytes = 1L).cluster(df, "vec", "id")
      .select("label").as[Int].collect().toSeq
    assert(labels.size == 60)
    assert(labels.forall(l => l == -1 || (l >= 0 && l < 3)))
    assert(labels.exists(_ != -1))
  }

  test("pca3d over budget fits via MLlib and emits finite 3-D coords") {
    val out = Ml.pca3d(df, "vec", "id", maxDriverFitBytes = 1L)
      .as[(Long, Double, Double, Double)].collect().toSeq
    assert(out.size == 60)
    assert(out.forall { case (_, x, y, z) =>
      java.lang.Double.isFinite(x) && java.lang.Double.isFinite(y) && java.lang.Double.isFinite(z)
    })
    assert(out.map(_._2).distinct.size > 1) // first component actually varies
  }

  test("pcaProject over budget fits via MLlib and projects the apply set") {
    val out = Ml.pcaProject(df, df.where(col("id") < 7), "vec", "id", maxDriverFitBytes = 1L)
      .as[(Long, Double, Double, Double)].collect().toSeq
    assert(out.size == 7)
  }

  test("fit-path crossover is dim-aware: same rows + same byte budget, 768-d flips to MLlib") {
    // 600 rows under a 1 MB budget: 64-d = 307 KB (driver fit), 768-d =
    // 3.7 MB (distributed fit). The budget bounds BYTES, not rows — the
    // 768-d corpus must flip ~12x earlier. Path observed from the plan:
    // the driver path assigns from a collected LocalRelation; the MLlib
    // path projects the model's __pca / __label columns.
    val budget = 1L << 20
    def vecDf(dim: Int) = (0L until 600L)
      .map(i => (i, Array.tabulate(dim)(j => math.sin(i * dim + j))))
      .toDF("id", "vec")
    val p64 = Ml.pca3d(vecDf(64), "vec", "id", maxDriverFitBytes = budget)
      .queryExecution.analyzed.toString
    assert(!p64.contains("__pca"), "64-d within budget must take the driver eigSym fit")
    val p768 = Ml.pca3d(vecDf(768), "vec", "id", maxDriverFitBytes = budget)
      .queryExecution.analyzed.toString
    assert(p768.contains("__pca"), "768-d over budget must take the MLlib fit")

    // the MLlib branch scores distance-to-centroid as a __dist column; the
    // driver branch ships finished (id, label) rows and has no such column
    val k64 = new Ml.KMeansClusterer(3, maxDriverFitBytes = budget)
      .cluster(vecDf(64), "vec", "id").queryExecution.analyzed.toString
    assert(!k64.contains("__dist"), "64-d within budget must assign from the driver fit")
    val k768 = new Ml.KMeansClusterer(3, maxDriverFitBytes = budget)
      .cluster(vecDf(768), "vec", "id").queryExecution.analyzed.toString
    assert(k768.contains("__dist") && k768.contains("__label"),
      "768-d over budget must assign via the MLlib model")
  }

  test("Ivf.assign over budget fits via MLlib KMeans and lists every row") {
    val (assigned, model) = Ivf.assign(df, "vec", 4, maxDriverFitBytes = 1L)
    assert(model.centroids.length == 4)
    val lists = assigned.select("list_id").as[Int].collect().toSeq
    assert(lists.size == 60 && lists.forall(l => l >= 0 && l < 4))
  }
}
