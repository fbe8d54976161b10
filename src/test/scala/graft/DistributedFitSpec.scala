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

  test("Ivf.assign over budget fits via MLlib KMeans and lists every row") {
    val (assigned, model) = Ivf.assign(df, "vec", 4, maxDriverFitBytes = 1L)
    assert(model.centroids.length == 4)
    val lists = assigned.select("list_id").as[Int].collect().toSeq
    assert(lists.size == 60 && lists.forall(l => l >= 0 && l < 4))
  }
}
