package graft

import graft.operators.{Ml, Umap}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** From-scratch UMAP (the reference's M5: umap.UMAP(n_components=3,
  * random_state=42), dimensionality_reduction.py:101-105): determinism,
  * curve-fit parity with umap-learn's published defaults, cluster
  * separation, neighborhood preservation, and both reducer paths.
  */
class UmapSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def blob(c: Array[Double], n: Int, sigma: Double, seed: Long): Seq[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(n)(c.map(_ + rnd.nextGaussian() * sigma))
  }

  private def dist(a: Array[Double], b: Array[Double]): Double =
    math.sqrt(a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum)

  test("(a, b) curve fit lands on umap-learn's published defaults for min_dist=0.1") {
    // umap-learn's find_ab_params(1.0, 0.1) ≈ (1.577, 0.895)
    val (a, b) = Umap.fitAb(0.1, 1.0)
    assert(math.abs(a - 1.577) < 0.12, s"a=$a")
    assert(math.abs(b - 0.895) < 0.05, s"b=$b")
  }

  test("fit is deterministic for a fixed seed and input order") {
    val pts = (blob(Array.fill(8)(0.0), 60, 1.0, 11) ++ blob(Array.fill(8)(20.0), 60, 1.0, 12)).toArray
    val e1  = Umap.fit(pts)
    val e2  = Umap.fit(pts)
    assert(e1.zip(e2).forall { case (u, v) => u.sameElements(v) })
  }

  test("well-separated blobs stay separated, and original-space neighbors stay close") {
    val a   = blob(Array.fill(16)(0.0), 70, 0.8, 21)
    val b   = blob(Array.fill(16)(25.0), 70, 0.8, 22)
    val pts = (a ++ b).toArray
    val emb = Umap.fit(pts)
    assert(emb.length == 140 && emb.forall(e => e.length == 3 && e.forall(v => !v.isNaN && !v.isInfinity)))
    val (ea, eb)  = emb.splitAt(70)
    def mean(vs: Seq[Array[Double]]) = Array.tabulate(3)(d => vs.map(_(d)).sum / vs.length)
    val (ca, cb)  = (mean(ea.toSeq), mean(eb.toSeq))
    val spreadA   = ea.map(dist(_, ca)).sum / ea.length
    val spreadB   = eb.map(dist(_, cb)).sum / eb.length
    val centreGap = dist(ca, cb)
    assert(centreGap > 2.0 * (spreadA + spreadB),
      s"blobs must separate: gap=$centreGap spreads=$spreadA/$spreadB")

    // neighborhood preservation: each point's original-space 5-NN must sit
    // closer in the layout than the average same-layout pair
    val n = pts.length
    var nnSum = 0.0; var nnCnt = 0
    var allSum = 0.0; var allCnt = 0
    for (i <- 0 until n) {
      val order = (0 until n).filter(_ != i).sortBy(j => (dist(pts(i), pts(j)), j))
      order.take(5).foreach { j => nnSum += dist(emb(i), emb(j)); nnCnt += 1 }
      order.foreach { j => allSum += dist(emb(i), emb(j)); allCnt += 1 }
    }
    assert(nnSum / nnCnt < 0.4 * (allSum / allCnt),
      s"5-NN pairs must be pulled together: ${nnSum / nnCnt} vs ${allSum / allCnt}")
  }

  test("transform places new points near their original-space neighborhood") {
    val a     = blob(Array.fill(12)(0.0), 60, 0.7, 31)
    val b     = blob(Array.fill(12)(18.0), 60, 0.7, 32)
    val model = Umap.fitModel((a ++ b).toArray)
    val (ea, eb) = model.embedding.splitAt(60)
    def mean(vs: Seq[Array[Double]]) = Array.tabulate(3)(d => vs.map(_(d)).sum / vs.length)
    val (ca, cb) = (mean(ea.toSeq), mean(eb.toSeq))
    val newA = Umap.transform(model, Array.fill(12)(0.3))
    val newB = Umap.transform(model, Array.fill(12)(17.7))
    assert(dist(newA, ca) < dist(newA, cb), "new A-side point must land on A's side")
    assert(dist(newB, cb) < dist(newB, ca), "new B-side point must land on B's side")
  }

  test("UmapReducer: driver path and over-cap sampled path both place every row, 3-D, finite") {
    val pts = (blob(Array.fill(6)(0.0), 50, 0.6, 41) ++ blob(Array.fill(6)(15.0), 50, 0.6, 42))
    val df  = pts.zipWithIndex.map { case (v, i) => (i.toLong, v.toSeq) }.toDF("vec_id", "embedding")
    for (cap <- Seq(4096, 40)) { // 40 < 100 rows forces the sampled+transform path
      val out  = new Ml.UmapReducer(maxFitRows = cap).project(df, "embedding", "vec_id")
      val rows = out.collect()
      assert(rows.length == 100, s"cap=$cap")
      assert(rows.map(_.getLong(0)).toSet == (0L until 100L).toSet, s"cap=$cap: every id exactly once")
      assert(rows.forall(r => (1 to 3).forall(i => !r.getDouble(i).isNaN && !r.getDouble(i).isInfinity)))
    }
  }

  test("reducerFor keeps the reference's fallback semantics; binding umap engages the real reducer") {
    assert(Ml.reducerFor("umap").name == "pca") // unbound → the reference's shipped fallback
    assert(Ml.reducerFor("umap", Some(new Ml.UmapReducer())).name == "umap")
    assert(Ml.reducerFor("nonsense").name == "pca")
  }

  test("tiny inputs (n < 3) take the PCA zero-pad path instead of a degenerate graph") {
    val df  = Seq((0L, Seq(1.0, 2.0, 3.0, 4.0)), (1L, Seq(4.0, 3.0, 2.0, 1.0))).toDF("vec_id", "embedding")
    val out = new Ml.UmapReducer().project(df, "embedding", "vec_id").orderBy("vec_id").collect()
    assert(out.length == 2)
    // n=2 → 2 real components max, z zero-padded (the reference's rule)
    assert(out.forall(_.getDouble(3) == 0.0))
  }
}
