package graft

import graft.operators.{Hdbscan, Ml}
import org.scalatest.funsuite.AnyFunSuite

/** HDBSCAN-star EoM semantics (the reference's clustering.py:50-60 contract):
  * density clusters with variable density, scattered points as −1 noise,
  * small inputs all-noise, input-order invariance.
  */
class HdbscanSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def blob(cx: Double, cy: Double, n: Int, sigma: Double, seed: Long): Seq[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(n)(Array(cx + rnd.nextGaussian() * sigma, cy + rnd.nextGaussian() * sigma))
  }

  test("two blobs + scattered far points: blobs cluster whole, stragglers are noise") {
    // 4 stragglers: below min_cluster_size, no subset of them can form a
    // cluster in ANY density regime — they must come out −1
    val a     = blob(0, 0, 40, 0.5, 1)
    val b     = blob(30, 0, 40, 0.5, 2)
    val noise = (0 until 4).map(i => Array(200.0 + 40 * i, -150.0 - 35 * i))
    val pts   = (a ++ b ++ noise).toArray
    val labels = Hdbscan.fit(pts, minClusterSize = 5, minSamples = 3)
    val la = labels.slice(0, 40).toSet
    val lb = labels.slice(40, 80).toSet
    assert(la.size == 1 && la.head != -1, s"blob A must be one cluster: $la")
    assert(lb.size == 1 && lb.head != -1, s"blob B must be one cluster: $lb")
    assert(la != lb, "blobs must be distinct clusters")
    assert(labels.drop(80).forall(_ == -1), "sub-min_cluster_size stragglers must be noise")

    // ...but FIVE mutually-cohesive stragglers reach min_cluster_size and
    // become a (sparse) cluster of their own — genuine HDBSCAN semantics,
    // where density is relative, not a centroid-distance noise cut
    val five   = (0 until 5).map(i => Array(200.0 + 40 * i, -150.0 - 35 * i))
    val labels5 = Hdbscan.fit((a ++ b ++ five).toArray, 5, 3)
    val lf = labels5.drop(80).toSet
    assert(lf.size == 1 && lf.head != -1, s"five cohesive stragglers form their own cluster: $lf")
  }

  test("variable density: EoM keeps both a tight and a loose cluster") {
    val tight = blob(0, 0, 50, 0.2, 3)
    val loose = blob(100, 100, 50, 3.0, 4)
    val labels = Hdbscan.fit((tight ++ loose).toArray, 5, 3)
    val lt = labels.take(50).filter(_ != -1).toSet
    val ll = labels.drop(50).filter(_ != -1).toSet
    assert(lt.size == 1 && ll.size == 1 && lt != ll,
      s"both density regimes must form clusters: tight=$lt loose=$ll")
    // variable density is the reference's stated reason for EoM — the loose
    // blob must survive selection, not dissolve into noise
    assert(labels.drop(50).count(_ != -1) >= 40)
  }

  test("adaptive min_cluster_size matches the reference's thresholds (main.py:795-801)") {
    import graft.operators.Ml.HdbscanClusterer.adaptiveMinClusterSize
    assert(adaptiveMinClusterSize(0) == 3 && adaptiveMinClusterSize(49) == 3)
    assert(adaptiveMinClusterSize(50) == 5 && adaptiveMinClusterSize(199) == 5)
    assert(adaptiveMinClusterSize(200) == 10 && adaptiveMinClusterSize(1000000) == 10)
  }

  test("fewer points than minClusterSize: all noise (reference early return)") {
    assert(Hdbscan.fit(blob(0, 0, 4, 0.5, 5).toArray, 5, 3).toSeq == Seq(-1, -1, -1, -1))
    assert(Hdbscan.fit(Array.empty[Array[Double]], 5, 3).isEmpty)
  }

  test("input order does not change the partition") {
    val pts = (blob(0, 0, 30, 0.5, 6) ++ blob(20, 20, 30, 0.5, 7) ++
      Seq(Array(500.0, 500.0))).toArray
    val base = Hdbscan.fit(pts, 5, 3)
    val perm = scala.util.Random.javaRandomToRandom(new java.util.Random(42)).shuffle(pts.indices.toList)
    val shuffled = perm.map(pts).toArray
    val got = Hdbscan.fit(shuffled, 5, 3)
    // compare as partitions over point identity (labels may renumber)
    def groups(labels: Array[Int], order: Seq[Int]) =
      order.zip(labels).filter(_._2 != -1).groupBy(_._2).values.map(_.map(_._1).toSet).toSet
    assert(groups(got, perm) == groups(base, pts.indices))
    assert(perm.zip(got).filter(_._2 == -1).map(_._1).toSet ==
      pts.indices.zip(base).filter(_._2 == -1).map(_._1).toSet)
  }

  test("HdbscanClusterer: exact path matches direct fit; over-cap path assigns blob-consistently") {
    val pts = blob(0, 0, 30, 0.5, 8) ++ blob(25, 0, 30, 0.5, 9)
    val df  = pts.zipWithIndex.map { case (p, i) => (i.toLong, p.toSeq) }.toDF("pid", "vec")
    val direct = Hdbscan.fit(pts.toArray, 5, 3)
    val got = new Ml.HdbscanClusterer(5, 3).cluster(df, "vec", "pid")
      .as[(Long, Int)].collect().sortBy(_._1).map(_._2)
    assert(got.toSeq == direct.toSeq)

    // over the row cap: sampled fit + nearest-fitted-point assignment must
    // still label each blob homogeneously and keep the blobs distinct
    val capped = new Ml.HdbscanClusterer(5, 3, maxFitRows = 24).cluster(df, "vec", "pid")
      .as[(Long, Int)].collect().sortBy(_._1).map(_._2)
    val ca = capped.take(30).filter(_ != -1).toSet
    val cb = capped.drop(30).filter(_ != -1).toSet
    assert(ca.size == 1 && cb.size == 1 && ca != cb, s"sampled path: a=$ca b=$cb")
  }
}
