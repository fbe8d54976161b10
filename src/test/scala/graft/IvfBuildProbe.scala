package graft

import org.apache.spark.sql.functions._
import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import graft.operators.{Ivf, Search}

/** Dev probe: IVF build-cost experiment at the reference's 768-d shape.
  * Compares kmeans|| default init vs random init with capped iterations on
  * fit time, recall@10 over 20 queries, and list-size balance.
  */
object IvfBuildProbe {
  def main(args: Array[String]): Unit = {
    val spark = Engine.session("ivf-build-probe")
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val root = sys.props("java.io.tmpdir") + "/graft-scale"
    val vecs = spark.read.parquet(s"$root/d768-s1/embeddings")
    val nList = 158; val nProbe = 15; val k = 10
    val queries = vecs.where(col("vec_id") % 100 === 7).select("vec_id", "embedding")
      .limit(20).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1)))
    val exact: Map[Long, Set[Long]] = queries.map { case (qid, qv) =>
      qid -> Search.topK(vecs, "embedding", "vec_id", qv, k).select("vec_id").as[Long].collect().toSet
    }.toMap
    val withVec = vecs.withColumn("__v", array_to_vector(col("embedding").cast("array<double>")))
    val total = withVec.count()
    val frac = math.min(1.0, (256.0 * nList) / total)
    val fitInput = if (frac >= 1.0) withVec else withVec.sample(withReplacement = false, frac, 42)
    fitInput.cache().count()
    for ((tag, km) <- Seq(
      "kmeans||-default" -> new KMeans().setK(nList).setSeed(42).setFeaturesCol("__v").setPredictionCol("list_id"),
      "random-15iter"    -> new KMeans().setK(nList).setSeed(42).setFeaturesCol("__v").setPredictionCol("list_id").setInitMode("random").setMaxIter(15),
      "kmeans||-10iter"  -> new KMeans().setK(nList).setSeed(42).setFeaturesCol("__v").setPredictionCol("list_id").setMaxIter(10),
      "kmeans||-5iter"   -> new KMeans().setK(nList).setSeed(42).setFeaturesCol("__v").setPredictionCol("list_id").setMaxIter(5),
    )) {
      val t0 = System.nanoTime()
      val model = km.fit(fitInput)
      val fitS = (System.nanoTime() - t0) / 1e9
      val m = Ivf.Model(model.clusterCenters.map(_.toArray))
      val assigned = model.transform(withVec).drop("__v").cache()
      assigned.count()
      val sizes = assigned.groupBy("list_id").count().select("count").as[Long].collect()
      val maxOverMean = sizes.max.toDouble / (sizes.sum.toDouble / sizes.length)
      var hits = 0
      for ((qid, qv) <- queries) {
        val lists = m.probeLists(qv, nProbe)
        hits += Search.topK(assigned.where(col("list_id").isin(lists: _*)), "embedding", "vec_id", qv, k)
          .select("vec_id").as[Long].collect().count(exact(qid))
      }
      assigned.unpersist()
      println(f"[ivfbuild] $tag%-18s fit=${fitS}%5.1f s recall@10=${hits.toDouble / (queries.length * k)}%.3f lists=${sizes.length} max/mean=${maxOverMean}%.2f")
    }
    spark.stop()
  }
}
