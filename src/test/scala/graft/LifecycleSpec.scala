package graft

import graft.operators._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The reference's three canonical flows (SURVEY §3) chained end-to-end over
  * one chunks table, exactly as a user of the reference would drive them:
  * upload (extract→chunk→embed→upsert) → search → cluster job
  * (cluster→name→write-back) → filtered search → delete by document →
  * re-search. Asserts cross-flow consistency, not just per-operator output.
  */
class LifecycleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("upload -> search -> cluster+name -> filtered search -> delete -> re-search") {
    // -- upload (§3.2): 3 docs, 2 topics
    val docs = Seq(
      (1L, "Cats meow softly. Cats purr at night. Kittens chase cats around.", "en"),
      (2L, "Dogs bark loudly. Dogs chase balls. Puppies follow dogs everywhere.", "en"),
      (3L, "Query planners optimize joins. Indexes accelerate scans. Optimizers prune columns.", "en"),
    ).toDF("doc_id", "text", "lang")
    val chunked = Chunker.chunk(spark, docs).toDF()
    val chunks = Embedder.embedText(spark, chunked, "doc_id", "text").toDF()
      .select(col("id").as("doc_id"), col("text"), col("embedding"))
    assert(chunks.count() == 3)

    // -- search (§3.1): on-topic query hits the cat document
    val q    = Embedder.default.embed("cats purring and meowing").map(_.toDouble).toSeq
    val top1 = Search.topK(chunks, "embedding", "doc_id", q, 1).select("doc_id").as[Long].head()
    assert(top1 == 1L)

    // -- cluster job (§3.3): label + name + write-back in one lineage
    val named = Ml.clusterAndName(chunks, "embedding", "doc_id", "text", new Ml.KMeansClusterer(2, noiseQuantile = 1.0))
    assert(named.count() == 3)
    assert(named.select("cluster_name").as[String].collect().forall(_.nonEmpty))

    // -- filtered search (F4+V1 over the written-back table): restrict to
    //    the cat document's cluster and search an off-topic query — results
    //    must stay inside the cluster filter
    val catCluster = named.where(col("doc_id") === 1L).select("label").as[Int].head()
    val filtered = Search.topK(
      named, "embedding", "doc_id",
      Embedder.default.embed("databases and indexes").map(_.toDouble).toSeq,
      3, Seq(Filters.eq("label", catCluster)))
    assert(filtered.select("label").as[Int].collect().forall(_ == catCluster))

    // -- delete by predicate (S14) + re-search: doc 1 gone from results
    val afterDelete = Maintenance.deleteWhere(named, Filters.eq("doc_id", 1L))
    assert(afterDelete.count() == 2)
    val top1After = Search.topK(afterDelete, "embedding", "doc_id", q, 1).select("doc_id").as[Long].head()
    assert(top1After != 1L)

    // -- upsert (S11) brings a replacement doc back and it becomes findable
    val replacement = Embedder.embedText(
      spark,
      Chunker.chunk(spark, Seq((9L, "Cats meow and purr. Cats are quiet felines.", "en")).toDF("doc_id", "text", "lang")).toDF(),
      "doc_id", "text").toDF()
      .select(col("id").as("doc_id"), col("text"), col("embedding"))
      .withColumn("label", lit(catCluster)).withColumn("cluster_name", lit("Cats"))
    val restored = Maintenance.upsert(afterDelete, replacement, "doc_id")
    val top1Restored = Search.topK(restored, "embedding", "doc_id", q, 1).select("doc_id").as[Long].head()
    assert(top1Restored == 9L)
  }
}
