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

  test("incremental recrawl: diff -> delta re-embed -> selective IVF rewrite; maintained store == from-scratch rebuild") {
    val words = Seq("cats", "dogs", "planner", "index", "join", "scan", "purr", "bark", "optimizer", "prune",
      "shard", "vector", "crawl", "robots", "sitemap", "token", "quality", "dedup", "sketch", "stream")
    def text(i: Long, salt: String): String =
      (0 until 6).map(j => words(((i * 7 + j * 3 + salt.length) % words.length).toInt)).mkString(" ") + s" doc$i $salt"
    val oldDocs = (0L until 300L).map(i => (i, text(i, "v1"))).toDF("doc_id", "text")
    // planted recrawl (small vs nList=32, so most lists stay untouched):
    // remove %97==0, change %89==0 (unless removed), add 5 fresh ids
    val removedIds = (0L until 300L).filter(_ % 97 == 0)
    val changedIds = (0L until 300L).filter(i => i % 89 == 0 && i % 97 != 0)
    val addedIds   = (1000L until 1005L)
    val newDocs = (0L until 300L).filterNot(removedIds.contains)
      .map(i => (i, if (changedIds.contains(i)) text(i, "v2-updated") else text(i, "v1")))
      .++(addedIds.map(i => (i, text(i, "brand-new"))))
      .toDF("doc_id", "text")

    // existing state: embed the old snapshot, fit, write the sidecar'd store
    val dir  = java.nio.file.Files.createTempDirectory("recrawl").toString
    val path = s"$dir/store"
    val oldEmb = Embedder.embedText(spark, oldDocs, "doc_id", "text").toDF()
      .select(col("id").as("doc_id"), col("embedding"))
    val (assigned, model) = Ivf.assign(oldEmb, "embedding", 32)
    Ivf.writeIndexed(assigned, path, model, "embedding")

    // snapshot per-list files before the maintenance round
    def listFiles(): Map[String, Set[String]] =
      new java.io.File(path).listFiles().filter(_.getName.startsWith("list_id=")).map { d =>
        d.getName -> d.listFiles().filter(_.getName.endsWith(".parquet")).map(f => f.getName + ":" + f.lastModified).toSet
      }.toMap
    val before = listFiles()

    val (diff, nTouched) = Recrawl.maintainIvf(spark, path, oldDocs, newDocs, "doc_id", "text")
    // the diff reproduces the planted delta exactly
    val byStatus = diff.groupBy("status").count().as[(String, Long)].collect().toMap
    assert(byStatus("removed") == removedIds.size && byStatus("changed") == changedIds.size
      && byStatus("added") == addedIds.size, byStatus.toString)
    assert(nTouched >= 1 && nTouched <= 32)

    // probe-visible row set == the new snapshot, stale vectors replaced
    val store = spark.read.parquet(path)
    val storeIds = store.select("doc_id").as[Long].collect().toSet
    val expectIds = newDocs.select("doc_id").as[Long].collect().toSet
    assert(storeIds == expectIds, s"missing=${expectIds -- storeIds} extra=${storeIds -- expectIds}")
    val changedVec = store.where(col("doc_id") === changedIds.head).select("embedding")
      .as[Seq[Float]].head()
    assert(changedVec == Embedder.default.embed(text(changedIds.head, "v2-updated")).toSeq,
      "changed doc must carry its re-embedded vector, not the stale one")

    // untouched list partitions were neither rewritten nor re-dated
    val after = listFiles()
    val untouched = before.keySet.intersect(after.keySet).filter(k => before(k) == after(k))
    assert(untouched.nonEmpty, s"expected some untouched lists; before=${before.keySet} after=${after.keySet}")
    assert((32 - untouched.size) <= nTouched)

    // maintained store ≡ from-scratch rebuild: full-probe search over the
    // patched store equals brute-force exact top-k over a fresh embed of
    // the new snapshot (same row set AND same vectors ⇒ same ranking)
    val freshAll = Embedder.embedText(spark, newDocs, "doc_id", "text").toDF()
      .select(col("id").as("doc_id"), col("embedding"))
    for (probe <- Seq("cats purr join", "brand-new crawl vector", "optimizer prune scan")) {
      val qv = Embedder.default.embed(probe).map(_.toDouble).toSeq
      val got = Ivf.search(store, model, "embedding", "doc_id", qv, 5, nProbe = 32)
        .select("doc_id").as[Long].collect().toSeq
      val exact = Search.topK(freshAll, "embedding", "doc_id", qv, 5)
        .select("doc_id").as[Long].collect().toSeq
      assert(got == exact, s"probe '$probe': $got vs $exact")
    }
    // a removed id can never surface again
    val qRemoved = Embedder.default.embed(text(removedIds.head, "v1")).map(_.toDouble).toSeq
    val hits = Ivf.search(store, model, "embedding", "doc_id", qRemoved, 10, nProbe = 32)
      .select("doc_id").as[Long].collect().toSet
    assert(removedIds.toSet.intersect(hits).isEmpty, s"removed ids resurfaced: ${removedIds.toSet.intersect(hits)}")

    // the same round against a sharded HNSW store: one selective-shard
    // rewrite; the maintained id set equals the new snapshot, and the
    // changed doc answers to its NEW vector
    val hnswPath = s"$dir/hnsw"
    Hnsw.writeIndex(oldEmb, "embedding", "doc_id", hnswPath, nShards = 8)
    val (diff2, shTouched) = Recrawl.maintainHnsw(spark, hnswPath, oldDocs, newDocs, "doc_id", "text")
    diff2.unpersist()
    assert(shTouched >= 1 && shTouched <= 8)
    val hIds = Hnsw.readIndex(spark, hnswPath).select("id").as[Long].collect().toSet
    assert(hIds == expectIds, s"hnsw missing=${expectIds -- hIds} extra=${hIds -- expectIds}")
    val qChanged = Embedder.default.embed(text(changedIds.head, "v2-updated")).map(_.toDouble).toSeq
    val hTop = Hnsw.searchIndex(Hnsw.readIndex(spark, hnswPath), qChanged, "doc_id", 1)
      .select("doc_id").as[Long].head()
    assert(hTop == changedIds.head, s"changed doc not found by its new vector: $hTop")
  }

  test("recrawl schedule: Cho/Garcia-Molina estimator, priority and due time match hand computation") {
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    // page A: 4 visits over 300s, 1 observed change -> lambda = -ln(2.5/3.5)/100
    // page B: never changes -> rate 0, no due time
    // page C: 1 visit -> dropped; page D: 2 visits at the same instant -> dropped
    val visits = Seq(
      ("A", ts(0), "h1"), ("A", ts(100), "h1"), ("A", ts(200), "h2"), ("A", ts(300), "h2"),
      ("B", ts(0), "x"), ("B", ts(50), "x"), ("B", ts(100), "x"),
      ("C", ts(10), "y"),
      ("D", ts(20), "z"), ("D", ts(20), "z"),
    ).toDF("url", "ts", "sig")
    val out = Recrawl.schedule(visits, "url", "ts", "sig",
        java.time.Instant.ofEpochSecond(500L))
      .orderBy("url")
      .select("url", "n_visits", "n_changes", "change_rate", "priority", "next_due")
      .collect()
    assert(out.map(_.getString(0)).toSeq == Seq("A", "B"))

    val a      = out(0)
    val lamA   = -math.log(2.5 / 3.5) / 100.0
    assert(a.getLong(1) == 4L && a.getLong(2) == 1L)
    assert(math.abs(a.getDouble(3) - lamA) < 1e-15)
    assert(math.abs(a.getDouble(4) - lamA * 200.0) < 1e-12) // age = 500 - 300
    val due = a.getTimestamp(5).getTime / 1000.0
    assert(math.abs(due - (300.0 + 1.0 / lamA)) < 1e-3)

    val b = out(1)
    assert(b.getLong(1) == 3L && b.getLong(2) == 0L)
    assert(b.getDouble(3) == 0.0 && b.getDouble(4) == 0.0)
    assert(b.isNullAt(5)) // no finite refresh cadence for a never-changing page
  }
}
