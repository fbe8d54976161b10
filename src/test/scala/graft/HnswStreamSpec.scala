package graft

import graft.operators.{Hnsw, Search}
import graft.streaming.HnswStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** HnswStream contract (VERDICT r13 task 5): micro-batches maintain a live
  * sharded HNSW store through Hnsw.applyDelta — new rows probe-visible
  * mid-stream, deletes vacate, and the streamed store equals the batch
  * path applied once with the cumulative delta (the streamed≡batch parity
  * Ivf.streamInto's end-to-end spec pins for the IVF store).
  */
class HnswStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def vec(seed: Long, dim: Int = 16): Seq[Double] = {
    var x = seed * 6364136223846793005L + 1442695040888963407L
    Seq.tabulate(dim) { _ =>
      x = x * 6364136223846793005L + 1442695040888963407L
      (x >>> 11).toDouble / (1L << 53).toDouble - 0.5
    }
  }

  private lazy val base = (0L until 300L).map(i => (i, vec(i))).toDF("id", "v")
  private val qVec: Seq[Double] = vec(424242L)

  private def topIds(store: String, k: Int): Seq[(Long, Double)] =
    Hnsw.searchIndex(spark.read.parquet(store), qVec, "id", k, efSearch = 65536)
      .collect().map(r => (r.getLong(0), math.rint(r.getDouble(1) * 1e9) / 1e9)).toSeq

  test("CDC micro-batches: upserts probe-visible mid-stream, deletes vacate, streamed == batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("hnsw-stream").toString

    // bootstrap-then-stream lifecycle: the store exists before the stream
    Hnsw.writeIndex(base, "v", "id", s"$tmp/streamed", nShards = 4)

    val mem = MemoryStream[(Long, Seq[Double], String)]
    val q = HnswStream.into(mem.toDF().toDF("id", "v", "op"), s"$tmp/streamed", s"$tmp/ckpt",
      "v", "id", opCol = "op", availableNow = false)
    try {
      // batch 1: 20 new ids + one CHANGED vector (id 7 now the query itself)
      val b1 = (1000L until 1020L).map(i => (i, vec(i), "upsert")) :+ ((7L, qVec, "upsert"))
      mem.addData(b1: _*)
      q.processAllAvailable()
      // probe MID-STREAM: the upserted id 7 must be the exhaustive top-1
      val mid = topIds(s"$tmp/streamed", 3)
      assert(mid.head._1 == 7L, s"changed vector must be probe-visible mid-stream: $mid")

      // batch 2: delete id 7, add a fresh nearest (id 9999 = the query)
      mem.addData((7L, Seq.empty[Double], "delete"), (9999L, qVec, "upsert"))
      q.processAllAvailable()
      val after = topIds(s"$tmp/streamed", 5)
      assert(after.head._1 == 9999L, s"fresh insert must take over top-1: $after")
      assert(!after.exists(_._1 == 7L), "deleted id must never surface")
    } finally q.stop()

    // parity: the BATCH path applies the cumulative delta once
    Hnsw.writeIndex(base, "v", "id", s"$tmp/batch", nShards = 4)
    val removed = Seq(7L).toDF("id")
    val added = ((1000L until 1020L).map(i => (i, vec(i))) :+ ((9999L, qVec))).toDF("id", "v")
    Hnsw.applyDelta(spark, s"$tmp/batch", removed, added, "v", "id")
    // same id set and same exhaustive search results (scores to 1e-9 —
    // rebuilt shards re-normalize, a documented ulp-level drift)
    val streamedIds = spark.read.parquet(s"$tmp/streamed").select("id").as[Long].collect().toSet
    val batchIds    = spark.read.parquet(s"$tmp/batch").select("id").as[Long].collect().toSet
    assert(streamedIds == batchIds, "streamed store id set must equal the batch path's")
    assert(topIds(s"$tmp/streamed", 10) == topIds(s"$tmp/batch", 10),
      "streamed≡batch: exhaustive search must agree")

    // only a replay-converged store: re-running the SAME delta batch-side
    // (the at-least-once retry case) changes nothing
    Hnsw.applyDelta(spark, s"$tmp/batch", removed, added, "v", "id")
    assert(topIds(s"$tmp/batch", 10) == topIds(s"$tmp/streamed", 10),
      "applyDelta replay must be idempotent (at-least-once safety)")
  }

  test("intra-batch CDC order (ADVICE r14): seqCol resolves per-id op order; without it duplicates fail fast") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("hnsw-stream-seq").toString

    Hnsw.writeIndex(base, "v", "id", s"$tmp/seq", nShards = 2)
    val mem = MemoryStream[(Long, Seq[Double], String, Long)]
    val q = HnswStream.into(mem.toDF().toDF("id", "v", "op", "seq"), s"$tmp/seq", s"$tmp/ckpt-seq",
      "v", "id", opCol = "op", seqCol = "seq", availableNow = false)
    try {
      // ONE micro-batch carrying, per id, the full little CDC drama:
      //  id 7:    upsert(seq 1) then delete(seq 2) — must vacate, NOT resurrect
      //  id 8:    delete(seq 1) then upsert(seq 2, = query) — must survive as top-1
      //  id 5000: upsert(seq 1) then upsert(seq 2, = query) — last write wins
      //  id 9:    upsert + delete at EQUAL seq — tie breaks toward the delete
      mem.addData(
        (7L, vec(7L).map(_ + 0.001), "upsert", 1L), (7L, Seq.empty[Double], "delete", 2L),
        (8L, Seq.empty[Double], "delete", 1L), (8L, qVec, "upsert", 2L),
        (5000L, vec(5000L), "upsert", 1L), (5000L, qVec.map(_ * 0.999), "upsert", 2L),
        (9L, vec(9L), "upsert", 3L), (9L, Seq.empty[Double], "delete", 3L),
      )
      q.processAllAvailable()
      val ids = spark.read.parquet(s"$tmp/seq").select("id").as[Long].collect().toSet
      assert(!ids.contains(7L), "upsert-then-delete within one batch must vacate (the r14 resurrection bug)")
      assert(!ids.contains(9L), "equal-seq tie must break toward the delete")
      assert(ids.contains(8L) && ids.contains(5000L))
      val top = topIds(s"$tmp/seq", 2)
      assert(top.map(_._1) == Seq(8L, 5000L), s"last-op-per-id vectors must win: $top")
    } finally q.stop()

    // without seqCol, a micro-batch with a repeated id has UNDEFINED op
    // order — refused loudly instead of silently undoing the delete
    val mem2 = MemoryStream[(Long, Seq[Double], String)]
    val q2 = HnswStream.into(mem2.toDF().toDF("id", "v", "op"), s"$tmp/seq", s"$tmp/ckpt-dup",
      "v", "id", opCol = "op", availableNow = false)
    try {
      mem2.addData((42L, qVec, "upsert"), (42L, Seq.empty[Double], "delete"))
      val ex = intercept[Exception](q2.processAllAvailable())
      def causes(t: Throwable): Seq[Throwable] =
        if (t == null) Nil else t +: causes(t.getCause)
      assert(causes(ex).exists(c => Option(c.getMessage).exists(_.contains("seqCol"))),
        s"expected the fail-fast duplicate-id message, got $ex")
    } finally q2.stop()
  }
}
