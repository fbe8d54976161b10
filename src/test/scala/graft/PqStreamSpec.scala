package graft

import graft.operators.{Pq, Search}
import graft.streaming.PqStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** PqStream contract (VERDICT r14 task 3): micro-batches maintain a live
  * two-store IVF-PQ index through Pq.applyDelta — new rows probe-visible
  * mid-stream, deletes vacate BOTH stores, and the streamed store equals
  * the batch path applied once with the cumulative delta (HnswStreamSpec's
  * parity device on the compressed tier).
  */
class PqStreamSpec extends AnyFunSuite {
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

  /** Exhaustive probe (nProbe = nList, k·refine ≥ corpus → the ADC cut is
    * lossless, the float re-rank is exact brute force).
    */
  private def topIds(store: String, k: Int): Seq[(Long, Double)] = {
    val (codes, floats, ivfm, pqm) = Pq.readStore(spark, store)
    Pq.searchIvfPq(codes, floats, ivfm, pqm, "v", "id", qVec, k, nProbe = 6, refine = 200)
      .select("id", "score")
      .collect().map(r => (r.getLong(0), math.rint(r.getDouble(1) * 1e9) / 1e9)).toSeq
  }

  test("CDC micro-batches: upserts probe-visible mid-stream, deletes vacate both stores, streamed == batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("pq-stream").toString

    Pq.writeStore(base, "v", "id", s"$tmp/streamed", nList = 6, m = 8, ksub = 16)

    val mem = MemoryStream[(Long, Seq[Double], String, Long)]
    val q = PqStream.into(mem.toDF().toDF("id", "v", "op", "seq"), s"$tmp/streamed",
      s"$tmp/ckpt", "v", "id", opCol = "op", seqCol = "seq", availableNow = false)
    try {
      // batch 1: 20 new ids + one CHANGED vector (id 7 now the query) — and
      // an intra-batch decoy for id 7 at a lower seq the dedupe must drop
      val b1 = (1000L until 1020L).map(i => (i, vec(i), "upsert", 2L)) ++
        Seq((7L, qVec.map(_ => 0.0), "upsert", 1L), (7L, qVec, "upsert", 2L))
      mem.addData(b1: _*)
      q.processAllAvailable()
      val mid = topIds(s"$tmp/streamed", 3)
      assert(mid.head._1 == 7L, s"changed vector must be probe-visible mid-stream: $mid")

      // batch 2: delete id 7, add a fresh nearest (id 9999 = the query)
      mem.addData((7L, Seq.empty[Double], "delete", 3L), (9999L, qVec, "upsert", 3L))
      q.processAllAvailable()
      val after = topIds(s"$tmp/streamed", 5)
      assert(after.head._1 == 9999L, s"fresh insert must take over top-1: $after")
      assert(!after.exists(_._1 == 7L), "deleted id must never surface")
      // deletes vacate BOTH stores (a codes orphan would eat candidate slots)
      val (codes, floats, _, _) = Pq.readStore(spark, s"$tmp/streamed")
      assert(codes.where(col("id") === 7L).count() == 0, "codes store must vacate deleted ids")
      assert(floats.where(col("id") === 7L).count() == 0, "floats store must vacate deleted ids")
    } finally q.stop()

    // parity: the BATCH path applies the cumulative delta once
    Pq.writeStore(base, "v", "id", s"$tmp/batch", nList = 6, m = 8, ksub = 16)
    val removed = Seq(7L).toDF("id")
    val added   = ((1000L until 1020L).map(i => (i, vec(i))) :+ ((9999L, qVec))).toDF("id", "v")
    Pq.applyDelta(spark, s"$tmp/batch", removed, added, "v", "id")
    val streamedIds = spark.read.parquet(s"$tmp/streamed/floats").select("id").as[Long].collect().toSet
    val batchIds    = spark.read.parquet(s"$tmp/batch/floats").select("id").as[Long].collect().toSet
    assert(streamedIds == batchIds, "streamed floats id set must equal the batch path's")
    assert(topIds(s"$tmp/streamed", 10) == topIds(s"$tmp/batch", 10),
      "streamed == batch: exhaustive probe must agree")

    // replay-converged: re-running the SAME delta batch-side (the
    // at-least-once retry case) changes nothing
    Pq.applyDelta(spark, s"$tmp/batch", removed, added, "v", "id")
    assert(topIds(s"$tmp/batch", 10) == topIds(s"$tmp/streamed", 10),
      "applyDelta replay must be idempotent (at-least-once safety)")
  }
}
