package graft

import java.sql.Timestamp

import graft.streaming.EventWindows
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The same declarative window transform must produce identical results in
  * batch and in Structured Streaming (SURVEY §2.11) — this drives the real
  * readStream→agg→writeStream path through a MemoryStream.
  */
class StreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("tumbling window agg: streaming (with watermark) equals batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val rows = (0 until 120).map { i =>
      (new Timestamp(1700000000000L + i * 60000L), if (i % 2 == 0) "click" else "view", (i % 7) + 0.25)
    }

    val mem = MemoryStream[(Timestamp, String, Double)]
    mem.addData(rows: _*)
    val streamDf = mem.toDF().toDF("ts", "event_type", "value").withWatermark("ts", "1 minute")
    val q = EventWindows.tumbling(streamDf, "ts", "10 minutes")
      .writeStream.format("memory").queryName("tumbling_out").outputMode("complete").start()
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("tumbling_out")
      .orderBy("window_start", "event_type")
      .as[(Timestamp, String, Long, Double)].collect().toSeq
    val batch = EventWindows.tumbling(rows.toDF("ts", "event_type", "value"), "ts", "10 minutes")
      .orderBy("window_start", "event_type")
      .as[(Timestamp, String, Long, Double)].collect().toSeq

    assert(streamed.nonEmpty)
    assert(streamed == batch)
  }
}

/** The quality rollup must produce identical group rows in batch and
  * streaming — and the integer-scaled mean must be batch-split-invariant
  * (a double mean would drift with the fold order across micro-batches).
  */
class QualityMonitorSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("per-source quality rollup: streaming (two micro-batches) equals batch") {
    import graft.streaming.QualityMonitor
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val rows = (0 until 200).map { i =>
      val text =
        if (i % 17 == 0) ""
        else if (i % 5 == 0) "short words here"
        else s"the quick value stream number $i flows with the usual batch of data and the filter keeps it"
      (s"src${i % 4}", text)
    }
    val mem = MemoryStream[(String, String)]
    mem.addData(rows.take(90): _*) // uneven split: fold-order trap for a double mean
    val q = QualityMonitor.monitor(mem.toDF().toDF("source", "text"), "source", "text")
      .writeStream.format("memory").queryName("quality_out").outputMode("complete").start()
    q.processAllAvailable()
    mem.addData(rows.drop(90): _*)
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("quality_out")
      .orderBy("source").as[(String, Long, Long, Long, Long)].collect().toSeq
    val batch = QualityMonitor.monitor(rows.toDF("source", "text"), "source", "text")
      .orderBy("source").as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(streamed.nonEmpty && streamed == batch)
    // the tallies actually see the planted rows
    val bySrc = batch.map(r => r._1 -> r).toMap
    assert(bySrc("src0")._4 > 0, "short docs counted")   // n_short
    assert(bySrc("src0")._5 > 0, "empty docs counted")   // n_empty
  }
}

/** Streaming exact dedup must agree with the batch first-wins dedup on the
  * same data (within the watermark horizon).
  */
class DedupStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("dropDuplicatesWithinWatermark keeps one row per text, matching batch distinct") {
    import graft.streaming.DedupStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val rows = (0 until 200).map { i =>
      (new Timestamp(1700000000000L + i * 1000L), i.toLong, s"doc body ${i % 40}")
    }
    val mem = MemoryStream[(Timestamp, Long, String)]
    mem.addData(rows: _*)
    val deduped = DedupStream.exactTextDedup(
      mem.toDF().toDF("ts", "id", "text"), "ts", "text", "10 minutes")
    val q = deduped.writeStream.format("memory").queryName("dedup_out").outputMode("append").start()
    q.processAllAvailable()
    q.stop()

    val out = spark.table("dedup_out").select("text").as[String].collect().toSeq
    assert(out.size == 40, s"expected one row per distinct text, got ${out.size}")
    assert(out.toSet == rows.map(_._3).toSet)
  }
}

/** Custom streaming state: flatMapGroupsWithState sessionization emits the
  * same sessions the batch window-function form computes.
  */
class SessionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("streaming sessionization (flatMapGroupsWithState) matches batch on closed sessions") {
    import graft.streaming.Sessions
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val base = 1700000000000L
    // user 1: two sessions (gap 45 min); user 2: one session
    val events = Seq(
      (1L, 0L), (1L, 5L), (1L, 10L),
      (1L, 55L), (1L, 60L),
      (2L, 7L), (2L, 17L),
    ).map { case (u, m) => Sessions.Event(u, new Timestamp(base + m * 60000L)) }
    // sentinel far in the future advances the watermark so timeouts flush
    val flush = Seq(Sessions.Event(99L, new Timestamp(base + 100L * 3600000L)))

    val mem = MemoryStream[Sessions.Event]
    val withWm = mem.toDS().withWatermark("ts", "1 minute").as[Sessions.Event]
    val q = Sessions.sessionizeStream(spark, withWm, gapMinutes = 30)
      .writeStream.format("memory").queryName("sessions_out").outputMode("append").start()
    mem.addData(events: _*)
    q.processAllAvailable()
    mem.addData(flush: _*)
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("sessions_out")
      .as[Sessions.SessionOut].collect()
      .filter(_.user_id != 99L)
      .map(s => (s.user_id, s.n_events, s.session_start.getTime, s.session_end.getTime)).toSet

    val batch = Sessions.sessionize(
      events.map(e => (e.user_id * 1000 + e.ts.getTime % 1000000, e.ts, e.user_id)).toDF("event_id", "ts", "user_id"), 30)
      .collect()
      .map(r => (r.getLong(r.fieldIndex("user_id")), r.getLong(r.fieldIndex("n_events"))))
      .toSeq.sorted

    assert(streamed.map(s => (s._1, s._2)).toSeq.sorted == batch)
    assert(streamed.size == 3)
  }

  test("cross-batch out-of-order event merges with min/max, never moves a session backward") {
    import graft.streaming.Sessions
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val base  = 1700000000000L
    val flush = Sessions.Event(99L, new Timestamp(base + 100L * 3600000L))

    val mem = MemoryStream[Sessions.Event]
    // generous watermark so the late event is still admitted
    val withWm = mem.toDS().withWatermark("ts", "2 hours").as[Sessions.Event]
    val q = Sessions.sessionizeStream(spark, withWm, gapMinutes = 30)
      .writeStream.format("memory").queryName("sessions_ooo").outputMode("append").start()
    // batch 1: event at t+30s; batch 2: a LATE event at t (before the open
    // session's start, within gap)
    mem.addData(Sessions.Event(7L, new Timestamp(base + 30000L)))
    q.processAllAvailable()
    mem.addData(Sessions.Event(7L, new Timestamp(base)))
    q.processAllAvailable()
    mem.addData(flush)
    q.processAllAvailable()
    q.stop()

    val out = spark.table("sessions_ooo").as[Sessions.SessionOut]
      .collect().filter(_.user_id == 7L)
    assert(out.length == 1)
    val s = out.head
    assert(s.n_events == 2)
    assert(s.session_start.getTime == base, s"start must be the late event: $s")
    assert(s.session_end.getTime == base + 30000L, s"end must not move backward: $s")
    assert(!s.session_end.before(s.session_start))
  }

  test("streaming as-of join matches batch, including a cross-batch late right row") {
    import graft.streaming.AsofStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val base = 1700000000000L
    def ts(m: Long) = new Timestamp(base + m * 60000L)
    // side 0 = right (views), side 1 = left (purchases)
    val batch1 = Seq(
      AsofStream.Tagged(1L, ts(0), 0, 0L, 100L, 1.0),
      AsofStream.Tagged(1L, ts(10), 1, 500L, 0L, 0.0), // should match the LATE right @5, not @0
      AsofStream.Tagged(2L, ts(3), 1, 501L, 0L, 0.0),  // user 2 has no right rows → no emit
    )
    val batch2 = Seq(
      AsofStream.Tagged(1L, ts(5), 0, 0L, 101L, 2.0),  // late right, still above watermark
      AsofStream.Tagged(1L, ts(20), 0, 0L, 102L, 3.0),
      AsofStream.Tagged(1L, ts(20), 1, 502L, 0L, 0.0), // same-instant right matches (inclusive)
    )
    val flush = Seq(AsofStream.Tagged(99L, new Timestamp(base + 100L * 3600000L), 0, 0L, 0L, 0.0))

    val mem = MemoryStream[AsofStream.Tagged]
    val withWm = mem.toDS().withWatermark("ts", "30 minutes").as[AsofStream.Tagged]
    val q = AsofStream.enrichStream(spark, withWm)
      .writeStream.format("memory").queryName("asof_out").outputMode("append").start()
    mem.addData(batch1: _*); q.processAllAvailable()
    mem.addData(batch2: _*); q.processAllAvailable()
    mem.addData(flush: _*);  q.processAllAvailable()
    q.stop()

    val streamed = spark.table("asof_out").as[AsofStream.Matched].collect()
      .map(m => (m.event_id, m.view_id, m.view_value, m.lag_us)).toSet

    val all = batch1 ++ batch2
    val lefts  = all.filter(_.side == 1).map(t => (t.event_id, t.user_id, t.ts)).toDF("event_id", "user_id", "ts")
    val rights = all.filter(_.side == 0).map(t => (t.user_id, t.ts, t.view_id, t.view_value))
      .toDF("user_id", "view_ts", "view_id", "view_value")
    val batch = operators.Joins.asofJoin(lefts, rights, "user_id", "ts", "view_ts")
      .select(col("event_id"), col("view_id"), col("view_value"),
        (unix_micros(col("ts")) - unix_micros(col("view_ts"))).as("lag_us"))
      .as[(Long, Long, Double, Long)].collect().toSet

    assert(streamed == batch)
    assert(streamed.map(_._1) == Set(500L, 502L)) // 501 unmatched, inner semantics
    assert(streamed.find(_._1 == 500L).get._2 == 101L, "late right @5 must win over right @0")
  }

  test("sub-millisecond gap boundary: stream and batch agree (epoch-micros semantics)") {
    import graft.streaming.Sessions
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val base = 1700000000000L
    val t0   = new Timestamp(base)
    // exactly gap + 500µs later: ms-truncated arithmetic sees gap == 1800s
    // (same session, wrong); micros sees 1800.0005s (new session, right)
    val t1 = new Timestamp(base + 1800000L)
    t1.setNanos(500000)
    val flush = Sessions.Event(99L, new Timestamp(base + 100L * 3600000L))

    val mem = MemoryStream[Sessions.Event]
    val withWm = mem.toDS().withWatermark("ts", "1 minute").as[Sessions.Event]
    val q = Sessions.sessionizeStream(spark, withWm, gapMinutes = 30)
      .writeStream.format("memory").queryName("sessions_subms").outputMode("append").start()
    mem.addData(Sessions.Event(5L, t0), Sessions.Event(5L, t1))
    q.processAllAvailable()
    mem.addData(flush)
    q.processAllAvailable()
    q.stop()

    val streamedSessions = spark.table("sessions_subms")
      .as[Sessions.SessionOut].collect().count(_.user_id == 5L)
    val batchSessions = Sessions.sessionize(
      Seq((1L, t0, 5L), (2L, t1, 5L)).toDF("event_id", "ts", "user_id"), 30).count()
    assert(batchSessions == 2, s"batch must split at gap+500µs, got $batchSessions")
    assert(streamedSessions == 2, s"stream must match batch at the µs boundary, got $streamedSessions")
  }
}

/** Streaming file-watch ingestion: drop files -> AvailableNow drain ->
  * chunk+embed -> parquet, end to end through the real source/sink.
  */
class IngestStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("AvailableNow ingestion drains a drop dir through chunk+embed to parquet") {
    val base = java.nio.file.Files.createTempDirectory("graft_ingest").toString
    val drop = s"$base/drop"; val out = s"$base/out"; val ckpt = s"$base/ckpt"
    new java.io.File(drop).mkdirs()
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$drop/a.txt"),
      "Cats meow loudly. Dogs bark at night. Birds sing in the morning.")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$drop/b.txt"),
      "Spark processes data in parallel. Partitions keep work distributed.")

    val q = graft.streaming.IngestStream.start(spark, drop, out, ckpt)
    q.awaitTermination(60000)

    val result = spark.read.parquet(out)
    assert(result.count() == 2) // 1 chunk per small file
    assert(result.columns.toSet == Set("doc_id", "text", "chunk_index", "token_count", "total_chunks", "embedding"))
    import org.apache.spark.sql.functions._
    val dims = result.select(size(col("embedding"))).as[Int](org.apache.spark.sql.Encoders.scalaInt).collect().toSet
    assert(dims == Set(64))
  }
}

/** Streaming component maintenance: micro-batched duplicate edges must leave
  * the persisted labeling equal to from-scratch CC over ALL edges — including
  * merges that span batches.
  */
class ComponentStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("micro-batched edges converge to the from-scratch labeling; cross-batch merges included") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base   = java.nio.file.Files.createTempDirectory("graft_ccstream").toString
    val labels = s"$base/labels"; val ckpt = s"$base/ckpt"

    val mem = MemoryStream[(Long, Long)]
    val q = graft.streaming.ComponentStream.start(
      spark, mem.toDF().toDF("u", "v"), "u", "v", labels, ckpt, availableNow = false)
    // batch 1: two separate clusters {1,2}, {3,4}; batch 2 merges them and
    // introduces 9; batch 3 is untouched-new {20,21}
    mem.addData((1L, 2L), (3L, 4L)); q.processAllAvailable()
    mem.addData((2L, 3L), (9L, 4L)); q.processAllAvailable()
    mem.addData((20L, 21L)); q.processAllAvailable()
    q.stop()

    val got = spark.read.parquet(labels).as[(Long, Long)].collect().toMap
    val allEdges = Seq((1L, 2L), (3L, 4L), (2L, 3L), (9L, 4L), (20L, 21L))
    val scratch = graft.operators.Dedup.connectedComponents(
      allEdges.flatMap(e => Seq(e._1, e._2)).distinct.toDF("id"),
      allEdges.toDF("u", "v"), "id", "u", "v")
      .as[(Long, Long)].collect().toMap
    assert(got == scratch)
    assert(got(9L) == 1L && got(4L) == 1L, "cross-batch merge must relabel old components")
  }

  test("currentLabels recovers from the .old copy when a crash interrupted the swap") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_ccswap").toString
    val root = s"$base/labels"
    Seq((1L, 1L), (2L, 1L)).toDF("id", "component").write.parquet(root)
    // simulate a crash between the two swap renames: root was moved to .old,
    // .next never made it to root
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(new org.apache.hadoop.fs.Path(root),
      new org.apache.hadoop.fs.Path(root + ".old")))
    val got = graft.streaming.ComponentStream.currentLabels(spark, root)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L),
      "a crash mid-swap must surface the .old labeling, not an empty one")
  }
}

class Scd2StreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("micro-batched events converge to the from-scratch SCD2, late arrivals included") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base  = java.nio.file.Files.createTempDirectory("graft_scd2stream").toString
    val store = s"$base/intervals"; val ckpt = s"$base/ckpt"

    val mem = MemoryStream[(Long, Long, Long, String)]
    val q = graft.streaming.Scd2Stream.start(
      spark, mem.toDF().toDF("user_id", "ts", "event_id", "state"),
      "user_id", "ts", "event_id", "state", store, ckpt, availableNow = false)
    // batch 1: user 1 goes a→b; user 2 opens with x
    mem.addData((1L, 10L, 1L, "a"), (1L, 20L, 2L, "b"), (2L, 15L, 3L, "x"))
    q.processAllAvailable()
    // batch 2: user 1 extends (b run collapses) then changes; user 3 new
    mem.addData((1L, 30L, 4L, "b"), (1L, 40L, 5L, "c"), (3L, 5L, 6L, "z"))
    q.processAllAvailable()
    // batch 3: LATE event for user 1 lands between existing changes and
    // must split the b interval retroactively; user 2 untouched since b1
    mem.addData((1L, 25L, 7L, "d"))
    q.processAllAvailable()
    q.stop()

    val got = spark.read.parquet(s"$store/intervals")
      .as[(Long, String, Long, Option[Long])].collect().toSet
    val allEvents = Seq(
      (1L, 10L, 1L, "a"), (1L, 20L, 2L, "b"), (2L, 15L, 3L, "x"),
      (1L, 30L, 4L, "b"), (1L, 40L, 5L, "c"), (3L, 5L, 6L, "z"),
      (1L, 25L, 7L, "d"),
    ).toDF("user_id", "ts", "event_id", "state")
    val scratch = graft.operators.Joins.scd2(allEvents, "user_id", "ts", "event_id", "state")
      .as[(Long, String, Long, Option[Long])].collect().toSet
    assert(got == scratch)
    // the late 'd' split: b reopens at 30 after d at 25
    assert(got.contains((1L, "d", 25L, Some(30L))))
    assert(got.contains((1L, "b", 30L, Some(40L))))
  }

  test("foldBatch is idempotent under batch redelivery (at-least-once safety)") {
    import spark.implicits._
    val ev = Seq((1L, 10L, 1L, "a"), (1L, 20L, 2L, "b"))
      .toDF("user_id", "ts", "event_id", "state")
    val e0 = graft.streaming.Scd2Stream.currentEvents(spark, s"/nonexistent_${System.nanoTime}")
    val i0 = graft.streaming.Scd2Stream.currentIntervals(spark, s"/nonexistent_${System.nanoTime}")
    val (e1, i1) = graft.streaming.Scd2Stream.foldBatch(e0, i0, ev, "user_id", "ts", "event_id", "state")
    val (e2, i2) = graft.streaming.Scd2Stream.foldBatch(e1, i1, ev, "user_id", "ts", "event_id", "state")
    assert(e2.count() == e1.count())
    assert(i2.as[(Long, String, Long, Option[Long])].collect().toSet ==
      i1.as[(Long, String, Long, Option[Long])].collect().toSet)
  }

  test("foldBatch fails fast on conflicting attrs sharing (key, ts, tie) instead of folding nondeterminism") {
    import spark.implicits._
    // same key/ts/tie, two different states — a producer bug the tie
    // column exists to prevent; must raise, not pick a partition-order winner
    val ev = Seq((1L, 10L, 1L, "a"), (1L, 10L, 1L, "b"))
      .toDF("user_id", "ts", "event_id", "state")
    val e0 = graft.streaming.Scd2Stream.currentEvents(spark, s"/nonexistent_${System.nanoTime}")
    val i0 = graft.streaming.Scd2Stream.currentIntervals(spark, s"/nonexistent_${System.nanoTime}")
    val (_, iv) = graft.streaming.Scd2Stream.foldBatch(e0, i0, ev, "user_id", "ts", "event_id", "state")
    val ex = intercept[Exception](iv.collect())
    assert(ex.getMessage.contains("conflicting attr") ||
      Option(ex.getCause).exists(_.getMessage.contains("conflicting attr")))
    // non-conflicting same-(key, ts) events with distinct ties still fold fine
    val ok = Seq((1L, 10L, 1L, "a"), (1L, 10L, 2L, "b"))
      .toDF("user_id", "ts", "event_id", "state")
    val (_, iv2) = graft.streaming.Scd2Stream.foldBatch(e0, i0, ok, "user_id", "ts", "event_id", "state")
    assert(iv2.count() > 0)
  }

  test("foldBatch on an empty store equals the batch operator (backfill path)") {
    import spark.implicits._
    val ev = Seq((1L, 10L, 1L, "a"), (1L, 20L, 2L, "b"), (2L, 5L, 3L, "x"))
      .toDF("user_id", "ts", "event_id", "state")
    val emptyEv = graft.streaming.Scd2Stream.currentEvents(spark, s"/nonexistent_${System.nanoTime}")
    val emptyIv = graft.streaming.Scd2Stream.currentIntervals(spark, s"/nonexistent_${System.nanoTime}")
    val folded = graft.streaming.Scd2Stream
      .foldBatch(emptyEv, emptyIv, ev, "user_id", "ts", "event_id", "state")
      ._2.as[(Long, String, Long, Option[Long])].collect().toSet
    val batch = graft.operators.Joins.scd2(ev, "user_id", "ts", "event_id", "state")
      .as[(Long, String, Long, Option[Long])].collect().toSet
    assert(folded == batch)
  }
}

/** M6 model persistence: save/load round-trip produces identical projections. */
class PersistenceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("PCA model save/load round-trip") {
    import spark.implicits._
    import graft.operators.{Embedder, Ml}
    val df    = (0 until 30).map(i => (i.toLong, Embedder.default.embed(s"doc $i"))).toDF("id", "vec")
    val model = Ml.fitPca(df, "vec", 3)
    val path  = java.nio.file.Files.createTempDirectory("graft_pca").toString + "/model"
    Ml.savePca(model, path)
    val loaded = Ml.loadPca(path)
    assert(loaded.pc == model.pc) // identical principal components matrix
  }
}

/** Driver-contract smoke: the flagship query returns rows and every declared
  * oracle key has a matching query entry (the column-name contract is
  * exercised for real by Verify + tools/check_oracle.py).
  */
class EntrySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracleSql key has a queries entry") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("a sample of declared queries runs at sf0.001") {
    val sample = Seq("f1_eq", "j5_folder_paths", "a6_tfidf_keywords", "v1_cosine_topk", "d4_ngram_jaccard", "w2_sliding")
    sample.foreach { name =>
      val n = SparkEntry.queries(name)(spark, "/root/testdata/sf0.001").count()
      assert(n >= 0, name)
    }
  }
}

/** Streamed recrawl maintenance (RecrawlStream) must equal the
  * hand-invoked batch applyDelta sequence — including under batch
  * redelivery and a crash between the index patch and the snapshot swap.
  */
class RecrawlStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def snapOf(m: Map[Long, String], b: Seq[(Long, String)]): Map[Long, String] =
    b.foldLeft(m) { case (acc, (id, t)) => if (t == null) acc - id else acc + (id -> t) }

  test("streamed maintenance equals the batch applyDelta sequence; redelivery and mid-swap crash are absorbed") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val docs0 = (0L until 120L).map(i => i -> s"doc $i body ${i % 7}").toMap
    // round 1: removals, content changes, fresh ids, one no-op unchanged row
    val b1: Seq[(Long, String)] =
      (0L until 120L by 13).map(i => (i, null: String)) ++
        (0L until 120L by 17).filter(_ % 13 != 0).map(i => (i, s"doc $i body updated")) ++
        (0L until 3L).map(j => (1000L + j, s"fresh doc $j")) ++
        Seq((2L, docs0(2L)))
    // round 2: mutate round-1 additions, delete an already-deleted id,
    // re-send unchanged content, add late
    val b2: Seq[(Long, String)] = Seq(
      (1000L, null: String), (1001L, "fresh doc 1 v2"),
      (26L, null: String), (5L, docs0(5L)), (2000L, "late addition"))
    val snap2 = snapOf(snapOf(docs0, b1), b2)

    // ---- streamed path ----
    val rootS = java.nio.file.Files.createTempDirectory("recrawl_stream").toString
    graft.streaming.RecrawlStream.bootstrap(
      spark, docs0.toSeq.toDF("doc_id", "text"), "doc_id", "text", rootS, nList = 4)
    val mem = MemoryStream[(Long, String)]
    val q = graft.streaming.RecrawlStream.start(
      spark, mem.toDF().toDF("doc_id", "text"), "doc_id", "text",
      rootS, s"$rootS/ckpt", availableNow = false)
    mem.addData(b1: _*); q.processAllAvailable()
    mem.addData(b2: _*); q.processAllAvailable()
    q.stop()

    // ---- batch path: two hand-invoked Recrawl.maintainIvf rounds ----
    val rootB = java.nio.file.Files.createTempDirectory("recrawl_batch").toString
    graft.streaming.RecrawlStream.bootstrap(
      spark, docs0.toSeq.toDF("doc_id", "text"), "doc_id", "text", rootB, nList = 4)
    val snap1 = snapOf(docs0, b1)
    val (d1, _) = graft.operators.Recrawl.maintainIvf(spark, s"$rootB/index",
      docs0.toSeq.toDF("doc_id", "text"), snap1.toSeq.toDF("doc_id", "text"), "doc_id", "text")
    d1.unpersist()
    val (d2, _) = graft.operators.Recrawl.maintainIvf(spark, s"$rootB/index",
      snap1.toSeq.toDF("doc_id", "text"), snap2.toSeq.toDF("doc_id", "text"), "doc_id", "text")
    d2.unpersist()

    def indexRows(root: String): Map[Long, Seq[Float]] =
      spark.read.parquet(s"$root/index")
        .select(col("doc_id"), col("embedding").cast("array<float>"))
        .as[(Long, Seq[Float])].collect().toMap
    val streamed = indexRows(rootS)
    assert(streamed == indexRows(rootB),
      "streamed index must equal the batch applyDelta sequence's")
    assert(streamed.keySet == snap2.keySet, "index ids must equal the final snapshot")
    // the snapshot the NEXT batch would diff against is exactly snap2's hashes
    val snapGot = graft.streaming.RecrawlStream.currentDocs(spark, rootS)
      .as[(Long, String)].collect().toMap
    val snapWant = snap2.toSeq.toDF("doc_id", "text")
      .select(col("doc_id"), graft.operators.Dedup.exactKey(col("text")))
      .as[(Long, String)].collect().toMap
    assert(snapGot == snapWant)

    // ---- redelivery: the whole of b2 again is a no-op fold ----
    val (nUp, nRem, nTouched) = graft.streaming.RecrawlStream.applyBatch(
      spark, rootS, b2.toDF("doc_id", "text"), "doc_id", "text")
    assert((nUp, nRem, nTouched) == ((0L, 0L, 0L)),
      s"redelivered batch must cost nothing: $nUp/$nRem/$nTouched")
    assert(indexRows(rootS) == streamed)

    // ---- crash between the index patch and the snapshot swap: the live
    // snapshot dir is gone (renamed to .old), recovery reads .old and the
    // replayed batch folds idempotently ----
    val fs = new org.apache.hadoop.fs.Path(rootS)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.rename(new org.apache.hadoop.fs.Path(s"$rootS/docs"),
      new org.apache.hadoop.fs.Path(s"$rootS/docs.old"))
    graft.streaming.RecrawlStream.applyBatch(
      spark, rootS, b2.toDF("doc_id", "text"), "doc_id", "text")
    assert(indexRows(rootS) == streamed)
    assert(graft.streaming.RecrawlStream.currentDocs(spark, rootS)
      .as[(Long, String)].collect().toMap == snapWant)
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$rootS/docs")),
      "recovery must republish the live snapshot dir")
  }
}
