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
