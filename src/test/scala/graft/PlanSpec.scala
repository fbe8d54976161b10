package graft

import graft.operators.{Joins, Search}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan contracts for the hot paths — the properties that keep the
  * engine viable at 100 TB, asserted against the real testdata scans so a
  * regression (a filter that stops pushing, a projection that drags the
  * embedding column along, a broadcast that flips to shuffle) fails CI
  * rather than only showing up as a bench slowdown.
  */
class PlanSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def formatted(df: DataFrame): String = TestSpark.formattedPlan(df)

  test("equality filter pushes down to the parquet scan") {
    val plan = formatted(
      Tables(spark, dir).documents.where(col("lang") === "en").select("doc_id", "lang"))
    val pushed = plan.linesIterator.find(_.contains("PushedFilters")).getOrElse("")
    assert(pushed.contains("EqualTo(lang,en)"), s"filter must reach the scan: $pushed")
  }

  test("projection prunes the scan's ReadSchema to the selected columns") {
    val plan = formatted(Tables(spark, dir).embeddings.select("vec_id", "label"))
    val schema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(schema.contains("vec_id") && schema.contains("label"), schema)
    assert(!schema.contains("embedding"), s"unused 64-float column must not be read: $schema")
  }

  test("hydrate plans the k-row hit side as a broadcast join") {
    val t    = Tables(spark, dir)
    val hits = t.embeddings.limit(5).select(col("vec_id"), lit(1.0).as("score"))
    val plan = Joins.hydrate(hits, t.embeddings.select("vec_id", "label"), "vec_id")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(800))
  }

  test("cosine top-k plans as TakeOrderedAndProject (per-partition top-k, no full sort)") {
    val q    = Seq.fill(64)(0.1)
    val plan = Search.topK(Tables(spark, dir).embeddings, "embedding", "vec_id", q, 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(800))
    assert(!plan.contains("Exchange"), s"top-k must not shuffle the corpus:\n${plan.take(800)}")
  }

  test("rangeJoin plans as an equi-join on the bin, never a nested-loop join") {
    import spark.implicits._
    val pts = (0 until 100).map(i => (i.toLong, i * 2.0)).toDF("pid", "p")
    val ivs = (0 until 10).map(i => (i.toLong, i * 20.0, (i + 1) * 20.0)).toDF("iid", "lo", "hi")
    val plan = Joins.rangeJoin(pts, "p", ivs, "lo", "hi", binWidth = 10.0)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"range join must stay equi-keyed:\n${plan.take(1200)}")
    assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"), plan.take(1200))
  }

  test("asofJoin shuffles exactly once (the keyed window), no join exchange") {
    import spark.implicits._
    val l = (0 until 100).map(i => (i.toLong, s"u${i % 5}", i.toLong)).toDF("eid", "k", "t")
    val r = (0 until 50).map(i => (s"u${i % 5}", i.toLong * 2, s"tag$i")).toDF("k", "rt", "tag")
    val plan = Joins.asofJoin(l, r, "k", "t", "rt").queryExecution.executedPlan.toString
    val exchanges = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges == 1, s"expected the single window shuffle, got $exchanges:\n${plan.take(1200)}")
    assert(!plan.contains("Join"), s"no join operator should appear:\n${plan.take(1200)}")
  }
}
