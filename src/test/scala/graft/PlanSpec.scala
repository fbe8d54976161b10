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
}
