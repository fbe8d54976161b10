package graft

import graft.operators.Dsir
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** DSIR importance-resampling contract: weights order documents by
  * target-likeness, edge rows keep the documented weight, the ratio table
  * broadcasts (the raw corpus is never shuffled by bucket), and the
  * resample is deterministic.
  */
class DsirSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // raw corpus: half "science" flavored, half "spam" flavored, a few mixed
  private lazy val raw = (0L until 120L).map { i =>
    val text =
      if (i % 2 == 0) s"quantum physics experiment measures entangled photon states run $i"
      else s"buy cheap pills now click here winner prize offer $i"
    (i, text)
  }.toDF("id", "text")

  private lazy val target = Seq(
    "physics experiment with photon detectors",
    "quantum states of entangled particles",
    "the experiment measures quantum decoherence",
  ).toDF("t")

  test("target-like documents get strictly higher weights than off-target ones") {
    val w = Dsir.importanceWeights(raw, "id", "text", target, "t")
      .select(col("id"), col("log_weight")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val sci  = w.filter(_._1 % 2 == 0).values
    val spam = w.filter(_._1 % 2 == 1).values
    assert(sci.min > spam.max,
      s"every science doc must outweigh every spam doc: sci.min=${sci.min} spam.max=${spam.max}")
  }

  test("resample takes overwhelmingly target-like documents; deterministic across runs") {
    val s1 = Dsir.resample(raw, "id", "text", target, "t", 30).select("id").as[Long].collect().toSet
    val s2 = Dsir.resample(raw, "id", "text", target, "t", 30).select("id").as[Long].collect().toSet
    assert(s1 == s2)
    assert(s1.size == 30)
    // with the weight gap this corpus has, the Gumbel noise should almost
    // never promote spam — allow a small minority, require a science surplus
    assert(s1.count(_ % 2 == 0) >= 25, s"science share: ${s1.count(_ % 2 == 0)}/30")
  }

  test("empty/null text keeps log_weight 0 and survives as a row") {
    val edge = Seq((1L, "quantum physics"), (2L, ""), (3L, null: String)).toDF("id", "text")
    val w = Dsir.importanceWeights(edge, "id", "text", target, "t")
      .select(col("id"), col("log_weight")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(w.keySet == Set(1L, 2L, 3L))
    assert(w(2L) == 0.0 && w(3L) == 0.0)
    // sign is corpus-dependent (q̂ fits on this 3-row corpus); the point is
    // that a doc WITH grams gets a real weight while gram-less docs get
    // exactly the empty-product 0
    assert(w(1L) != 0.0)
  }

  test("the ratio table broadcasts: no shuffle of the raw corpus by bucket") {
    val plan = TestSpark.formattedPlan(
      Dsir.importanceWeights(raw, "id", "text", target, "t"))
    // the per-gram join against the ≤65536-row ratio table must be a
    // BroadcastHashJoin — a SortMergeJoin there would shuffle every gram
    // occurrence of a 100 TB corpus by bucket
    assert(plan.contains("BroadcastHashJoin"), plan.take(1500))
  }

  test("reserved-column and argument guards") {
    intercept[IllegalArgumentException] {
      Dsir.importanceWeights(raw.withColumn("log_weight", lit(1.0)), "id", "text", target, "t")
    }
    intercept[IllegalArgumentException] { Dsir.resample(raw, "id", "text", target, "t", 0) }
    intercept[IllegalArgumentException] {
      Dsir.importanceWeights(raw, "id", "text", target, "t", alpha = 0.0)
    }
  }
}
