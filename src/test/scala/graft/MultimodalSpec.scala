package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Multimodal plumbing: real binaryFile source + magic-byte sniffing; the
  * decode stub's batch shape and determinism; frame-sampling fan-out.
  */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dir = "/root/repo/fixtures/media"

  test("format sniff is content-based (magic bytes), not extension-based") {
    val got = Multimodal.binaryTable(spark, dir)
      .select(col("file_name"), Multimodal.sniffFormat(col("content")).as("f"))
      .as[(String, String)].collect().toMap
    assert(got("img1.png") == "png")
    assert(got("img2.jpg") == "jpeg")
    assert(got("clip1.gif") == "gif")
    assert(got("audio1.bin") == "unknown")
  }

  test("stub features: fixed dim, histogram sums to ~1, deterministic") {
    val b  = Multimodal.binaryTable(spark, dir)
    val f1 = Multimodal.extractFeatures(spark, b).collect().sortBy(_.file_name)
    val f2 = Multimodal.extractFeatures(spark, b).collect().sortBy(_.file_name)
    assert(f1.length == 4)
    f1.foreach { m =>
      assert(m.features.length == 16)
      assert(math.abs(m.features.map(_.toDouble).sum - 1.0) < 1e-3)
    }
    assert(f1.map(_.features.toSeq).toSeq == f2.map(_.features.toSeq).toSeq)
  }

  test("frame sampling: stride windows capped at maxFrames, dense indices") {
    val b = Multimodal.binaryTable(spark, dir)
    val frames = Multimodal.sampleFrames(spark, b, frameSize = 64, stride = 32, maxFrames = 5)
      .collect().groupBy(_.file_name)
    val png = frames("img1.png").sortBy(_.frame_index) // 408 bytes -> capped at 5
    assert(png.length == 5)
    assert(png.map(_.frame_index).toSeq == (0 until 5))
    assert(png.forall(_.frame_bytes.length == 64))
    val bin = frames("audio1.bin") // 256 bytes -> (256-64)/32+1 = 7 -> capped 5
    assert(bin.length == 5)
  }
}
