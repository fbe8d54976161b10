package graft

import graft.operators.Sketches
import graft.streaming.SketchStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming sketch maintenance: the streamed sketch table, rolled up, must
  * answer exactly what one batch sketch over ALL the data answers — and the
  * store must stay correct through compaction.
  */
class SketchStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def writeCsv(dir: String, name: String, rows: Seq[(String, Long, Double)]): Unit = {
    val body = rows.map { case (g, u, v) => s"$g,$u,$v" }.mkString("\n")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/$name"), body)
  }

  test("streamed per-batch sketches roll up to the one-shot batch answer") {
    val base  = java.nio.file.Files.createTempDirectory("graft_sketchstream").toString
    val drop  = s"$base/drop"; val store = s"$base/store"; val ckpt = s"$base/ckpt"
    new java.io.File(drop).mkdirs()
    val batch1 = (0 until 400).map(i => (s"g${i % 2}", (i % 90).toLong, i.toDouble))
    val batch2 = (0 until 400).map(i => (s"g${i % 2}", (i % 130 + 50).toLong, (i + 400).toDouble))
    writeCsv(drop, "b1.csv", batch1)

    val schema = "grp STRING, uid LONG, v DOUBLE"
    def stream = spark.readStream.schema(org.apache.spark.sql.types.StructType.fromDDL(schema))
      .csv(drop)
    val q1 = SketchStream.start(stream, Seq("grp"), "uid", "v", store, ckpt)
    q1.awaitTermination(60000)
    writeCsv(drop, "b2.csv", batch2)
    val q2 = SketchStream.start(stream, Seq("grp"), "uid", "v", store, ckpt)
    q2.awaitTermination(60000)

    val rolled = SketchStream.rollup(spark, store, Seq("grp"), Seq(0.5)).collect()
      .map(r => r.getAs[String]("grp") ->
        (r.getAs[Long]("approx_distinct"), r.getAs[Long]("n_rows"), r.getAs[Seq[Double]]("approx_q").head))
      .toMap

    val all = (batch1 ++ batch2).toDF("grp", "uid", "v")
    val expect = all.groupBy("grp")
      .agg(countDistinct("uid").as("d"), count(lit(1)).as("n"),
        expr("percentile(v, 0.5)").as("med")).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap

    expect.foreach { case (g, (d, n, med)) =>
      val (gd, gn, gq) = rolled(g)
      assert(gd == d, s"$g distinct $gd != $d (exact below 2^12 -> must be equal)")
      assert(gn == n, s"$g rows $gn != $n")
      assert(math.abs(gq - med) / med <= 0.05, s"$g median $gq vs $med")
    }

    // the store holds one row per (grp, batch) before compaction
    val pre = spark.read.parquet(store)
    assert(pre.count() == 4) // 2 groups x 2 batches
    val compacted = SketchStream.compact(spark, store, Seq("grp"))
    assert(compacted == 2)
    // rollup answers are unchanged after compaction
    val rolled2 = SketchStream.rollup(spark, store, Seq("grp"), Seq(0.5)).collect()
      .map(r => r.getAs[String]("grp") -> r.getAs[Long]("approx_distinct")).toMap
    expect.foreach { case (g, (d, _, _)) => assert(rolled2(g) == d) }
  }
}
