package graft

import graft.operators.{Packing, Sketches}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Contracts for concat-and-chunk packing and mergeable HLL sketches. */
class PackingSketchesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("packConcat: offsets tile each shard's stream with no gaps or overlaps") {
    val docs = (0L until 200L).map(i => (i, (i % 37) + 1)).toDF("id", "n_tok")
    val packed = Packing.packConcat(docs, "id", "n_tok", seqLen = 64, nShards = 3)
      .select("id", "shard", "tok_offset", "n_tok").collect()
    packed.groupBy(_.getLong(1)).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getLong(2))
      var expect = 0L
      sorted.foreach { r =>
        assert(r.getLong(2) == expect, s"gap/overlap at id ${r.getLong(0)}")
        expect += r.getLong(3)
      }
    }
  }

  test("packConcat: straddling docs span the right sequences; zero-token docs sit on a boundary") {
    val docs = Seq((1L, 60L), (2L, 10L), (3L, 0L), (4L, 130L)).toDF("id", "n_tok")
    val got = Packing.packConcat(docs, "id", "n_tok", seqLen = 64, nShards = 1)
      .select("id", "tok_offset", "seq_first", "seq_last", "n_seqs")
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    got.foreach { case (_, (off, first, last, n)) =>
      assert(first == off / 64)
      assert(n == last - first + 1)
    }
    // a 130-token doc covers ceil fragments: spans floor(off/64) .. floor((off+129)/64)
    val (off4, f4, l4, n4) = got(4L)
    assert(l4 == (off4 + 129) / 64 && f4 == off4 / 64 && n4 >= 3 - 1)
    // zero-token doc: occupies no space
    val (off3, f3, l3, _) = got(3L)
    assert(f3 == l3 && f3 == off3 / 64)
  }

  test("packConcat: derived shard count and reserved-column guard") {
    val docs = (0L until 10L).map(i => (i, 1L)).toDF("id", "n_tok")
    // 10 rows < RowsPerShard -> one shard
    val one = Packing.packConcat(docs, "id", "n_tok", seqLen = 8)
    assert(one.select("shard").distinct().count() == 1)
    val bad = docs.withColumn("tok_offset", lit(0L))
    intercept[IllegalArgumentException] {
      Packing.packConcat(bad, "id", "n_tok", seqLen = 8)
    }
  }

  test("lengthBuckets: histogram-edge buckets, bounded batches, pad beats arrival order") {
    import org.apache.spark.sql.expressions.Window
    val rows = (1L to 100L).map(i => (i, (i * 37 % 97) + 3)).toDF("id", "len")
    val out  = Packing.lengthBuckets(rows, "id", "len", nBuckets = 4, batchSize = 8)
    assert(out.count() == 100)
    // equal lengths always share a bucket (edges are per-LENGTH)
    assert(out.groupBy("len").agg(countDistinct("bucket").as("nb"))
      .where($"nb" > 1).count() == 0)
    // batches never exceed batchSize; pad arithmetic consistent
    val sizes = out.groupBy("bucket", "batch").count().select("count").as[Long].collect()
    assert(sizes.nonEmpty && sizes.forall(_ <= 8))
    assert(out.where($"pad" < 0 || $"batch_max" < $"len" || $"pad" =!= $"batch_max" - $"len").count() == 0)
    // the point of the operator: less padding than arrival-order batching
    val bucketedPad = out.agg(sum("pad")).as[Long].head()
    val naive = rows.withColumn("batch", expr("(id - 1) div 8"))
      .withColumn("bmax", max(col("len")).over(Window.partitionBy("batch")))
    val naivePad = naive.agg(sum(col("bmax") - col("len"))).as[Long].head()
    assert(bucketedPad < naivePad, s"bucketed $bucketedPad !< naive $naivePad")
    // deterministic across runs
    assert(Packing.lengthBuckets(rows, "id", "len", 4, 8).collect().toSet
      == out.collect().toSet)
    // reserved-column guard
    val e = intercept[IllegalArgumentException](
      Packing.lengthBuckets(rows.withColumnRenamed("len", "pad"), "id", "pad", 4, 8))
    assert(e.getMessage.contains("pad"))
  }

  test("shardManifest counts full sequences only") {
    val docs = Seq((1L, 100L), (2L, 100L), (3L, 60L)).toDF("id", "n_tok")
    val packed = Packing.packConcat(docs, "id", "n_tok", seqLen = 64, nShards = 1)
    val m = Packing.shardManifest(packed, "n_tok", 64).collect().head
    assert(m.getAs[Long]("n_docs") == 3)
    assert(m.getAs[Long]("n_tokens") == 260)
    assert(m.getAs[Long]("n_sequences") == 4) // 260/64 = 4 full, ragged 4 dropped
  }

  test("sketch union across buckets estimates the cross-bucket distinct") {
    val rows = (0 until 5000).map(i => (i % 10, i % 7, (i % 731).toLong))
    val df   = rows.toDF("batch", "grp", "v")
    val sk   = Sketches.distinctSketches(df, Seq("grp", "batch"), "v")
    assert(sk.count() == 70) // one sketch row per (grp, batch)
    val merged = Sketches.mergeSketches(sk, Seq("grp")).collect()
    val exact = rows.groupBy(_._2).view.mapValues(_.map(_._3).distinct.size).toMap
    merged.foreach { r =>
      val g   = r.getInt(0)
      val est = r.getLong(1).toDouble
      val ex  = exact(g).toDouble
      assert(math.abs(est - ex) / ex <= 0.05, s"grp $g est $est exact $ex")
    }
    // row counts ride along exactly
    assert(merged.map(_.getAs[Long]("n_rows")).sum == 5000L)
  }

  test("KLL quantile sketches: per-bucket build + union lands in the exact rank band") {
    // deterministic skewed values: v = (i*i) % 9973 over 8 buckets
    val rows = (0 until 8000).map(i => (i % 8, ((i.toLong * i) % 9973).toDouble))
    val df   = rows.toDF("batch", "v")
    val qs   = Seq(0.5, 0.9, 0.99)
    val got  = Sketches.mergeQuantileSketches(
      Sketches.quantileSketches(df, Seq("batch"), "v"), Seq("batch"), qs)
    // rollup ACROSS all buckets via a constant group
    val all = Sketches.mergeQuantileSketches(
      Sketches.quantileSketches(df.withColumn("g", lit(1)), Seq("g", "batch"), "v"),
      Seq("g"), qs).select("approx_q").as[Seq[Double]].head()
    val sortedAll = rows.map(_._2).sorted
    qs.zip(all).foreach { case (q, est) =>
      val lo = sortedAll(math.max(0, ((q - 0.02) * sortedAll.length).toInt))
      val hi = sortedAll(math.min(sortedAll.length - 1, ((q + 0.02) * sortedAll.length).toInt))
      assert(est >= lo && est <= hi, s"q=$q est=$est band=[$lo,$hi]")
    }
    assert(got.count() == 8)
    assert(got.agg(sum("n_rows")).as[Long].head() == 8000L)
  }

  test("KLL sketch binaries survive a parquet round-trip and still merge") {
    val df  = (0 until 1000).map(i => (i % 4, i.toDouble)).toDF("batch", "v")
    val sk  = Sketches.quantileSketches(df, Seq("batch"), "v")
    val dir = java.nio.file.Files.createTempDirectory("kll_rt").toString
    sk.write.mode("overwrite").parquet(dir)
    val rt  = spark.read.parquet(dir)
    val est = Sketches.mergeQuantileSketches(rt.withColumn("g", lit(1)), Seq("g"), Seq(0.5))
      .select("approx_q").as[Seq[Double]].head().head
    assert(math.abs(est - 500.0) <= 25.0, s"median est $est")
  }

  test("theta set algebra: overlap/union estimates vs exact on overlapping slices") {
    // slice A = ids 0..5999, slice B = 3000..8999 -> exact overlap 3000
    val rows = ((0 until 6000).map(i => ("a", i.toLong)) ++
      (3000 until 9000).map(i => ("b", i.toLong)))
      .zipWithIndex.map { case ((s, v), i) => (s, i % 8, v) }
    val df = rows.toDF("slice", "batch", "v")
    val ov = Sketches.sliceOverlap(
      Sketches.setSketches(df, Seq("slice", "batch"), "v"), "slice").collect().head
    // 6000 distinct per slice > 4096 nominal entries -> ESTIMATION mode:
    // this exercises the approximate regime, not the exact small-set path
    assert(math.abs(ov.getAs[Double]("overlap") - 3000.0) / 3000.0 <= 0.10,
      s"overlap ${ov.getAs[Double]("overlap")}")
    assert(math.abs(ov.getAs[Double]("union_est") - 9000.0) / 9000.0 <= 0.10,
      s"union ${ov.getAs[Double]("union_est")}")
    assert(math.abs(ov.getAs[Double]("distinct_a") - 6000.0) / 6000.0 <= 0.10)
  }

  test("frequent items: no false negatives and bracketing bounds under bucketed merge") {
    // heavy tokens h0..h4 (600 each) in a sea of 6000 singletons; tiny map
    // (64) forces constant eviction — the adversarial regime for MG bounds
    val heavy = (0 until 3000).map(i => (i % 8, s"h${i % 5}"))
    val noise = (0 until 6000).map(i => (i % 8, s"n$i"))
    val df    = (heavy ++ noise).toDF("batch", "tok")
    val sk    = Sketches.freqSketches(df, Seq("batch"), "tok", maxMapSize = 64)
    val thrDf = df.agg((count(lit(1)) / 20).cast("long").as("thr")) // 450
    val got   = Sketches.heavyHitters(sk, thrDf, maxMapSize = 64).collect()
    val byItem = got.map(r => r.getAs[String]("item") ->
      (r.getAs[Long]("lower"), r.getAs[Long]("upper"))).toMap
    (0 until 5).foreach { i =>
      val item = s"h$i"
      assert(byItem.contains(item), s"true heavy hitter $item missed")
      val (lo, hi) = byItem(item)
      assert(lo <= 600 && hi >= 600, s"$item bounds [$lo,$hi] exclude 600")
    }
  }

  test("theta and freq sketch binaries survive a parquet round-trip") {
    // v = (i/4) % 300 so EVERY batch (= i % 4) sees all 300 values — with
    // v = i % 300 the gcd(4,300)=4 aliasing would make the slices disjoint
    val df  = (0 until 2000).map(i => (i % 4, ((i / 4) % 300).toLong)).toDF("batch", "v")
    val dir = java.nio.file.Files.createTempDirectory("theta_rt").toString
    Sketches.setSketches(df, Seq("batch"), "v").write.mode("overwrite").parquet(dir)
    val rt  = spark.read.parquet(dir)
    val est = Sketches.sliceOverlap(rt.withColumn("s", col("batch") % 2), "s")
      .collect().head
    // every batch contains all 300 values -> both slices identical sets
    assert(math.abs(est.getAs[Double]("overlap") - 300.0) <= 1.0)
  }

  test("sketches never count nulls and merge is insensitive to bucketing") {
    val df = ((0 until 100).map(i => (i % 4, Some((i % 13).toLong))) :+ (0, Option.empty[Long]))
      .toDF("batch", "v")
    val coarse = Sketches.mergeSketches(
      Sketches.distinctSketches(df, Seq("batch"), "v"), Seq("batch"))
    val fineAll = Sketches.mergeSketches(
      Sketches.distinctSketches(df.withColumn("g", lit(1)), Seq("g", "batch"), "v"), Seq("g"))
      .select("approx_distinct").as[Long].head()
    assert(fineAll == 13L)
    assert(coarse.agg(sum("n_rows")).as[Long].head() == 100L) // null row dropped
  }
}
