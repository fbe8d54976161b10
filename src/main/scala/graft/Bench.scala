package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: times every declared query at SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line. Failures are reported per-query (status "error",
  * value -1) instead of being silently timed as successes, and errors are
  * excluded from the headline total.
  */
object Bench {

  /** One query's published warm measurement. `spread` is max−min of the
    * three reps the median came from; `extra` counts re-measurements;
    * `dirty` means the spread criterion still failed after `maxExtra`
    * extra reps (the query lands in the JSON's `contaminated` list).
    */
  final case class Warm(median: Double, spread: Double, extra: Int, dirty: Boolean)

  /** Warm-rep policy, self-defending against machine-load contamination:
    * rounds 8–10 each shipped a driver-side bench with a query whose two
    * warm reps disagreed 15× because another process stole the cores
    * mid-rep — the harness RECORDED the spread but still published the
    * inflated median. Policy: take 3 reps; while the best (smallest) 3
    * observed disagree by more than max(0.5 s, 50% of their min), take up
    * to `maxExtra` more. Publish the median of the best 3 — under load
    * the smallest observations are the least contaminated, and when the
    * machine is idle this degenerates to the old median-of-3 exactly
    * (the loop never fires, rep order is untouched). A query still dirty
    * after `maxExtra` extra reps is published but flagged.
    *
    * Pure over the `rep` thunk so the policy itself is unit-testable with
    * scripted durations (no sleeps, no Spark).
    */
  def cleanWarm(rep: () => Double, maxExtra: Int = 4): Warm = {
    val reps = scala.collection.mutable.ArrayBuffer(rep(), rep(), rep())
    def best3: Seq[Double] = reps.sorted.take(3).toSeq
    def dirty(s: Seq[Double]) = (s.last - s.head) > math.max(0.5, 0.5 * s.head)
    var extra = 0
    while (dirty(best3) && extra < maxExtra) { reps += rep(); extra += 1 }
    val b = best3
    Warm(b(1), b.last - b.head, extra, dirty(b))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Engine.session("graft-bench")
    // Timing materializes every output row through the noop sink: a count()
    // on top would let Catalyst PRUNE the projected expressions (and
    // eliminate sorts), so projection-only queries (fingerprints, sanitize,
    // quality features…) would time a bare zero-column scan instead of the
    // operator under test.
    def materialize(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    // Contention telemetry (round-14): the tail floor probe below runs
    // after 245 queries of GC churn, so it conflates ambient steal with
    // the run's own wake; the START-of-run floor plus the 1-min load
    // average at both ends are the clean signals tools/bench_drift.py
    // gates round closes on (r13's three closing benches all ran under
    // hypervisor steal that only the hand-read SCALE.md caveat caught).
    def load1: Double =
      try scala.io.Source.fromFile("/proc/loadavg").mkString.split("\\s+")(0).toDouble
      catch { case scala.util.control.NonFatal(_) => -1.0 }
    def floorProbe(): Double = {
      val q = () => Tables(spark, sfDir).embeddings.select("vec_id").limit(1).count()
      q(); q() // warm
      val ts = (1 to 3).map { _ => val t0 = System.nanoTime(); q(); (System.nanoTime() - t0) / 1e9 }
      ts.sorted.apply(1) // median of 3
    }
    val load1Start = load1
    val floorStart = floorProbe()
    // Each query runs once cold (one-off JVM / whole-stage-codegen
    // compilation and file-listing costs) then through [[cleanWarm]]: three
    // warm reps, extended with up to four more whenever the spread says the
    // machine was loaded mid-query, publishing the median of the best
    // three. Median-of-3, not min-of-2: typed-Dataset queries are
    // JIT-bimodal at toy scale (d8 swung 0.73↔2.9 s between identical
    // runs), and a min hides exactly the variance that makes a regression
    // attributable; the spread column says whether a delta vs last round
    // is plan or noise, and `contaminated` lists queries that never
    // produced three consistent reps.
    val results: Map[String, Either[String, (Double, Warm)]] = SparkEntry.queries.map { case (name, fn) =>
      val r =
        try {
          val t0 = System.nanoTime(); materialize(fn(spark, sfDir))
          val cold = (System.nanoTime() - t0) / 1e9
          val warm = cleanWarm { () =>
            val t1 = System.nanoTime(); materialize(fn(spark, sfDir))
            (System.nanoTime() - t1) / 1e9
          }
          Right((cold, warm))
        } catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getClass.getSimpleName}: ${e.getMessage}")
          Left(e.getClass.getSimpleName)
        }
      // Release per-query state so later queries aren't taxed by earlier
      // ones: ContextCleaner frees broadcasts/shuffles only after driver GC,
      // and 60 queries of lag showed up as a 15x slowdown on one of them.
      spark.catalog.clearCache()
      System.gc()
      name -> r
    }
    // Per-query job FLOOR: the steady-state cost of scheduling one trivial
    // parquet-backed job (scan 1 column, limit 1). Reported so per-query
    // ratios vs BASELINE.md can subtract Spark's fixed overhead — a 0.15 s
    // "query" that is 0.1 s floor is not a 3x-slower operator.
    val floor   = floorProbe()
    val load1End = load1
    val qs = results.toSeq.sortBy(_._1).map {
      case (k, Right((_, w))) => "\"" + k + "\":" + w.median
      case (k, Left(_))       => "\"" + k + "\":-1"
    }.mkString("{", ",", "}")
    val spreads = results.toSeq.sortBy(_._1).collect {
      case (k, Right((_, w))) => "\"" + k + "\":" + math.rint(w.spread * 1000) / 1000
    }.mkString("{", ",", "}")
    val contaminated = results.toSeq.sortBy(_._1).collect {
      case (k, Right((_, w))) if w.dirty => "\"" + k + "\""
    }.mkString("[", ",", "]")
    val extraReps = results.values.collect { case Right((_, w)) => w.extra }.sum
    val ok    = results.values.collect { case Right(v) => v }
    val total = if (ok.nonEmpty) ok.map(_._2.median).sum else 0.0
    val cold  = if (ok.nonEmpty) ok.map(_._1).sum else 0.0
    val nErr  = results.values.count(_.isLeft)
    val full  = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"warm_spread":$spreads,"contaminated":$contaminated,"extra_reps":$extraReps,"errors":$nErr,"cold_total":$cold,"floor":$floor,"floor_start":$floorStart,"load1_start":$load1Start,"load1_end":$load1End,"sf":"$sfDir"}"""
    println(full)
    // The harness keeps only the last ~2000 chars of output, and 90+ queries
    // push the full line past that — it has arrived truncated (unparseable)
    // every round so far. So the full line also lands in bench_full.json, and
    // the LAST line printed is a compact digest that always fits the tail
    // window: total/floor/errors plus the queries that map 1:1 onto
    // BASELINE.md rows (search, ingest, clustering+naming, PCA) and the five
    // slowest, 3-decimal precision.
    // only advertise the full-line file if the write actually succeeded
    val fullRef =
      try {
        java.nio.file.Files.writeString(java.nio.file.Paths.get("bench_full.json"), full + "\n")
        ""","queries_full":"bench_full.json""""
      } catch { case _: Throwable => "" }
    def r3(d: Double) = math.rint(d * 1000) / 1000
    val warmOf   = results.collect { case (k, Right((_, w))) => k -> w.median }
    val headline = Seq("v1_cosine_topk", "v6_ivf_ann", "p1_ingest_pipeline", "m1_kmeans", "m2_cluster_naming", "m3_pca_3d")
    val slowest  = warmOf.toSeq.sortBy(-_._2).take(5).map(_._1)
    val digest = (headline ++ slowest).distinct.flatMap(k => warmOf.get(k).map(w => "\"" + k + "\":" + r3(w)))
      .mkString("{", ",", "}")
    // Print the digest AFTER spark.stop(): it must be the absolutely last
    // stdout line of the run (the driver parses the tail of stdout as JSON;
    // build.sbt's StdoutOutput/showSuccess strip sbt's decoration around it).
    // Spark's own shutdown chatter goes to stderr, but stopping first makes
    // the ordering independent of log4j configuration.
    val digestLine =
      s"""{"metric":"total","value":${r3(total)},"unit":"sec","queries":$digest,"n_queries":${results.size},"errors":$nErr,"contaminated":$contaminated,"cold_total":${r3(cold)},"floor":${r3(floor)}$fullRef,"sf":"$sfDir"}"""
    spark.stop()
    println(digestLine)
    System.out.flush()
  }
}
