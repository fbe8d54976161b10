package graft

/** Dev profiling main: time NAMED queries with exactly [[Bench]]'s
  * materialization (noop sink — a count would let Catalyst prune the
  * projections under test) and print per-rep seconds, so a regression on
  * one query can be attributed without a full-suite run.
  *
  * Usage: runMain graft.BenchOne <sfDir> <reps> <query> [query...]
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: BenchOne <sfDir> <reps> <query> [query...]")
    val sfDir = args(0)
    val reps  = args(1).toInt
    val names = args.drop(2).toSeq
    val spark = Engine.session("graft-bench-one")
    // optional runtime-conf overrides for A/B experiments, e.g.
    // SPARK_GRAFT_CONF="spark.sql.adaptive.enabled=false"
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(';').filter(_.nonEmpty).foreach { kv =>
      kv.split("=", 2) match {
        case Array(k, v) => spark.conf.set(k, v)
        case _ =>
          throw new IllegalArgumentException(
            s"malformed SPARK_GRAFT_CONF entry '$kv' — expected key=value")
      }
    })
    def materialize(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    })
    names.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        throw new IllegalArgumentException(s"unknown query: $name"))
      // the listener bus is ASYNC: events for the action's last jobs can
      // still be queued when the action returns. Poll the counter until it
      // is stable for 100 ms (outside the timed region) so per-rep job
      // counts neither undercount nor bleed into the next rep's reset.
      def stableJobs(): Int = {
        var prev = -1
        var cur  = jobs.get()
        while (cur != prev) { prev = cur; Thread.sleep(100); cur = jobs.get() }
        cur
      }
      val times = (0 until reps).map { _ =>
        jobs.set(0)
        val t0 = System.nanoTime(); materialize(fn(spark, sfDir))
        val sec = (System.nanoTime() - t0) / 1e9
        (sec, stableJobs())
      }
      spark.catalog.clearCache()
      System.gc()
      println(f"[benchone] $name cold=${times.head._1}%.3f " +
        s"warm=${times.tail.map(t => f"${t._1}%.3f").mkString(",")} " +
        s"jobs=${times.map(_._2).mkString(",")}")
    }
    spark.stop()
  }
}
