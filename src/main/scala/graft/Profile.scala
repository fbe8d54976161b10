package graft

import org.apache.spark.scheduler._
import scala.collection.mutable

/** Per-query stage-level profiler (optimization-round measurement harness,
  * guide §1). Runs named declared queries exactly as Bench does (cold once,
  * then N warm reps through the noop sink) with a listener that attributes
  * time to (a) per-stage executor run/CPU/GC time, shuffle and I/O bytes,
  * keyed by the stage's callsite name, and (b) the driver-side remainder
  * (wall − scheduled-job time): planning, collects, file-system calls.
  *
  * Output (stderr, `[profile]`-prefixed so sbt noise greps away):
  * per query, the warm wall seconds, job count, and the top stages by
  * executor time with task counts and bytes. Usage:
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.Profile v32_ab_significance m5_umap"
  *
  * Not part of the driver contract; changes nothing a query computes.
  */
object Profile {

  final class Agg extends SparkListener {
    final case class StageRow(var name: String, var tasks: Int = 0, var runMs: Long = 0,
        var cpuMs: Long = 0, var gcMs: Long = 0, var shRead: Long = 0, var shWrite: Long = 0,
        var inBytes: Long = 0, var wallMs: Long = 0)
    // keyed by (stageId, attemptNumber): merging attempts summed wall across
    // retries and counted failed-attempt task metrics into one row (r16
    // advisor) — per-attempt rows make retry inflation visible instead
    val stages = mutable.LinkedHashMap.empty[(Int, Int), StageRow]
    var jobs = 0
    var jobMs = 0L
    private val jobStart = mutable.Map.empty[Int, Long]
    /** Monotone change counter so the harness can poll for quiescence. */
    @volatile var events = 0L
    override def onJobStart(e: SparkListenerJobStart): Unit = synchronized {
      jobs += 1; jobStart(e.jobId) = e.time; events += 1
    }
    override def onJobEnd(e: SparkListenerJobEnd): Unit = synchronized {
      jobStart.remove(e.jobId).foreach(t0 => jobMs += e.time - t0); events += 1
    }
    override def onStageSubmitted(e: SparkListenerStageSubmitted): Unit = synchronized {
      val si = e.stageInfo
      val row = stages.getOrElseUpdate((si.stageId, si.attemptNumber), StageRow(si.name))
      if (row.name == "?") row.name = si.name
      events += 1
    }
    override def onStageCompleted(e: SparkListenerStageCompleted): Unit = synchronized {
      val si = e.stageInfo
      val row = stages.getOrElseUpdate((si.stageId, si.attemptNumber), StageRow(si.name))
      if (row.name == "?") row.name = si.name
      row.wallMs += (for {a <- si.completionTime; b <- si.submissionTime} yield a - b).getOrElse(0L)
      events += 1
    }
    override def onTaskEnd(e: SparkListenerTaskEnd): Unit = synchronized {
      events += 1
      val m = e.taskMetrics
      if (m != null) {
        val row = stages.getOrElseUpdate((e.stageId, e.stageAttemptId), StageRow("?"))
        row.tasks += 1
        row.runMs += m.executorRunTime
        row.cpuMs += m.executorCpuTime / 1000000L
        row.gcMs += m.jvmGCTime
        row.shRead += m.shuffleReadMetrics.totalBytesRead
        row.shWrite += m.shuffleWriteMetrics.bytesWritten
        row.inBytes += m.inputMetrics.bytesRead
      }
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps  = sys.env.getOrElse("SPARK_GRAFT_PROFILE_REPS", "2").toInt
    val spark = Engine.session("graft-profile")
    def materialize(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    val all = SparkEntry.queries
    val names = if (args.nonEmpty) args.toSeq else Seq.empty
    val unknown = names.filterNot(all.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
    def p(s: String): Unit = System.err.println(s"[profile] $s")
    names.foreach { name =>
      val fn = all(name)
      materialize(fn(spark, sfDir)) // cold
      spark.catalog.clearCache(); System.gc()
      val agg = new Agg
      spark.sparkContext.addSparkListener(agg)
      val t0 = System.nanoTime()
      (1 to reps).foreach(_ => materialize(fn(spark, sfDir)))
      val wallMs = (System.nanoTime() - t0) / 1e6
      // let straggler listener events drain before reading the aggregates:
      // poll until the aggregate stops changing for two consecutive probes
      // (r16 advisor: a fixed sleep silently dropped late onTaskEnd events
      // under load, understating the profiled totals)
      locally {
        var last   = -1L
        var stable = 0
        var waited = 0
        while (stable < 2 && waited < 5000) {
          Thread.sleep(100); waited += 100
          val cur = agg.events
          if (cur == last) stable += 1 else { stable = 0; last = cur }
        }
      }
      spark.sparkContext.removeSparkListener(agg)
      p(f"===== $name: warm wall ${wallMs / 1000 / reps}%.3f s/rep x $reps reps, " +
        f"${agg.jobs} jobs, job-scheduled ${agg.jobMs / 1000.0}%.2f s, " +
        f"driver gap ${(wallMs - agg.jobMs) / 1000}%.2f s =====")
      // merge stage instances by callsite name (reps and retries collapse)
      val byName = agg.stages.values.groupBy(_.name).map { case (n, rows) =>
        val m = new agg.StageRow(n)
        rows.foreach { r =>
          m.tasks += r.tasks; m.runMs += r.runMs; m.cpuMs += r.cpuMs; m.gcMs += r.gcMs
          m.shRead += r.shRead; m.shWrite += r.shWrite; m.inBytes += r.inBytes
          m.wallMs += r.wallMs
        }
        (m, rows.size)
      }.toSeq.sortBy(-_._1.runMs).take(16)
      byName.foreach { case (r, inst) =>
        p(f"  run ${r.runMs}%6d ms cpu ${r.cpuMs}%6d gc ${r.gcMs}%4d wall ${r.wallMs}%6d " +
          f"x$inst%-3d tasks ${r.tasks}%4d shR ${r.shRead / 1024}%7d KB shW ${r.shWrite / 1024}%7d KB " +
          f"in ${r.inBytes / 1024}%8d KB  ${r.name.take(100)}")
      }
      spark.catalog.clearCache(); System.gc()
    }
    spark.stop()
  }
}
