package graft

/** Dumps `.explain("formatted")` for named declared queries into
  * plans/r16/<query>_<tag>.txt — the optimization round's before/after
  * plan evidence (the judge reads these instead of running Spark).
  *
  * Usage: runMain graft.PlanSnap <tag> <query> [query ...]
  * Env:   SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_PLANS_DIR
  *        (default plans/r16).
  *
  * Measurement-only harness: changes nothing any query computes.
  */
object PlanSnap {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanSnap <tag> <query> [query ...]")
    val tag    = args.head
    val names  = args.tail.toSeq
    val sfDir  = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val outDir = java.nio.file.Paths.get(sys.env.getOrElse("SPARK_GRAFT_PLANS_DIR", "plans/r16"))
    java.nio.file.Files.createDirectories(outDir)
    val spark   = Engine.session("graft-plansnap")
    val all     = SparkEntry.queries
    val unknown = names.filterNot(all.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
    names.foreach { name =>
      val df   = all(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(outDir.resolve(s"${name}_$tag.txt"),
        plan.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      System.err.println(s"[plansnap] wrote ${name}_$tag.txt (${plan.length} chars)")
    }
    spark.stop()
  }
}
