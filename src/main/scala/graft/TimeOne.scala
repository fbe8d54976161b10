package graft
import org.apache.spark.sql.SparkSession

/** Throwaway single-query timer: runMain graft.TimeOne <query> <sfDir> [reps] */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val name  = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val reps  = if (args.length > 2) args(2).toInt else 3
    val cpus  = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(name)
    (1 to reps).foreach { i =>
      // noop sink, same as Bench: count() would let Catalyst prune the
      // projected expressions and time a bare scan
      val t0 = System.nanoTime(); fn(spark, sfDir).write.mode("overwrite").format("noop").save()
      println(f"[timeone] $name rep$i ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
