package graft.sources

import java.util.zip.{ZipEntry, ZipOutputStream}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.TaskContext
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Row}

/** S17 — the ZIP export sink (reference: backend/main.py:917-1000 streams
  * every upload through the API process into ONE zip). A single zip is
  * inherently a one-writer stream, so the distributed re-expression follows
  * the part-file contract every Spark sink uses: one `part-NNNNN.zip` per
  * partition, written on the executors, entries sorted by arcname within a
  * part for determinism. Declared deviation: N part zips instead of one
  * monolith — at 100 TB a single zip stream through the driver IS the
  * bottleneck (and >4 GB zips need zip64 anyway); consumers extract the
  * parts side by side. Arcname RULES (folder path resolution, `__root__`,
  * `unsorted/` fallback) are J5+J4 — see SparkEntry's s17 queries.
  */
object Export {

  /** Write (arcname, content) rows as one zip file per non-empty partition
    * under `outDir`. Content column must be binary (`encode(...)` strings
    * first). Idempotent under task retries: a re-executed task overwrites
    * its own part file.
    */
  def zipExport(df: DataFrame, outDir: String, nameCol: String = "arcname", contentCol: String = "content"): Unit =
    df.select(col(nameCol).cast("string"), col(contentCol))
      .sortWithinPartitions(nameCol)
      .foreachPartition { (it: Iterator[Row]) =>
        if (it.hasNext) {
          val part = new Path(outDir, f"part-${TaskContext.getPartitionId()}%05d.zip")
          // executor-local Configuration: the default FS resolution is all
          // the sink needs (local in tests, HDFS/object store on a cluster)
          val fs = part.getFileSystem(new Configuration())
          val zos = new ZipOutputStream(fs.create(part, true))
          // Python's zipfile writes duplicate arcnames with a warning;
          // ZipOutputStream throws. Uniquify deterministically instead of
          // failing the task: second 'a.txt' becomes 'a (1).txt'.
          val seen = scala.collection.mutable.HashMap.empty[String, Int]
          try it.foreach { r =>
            val name = r.getString(0)
            val n    = seen.getOrElse(name, 0)
            seen(name) = n + 1
            val arcname =
              if (n == 0) name
              else {
                val dot = name.lastIndexOf('.')
                if (dot > name.lastIndexOf('/')) s"${name.substring(0, dot)} ($n)${name.substring(dot)}"
                else s"$name ($n)"
              }
            zos.putNextEntry(new ZipEntry(arcname))
            zos.write(r.getAs[Array[Byte]](1))
            zos.closeEntry()
          } finally zos.close()
        }
      }

  /** Read every entry of every `part-*.zip` under `dir` back as rows —
    * the verification half of the round trip (distributed: zips are opened
    * on executors via the binaryFile source).
    */
  def zipEntries(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.operators.Multimodal.binaryTable(spark, dir, "*.zip")
      .select("file_name", "content").as[(String, Array[Byte])]
      .flatMap { case (zip, bytes) =>
        Ooxml.entries(bytes).map { case (name, content) => (zip, name, content) }
      }
      .toDF("zip_part", "arcname", "content")
  }
}
