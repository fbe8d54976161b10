package graft.streaming

import graft.operators.{Chunker, Embedder}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** Streaming ingestion (SURVEY §2.11): the reference's upload pipeline
  * (§3.2: save → extract → chunk → embed → upsert) re-expressed as a
  * Structured Streaming file-watch source. `Trigger.AvailableNow` drains
  * whatever is in the drop directory and stops — the reference's batch-upload
  * endpoint as a micro-batch job; leaving the default trigger turns the same
  * code into a continuous watcher. Each micro-batch reuses the exact batch
  * operators (chunk flatMap, embed mapPartitions), so streaming and batch
  * ingestion cannot diverge.
  */
object IngestStream {

  /** Watch `dropDir` for text files; chunk + embed each micro-batch and
    * append to `outPath` parquet. Returns the started writer's query.
    */
  def start(
      spark: SparkSession,
      dropDir: String,
      outPath: String,
      checkpoint: String,
      availableNow: Boolean = true,
  ): org.apache.spark.sql.streaming.StreamingQuery = {
    val files = spark.readStream
      .option("wholetext", "true")
      .text(dropDir)
      .withColumn("path", input_file_name())
      .withColumn("file_name", regexp_extract(col("path"), "([^/]+)$", 1))

    val writer: DataStreamWriter[Row] = files.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val docs = batch.select(
          // hash the FULL path — same-named files in different subdirs must
          // not collide into one document id; mask (not abs) keeps
          // Long.MinValue non-negative too
          xxhash64(col("path")).bitwiseAND(lit(Long.MaxValue)).as("doc_id"),
          col("value").as("text"),
          regexp_extract(col("file_name"), "\\.(\\w+)$", 1).as("lang"),
        )
        val chunks = Chunker.chunk(batch.sparkSession, docs).toDF()
        // embed in place: joining embedText back on (doc_id, text) would
        // duplicate rows when two chunks of a doc share identical text, and
        // recompute + shuffle both sides
        val out = Embedder.withEmbedding(chunks, "text")
        out.write.mode("append").parquet(outPath)
      }

    (if (availableNow) writer.trigger(Trigger.AvailableNow()) else writer).start()
  }
}
