package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Pluggable embedding seam (SURVEY §2.5 V2/V3).
  *
  * The reference embeds with SentenceTransformers behind a per-process
  * singleton + batch encode (reference: backend/embedding_service.py:16-27,
  * 64-84). Torch outputs aren't reproducible on the JVM, so the engine's
  * contract is this trait: production plugs a real model via
  * [[graft.onnx.OnnxEmbedder]] (from-scratch ONNX loader + interpreter —
  * drop in `model.onnx` + `vocab.txt`, round 8); tests and oracle runs
  * use the deterministic [[HashingEmbedder]].
  */
trait Embedder extends Serializable {
  def dim: Int

  /** Batch encode — called once per partition-batch, amortizing model init
    * (the Spark analog of the reference's singleton + 2-thread pool).
    */
  def embedBatch(texts: Seq[String]): Seq[Array[Float]]

  def embed(text: String): Array[Float] = embedBatch(Seq(text)).head
}

/** Deterministic feature-hashing embedder: each token is murmur3-hashed to a
  * bucket with a hash-derived sign (the classic hashing trick), accumulated,
  * then L2-normalized. Same text → same vector on any JVM, any partition
  * order — which is what makes end-to-end search tests golden.
  */
final class HashingEmbedder(val dim: Int = 64) extends Embedder {
  import scala.util.hashing.MurmurHash3

  override def embedBatch(texts: Seq[String]): Seq[Array[Float]] = texts.map { text =>
    val v = new Array[Float](dim)
    val toks = Option(text).getOrElse("").toLowerCase(java.util.Locale.ROOT).split("[^a-z0-9]+").filter(_.nonEmpty)
    for (t <- toks) {
      val h      = MurmurHash3.stringHash(t, 42)
      val bucket = math.floorMod(h, dim)
      val sign   = if (((h >>> 31) & 1) == 0) 1.0f else -1.0f
      v(bucket) += sign
    }
    val norm = math.sqrt(v.foldLeft(0.0)((a, x) => a + x.toDouble * x)).toFloat
    if (norm > 0f) { var i = 0; while (i < dim) { v(i) /= norm; i += 1 } }
    v
  }
}

object Embedder {

  /** Default deterministic embedder: 64-d to match the testdata corpus. */
  val default: Embedder = new HashingEmbedder(64)

  final case class Embedded(id: Long, text: String, embedding: Array[Float])

  /** Distributed batch embedding via `mapPartitions`: one embedder instance
    * per partition, inputs drained in batches (reference batching analog:
    * backend/ingestion.py:106). Narrow op — no shuffle.
    */
  def embedText(
      spark: SparkSession,
      df: DataFrame,
      idCol: String,
      textCol: String,
      embedder: Embedder = default,
      batchSize: Int = 256,
  ): Dataset[Embedded] = {
    import spark.implicits._
    graft.Par.fanOut(df.selectExpr(s"$idCol as id", s"$textCol as text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          val vecs = embedder.embedBatch(batch.map(_._2))
          batch.iterator.zip(vecs.iterator).map { case ((id, t), v) => Embedded(id, t, v) }
        }
      }
  }

  /** Append an embedding column to `df` in place, preserving every other
    * column — the shape a chunk→embed pipeline stage wants. Joining
    * [[embedText]]'s (id, embedding) back onto the source recomputes the
    * source subtree (Spark doesn't CSE across self-joins) and shuffles both
    * sides; this stays a single narrow pass.
    */
  def withEmbedding(
      df: DataFrame,
      textCol: String,
      outCol: String = "embedding",
      embedder: Embedder = default,
      batchSize: Int = 256,
  ): DataFrame = {
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    import org.apache.spark.sql.{Encoders, Row}
    val schema = df.schema.add(outCol, ArrayType(FloatType, containsNull = false))
    val idx    = df.schema.fieldIndex(textCol)
    graft.Par.fanOut(df).mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        val vecs = embedder.embedBatch(batch.map(_.getString(idx)))
        batch.iterator.zip(vecs.iterator).map { case (r, v) => Row.fromSeq(r.toSeq :+ v.toSeq) }
      }
    }(Encoders.row(schema))
  }
}
