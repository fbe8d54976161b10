package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Pluggable embedding seam (SURVEY §2.5 V2/V3).
  *
  * The reference embeds with SentenceTransformers behind a per-process
  * singleton + batch encode (reference: backend/embedding_service.py:16-27,
  * 64-84). Torch outputs aren't reproducible on the JVM, so the engine's
  * contract is this trait: production plugs an ONNX/DJL model in
  * `mapPartitions`; tests and oracle runs use the deterministic
  * [[HashingEmbedder]].
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
    val toks = Option(text).getOrElse("").toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
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
    df.selectExpr(s"$idCol as id", s"$textCol as text")
      .as[(Long, String)]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          val vecs = embedder.embedBatch(batch.map(_._2))
          batch.iterator.zip(vecs.iterator).map { case ((id, t), v) => Embedded(id, t, v) }
        }
      }
  }
}
