package graft.onnx

/** Generator for the COMMITTED checkpoint fixtures under
  * `fixtures/onnx/checkpoint` (embedder) and `fixtures/onnx/checkpoint_cross`
  * (cross-encoder): the [[TinyMpnet]] artifact pairs plus pinned
  * `parity.tsv`/`cross_parity.tsv` reports, so [[ParityCheck]]'s
  * deployment gate runs UNCONDITIONALLY in `sbt test` against an on-disk
  * model — no `GRAFT_MPNET_DIR` needed.
  *
  * Pinning stance: the expected vectors/logits are produced ONCE by this
  * runtime and committed. That is a REGRESSION pin, not the correctness
  * proof — architecture fidelity is established separately by OnnxSpec's
  * independent double-precision forward over the same deterministic
  * weights. The pin is what catches future drift anywhere on the
  * deployment path (tokenizer, op kernels, pooling, normalization, TSV
  * plumbing) the moment it happens, instead of only on machines where the
  * real-weights export script has run.
  *
  * `runMain graft.onnx.CheckpointFixture [embDir crossDir]` regenerates
  * both directories byte-identically (deterministic weights, single-batch
  * embed, fixed formatting).
  */
object CheckpointFixture {

  /** Probe set mirroring export_mpnet_parity.py's coverage axes, scaled to
    * the tiny vocab: in-vocab prose, subword splits, all-UNK, punctuation,
    * a single word, a long (32-token) sequence, unicode→UNK mixing.
    */
  val probes: Seq[String] = Seq(
    "the spark engine",
    "the tokenizer dedup pipeline quality stream scan",
    "zzz qqq",
    "merge sort read write , .",
    "batch",
    Seq.fill(8)("vector search index join").mkString(" "),
    "café naïve the engine",
    "spark spark spark spark spark spark spark",
  )

  val crossPairs: Seq[(String, String)] = Seq(
    ("the spark engine", "vector search index"),
    ("the spark engine", "the spark engine"),
    ("dedup stream", "zzz qqq"),
    ("token quality", "merge sort read write"),
  )

  def main(args: Array[String]): Unit = {
    val embDir   = args.lift(0).getOrElse("fixtures/onnx/checkpoint")
    val crossDir = args.lift(1).getOrElse("fixtures/onnx/checkpoint_cross")

    val (mp, vp) = TinyMpnet.writeTo(embDir)
    val emb  = new OnnxEmbedder(mp, vp, TinyMpnet.hidden)
    val vecs = emb.embedBatch(probes)
    val pw = new java.io.PrintWriter(new java.io.File(s"$embDir/parity.tsv"), "UTF-8")
    try {
      pw.println(s"dim\t${TinyMpnet.hidden}")
      probes.zip(vecs).foreach { case (s, v) =>
        pw.println(s + "\t" + v.map(f => String.format(java.util.Locale.ROOT, "%.8e", Float.box(f))).mkString(","))
      }
    } finally pw.close()

    val (cmp, cvp) = TinyMpnet.writeCrossTo(crossDir)
    val ce = new OnnxCrossEncoder(cmp, cvp)
    val cw = new java.io.PrintWriter(new java.io.File(s"$crossDir/cross_parity.tsv"), "UTF-8")
    try {
      cw.println("query\tdoc\tlogit")
      crossPairs.groupBy(_._1).toSeq.sortBy(_._1).foreach { case (q, rows) =>
        val scores = ce.scoreBatch(q, rows.map(_._2))
        rows.zip(scores).foreach { case ((_, d), s) =>
          cw.println(q + "\t" + d + "\t" + String.format(java.util.Locale.ROOT, "%.8e", Double.box(s)))
        }
      }
    } finally cw.close()
    println(s"wrote $embDir (model.onnx, vocab.txt, parity.tsv: ${probes.length} probes) and " +
      s"$crossDir (cross_parity.tsv: ${crossPairs.length} pairs)")
  }
}
