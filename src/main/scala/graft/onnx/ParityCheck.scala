package graft.onnx

/** Deployment-side fidelity gate for the from-scratch ONNX runtime against
  * REAL pretrained weights (`tools/export_mpnet_parity.py` writes the
  * artifacts): re-embeds the pinned probe sentences through
  * [[OnnxEmbedder]] (the exact distributed-seam code path — WordPiece ids,
  * masked mean pool, L2 normalize) and compares against the torch-side
  * report. [[Export.TinyMpnet]] pins the runtime's ARCHITECTURE fidelity
  * in-sandbox (<2e-5/dim on an mpnet-shaped seeded model); this closes the
  * remaining gap — the numerical range of real weights — wherever a
  * deployment can run the export script.
  *
  * Usage: runMain graft.onnx.ParityCheck <dir with model.onnx, vocab.txt,
  * parity.tsv>. Exit 0 = every probe inside the gate (cosine ≥ 0.9995 AND
  * max|diff| ≤ 5e-3 — loose enough for kernel-order float drift, tight
  * enough that a tokenizer/op defect fails loudly); nonzero otherwise.
  */
object ParityCheck {

  final case class ProbeResult(sentence: String, cosine: Double, maxAbsDiff: Double) {
    def ok: Boolean = cosine >= 0.9995 && maxAbsDiff <= 5e-3
  }

  def run(dir: String): Seq[ProbeResult] = {
    val lines = scala.io.Source.fromFile(s"$dir/parity.tsv", "UTF-8").getLines().toVector
    require(lines.nonEmpty && lines.head.startsWith("dim\t"), s"$dir/parity.tsv: missing dim header")
    val dim = lines.head.split('\t')(1).trim.toInt
    val probes = lines.tail.map { l =>
      val Array(s, v) = l.split('\t')
      s -> v.split(',').map(_.toDouble)
    }
    require(probes.nonEmpty, "parity.tsv has no probe rows")
    val emb = new OnnxEmbedder(s"$dir/model.onnx", s"$dir/vocab.txt", dim)
    // one batch, like the export: padding invariance is TinyMpnet-covered
    val got = emb.embedBatch(probes.map(_._1))
    probes.zip(got).map { case ((s, want), g) =>
      require(want.length == g.length, s"dim mismatch: ${want.length} vs ${g.length}")
      var dot = 0.0; var maxD = 0.0
      var i = 0
      while (i < want.length) {
        dot += want(i) * g(i)
        maxD = math.max(maxD, math.abs(want(i) - g(i)))
        i += 1
      }
      // both sides are L2-normalized, so the dot IS the cosine
      ProbeResult(s, dot, maxD)
    }
  }

  final case class CrossResult(query: String, doc: String, want: Double, got: Double) {
    def ok: Boolean = math.abs(want - got) <= 5e-2
  }

  /** Pair-logit parity for a cross-encoder export
    * (tools/export_crossencoder_parity.py): re-score every
    * `cross_parity.tsv` (query, doc, logit) row through
    * [[OnnxCrossEncoder]] and gate |diff| ≤ 5e-2 — ~0.2% of the MS MARCO
    * logit range, loose for kernel-order drift, tight for real defects.
    */
  def runCross(dir: String): Seq[CrossResult] = {
    val lines = scala.io.Source.fromFile(s"$dir/cross_parity.tsv", "UTF-8").getLines().toVector
    require(lines.nonEmpty && lines.head == "query\tdoc\tlogit",
      s"$dir/cross_parity.tsv: header must be 'query\\tdoc\\tlogit' (3 columns matching the data rows)")
    val probes = lines.tail.map { l =>
      val Array(q, d, v) = l.split('\t')
      (q, d, v.toDouble)
    }
    require(probes.nonEmpty, "cross_parity.tsv has no probe rows")
    val ce = new OnnxCrossEncoder(s"$dir/model.onnx", s"$dir/vocab.txt")
    probes.groupBy(_._1).toSeq.sortBy(_._1).flatMap { case (q, rows) =>
      val got = ce.scoreBatch(q, rows.map(_._2))
      rows.zip(got).map { case ((_, d, want), g) => CrossResult(q, d, want, g) }
    }
  }

  /** Record the per-probe results as TSV — the artifact a deployment
    * checks in next to its model export (committed sample:
    * fixtures/onnx/parity_report.sample.tsv). Format: header row, then
    * `status<TAB>cosine<TAB>max_abs_diff<TAB>sentence` per probe.
    */
  def writeReport(results: Seq[ProbeResult], path: String): Unit = {
    val w = new java.io.PrintWriter(new java.io.File(path), "UTF-8")
    try {
      w.println("status\tcosine\tmax_abs_diff\tsentence")
      results.foreach { r =>
        // a tab/newline inside the probe sentence would corrupt the
        // TSV's column/row structure — flatten to single spaces
        val sent = r.sentence.replaceAll("[\\t\\n\\r]", " ")
        w.println(f"${if (r.ok) "PASS" else "FAIL"}\t${r.cosine}%.6f\t${r.maxAbsDiff}%.2e\t$sent")
      }
    } finally w.close()
  }

  def main(args: Array[String]): Unit = {
    require(args.length == 1,
      "usage: ParityCheck <dir with model.onnx, vocab.txt, parity.tsv|cross_parity.tsv>")
    val dir = args(0)
    if (new java.io.File(s"$dir/cross_parity.tsv").exists()) {
      val results = runCross(dir)
      results.foreach { r =>
        println(f"${if (r.ok) "PASS" else "FAIL"}  want=${r.want}%.4f got=${r.got}%.4f  ${r.query.take(30)} | ${r.doc.take(40)}")
      }
      val bad = results.count(!_.ok)
      println(s"cross parity: ${results.size - bad}/${results.size} pairs pass")
      if (bad > 0) sys.exit(1)
      return
    }
    val results = run(dir)
    results.foreach { r =>
      println(f"${if (r.ok) "PASS" else "FAIL"}  cos=${r.cosine}%.6f maxdiff=${r.maxAbsDiff}%.2e  ${r.sentence.take(60)}")
    }
    writeReport(results, s"$dir/parity_report.tsv")
    val bad = results.count(!_.ok)
    println(s"parity: ${results.size - bad}/${results.size} probes pass; report at $dir/parity_report.tsv")
    if (bad > 0) sys.exit(1)
  }
}
