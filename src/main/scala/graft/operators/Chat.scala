package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Instruction/SFT data preparation — the step between a raw conversation
  * corpus and a trainable token stream. A fine-tuning pipeline needs three
  * things per conversation, all deterministic: the RENDERED training
  * string (a chat template over the turns), the LOSS-MASK SPANS (train on
  * assistant content only — the markers, system prompt and user turns are
  * context, not targets), and a VALIDITY gate (role structure a collator
  * can rely on). The reference stores flat documents only; this family is
  * part of the beyond-reference LLM-pipeline surface, next to packing
  * (`u11`) and MLM masking (`x25`) which consume exactly this output.
  *
  * Template: ChatML-shaped markers (`<|im_start|>role\ncontent<|im_end|>\n`
  * — the OpenAI/Qwen lineage format, public spec). Offsets are CHARACTER
  * offsets into the rendered string, so downstream tokenizers can map
  * spans through their own offset tracking.
  *
  * Plan shape: pure per-row HOF projections over the turn array — no
  * explode, no shuffle, one output row per conversation; the running
  * character offset is a single `aggregate` fold per row. Linear in
  * corpus bytes at any scale.
  */
object Chat {

  val BeginMark = "<|im_start|>"
  val EndMark   = "<|im_end|>\n"

  private def header(role: Column) = concat(lit(BeginMark), role, lit("\n"))
  private def part(t: Column) =
    concat(header(t.getField("role")), t.getField("content"), lit(EndMark))

  /** Rendered template over a `array<struct<role, content>>` column. */
  def rendered(turns: Column): Column =
    concat_ws("", transform(turns, part(_)))

  /** Assistant-content [start, end) character spans into [[rendered]] —
    * one `aggregate` fold carrying (offset, spans).
    */
  def maskSpans(turns: Column): Column = {
    val zero = struct(
      lit(0L).as("off"),
      array().cast("array<struct<s:bigint,e:bigint>>").as("spans"))
    val step = (acc: Column, t: Column) => {
      val start = acc.getField("off") + length(header(t.getField("role")))
      val end   = start + length(t.getField("content"))
      struct(
        (acc.getField("off") + length(part(t))).as("off"),
        when(t.getField("role") === "assistant",
          concat(acc.getField("spans"), array(struct(start.as("s"), end.as("e")))))
          .otherwise(acc.getField("spans")).as("spans"))
    }
    aggregate(turns, zero, step, acc => acc.getField("spans"))
  }

  /** Collator-grade structural validity: an optional leading `system`
    * turn, then a strict user/assistant alternation that starts with
    * `user`, ends on `assistant` (a complete training example), and has
    * at least one exchange.
    */
  def isValid(turns: Column): Column = {
    val roles = transform(turns, t => t.getField("role"))
    val body  = when(element_at(roles, 1) === "system",
      slice(roles, lit(2), greatest(size(roles) - 1, lit(0)))).otherwise(roles)
    val alternating = forall(
      zip_with(body, sequence(lit(0), size(body) - 1),
        (r, i) => r === when(i % 2 === 0, "user").otherwise("assistant")),
      x => x)
    size(body) >= 2 && size(body) % 2 === 0 && alternating
  }

  /** Per-conversation SFT prep over `turnsCol: array<struct<role string,
    * content string>>`: (idCol, n_turns, n_assistant, valid, rendered,
    * mask_spans, mask_chars).
    */
  def render(df: DataFrame, idCol: String, turnsCol: String): DataFrame = {
    val names = df.columns.toSet
    val fixed =
      Seq("n_turns", "n_assistant", "valid", "rendered", "mask_spans", "mask_chars")
    // idCol passes through to the output unchanged, so it must not collide
    // with a fixed output name — filtering it out of the check would
    // silently yield a frame with two identically named columns
    require(!fixed.contains(idCol),
      s"idCol '$idCol' collides with a fixed output column; rename it first")
    fixed.foreach(c => require(!names.contains(c), s"input already has a '$c' column"))
    val turns = col(turnsCol)
    val spans = maskSpans(turns)
    df.select(
      col(idCol),
      size(turns).cast("long").as("n_turns"),
      size(filter(turns, t => t.getField("role") === "assistant")).cast("long").as("n_assistant"),
      isValid(turns).as("valid"),
      rendered(turns).as("rendered"),
      spans.as("mask_spans"),
      aggregate(spans, lit(0L),
        (acc, s) => acc + (s.getField("e") - s.getField("s"))).as("mask_chars"))
  }

  /** DPO/RLHF preference-pair construction — the step between scored
    * candidate responses and a trainable (chosen, rejected) dataset
    * (Rafailov 2023's data contract; also what a reward-model trainer
    * consumes). Per prompt: chosen = highest-scored candidate, rejected =
    * lowest-scored, emitted only when the margin clears `minMargin` and
    * the prompt has >= 2 candidates — same-score pairs teach nothing and
    * flip under tie-reorderings, so the margin gate is strict (>).
    *
    * Determinism contract (oracle-replayable): ties on score break to the
    * LOWEST candidate id for chosen and the HIGHEST for rejected, so a
    * prompt whose candidates all tie picks (min id, max id) and is then
    * dropped by the margin gate. Scores must be non-null AND non-NaN
    * (a NaN wins Spark's struct-max ordering and its margin passes the
    * strict > gate) — enforced by an INLINE raise_error on the score as
    * it enters the tie structs, so validation is lazy, distributed and
    * costs no extra scan — and ids must be numeric (the tie order rides
    * on the negated id).
    *
    * Plan shape: ONE map-side-combinable aggregate — chosen/rejected are
    * struct-ordered max/min (score, then negated id, so the lexicographic
    * struct order IS the tie-break), so there are no windows, no
    * self-join, and the single shuffle carries one partial row per
    * (partition, prompt). Output is one row per surviving prompt.
    */
  def preferencePairs(
      df: DataFrame,
      promptCol: String,
      idCol: String,
      scoreCol: String,
      minMargin: Double = 0.0,
  ): DataFrame = {
    require(minMargin >= 0.0, s"minMargin must be >= 0: $minMargin")
    val reserved = Seq("chosen_id", "rejected_id", "chosen_score", "rejected_score",
      "margin", "n_candidates", "__best", "__worst")
    reserved.foreach(c => require(!df.columns.contains(c), s"input already has a '$c' column"))
    // inline fail-loud: null breaks totality, NaN wins the struct max and
    // leaks a NaN margin past the strict > gate — reject both where the
    // score enters the tie order (lazy, codegen'd, no validation scan)
    val sRaw = col(scoreCol).cast("double")
    val sChecked = when(sRaw.isNull || isnan(sRaw),
      raise_error(format_string(
        s"'$scoreCol' must be non-null and non-NaN for the tie orders to be " +
          "total: offending candidate id %s", col(idCol).cast("string"))))
      .otherwise(sRaw)
    // (s, -id, id): max picks top score with LOWEST id, min picks bottom
    // score with HIGHEST id — the third field just carries the id out
    val key = struct(sChecked.as("s"),
      (-col(idCol)).as("ni"), col(idCol).as("i"))
    df.groupBy(col(promptCol))
      .agg(
        count(lit(1)).as("n_candidates"),
        max(key).as("__best"),
        min(key).as("__worst"))
      .where(col("n_candidates") >= 2 &&
        (col("__best.s") - col("__worst.s")) > minMargin)
      .select(col(promptCol),
        col("__best.i").as("chosen_id"),
        col("__worst.i").as("rejected_id"),
        col("__best.s").as("chosen_score"),
        col("__worst.s").as("rejected_score"),
        (col("__best.s") - col("__worst.s")).as("margin"),
        col("n_candidates"))
  }
}
