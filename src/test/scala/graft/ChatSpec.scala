package graft

import graft.operators.Chat
import org.scalatest.funsuite.AnyFunSuite

/** Chat/SFT prep contract: exact ChatML rendering, hand-computed
  * loss-mask character offsets, and the collator validity rule.
  */
class ChatSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def mk(id: Long, turns: Seq[(String, String)]) = (id, turns)

  private def run(rows: Seq[(Long, Seq[(String, String)])]) =
    Chat.render(
      rows.toDF("id", "turns")
        .selectExpr("id", "transform(turns, t -> named_struct('role', t._1, 'content', t._2)) AS turns"),
      "id", "turns")

  test("rendering and mask spans match hand computation") {
    val out = run(Seq(mk(1L, Seq("user" -> "hi", "assistant" -> "yo"))))
      .selectExpr("n_turns", "n_assistant", "valid", "rendered",
        "transform(mask_spans, s -> concat(s.s, ':', s.e)) AS spans", "mask_chars")
      .as[(Long, Long, Boolean, String, Seq[String], Long)].head()
    val expected = "<|im_start|>user\nhi<|im_end|>\n<|im_start|>assistant\nyo<|im_end|>\n"
    // part1 = 17 (header) + 2 + 11 = 30 chars; assistant header = 22
    assert(out == ((2L, 1L, true, expected, Seq("52:54"), 2L)))
    // span really covers the assistant content
    assert(expected.substring(52, 54) == "yo")
  }

  test("multiple assistant turns accumulate spans through the running offset") {
    val out = run(Seq(mk(1L, Seq(
      "system" -> "be nice", "user" -> "a", "assistant" -> "bb",
      "user" -> "c", "assistant" -> "dddd"))))
      .selectExpr("valid", "rendered",
        "transform(mask_spans, s -> concat(s.s, ':', s.e)) AS spans", "mask_chars")
      .as[(Boolean, String, Seq[String], Long)].head()
    assert(out._1 && out._4 == 6L && out._3.length == 2)
    for (sp <- out._3) {
      val Array(s, e) = sp.split(":").map(_.toInt)
      assert(Set("bb", "dddd").contains(out._2.substring(s, e)))
    }
  }

  test("property: every mask span lies inside the rendered string and covers exactly its assistant content") {
    // 60 generated conversations with varied role sequences and contents
    // (including empty contents and template-metacharacter text)
    val roles = Vector("system", "user", "assistant")
    val cases = (0 until 60).map { i =>
      val n = i % 7 + 1
      val turns = (0 until n).map { j =>
        val role = roles((i * 31 + j * 17) % 3)
        val content = ((i * 13 + j) % 4) match {
          case 0 => ""
          case 1 => s"c$i-$j"
          case 2 => "<|im_start|>sneaky<|im_end|>" // template metachars in content
          case _ => s"word " * (j + 1)
        }
        (role, content.trim + (if (content.endsWith(" ")) "" else ""))
      }
      (i.toLong, turns)
    }
    val rows = run(cases)
      .selectExpr("id", "rendered",
        "transform(mask_spans, s -> concat(s.s, ':', s.e)) AS spans", "mask_chars", "n_assistant")
      .as[(Long, String, Seq[String], Long, Long)].collect()
    val byId = cases.toMap
    for ((id, rendered, spans, maskChars, nAssistant) <- rows) {
      val contents = byId(id).filter(_._1 == "assistant").map(_._2)
      assert(spans.length.toLong == nAssistant && spans.length == contents.length, s"conv $id")
      var total = 0L
      for ((sp, want) <- spans.zip(contents)) {
        val Array(s, e) = sp.split(":").map(_.toInt)
        assert(s >= 0 && e >= s && e <= rendered.length, s"conv $id: span $sp out of bounds")
        assert(rendered.substring(s, e) == want, s"conv $id: span covers '${rendered.substring(s, e)}' not '$want'")
        total += e - s
      }
      assert(total == maskChars, s"conv $id: mask_chars")
    }
  }

  test("an idCol named like a fixed output column is rejected, not silently duplicated") {
    val df = Seq((1L, Seq(("user", "hi"), ("assistant", "yo"))))
      .toDF("valid", "turns")
      .selectExpr("valid", "transform(turns, t -> named_struct('role', t._1, 'content', t._2)) AS turns")
    val e = intercept[IllegalArgumentException](Chat.render(df, "valid", "turns"))
    assert(e.getMessage.contains("collides"))
  }

  test("validity: alternation, user-start, assistant-end, system only leading") {
    val cases = Seq(
      mk(1L, Seq("user" -> "a", "assistant" -> "b")),                     // valid
      mk(2L, Seq("system" -> "s", "user" -> "a", "assistant" -> "b")),    // valid
      mk(3L, Seq("assistant" -> "b", "user" -> "a")),                     // wrong start
      mk(4L, Seq("user" -> "a")),                                         // no exchange
      mk(5L, Seq("user" -> "a", "assistant" -> "b", "user" -> "c")),      // dangling user
      mk(6L, Seq("user" -> "a", "user" -> "b")),                          // no alternation
      mk(7L, Seq("user" -> "a", "system" -> "s")),                        // system not leading
    )
    val got = run(cases).selectExpr("id", "valid").as[(Long, Boolean)].collect().toMap
    assert(got == Map(1L -> true, 2L -> true, 3L -> false, 4L -> false,
      5L -> false, 6L -> false, 7L -> false))
  }

  test("preferencePairs: margin gate, tie-breaks, single-candidate and all-tied prompts dropped") {
    val cands = Seq(
      // prompt 1: clear winner/loser, margin 0.4 > 0.05 -> emitted
      (1L, 10L, 0.9), (1L, 11L, 0.5), (1L, 12L, 0.7),
      // prompt 2: margin 0.01 <= 0.05 -> dropped
      (2L, 20L, 0.51), (2L, 21L, 0.50),
      // prompt 3: single candidate -> dropped
      (3L, 30L, 0.9),
      // prompt 4: all tied -> chosen=min id, rejected=max id, margin 0 -> dropped
      (4L, 40L, 0.6), (4L, 41L, 0.6), (4L, 42L, 0.6),
      // prompt 5: ties at BOTH ends -> chosen = lowest id of the top
      // score, rejected = highest id of the bottom score
      (5L, 50L, 0.8), (5L, 51L, 0.8), (5L, 52L, 0.2), (5L, 53L, 0.2),
    ).toDF("prompt_id", "cand_id", "score")
    val out = Chat.preferencePairs(cands, "prompt_id", "cand_id", "score", minMargin = 0.05)
      .orderBy("prompt_id")
      .select("prompt_id", "chosen_id", "rejected_id", "n_candidates")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq((1L, 10L, 11L, 3L), (5L, 50L, 53L, 4L)))
    // margin arithmetic on the emitted row
    val m = Chat.preferencePairs(cands, "prompt_id", "cand_id", "score", minMargin = 0.05)
      .where($"prompt_id" === 1L).select("chosen_score", "rejected_score", "margin")
      .as[(Double, Double, Double)].head()
    assert(m == ((0.9, 0.5, 0.9 - 0.5)))
    // reserved output names rejected on input
    val bad = cands.withColumnRenamed("score", "margin")
    val e = intercept[IllegalArgumentException](
      Chat.preferencePairs(bad, "prompt_id", "cand_id", "margin"))
    assert(e.getMessage.contains("margin"))
  }
}
