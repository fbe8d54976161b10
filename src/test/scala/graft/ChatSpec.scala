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
}
