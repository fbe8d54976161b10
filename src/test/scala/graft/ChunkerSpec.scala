package graft

import graft.operators.{Chunker, DocRow}
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** SURVEY §5.2 chunker properties (invariants embedded in the reference's
  * packing loop, backend/chunker.py:109-152). Property-style via ScalaCheck
  * generators sampled deterministically (scalatestplus bridge isn't in the
  * offline cache).
  */
class ChunkerSpec extends AnyFunSuite {

  private val word     = Gen.oneOf("alpha", "beta", "gamma", "delta", "epsilon", "Zeta", "a", "quantum")
  private val sentence = for {
    n  <- Gen.choose(1, 40)
    ws <- Gen.listOfN(n, word)
    p  <- Gen.oneOf(".", "!", "?")
  } yield ws.mkString(" ").capitalize + p
  private val textGen = for {
    n  <- Gen.choose(0, 60)
    ss <- Gen.listOfN(n, sentence)
  } yield ss.mkString(" ")

  private def samples(n: Int): Seq[String] =
    (0 until n).flatMap(i => textGen.apply(Gen.Parameters.default, Seed(i.toLong)))

  test("every chunk is at most maxTokens tokens — including after overlap re-entry") {
    samples(200).foreach { text =>
      Chunker.chunkProse(text).foreach { case (t, n) =>
        assert(n <= Chunker.MaxTokens, s"chunk of $n tokens > ${Chunker.MaxTokens}")
        assert(Chunker.countTokens(t) == n, "token_count must match the chunk text")
      }
    }
  }

  test("non-empty text produces chunks; chunk_index is dense from 0") {
    samples(200).foreach { text =>
      val chunks = Chunker.chunkDocument(DocRow(1L, text, "en"))
      if (text.trim.nonEmpty) assert(chunks.nonEmpty)
      assert(chunks.map(_.chunk_index) == chunks.indices.toVector)
    }
  }

  test("oversized single sentences are word-packed to <= maxTokens") {
    val huge  = ("word " * 1205).trim
    val parts = Chunker.splitOversized(huge)
    assert(parts.map(Chunker.countTokens) == Vector(500, 500, 205))
    val chunks = Chunker.chunkProse(huge)
    assert(chunks.map(_._2).sum == 1205)
    assert(chunks.forall(_._2 <= Chunker.MaxTokens))
  }

  test("overlap: consecutive chunks share trailing sentences when feasible") {
    // 30 sentences x 30 tokens: chunks of 16 sentences (480 tok) with
    // ~2-sentence (60 >= 50 token) overlap expected.
    val s      = (1 to 30).map(i => ("w" + i + " ") * 29 + "end" + i + ".").map(_.capitalize)
    val text   = s.mkString(" ")
    val chunks = Chunker.chunkProse(text)
    assert(chunks.length > 1)
    chunks.map(_._1).sliding(2).foreach {
      case Seq(a, b) =>
        val aSent = a.split("(?<=\\.)\\s+").toSet
        val bSent = b.split("(?<=\\.)\\s+").toSet
        assert(aSent.intersect(bSent).nonEmpty, "adjacent chunks should overlap")
      case _ => ()
    }
  }

  test("token-counter seam: chunk invariants hold under BOTH counters; boundaries reproducible") {
    val wp = graft.operators.TokenCounters.demo
    samples(120).foreach { text =>
      for (counter <- Seq(graft.operators.TokenCounters.Whitespace, wp)) {
        val chunks = Chunker.chunkProse(text, counter = counter)
        chunks.foreach { case (t, n) =>
          assert(n <= Chunker.MaxTokens, s"[${counter.name}] chunk of $n tokens")
          assert(counter.count(t) == n, s"[${counter.name}] token_count must match the chunk text")
        }
        // deterministic: the same text + counter always yields the same chunks
        assert(Chunker.chunkProse(text, counter = counter) == chunks)
      }
    }
  }

  test("WordPiece counter: greedy longest-match, ## continuations, punctuation, [UNK]") {
    val wp = graft.operators.TokenCounters.demo
    assert(wp.count("the engine") == 2)         // both whole words in vocab
    assert(wp.count("engines") == 2)            // engine + ##s
    assert(wp.count("tokenized") == 2)          // token + ##ized
    assert(wp.count("Spark, distributed!") == 4) // spark , distributed !
    assert(wp.count("xq9") == 3)                // char-level fallback: x ##q ##9
    assert(wp.count("naïve") == 1)              // ï not in vocab → [UNK] = 1
    assert(wp.count("") == 0)
    // parity report vs whitespace: suffixes and punctuation diverge, by design
    val texts = Seq(
      "The engine processes data.",
      "Distributed pipelines scale to tokenized words!",
    )
    val ws = graft.operators.TokenCounters.Whitespace
    texts.foreach { t =>
      info(f"parity: whitespace=${ws.count(t)}%2d wordpiece=${wp.count(t)}%2d  '$t'")
      assert(wp.count(t) > ws.count(t), "WordPiece must count subwords + punctuation separately")
    }
  }

  test("committed vocab fixture: known greedy splits, and chunk boundaries shift vs whitespace") {
    // the SAME vocab c1_wordpiece's DuckDB oracle replays — pin a few
    // splits so a regenerated fixture that drifts breaks here first
    val wp = graft.operators.TokenCounters.fromVocabFile("/root/repo/fixtures/vocab.txt")
    assert(wp.count("spark") == 1,  "full word in vocab")
    assert(wp.count("window") == 2, "wind + ##ow (no full word)")
    assert(wp.count("table") == 2,  "ta + ##ble")
    assert(wp.count("data") == 2,   "da + ##ta")
    assert(wp.count("customer") == 2, "custom + ##er")
    // chunk-boundary parity: the boundary seam reacts to the counter —
    // WordPiece inflates counts, so chunks hold fewer words
    val words = Iterator.continually(Seq("window", "table", "customer", "data", "spark")).flatten
      .take(800).mkString(" ")
    val wsChunks = Chunker.chunkProse(words, counter = graft.operators.TokenCounters.Whitespace)
    val wpChunks = Chunker.chunkProse(words, counter = wp)
    assert(wpChunks.length > wsChunks.length,
      s"WordPiece (${wpChunks.length} chunks) must split earlier than whitespace (${wsChunks.length})")
    wpChunks.foreach { case (t, n) => assert(n <= Chunker.MaxTokens && wp.count(t) == n) }
  }

  test("dispatch: only py/python route to the code chunker (reference parity)") {
    val code = "def f():\n    return 1\n\ndef g():\n    return 2\n"
    val py   = Chunker.chunkDocument(DocRow(1, code, "py"))
    val js   = Chunker.chunkDocument(DocRow(1, code, "js"))
    val none = Chunker.chunkDocument(DocRow(1, code, null))
    // code path packs blocks joined by \n\n; prose path joins "sentences" with spaces
    assert(py.head.text.contains("\n\n"))
    assert(js == none)
  }

  test("code chunker keeps decorators attached to their def (ast.parse never separates them)") {
    val code = "@route('/x')\ndef f():\n    return 1\n@a\n@b\ndef g():\n    return 2\nclass C:\n    pass\n"
    val blocksJoined = Chunker.chunkCode(code).map(_._1).mkString("\n\n")
    // blocks pack joined by \n\n: a decorator followed by a blank-line gap
    // would mean it was split from its def
    assert(!blocksJoined.contains("@route('/x')\n\n"), blocksJoined)
    assert(!blocksJoined.contains("@b\n\n"), blocksJoined)
    assert(blocksJoined.contains("@route('/x')\ndef f():"))
    assert(blocksJoined.contains("@a\n@b\ndef g():"))
    // and plain boundaries still split: class C starts its own block
    assert(Chunker.chunkCode("def f():\n    return 1\nclass C:\n    pass\n", maxTokens = 6).length == 2)
    // async def is a top-level AST node like def — it must start a block
    assert(Chunker.chunkCode("def f():\n    return 1\nasync def g():\n    return 2\n", maxTokens = 6).length == 2)
  }

  test("def-like lines inside triple-quoted strings are not boundaries (ast.parse sees one string)") {
    val code =
      "\"\"\"Module docs.\ndef not_code():\n    pass\n\"\"\"\ndef real():\n    return 1\n" +
        "def g():\n    '''\nclass AlsoNotCode:\n    '''\n    return 2\n"
    // small maxTokens so every block becomes its own chunk — boundary
    // placement is then directly visible in the chunk count and contents
    val chunks = Chunker.chunkCode(code, maxTokens = 8).map(_._1)
    assert(!chunks.exists(_.startsWith("def not_code")), chunks.mkString("<<", ">>,<<", ">>"))
    assert(!chunks.exists(_.startsWith("class AlsoNotCode")), chunks.mkString("<<", ">>,<<", ">>"))
    assert(chunks.exists(_.startsWith("def real")))
    // the docstring travels whole, attached to one block
    assert(chunks.head.contains("def not_code"), chunks.head)
  }

  test("multi-line decorators and signatures stay one logical construct (paren/backslash tracking)") {
    // decorator spanning parens: ast.parse binds the whole call to the def
    val code =
      "@app.route(\n    '/path',\n    methods=['GET'])\ndef handler():\n    return 1\n" +
        "def long_sig(a,\n             b,\n             c):\n    return a\n" +
        "x = 1 + \\\n    2\n" +
        "def after():\n    return 2\n"
    val chunks = Chunker.chunkCode(code, maxTokens = 10).map(_._1)
    // the decorator must not be orphaned from handler
    assert(chunks.exists(c => c.contains("@app.route(") && c.contains("def handler():")),
      chunks.mkString("<<", ">>,<<", ">>"))
    assert(!chunks.exists(_.trim.endsWith("methods=['GET'])")), chunks.mkString("<<", ">>,<<", ">>"))
    // a continuation line of a signature is never a boundary: the whole
    // signature lives in one block
    assert(chunks.exists(c => c.contains("def long_sig(a,") && c.contains("c):")))
    // parens inside strings and comments don't skew the depth: after() is
    // still found as a boundary following a line with unbalanced-looking text
    val tricky =
      "s = '(((' # )))\ndef g():\n    t = \"(\"  # ( in comment\n    return t\ndef h():\n    return ')'\n"
    val tc = Chunker.chunkCode(tricky, maxTokens = 8).map(_._1)
    assert(tc.exists(_.startsWith("def g")), tc.mkString("<<", ">>,<<", ">>"))
    assert(tc.exists(_.startsWith("def h")), tc.mkString("<<", ">>,<<", ">>"))
  }

  test("ast fidelity: parenthesized top-level statements and multi-line decorator args stay whole blocks") {
    val code = Seq(
      "CONFIG = {", "    \"a\": 1,", "}",
      "@app.route(", "    \"/x\",", "    methods=[\"GET\"],", ")",
      "def handler():", "    return 1",
      "X = (1 +", "     2)",
      "@decorator(arg1,", "           arg2)", "@second", "def tail():", "    pass",
    ).mkString("\n")
    // a 16-token budget flushes at every block boundary, exposing them
    // (the largest block is 13 tokens, adjacent pairs exceed 16)
    val blocks = Chunker.chunkCode(code, maxTokens = 16).map(_._1)
    // ast.parse boundaries: the bracketed dict is ONE statement; each
    // decorator chain (multi-line args included) binds to its def
    assert(blocks(0) == "CONFIG = {\n    \"a\": 1,\n}", blocks.mkString("<<", ">>,<<", ">>"))
    assert(blocks(1) ==
      "@app.route(\n    \"/x\",\n    methods=[\"GET\"],\n)\ndef handler():\n    return 1\nX = (1 +\n     2)")
    assert(blocks(2) == "@decorator(arg1,\n           arg2)\n@second\ndef tail():\n    pass")
    assert(blocks.length == 3)
    // no continuation line of either construct ever opens a chunk
    assert(!blocks.exists(b => b.startsWith(")") || b.startsWith("     2)") || b.startsWith("           arg2)")))
  }

  test("ast fidelity: backslash continuations, parenthesized lambdas, and backslash-continued strings stay whole") {
    // all four constructs verified single ast.parse nodes (round 13):
    //   TOTAL = 1 + \        <- plain backslash continuation
    //   2
    //   HANDLER = (lambda x: <- top-level parenthesized lambda
    //       x + 1)
    //   DOC = 'start \       <- single-quoted string continued by a
    //   def fake(): pass'       trailing backslash — the second PHYSICAL
    //                           line READS like a def but is string body
    val preamble = "CONFIG = {\n    \"a\": 1,\n}\n" +
      "TOTAL = 1 + \\\n2\n" +
      "HANDLER = (lambda x:\n    x + 1)\n" +
      "DOC = 'start \\\ndef fake(): pass'"
    val code = preamble + "\n@app.route(\n    \"/x\",\n)\ndef real():\n    return 1\n"
    // preamble = 26 tokens: a 26-token budget flushes exactly at its end,
    // so chunk 0 must be the preamble VERBATIM — any boundary opening
    // inside it (the def-looking string line is the trap) changes chunk 0
    val chunks = Chunker.chunkCode(code, maxTokens = 26).map(_._1)
    assert(chunks.head == preamble, chunks.mkString("<<", ">>,<<", ">>"))
    assert(chunks(1).startsWith("@app.route(") && chunks(1).contains("def real():"))
    assert(!chunks.exists(_.startsWith("def fake")), chunks.mkString("<<", ">>,<<", ">>"))
    // and the line AFTER a backslash-continued string is again normal code:
    // a real def following the closed string is a boundary
    val after = "S = 'a \\\nb'\ndef g():\n    return 2\n"
    val ac = Chunker.chunkCode(after, maxTokens = 5).map(_._1)
    assert(ac.exists(_.startsWith("def g")), ac.mkString("<<", ">>,<<", ">>"))
    assert(ac.head == "S = 'a \\\nb'", ac.mkString("<<", ">>,<<", ">>"))
  }

  test("ast fidelity: the continuation line of a backslash-continued string scans as STRING, not code") {
    // the continuation line's remainder holds an unbalanced '(' and a '#'
    // — both literal string content to ast.parse. Scanned as code (the
    // pre-fix behavior) the '(' left depth=1 forever: every later line
    // became a continuation, no boundary ever fired again, and the whole
    // file collapsed into one block.
    val code = "X = 'note \\\nsee (1 # not a comment'\ndef g():\n    return 2\n" +
      "def h():\n    return 3\n"
    // the X block is exactly 10 whitespace tokens — a 10-token budget keeps
    // it whole iff the boundary after the string fired
    val chunks = Chunker.chunkCode(code, maxTokens = 10).map(_._1)
    assert(chunks.head == "X = 'note \\\nsee (1 # not a comment'",
      chunks.mkString("<<", ">>,<<", ">>"))
    assert(chunks.exists(_.startsWith("def g")) && chunks.exists(_.contains("def h")),
      chunks.mkString("<<", ">>,<<", ">>"))
    // chained continuation: two escaped newlines inside one string
    val chained = "Y = 'a \\\nb \\\nc'\ndef k():\n    return 4\n"
    val cc = Chunker.chunkCode(chained, maxTokens = 7).map(_._1)
    assert(cc.head == "Y = 'a \\\nb \\\nc'", cc.mkString("<<", ">>,<<", ">>"))
    assert(cc.exists(_.startsWith("def k")), cc.mkString("<<", ">>,<<", ">>"))
  }

  test("code chunker splits at top-level boundaries and packs to <= maxTokens") {
    val blocks = (1 to 50).map(i => s"def f$i():\n" + ("    x = 1\n" * 30))
    val chunks = Chunker.chunkCode(blocks.mkString(""))
    assert(chunks.nonEmpty)
    assert(chunks.forall(_._2 <= Chunker.MaxTokens))
  }
}
