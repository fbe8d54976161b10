package graft

import graft.operators.Bpe
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** BPE learning: hand-computed merges on a tiny corpus, greedy-overlap
  * semantics, driver/distributed parity, encode round-trip.
  */
class BpeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("merges match the hand computation, ties broken (count desc, a, b)") {
    // words: aaa x2, aaab x1
    val docs = Seq("aaa aaa aaab").toDF("text")
    val wf = Bpe.wordFreqs(docs, "text")
    val merges = Bpe.learn(wf, 3)
    // r0: (a,a) = 2*2 + 2*1 = 6 ; r1: (aa,a) = 2+1 = 3 ; r2: (aaa,b) = 1
    assert(merges.map(m => (m.rank, m.a, m.b, m.count)) ==
      Seq((0, "a", "a", 6L), (1, "aa", "a", 3L), (2, "aaa", "b", 1L)))
  }

  test("greedy left-to-right non-overlapping application") {
    assert(Bpe.applyMerge(Bpe.bracketed("aaaa"), "a", "a") == "[aa][aa]")
    assert(Bpe.applyMerge(Bpe.bracketed("aaa"), "a", "a") == "[aa][a]")
    val m = Seq(Bpe.Merge(0, "a", "a", 0L))
    assert(Bpe.segment("aaaaa", m) == Seq("aa", "aa", "a"))
  }

  test("driver and distributed paths learn identical merges") {
    val docs = Seq("the theme there then other brother",
      "the other theme is there", "then the brothers").toDF("text")
    val wf = Bpe.wordFreqs(docs, "text").cache()
    val drv  = Bpe.learn(wf, 8)
    val dist = Bpe.learn(wf, 8, maxDriverWords = 0) // force the distributed path
    assert(drv == dist, s"\ndriver: $drv\ndistrib: $dist")
    assert(drv.length == 8)
    // counts are the per-occurrence weighted pair counts -> never increase
    // is NOT guaranteed in BPE generally, but rank order must be stable
    assert(drv.map(_.rank) == (0 until 8))
  }

  test("encode applies merges in rank order and counts tokens") {
    val docs = Seq((1L, "aaa aaab"), (2L, "b aaaa")).toDF("id", "text")
    val merges = Seq(Bpe.Merge(0, "a", "a", 6L), Bpe.Merge(1, "aa", "a", 3L))
    val out = Bpe.encode(docs, "text", merges).orderBy("id").collect()
    // aaa -> [aaa] ; aaab -> [aaa][b] ; b -> [b] ; aaaa -> [aa][aa] -> ([aaa]? no:
    // merge1 applies to [aa][a] pairs; aaaa after r0 = [aa][aa], r1 needs ([aa],[a]) -> absent
    assert(out(0).getAs[scala.collection.Seq[String]]("bpe_tokens").toSeq == Seq("aaa", "aaa", "b"))
    assert(out(0).getAs[Long]("bpe_n_tokens") == 3L)
    assert(out(1).getAs[scala.collection.Seq[String]]("bpe_tokens").toSeq == Seq("b", "aa", "aa"))
  }

  test("learning on empty or single-char vocab stops early") {
    val docs = Seq("a b c a").toDF("text")
    val merges = Bpe.learn(Bpe.wordFreqs(docs, "text"), 5)
    assert(merges.isEmpty) // every word is one symbol; no adjacent pairs
  }
}
