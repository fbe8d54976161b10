package graft.operators

/** Token-counting seam for the chunker (SURVEY §2.7 C1). The reference
  * counts with the HF AutoTokenizer for all-mpnet-base-v2
  * (backend/chunker.py:19-31 — WordPiece, lowercased); the engine's oracle
  * semantic is whitespace counting (the declared deviation — exactly
  * expressible in SQL, so chunk boundaries stay oracle-checkable). This
  * seam makes the counter pluggable so a deployment holding the model's
  * vocab file gets HF-parity boundaries from the same chunking code.
  */
trait TokenCounter extends Serializable {
  def name: String
  def count(text: String): Int
}

object TokenCounters {

  /** The oracle semantic: split on whitespace runs. */
  object Whitespace extends TokenCounter {
    val name                       = "whitespace"
    def count(text: String): Int   = Chunker.countTokens(text)
  }

  /** WordPiece counting with BERT-family pre-tokenization, the algorithm
    * behind the reference's AutoTokenizer count (greedy longest-prefix
    * subword match, `##` continuation prefix, unknown words collapse to one
    * [UNK] token). Counting ignores special tokens ([CLS]/[SEP]) like the
    * reference's `len(tokenizer.encode(text, add_special_tokens=False))`.
    *
    * The VOCAB is deployment-provided (`fromVocabFile` reads the standard
    * one-token-per-line vocab.txt) — the model's 30k-entry vocabulary is an
    * artifact of the model, not of this library. [[demo]] builds a small
    * self-contained vocabulary for tests and parity reports.
    */
  final class WordPiece(vocab: Set[String], lowercase: Boolean = true) extends TokenCounter {
    require(vocab.nonEmpty, "WordPiece needs a non-empty vocabulary")
    val name = "wordpiece"
    private val maxWordChars = 100

    /** BERT basic pre-tokenization: whitespace-split, punctuation split out
      * as single-char tokens, optional lowercase. (No CJK-char isolation or
      * accent stripping — out of scope for the parity this seam targets.)
      */
    private[operators] def preTokenize(text: String): Vector[String] = {
      val out = Vector.newBuilder[String]
      val cur = new StringBuilder
      def flush(): Unit = if (cur.nonEmpty) { out += cur.result(); cur.clear() }
      val s = if (lowercase) text.toLowerCase(java.util.Locale.ROOT) else text
      var i = 0
      while (i < s.length) {
        val c = s.charAt(i)
        if (c.isWhitespace) flush()
        else if (c.isLetterOrDigit) cur.append(c)
        else { flush(); out += c.toString } // punctuation: its own token
        i += 1
      }
      flush()
      out.result()
    }

    /** Greedy longest-match-first subword count of one pre-token. */
    private[operators] def wordPieces(word: String): Int = {
      if (word.length > maxWordChars) return 1 // [UNK]
      var start = 0
      var n     = 0
      while (start < word.length) {
        var end   = word.length
        var found = -1
        while (end > start && found < 0) {
          val piece = (if (start > 0) "##" else "") + word.substring(start, end)
          if (vocab.contains(piece)) found = end else end -= 1
        }
        if (found < 0) return 1 // no tokenization exists: whole word → [UNK]
        n += 1
        start = found
      }
      n
    }

    def count(text: String): Int = preTokenize(text).iterator.map(wordPieces).sum
  }

  /** Standard HF vocab.txt (one token per line, `##`-prefixed continuations). */
  def fromVocabFile(path: String, lowercase: Boolean = true): WordPiece = {
    val src = scala.io.Source.fromFile(path, "UTF-8")
    try new WordPiece(src.getLines().map(_.trim).filter(_.nonEmpty).toSet, lowercase)
    finally src.close()
  }

  /** Self-contained demo vocabulary: single characters (so every word HAS a
    * tokenization), common English words and subword suffixes. Enough for
    * tests and for the parity report to show real whitespace-vs-WordPiece
    * divergence (suffixed words split, punctuation counts, unknowns).
    */
  lazy val demo: WordPiece = {
    val chars    = ('a' to 'z') ++ ('0' to '9')
    val words    = Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "are",
      "engine", "spark", "data", "chunk", "token", "count", "process", "distributed",
      "pipeline", "query", "scale", "test", "text", "word", "sentence")
    val suffixes = Seq("s", "ed", "ing", "er", "est", "ly", "tion", "ment", "ness", "ize", "ized")
    new WordPiece(
      chars.map(_.toString).toSet ++
        chars.map(c => s"##$c").toSet ++
        words.toSet ++
        suffixes.map(s => s"##$s").toSet ++
        Set(".", ",", "!", "?", ";", ":", "(", ")", "'", "\""))
  }
}
