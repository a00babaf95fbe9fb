package graft.core

/** Nerf-style tokenizer, re-expressed in pure Scala.
  *
  * The reference pipeline is `whitespace >=> uris >=> punctuation`
  * (/root/reference/src/NLP/Nerf/Tokenize.hs:41-50, using the public
  * `tokenize-0.3.0` Hackage combinators): split on whitespace, protect
  * URI-looking tokens from further splitting, then split leading/trailing
  * punctuation off each remaining token.
  *
  * This is a from-scratch implementation of those documented semantics,
  * frozen by the unit tests in TokenizerSpec (SURVEY.md §7.4 pinning).
  * Unicode discipline: ONE whitespace predicate (`isSpace`) shared by the
  * splitter and `essence` (the reference's Haskell `isSpace` covers Zs —
  * three diverging definitions would desynchronize char-range alignment),
  * and punctuation classification runs per CODE POINT so astral
  * characters (emoji, rare CJK) are never split into lone surrogates.
  */
object Tokenizer {

  private val UriRe = "^[a-zA-Z][a-zA-Z0-9+.-]*://\\S+$".r

  /** True when the token should be protected from punctuation splitting.
    * The regex REQUIRES a literal "://", so the cheap substring probe
    * rejects the overwhelmingly common non-URI token without entering
    * the regex engine (r7: this ran once per token of the corpus and
    * the engine invocation dominated the tokenizer's cost).
    */
  private def isUri(s: String): Boolean =
    s.length >= 4 && s.indexOf("://") > 0 && UriRe.findFirstIn(s).isDefined

  /** The single whitespace definition: Java whitespace ∪ Unicode Zs
    * (NBSP, EM SPACE, ...), matching Haskell's Data.Char.isSpace.
    */
  @inline private[core] def isSpace(cp: Int): Boolean =
    Character.isWhitespace(cp) || Character.isSpaceChar(cp)

  /** Split leading and trailing punctuation CODE POINTS into their own
    * tokens; the word core stays intact (internal punctuation, e.g.
    * hyphens inside words, is preserved).
    */
  private def splitPunct(tok: String): List[String] = {
    if (tok.isEmpty) Nil
    else {
      var i = 0
      var j = tok.length
      while (i < j && isPunct(tok.codePointAt(i)))
        i += Character.charCount(tok.codePointAt(i))
      while (j > i && isPunct(tok.codePointBefore(j)))
        j -= Character.charCount(tok.codePointBefore(j))
      val lead = scala.collection.mutable.ListBuffer.empty[String]
      var k = 0
      while (k < i) {
        val cp = tok.codePointAt(k)
        lead += tok.substring(k, k + Character.charCount(cp))
        k += Character.charCount(cp)
      }
      val trail = scala.collection.mutable.ListBuffer.empty[String]
      k = j
      while (k < tok.length) {
        val cp = tok.codePointAt(k)
        trail += tok.substring(k, k + Character.charCount(cp))
        k += Character.charCount(cp)
      }
      val core = tok.substring(i, j)
      if (core.isEmpty) (lead ++ trail).toList
      else (lead ++ (core +: trail)).toList
    }
  }

  private def isPunct(cp: Int): Boolean =
    !Character.isLetterOrDigit(cp) && !isSpace(cp)

  /** Tokenize one sentence. Mirrors `NLP.Nerf.Tokenize.tokenize`
    * (/root/reference/src/NLP/Nerf/Tokenize.hs:49-50).
    */
  def tokenize(sent: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    val b = new StringBuilder
    def flush(): Unit = if (b.nonEmpty) {
      val t = b.result(); b.clear()
      if (isUri(t)) out += t else splitPunct(t).foreach(out += _)
    }
    var k = 0
    while (k < sent.length) {
      val cp = sent.codePointAt(k)
      if (isSpace(cp)) flush()
      else b.appendAll(Character.toChars(cp))
      k += Character.charCount(cp)
    }
    flush()
    out.result()
  }

  /** Count of non-whitespace characters (UTF-16 units of non-space code
    * points) — the `essence` used for char-range alignment
    * (/root/reference/src/NLP/Nerf/Tokenize.hs:75-77). Uses the SAME
    * `isSpace` as the splitter, so ranges and tokens always agree.
    */
  def essence(s: String): Int = {
    var n = 0
    var k = 0
    while (k < s.length) {
      val cp = s.codePointAt(k)
      val w = Character.charCount(cp)
      if (!isSpace(cp)) n += w
      k += w
    }
    n
  }
}
