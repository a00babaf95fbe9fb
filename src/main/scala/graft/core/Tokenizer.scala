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
  */
object Tokenizer {

  private val UriRe = "^[a-zA-Z][a-zA-Z0-9+.-]*://\\S+$".r

  /** True when the token should be protected from punctuation splitting. */
  private def isUri(s: String): Boolean = UriRe.findFirstIn(s).isDefined

  /** Split leading and trailing punctuation characters into their own
    * tokens, one token per punctuation char; the word core stays intact
    * (internal punctuation, e.g. hyphens inside words, is preserved).
    */
  private def splitPunct(tok: String): List[String] = {
    if (tok.isEmpty) Nil
    else {
      var i = 0
      var j = tok.length
      while (i < j && isPunct(tok.charAt(i))) i += 1
      while (j > i && isPunct(tok.charAt(j - 1))) j -= 1
      val lead = (0 until i).map(k => tok.charAt(k).toString).toList
      val trail = (j until tok.length).map(k => tok.charAt(k).toString).toList
      val core = tok.substring(i, j)
      if (core.isEmpty) lead ::: trail
      else lead ::: core :: trail
    }
  }

  private def isPunct(c: Char): Boolean =
    !c.isLetterOrDigit && !c.isWhitespace

  /** Tokenize one sentence. Mirrors `NLP.Nerf.Tokenize.tokenize`
    * (/root/reference/src/NLP/Nerf/Tokenize.hs:49-50).
    */
  def tokenize(sent: String): Vector[String] = {
    val ws = sent.split("\\s+").iterator.filter(_.nonEmpty)
    ws.flatMap { t => if (isUri(t)) List(t) else splitPunct(t) }.toVector
  }

  /** Count of non-whitespace characters — the `essence` used for
    * char-range alignment (/root/reference/src/NLP/Nerf/Tokenize.hs:75-77).
    */
  def essence(s: String): Int = s.count(c => !c.isWhitespace)
}
