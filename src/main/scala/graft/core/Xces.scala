package graft.core

import scala.collection.mutable.ArrayBuffer

/** XCES corpus reader/writer (SURVEY.md §2.1 S3, §2.6 O2).
  *
  * The reference parses XCES XML with a tag-soup scanner: `<chunk
  * type="s">` delimits sentences, `<tok><orth>..</orth>..</tok>` carries
  * tokens, `<ns/>` marks "no space before"
  * (/root/reference/src/NLP/Nerf/XCES.hs:76-97,143-173), and the writer
  * re-renders the document with `<group type="NE">` wrappers around
  * recognized entities while preserving all other markup
  * (XCES.hs:196-213,239-248,320-338).
  *
  * This is a from-scratch tag-soup implementation of those semantics
  * over the same element vocabulary.
  */
object Xces {

  final case class Tok(orth: String, noSpaceBefore: Boolean)
  final case class Sent(toks: Vector[Tok])

  // token elements and <ns/> markers, in document order; the orth is
  // extracted WITHIN a matched token element so an orth-less <tok>
  // still counts as one (empty-orth) token — the reference does the
  // same (`maybe "" id`, /root/reference/src/NLP/Nerf/XCES.hs:233-234),
  // and the splicer's token positions must agree with the parser's.
  // Self-closing <tok/> must match its OWN branch first: `[^>]*` would
  // otherwise eat the '/' and `.*?</tok>` would swallow everything up
  // to the NEXT token's close tag, merging two tokens into one.
  private val TokRe =
    "(?s)(<tok\\b[^>]*/>)|(<tok\\b[^>]*>.*?</tok>)|<ns\\s*/>".r
  private val OrthRe = "(?s)<orth\\b[^>]*>(.*?)</orth>".r
  private val SentRe =
    "(?s)<chunk[^>]*type=\"s\"[^>]*>(.*?)</chunk>".r
  /** Token elements only (for splicing group tags between them). */
  private val TokOnlyRe = "(?s)<tok\\b[^>]*/>|<tok\\b[^>]*>.*?</tok>".r

  def unescapeXml(s: String): String = s
    .replace("&lt;", "<").replace("&gt;", ">")
    .replace("&quot;", "\"").replace("&apos;", "'")
    .replace("&amp;", "&")

  def escapeXml(s: String): String = s
    .replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  /** Parse one sentence body (the content of a `<chunk type="s">`). */
  def parseBody(body: String): Sent = {
    val toks = ArrayBuffer.empty[Tok]
    var nsPending = false
    TokRe.findAllMatchIn(body).foreach { m =>
      if (m.group(1) == null && m.group(2) == null) nsPending = true // <ns/>
      else {
        // group 1 = self-closing <tok/> (always empty orth);
        // group 2 = full element, orth extracted within
        val orth =
          if (m.group(1) != null) ""
          else OrthRe.findFirstMatchIn(m.group(2))
            .map(om => unescapeXml(om.group(1))).getOrElse("")
        toks += Tok(orth, nsPending)
        nsPending = false
      }
    }
    Sent(toks.toVector)
  }

  /** Parse all `<chunk type="s">` sentences out of an XCES document. */
  def parse(xml: String): Vector[Sent] =
    SentRe.findAllMatchIn(xml).map(sm => parseBody(sm.group(1))).toVector

  /** Restore the original sentence text, honoring `<ns/>`
    * (/root/reference/src/NLP/Nerf/XCES.hs:351-357).
    */
  def restoreText(s: Sent): String = {
    val b = new StringBuilder
    s.toks.zipWithIndex.foreach { case (t, i) =>
      if (i > 0 && !t.noSpaceBefore) b += ' '
      b ++= t.orth
    }
    b.result()
  }

  /** Splice `<group type="NE">` wrappers into an ORIGINAL sentence body:
    * every byte of the source markup (token attributes, `<lex>` analyses,
    * `<ns/>`, non-token tags, whitespace) is preserved verbatim; the only
    * insertions are group open tags immediately before a span's first
    * `<tok>` and close tags immediately after its last `</tok>`
    * (reference preserves the full tag stream the same way,
    * /root/reference/src/NLP/Nerf/XCES.hs:196-248).
    */
  def spliceGroups(body: String, spans: Seq[Span]): String = {
    val toks = TokOnlyRe.findAllMatchIn(body).toVector
    // zero-width spans (begin == end — Forest.toSpans emits them for
    // childless NE nodes) can't go through the open/close maps: their
    // close would fire one token BEFORE their open. They are emitted as
    // complete empty <group></group> elements at their boundary, NESTED
    // BY DEPTH: a zero-width span deeper than a span CLOSING at the same
    // boundary is its last child and must be emitted before that close;
    // the rest sit after the boundary's opens (first children / siblings).
    val (zero, wide) = spans.partition(sp => sp.end == sp.begin)
    def emptyGroup(sp: Span): String =
      s"""<group type="NE" subtype="${escapeXml(sp.neType)}"></group>"""
    if (toks.isEmpty)
      return zero.sortBy(sp => (sp.depth, sp.neType)).map(emptyGroup).mkString + body
    val zeroAt = zero.groupBy(sp => math.min(math.max(sp.begin, 0), toks.length))
    val opens = wide.groupBy(_.begin)
    val closes = wide.groupBy(_.end)
    val b = new StringBuilder
    var pos = 0
    for (i <- 0 to toks.length) { // token boundaries
      // deepest first, so children pair with the innermost closing span
      var zws = zeroAt.getOrElse(i, Nil)
        .sortBy(sp => (-sp.depth, sp.neType)).toList
      // close spans ending at boundary i (innermost first), emitting any
      // deeper zero-width span INSIDE the span it is a child of
      closes.get(i).foreach { cs =>
        cs.sortBy(-_.depth).foreach { c =>
          val (inside, rest) = zws.partition(_.depth > c.depth)
          inside.foreach(z => b ++= emptyGroup(z))
          zws = rest
          b ++= "</group>"
        }
      }
      if (i < toks.length) {
        val m = toks(i)
        // original content between previous token (or start) and this token
        b ++= body.substring(pos, m.start)
        // open groups whose span begins at token i: outermost first
        opens.get(i).foreach { os =>
          os.sortBy(sp => (sp.depth, -(sp.end - sp.begin))).foreach { sp =>
            b ++= s"""<group type="NE" subtype="${escapeXml(sp.neType)}">"""
          }
        }
        // remaining empty groups sit inside the opens (or stand alone)
        zws.sortBy(sp => (sp.depth, sp.neType)).foreach(z => b ++= emptyGroup(z))
        b ++= body.substring(m.start, m.end) // the token, verbatim
        pos = m.end
      } else {
        // boundary past the last token: anything still pending
        zws.sortBy(sp => (sp.depth, sp.neType)).foreach(z => b ++= emptyGroup(z))
      }
    }
    b ++= body.substring(pos)
    b.result()
  }

  /** End-to-end XCES NER (the reference's `nerf ner -f xces` path,
    * /root/reference/src/NLP/Nerf/XCES.hs:343-357): parse, restore text,
    * run NER, re-align the result with the XCES tokens via `sync`, and
    * splice group tags into the ORIGINAL document — all markup outside
    * the group insertions round-trips byte-identically.
    */
  def annotate(xml: String, ner: String => List[NeTree]): String = {
    val b = new StringBuilder
    var pos = 0
    SentRe.findAllMatchIn(xml).foreach { sm =>
      val body = sm.group(1)
      val sent = parseBody(body)
      val forest = ner(restoreText(sent))
      val synced = Forest.sync(forest, sent.toks.map(_.orth))
      val (_, spans) = Forest.toSpans(synced)
      b ++= xml.substring(pos, sm.start(1))
      b ++= spliceGroups(body, spans)
      pos = sm.end(1)
    }
    b ++= xml.substring(pos)
    b.result()
  }
}
