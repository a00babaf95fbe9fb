package graft.core

import scala.collection.mutable.ArrayBuffer

/** NE forest: trees whose internal nodes carry named-entity categories and
  * whose leaves carry words — the Spark-side rendition of the reference's
  * `NeForest NE Word` (`Tree (Either NE Word)`, described in
  * /root/reference/nerf.cabal_backup:7-9 and used throughout
  * /root/reference/src/NLP/Nerf.hs).
  */
sealed trait NeTree {
  def leaves: Vector[String] = this match {
    case NeLeaf(w)        => Vector(w)
    case NeNode(_, kids)  => kids.flatMap(_.leaves).toVector
  }
}
final case class NeNode(neType: String, children: List[NeTree]) extends NeTree
final case class NeLeaf(word: String) extends NeTree

/** A mention span over token indices: `[begin, end)` at a nesting depth.
  * Spark-friendly flattening of the recursive forest (SURVEY.md §1.4).
  */
final case class Span(neType: String, begin: Int, end: Int, depth: Int)

object Forest {

  // ---------------------------------------------------------------------
  // ENAMEX parsing / rendering
  // (format per /root/reference/README.md:33-50: one sentence per line,
  //  inline nested <type>..</type> tags; escapes \< \> \\ and "\ ")
  // ---------------------------------------------------------------------

  /** Parse one ENAMEX-encoded sentence into an NE forest. A stray
    * top-level close tag is an ERROR, not a stop marker — silently
    * truncating the line would quietly corrupt comparisons and training.
    */
  def parseEnamex(line: String): List[NeTree] = {
    val p = new EnamexParser(line)
    val forest = p.parseForest(None)
    require(p.consumedAll,
      s"ENAMEX: unmatched close tag at position ${p.position} in: $line")
    forest
  }

  private final class EnamexParser(s: String) {
    private var pos = 0
    private def peek: Char = s.charAt(pos)
    private def eof: Boolean = pos >= s.length
    def consumedAll: Boolean = pos >= s.length
    def position: Int = pos

    private def skipSpaces(): Unit =
      while (!eof && peek == ' ') pos += 1

    /** Parse trees until EOF or the closing tag `</until>`. */
    def parseForest(until: Option[String]): List[NeTree] = {
      val out = ArrayBuffer.empty[NeTree]
      skipSpaces()
      while (!eof && !atClose) {
        if (peek == '<') {
          pos += 1 // '<'
          val name = readUntil('>'); pos += 1 // '>'
          val kids = parseForest(Some(name))
          // consume '</name>'
          expect('<'); expect('/')
          val cname = readUntil('>'); pos += 1
          require(cname == name, s"ENAMEX: mismatched tag <$name> vs </$cname> in: $s")
          out += NeNode(name, kids)
        } else {
          val w = readWord()
          if (w.nonEmpty) out += NeLeaf(w)
        }
        skipSpaces()
      }
      out.toList
    }

    private def atClose: Boolean =
      peek == '<' && pos + 1 < s.length && s.charAt(pos + 1) == '/'

    private def expect(c: Char): Unit = {
      require(!eof && peek == c, s"ENAMEX: expected '$c' at $pos in: $s")
      pos += 1
    }

    private def readUntil(stop: Char): String = {
      val b = new StringBuilder
      while (!eof && peek != stop) { b += peek; pos += 1 }
      b.result()
    }

    /** A word: chars until an unescaped space or '<'. Handles escapes. */
    private def readWord(): String = {
      val b = new StringBuilder
      var done = false
      while (!eof && !done) {
        val c = peek
        if (c == '\\' && pos + 1 < s.length) { b += s.charAt(pos + 1); pos += 2 }
        else if (c == ' ' || c == '<') done = true
        else { b += c; pos += 1 }
      }
      b.result()
    }
  }

  private def escapeWord(w: String): String =
    w.flatMap {
      case '<'  => "\\<"
      case '>'  => "\\>"
      case '\\' => "\\\\"
      case ' '  => "\\ "
      case c    => c.toString
    }

  /** Render an NE forest back to one ENAMEX line — the reference's
    * `showForest` output surface (/root/reference/app/Main.hs:280).
    */
  def renderEnamex(forest: List[NeTree]): String = {
    def tree(t: NeTree): String = t match {
      case NeLeaf(w)          => escapeWord(w)
      case NeNode(ne, kids)   => s"<$ne>${kids.map(tree).mkString(" ")}</$ne>"
    }
    forest.map(tree).mkString(" ")
  }

  // ---------------------------------------------------------------------
  // Forest <-> span set (SURVEY.md §1.4: Spark has no recursive types)
  // ---------------------------------------------------------------------

  /** Flatten a forest to (tokens, spans-in-token-indices). Span depth 0 =
    * outermost. Only NE nodes produce spans (leaves don't), matching the
    * reference's Compare semantics (/root/reference/src/NLP/Nerf/Compare.hs:101-119).
    */
  def toSpans(forest: List[NeTree]): (Vector[String], Vector[Span]) = {
    val toks = ArrayBuffer.empty[String]
    val spans = ArrayBuffer.empty[Span]
    def go(t: NeTree, depth: Int): Unit = t match {
      case NeLeaf(w) => toks += w
      case NeNode(ne, kids) =>
        val b = toks.length
        kids.foreach(go(_, depth + 1))
        spans += Span(ne, b, toks.length, depth)
    }
    forest.foreach(go(_, 0))
    (toks.toVector, spans.toVector)
  }

  /** Rebuild a forest from tokens + properly-nesting spans (inverse of
    * `toSpans` for well-formed span sets: no partial overlap). Handles
    * the ZERO-WIDTH spans toSpans emits for childless NE nodes
    * ('<a></a>'), including at the end-of-sentence boundary.
    */
  def fromSpans(tokens: Vector[String], spans: Seq[Span]): List[NeTree] = {
    // sort: by begin asc, then end desc (wider first), then depth asc
    val sorted = spans.sortBy(s => (s.begin, -s.end, s.depth)).toList
    def build(b: Int, e: Int, ss: List[Span]): (List[NeTree], List[Span]) = {
      val out = ArrayBuffer.empty[NeTree]
      var i = b
      var rest = ss
      def zeroWidthAt(i2: Int): Boolean = rest match {
        case h :: _ => h.begin == i2 && h.end == i2
        case Nil => false
      }
      while (i < e || zeroWidthAt(i)) {
        rest match {
          case h :: t if h.begin == i && h.end <= e =>
            // children of h are the remaining spans inside it
            val (inside, after) = t.span(x => x.begin >= h.begin && x.end <= h.end)
            val (kids, leftover) = build(h.begin, h.end, inside)
            require(leftover.isEmpty, "fromSpans: non-nesting spans")
            out += NeNode(h.neType, kids)
            i = h.end
            rest = after
          case _ =>
            out += NeLeaf(tokens(i))
            i += 1
        }
      }
      (out.toList, rest)
    }
    val (forest, leftover) = build(0, tokens.length, sorted)
    require(leftover.isEmpty, "fromSpans: spans outside token range")
    forest
  }

  // ---------------------------------------------------------------------
  // Character-level spans for Compare (whitespace-ignored), per
  // /root/reference/src/NLP/Nerf/Compare.hs:89-119
  // ---------------------------------------------------------------------

  /** NE nodes as (neType, charBegin, charEnd) with whitespace-ignored
    * character offsets — exact-match compare keys.
    */
  def charSpans(forest: List[NeTree]): Set[(String, Int, Int)] = {
    val out = scala.collection.mutable.Set.empty[(String, Int, Int)]
    var off = 0
    def go(t: NeTree): (Int, Int) = t match {
      case NeLeaf(w) =>
        val b = off; off += Tokenizer.essence(w); (b, off)
      case NeNode(ne, kids) =>
        val rs = kids.map(go)
        // a childless NE node (parseable: '<a></a>') is a zero-width
        // span at the current offset, not a crash
        val span =
          if (rs.isEmpty) (off, off)
          else rs.reduce((a, b) => (math.min(a._1, b._1), math.max(a._2, b._2)))
        out += ((ne, span._1, span._2))
        span
    }
    forest.foreach(go)
    out.toSet
  }

  // ---------------------------------------------------------------------
  // sync: re-align a forest with a new tokenization via interval
  // intersection over non-space char ranges
  // (/root/reference/src/NLP/Nerf/Tokenize.hs:96-185)
  // ---------------------------------------------------------------------

  /** Replace the leaves of `forest` with the tokens of `newToks` whose
    * non-space char ranges intersect them; new tokens not consumed by any
    * NE become top-level leaves; result ordered by range.
    */
  def sync(forest: List[NeTree], newToks: Vector[String]): List[NeTree] = {
    // ranges of the new tokenization
    val newRanges = {
      var p = 0
      newToks.map { w => val q = p + Tokenizer.essence(w); val r = (p, q, w); p = q; r }
    }
    // assign char ranges to old leaves, keep only internal (NE) trees
    var acc = 0
    def ranged(t: NeTree): RTree = t match {
      case NeLeaf(w) =>
        val b = acc; acc += Tokenizer.essence(w); RLeaf(b, acc)
      case NeNode(ne, kids) => RNode(ne, kids.map(ranged))
    }
    val rforest = forest.map(ranged)
    val neTrees = rforest.collect { case n: RNode => n }

    // interval map of unconsumed new tokens (keyed by begin; ranges are
    // disjoint, so intersection tests are simple)
    val remaining = scala.collection.mutable.TreeMap.empty[Int, (Int, String)]
    newRanges.foreach { case (b, e, w) => remaining += (b -> (e, w)) }

    def intersecting(b: Int, e: Int): List[(Int, Int, String)] = {
      // disjoint intervals sorted by begin: candidates with begin < e and end > b
      remaining.rangeUntil(e).iterator
        .collect { case (nb, (ne1, w)) if ne1 > b => (nb, ne1, w) }
        .toList
    }

    // replace each old leaf with all intersecting new tokens (consuming them)
    def replace(t: RTree): List[SyncTree] = t match {
      case RNode(ne, kids) =>
        List(SNode(ne, kids.flatMap(replace)))
      case RLeaf(b, e) =>
        val hits = intersecting(b, e)
        hits.foreach { case (nb, _, _) => remaining -= nb }
        hits.map { case (nb, ne1, w) => SLeaf(nb, ne1, w) }
    }
    val replaced = neTrees.map(n => replace(n).head)

    // first-leaf range lifts to the top for ordering
    def firstRange(t: SyncTree): Option[Int] = t match {
      case SLeaf(b, _, _)   => Some(b)
      case SNode(_, kids)   => kids.iterator.flatMap(firstRange(_).iterator).nextOption()
    }
    def strip(t: SyncTree): Option[NeTree] = t match {
      case SLeaf(_, _, w) => Some(NeLeaf(w))
      case SNode(ne, kids) =>
        val ks = kids.flatMap(strip)
        if (ks.isEmpty) None else Some(NeNode(ne, ks))
    }

    val neOut: List[(Int, NeTree)] = replaced.flatMap { t =>
      for (r <- firstRange(t); st <- strip(t)) yield (r, st)
    }
    val leafOut: List[(Int, NeTree)] =
      remaining.iterator.map { case (b, (_, w)) => (b, NeLeaf(w): NeTree) }.toList

    (neOut ::: leafOut).sortBy(_._1).map(_._2)
  }

  private sealed trait RTree
  private final case class RNode(ne: String, kids: List[RTree]) extends RTree
  private final case class RLeaf(b: Int, e: Int) extends RTree

  private sealed trait SyncTree
  private final case class SNode(ne: String, kids: List[SyncTree]) extends SyncTree
  private final case class SLeaf(b: Int, e: Int, w: String) extends SyncTree

  /** Normalize a training forest to the nerf tokenization: join leaves
    * with spaces, re-tokenize, re-align
    * (/root/reference/src/NLP/Nerf.hs:53-58).
    */
  def reTokenize(forest: List[NeTree]): List[NeTree] = {
    val text = forest.flatMap(_.leaves).mkString(" ")
    sync(forest, Tokenizer.tokenize(text))
  }
}
