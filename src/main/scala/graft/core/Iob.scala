package graft.core

import scala.collection.mutable.ArrayBuffer

/** The "joined label" IOB codec for nested named entities.
  *
  * The reference encodes a nested NE forest into one flat label per token,
  * where a label is a *stack* of B/I atoms, one per nesting layer, outermost
  * first (`Lb = IOB.Label NE = [Atom NE]`,
  * /root/reference/src/NLP/Nerf/Types.hs:27; method description
  * /root/reference/README.md:6-14 "joined labels"; codec provided by the
  * public `data-named` package, call sites
  * /root/reference/src/NLP/Nerf.hs:48-50,99).
  *
  * This is a from-scratch implementation of those semantics; the exact
  * serialized form of a label is our own frozen convention:
  * `"B-t1;I-t2"` (outermost first, ';'-joined), `"O"` for the empty stack.
  */
object Iob {

  final case class Atom(begin: Boolean, ne: String)
  type Label = List[Atom] // outermost first; Nil = outside any NE

  val Outside = "O"

  def renderLabel(l: Label): String =
    if (l.isEmpty) Outside
    else l.map { a =>
      // ';' is the frozen atom separator and an EMPTY type renders as
      // "B-", which parseLabel rejects: either would train fine and then
      // crash on the first tag call of every input — fail HERE instead
      require(a.ne.nonEmpty, "NE type must be non-empty (an empty " +
        "<>...</> tag in the training corpus renders an unparseable label)")
      require(!a.ne.contains(';'),
        s"NE type must not contain ';' (label separator): '${a.ne}'")
      (if (a.begin) "B-" else "I-") + a.ne
    }.mkString(";")

  def parseLabel(s: String): Label =
    if (s == Outside || s.isEmpty) Nil
    else s.split(';').iterator.map { part =>
      require(part.length > 2 && (part(0) == 'B' || part(0) == 'I') && part(1) == '-',
        s"bad IOB atom: $part")
      Atom(part(0) == 'B', part.substring(2))
    }.toList

  /** Encode a forest into per-token label stacks (tokens in leaf order).
    * Within each NE node, the first covered token gets a B atom for that
    * node, subsequent tokens get I atoms; atoms accumulate outermost-first
    * down the nesting. LIMITATION (inherent to token-level IOB, shared
    * with the reference's codec): an NE node with no leaf descendants
    * covers zero tokens and therefore disappears from the encoding —
    * decode∘encode is the identity only for forests without empty nodes.
    */
  def encodeForest(forest: List[NeTree]): Vector[(String, Label)] = {
    val out = ArrayBuffer.empty[(String, Label)]
    def go(t: NeTree, prefixOf: Int => Label): Unit = t match {
      case NeLeaf(w) => out += ((w, prefixOf(out.length)))
      case NeNode(ne, kids) =>
        val start = out.length
        val pf: Int => Label =
          i => prefixOf(i) :+ Atom(begin = i == start, ne = ne)
        kids.foreach(go(_, pf))
    }
    forest.foreach(go(_, _ => Nil))
    out.toVector
  }

  /** Decode per-token label stacks back into a forest. Ill-formed
    * sequences are repaired: an I atom that does not continue an open
    * entity of the same type at the same layer is treated as B
    * (I-without-B repair, the documented behavior of
    * `data-named`'s `decodeForest`, call site
    * /root/reference/src/NLP/Nerf.hs:99).
    */
  def decodeForest(tagged: Seq[(String, Label)]): List[NeTree] = {
    // Open node on the stack: its type + completed children so far.
    final class Open(val ne: String) { val kids = ArrayBuffer.empty[NeTree] }
    val top = ArrayBuffer.empty[NeTree]
    val stack = ArrayBuffer.empty[Open]

    def closeDownTo(depth: Int): Unit =
      while (stack.length > depth) {
        val o = stack.remove(stack.length - 1)
        val node = NeNode(o.ne, o.kids.toList)
        if (stack.isEmpty) top += node else stack.last.kids += node
      }

    for ((word, atoms) <- tagged) {
      // longest prefix of atoms that continues the currently-open stack:
      // atom j continues iff it is I with the same type as open layer j
      var j = 0
      while (j < atoms.length && j < stack.length &&
             !atoms(j).begin && atoms(j).ne == stack(j).ne) j += 1
      closeDownTo(j)
      // open the remaining layers (B, or repaired I)
      var k = j
      while (k < atoms.length) { stack += new Open(atoms(k).ne); k += 1 }
      val leaf = NeLeaf(word)
      if (stack.isEmpty) top += leaf else stack.last.kids += leaf
    }
    closeDownTo(0)
    top.toList
  }
}
