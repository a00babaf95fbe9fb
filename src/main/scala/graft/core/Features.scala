package graft.core

import scala.collection.mutable.ArrayBuffer

/** Observation-schema feature extraction.
  *
  * Re-implements the reference's 12 config-driven schema blocks
  * (/root/reference/src/NLP/Nerf/Schema.hs:105-212,248-362) plus the Ox
  * index bookkeeping of the public `monad-ox` package (each `save` site
  * gets a deterministic hierarchical index `[Int]`; `group` nests one
  * level; observation identity = (index path, value), so two identical
  * texts emitted by different blocks are distinct features —
  * /root/reference/src/NLP/Nerf/Types.hs:23).
  *
  * Our frozen conventions (SURVEY.md §7.4 pinning; documented because the
  * dep sources are not vendored):
  *  - index path: top-level saves count 1,2,3,… in call order; a `group`
  *    occupies one slot and its inner saves get `slot.1`, `slot.2`, …;
  *    `save(None)` still consumes a slot (stable site numbering);
  *    `saves` (multi-value) puts all values under one slot.
  *  - rendered feature key: `"<i>.<j>~<value>"`.
  *  - shape alphabet: upper→'X', lower→'x', digit→'d', other→'o'
  *    (Schema.hs:156-161).
  *  - prefix/suffix of negative length n takes `len+n` chars; out-of-range
  *    lengths yield no observation (Schema.hs:144-153 uses `[0,-1..-n]`).
  */
object Features {

  // ---------------- Ox emulation ----------------

  final class Ox {
    private val out = ArrayBuffer.empty[String]
    private val path = ArrayBuffer.empty[Int] // counters of enclosing groups
    private var counter = 0                   // counter at current level

    private def key(): String =
      if (path.isEmpty) counter.toString
      else path.mkString(".") + "." + counter

    def save(v: Option[String]): Unit = {
      counter += 1
      v.foreach(x => out += key() + "~" + x)
    }

    def saves(vs: Iterable[String]): Unit = {
      counter += 1
      val k = key()
      vs.foreach(x => out += k + "~" + x)
    }

    def group(body: => Unit): Unit = {
      counter += 1
      path += counter
      val saved = counter
      counter = 0
      body
      path.remove(path.length - 1)
      counter = saved
    }

    def result(): Set[String] = out.toSet // dedup, as S.fromList (Schema.hs:359)
  }

  // ---------------- basic accessors ----------------

  private def orthAt(sent: IndexedSeq[String], i: Int): Option[String] =
    if (i >= 0 && i < sent.length) Some(sent(i)) else None

  private def lowOrthAt(sent: IndexedSeq[String], i: Int): Option[String] =
    orthAt(sent, i).map(_.toLowerCase)

  /** Affix helper: non-negative n = take n chars; negative n = take len+n
    * chars; out of range -> None.
    */
  def prefix(n: Int, w: String): Option[String] = {
    val len = w.length
    val m = if (n >= 0) n else len + n
    if (m >= 0 && m <= len) Some(w.substring(0, m)) else None
  }

  def suffix(n: Int, w: String): Option[String] = {
    val len = w.length
    val m = if (n >= 0) n else len + n
    if (m >= 0 && m <= len) Some(w.substring(len - m)) else None
  }

  /** Character shape (Schema.hs:156-161). */
  def shape(w: String): String = w.map { c =>
    if (c.isUpper) 'X' else if (c.isLower) 'x'
    else if (c.isDigit) 'd' else 'o'
  }

  /** Run-length-collapsed shape (Schema.hs:164-170). */
  def pack(s: String): String = {
    val b = new StringBuilder
    var last: Char = 0
    s.foreach { c => if (c != last) { b += c; last = c } }
    b.result()
  }

  // ---------------- schema configuration ----------------

  /** One block's config: the relative-position range + block argument
    * (Schema.hs:215-219 `Body { range, args }`). `None` = block disabled.
    */
  final case class SchemaConf(
      orthC: Option[List[Int]] = None,
      splitOrthC: Option[List[Int]] = None,
      lowPrefixesC: Option[(List[Int], List[Int])] = None, // (range, lengths)
      lowSuffixesC: Option[(List[Int], List[Int])] = None,
      lemmaC: Option[(List[Int], Int)] = None,
      shapeC: Option[List[Int]] = None,
      packedC: Option[List[Int]] = None,
      shapePairC: Option[List[Int]] = None,
      packedPairC: Option[List[Int]] = None,
      dictC: Option[(List[Int], List[Map[String, List[String]]])] = None,
      intTrigsC: Option[(List[Int], Map[String, List[String]])] = None,
      extTrigsC: Option[(List[Int], Map[String, List[String]])] = None)

  object SchemaConf {
    /** Default configuration (Schema.hs:304-322). */
    def default(
        neDicts: List[Map[String, List[String]]] = Nil,
        intDict: Option[Map[String, List[String]]] = None,
        extDict: Option[Map[String, List[String]]] = None): SchemaConf =
      SchemaConf(
        orthC = None,
        splitOrthC = Some(List(-1, 0)),
        lowPrefixesC = None,
        lowSuffixesC = Some((List(0), List(2, 3, 4))),
        lemmaC = Some((List(-1, 0), 3)),
        shapeC = Some(List(-1, 0)),
        packedC = Some(List(-1, 0)),
        shapePairC = Some(List(0)),
        packedPairC = Some(List(0)),
        dictC = if (neDicts.isEmpty) None else Some((List(-1, 0), neDicts)),
        intTrigsC = intDict.map(d => (List(0), d)),
        extTrigsC = extDict.map(d => (List(-1), d)))
  }

  // ---------------- blocks ----------------
  // Each mirrors the reference's save-call order exactly so that index
  // paths are stable (fromBlock: absolute positions = range.map(_ + k),
  // Schema.hs:99-102).

  private type Sent = IndexedSeq[String]

  private def orthB(ox: Ox, sent: Sent, ks: List[Int]): Unit =
    ks.foreach(i => ox.save(orthAt(sent, i)))

  private def splitOrthB(ox: Ox, sent: Sent, ks: List[Int]): Unit = {
    ks.foreach(i => ox.save(lowOrthAt(sent, i)))
    ks.foreach(i => ox.save(orthAt(sent, i).filter(_.exists(_.isUpper))))
  }

  private def lowPrefixesB(ox: Ox, sent: Sent, ks: List[Int], ns: List[Int]): Unit =
    ks.foreach { i =>
      ns.foreach(n => ox.save(lowOrthAt(sent, i).flatMap(prefix(n, _))))
    }

  private def lowSuffixesB(ox: Ox, sent: Sent, ks: List[Int], ns: List[Int]): Unit =
    ks.foreach { i =>
      ns.foreach(n => ox.save(lowOrthAt(sent, i).flatMap(suffix(n, _))))
    }

  private def lemmaB(ox: Ox, sent: Sent, ks: List[Int], n: Int): Unit =
    ks.foreach { i =>
      ox.group {
        val deltas = (0 to n).map(-_).toList // [0, -1 .. -n] (Schema.hs:152)
        deltas.foreach(d => ox.save(lowOrthAt(sent, i).flatMap(prefix(d, _))))
        deltas.foreach(d => ox.save(lowOrthAt(sent, i).flatMap(suffix(d, _))))
      }
    }

  private def shapeB(ox: Ox, sent: Sent, ks: List[Int]): Unit =
    ks.foreach(i => ox.save(orthAt(sent, i).map(shape)))

  private def packedB(ox: Ox, sent: Sent, ks: List[Int]): Unit =
    ks.foreach(i => ox.save(orthAt(sent, i).map(w => pack(shape(w)))))

  private def shapePairB(ox: Ox, sent: Sent, ks: List[Int]): Unit =
    ks.foreach { i =>
      val v = for {
        a <- orthAt(sent, i).map(shape)
        b <- orthAt(sent, i - 1).map(shape)
      } yield a + "-" + b
      ox.save(v)
    }

  private def packedPairB(ox: Ox, sent: Sent, ks: List[Int]): Unit =
    ks.foreach { i =>
      val v = for {
        a <- orthAt(sent, i).map(w => pack(shape(w)))
        b <- orthAt(sent, i - 1).map(w => pack(shape(w)))
      } yield a + "-" + b
      ox.save(v)
    }

  private def dictB(ox: Ox, sent: Sent, ks: List[Int],
                    dict: Map[String, List[String]]): Unit =
    ks.foreach { i =>
      val hits = orthAt(sent, i).flatMap(dict.get).getOrElse(Nil)
      ox.saves(hits.sorted) // S.toList ordering (Schema.hs:206-212)
    }

  // ---------------- schematize ----------------

  /** Extract per-position observation sets for a sentence
    * (Schema.hs:341-362: blocks composed in fixed order; fresh Ox per
    * position).
    */
  def schematize(conf: SchemaConf, tokens: IndexedSeq[String]): Array[Set[String]] = {
    val n = tokens.length
    Array.tabulate(n) { k =>
      val ox = new Ox
      def abs(range: List[Int]): List[Int] = range.map(_ + k)
      conf.orthC.foreach(r => orthB(ox, tokens, abs(r)))
      conf.splitOrthC.foreach(r => splitOrthB(ox, tokens, abs(r)))
      conf.lowPrefixesC.foreach { case (r, ns) => lowPrefixesB(ox, tokens, abs(r), ns) }
      conf.lowSuffixesC.foreach { case (r, ns) => lowSuffixesB(ox, tokens, abs(r), ns) }
      conf.lemmaC.foreach { case (r, m) => lemmaB(ox, tokens, abs(r), m) }
      conf.shapeC.foreach(r => shapeB(ox, tokens, abs(r)))
      conf.packedC.foreach(r => packedB(ox, tokens, abs(r)))
      conf.shapePairC.foreach(r => shapePairB(ox, tokens, abs(r)))
      conf.packedPairC.foreach(r => packedPairB(ox, tokens, abs(r)))
      conf.dictC.foreach { case (r, dicts) =>
        dicts.foreach(d => dictB(ox, tokens, abs(r), d))
      }
      conf.intTrigsC.foreach { case (r, d) => dictB(ox, tokens, abs(r), d) }
      conf.extTrigsC.foreach { case (r, d) => dictB(ox, tokens, abs(r), d) }
      ox.result()
    }
  }
}
