package graft.core

import scala.collection.mutable.ArrayBuffer

/** Observation-schema feature extraction.
  *
  * Re-implements the reference's 12 config-driven schema blocks
  * (/root/reference/src/NLP/Nerf/Schema.hs:105-212,248-362) plus the Ox
  * index bookkeeping of the public `monad-ox` package: each `save` site
  * gets a deterministic index; observation identity = (index, value), so
  * two identical texts emitted by different blocks are distinct features
  * (/root/reference/src/NLP/Nerf/Types.hs:23).
  *
  * Our frozen conventions (SURVEY.md §7.4 pinning; documented because
  * the dep sources are not vendored):
  *  - the hierarchical `[Int]` Ox path is flattened to one scalar
  *    `siteId` = the ordinal of the save call within the per-position
  *    schema program. Every save site executes exactly once per position
  *    (disabled/out-of-range saves still consume their ordinal), so the
  *    numbering is stable and (siteId, value) pairs are unique within a
  *    position — the reference's per-position set-dedup
  *    (`S.fromList`, Schema.hs:359) is then a no-op and is omitted.
  *  - `saves` (multi-value dictionary hits) emits all values under one
  *    siteId.
  *  - shape alphabet: upper→'X', lower→'x', digit→'d', other→'o'
  *    (Schema.hs:156-161).
  *  - prefix/suffix of negative length n takes `len+n` chars;
  *    out-of-range lengths yield no observation (Schema.hs:144-153 uses
  *    `[0,-1..-n]`).
  *
  * Hot-path note: this runs once per token of a 100 TB corpus. The
  * representation is two parallel arrays per position (site ids +
  * value strings, the latter usually sharing the token's backing
  * storage) — no per-observation boxing, hashing, or string
  * concatenation (measured: the dominant memory-bandwidth cost at high
  * executor thread counts).
  */
object Features {

  /** Observations at one sentence position: parallel arrays, index i
    * pairing sites(i) with values(i).
    */
  final class PosObs(val sites: Array[Int], val values: Array[String])
      extends Serializable {
    def size: Int = sites.length
    def render: List[String] =
      sites.indices.map(i => s"${sites(i)}~${values(i)}").toList
    override def equals(o: Any): Boolean = o match {
      case p: PosObs =>
        java.util.Arrays.equals(sites, p.sites) &&
          java.util.Arrays.equals(values.asInstanceOf[Array[AnyRef]],
            p.values.asInstanceOf[Array[AnyRef]])
      case _ => false
    }
    override def hashCode: Int =
      java.util.Arrays.hashCode(sites) * 31 +
        java.util.Arrays.hashCode(values.asInstanceOf[Array[AnyRef]])
  }

  // ---------------- Ox emulation ----------------

  final class Ox {
    // primitive-backed builder: ArrayBuffer[Int] would box every site id
    // on the once-per-token hot path (erased Array[AnyRef] storage)
    private val siteBuf = new scala.collection.mutable.ArrayBuilder.ofInt
    private val valueBuf = new ArrayBuffer[String](32)
    private var site = 0
    siteBuf.sizeHint(32)

    def save(v: String): Unit = { // null = no observation, slot consumed
      if (v != null) { siteBuf += site; valueBuf += v }
      site += 1
    }

    def saves(vs: Iterable[String]): Unit = {
      vs.foreach { x => siteBuf += site; valueBuf += x }
      site += 1
    }

    def result(): PosObs = new PosObs(siteBuf.result(), valueBuf.toArray)
  }

  // ---------------- basic accessors ----------------

  @inline private def orthAt(sent: IndexedSeq[String], i: Int): String =
    if (i >= 0 && i < sent.length) sent(i) else null

  @inline private def lowOrthAt(sent: IndexedSeq[String], i: Int): String = {
    val w = orthAt(sent, i)
    // Locale.ROOT: features must be identical on every executor JVM
    // regardless of default locale (tr_TR lowercases I to dotless ı,
    // silently desynchronizing tag-time features from the trained model)
    if (w == null) null else w.toLowerCase(java.util.Locale.ROOT)
  }

  /** Affix helper: non-negative n = take n chars; negative n = take
    * len+n chars; out of range -> null.
    */
  def prefix(n: Int, w: String): String = {
    val len = w.length
    val m = if (n >= 0) n else len + n
    if (m >= 0 && m <= len) w.substring(0, m) else null
  }

  def suffix(n: Int, w: String): String = {
    val len = w.length
    val m = if (n >= 0) n else len + n
    if (m >= 0 && m <= len) w.substring(len - m) else null
  }

  /** Character shape (Schema.hs:156-161). */
  def shape(w: String): String = {
    val b = new java.lang.StringBuilder(w.length)
    var i = 0
    while (i < w.length) {
      val c = w.charAt(i)
      b.append(
        if (Character.isUpperCase(c)) 'X'
        else if (Character.isLowerCase(c)) 'x'
        else if (Character.isDigit(c)) 'd' else 'o')
      i += 1
    }
    b.toString
  }

  /** Run-length-collapsed shape (Schema.hs:164-170). */
  def pack(s: String): String = {
    val b = new java.lang.StringBuilder(s.length)
    var last: Char = 0
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c != last) { b.append(c); last = c }
      i += 1
    }
    b.toString
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
      dictC: Option[(List[Int], List[CompactDict])] = None,
      intTrigsC: Option[(List[Int], CompactDict)] = None,
      extTrigsC: Option[(List[Int], CompactDict)] = None)

  object SchemaConf {
    /** Default configuration (Schema.hs:304-322). Dictionaries are
      * compiled to [[CompactDict]] (broadcast-compact, SURVEY.md §4).
      */
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
        dictC = if (neDicts.isEmpty) None
                else Some((List(-1, 0), neDicts.map(CompactDict.fromMap(_)))),
        intTrigsC = intDict.map(d => (List(0), CompactDict.fromMap(d))),
        extTrigsC = extDict.map(d => (List(-1), CompactDict.fromMap(d))))
  }

  // ---------------- blocks ----------------
  // Each mirrors the reference's save-call order exactly so that site
  // ids are stable (fromBlock: absolute positions = range.map(_ + k),
  // Schema.hs:99-102).

  private type Sent = IndexedSeq[String]

  private def orthB(ox: Ox, sent: Sent, ks: List[Int]): Unit =
    ks.foreach(i => ox.save(orthAt(sent, i)))

  private def splitOrthB(ox: Ox, sent: Sent, ks: List[Int]): Unit = {
    ks.foreach(i => ox.save(lowOrthAt(sent, i)))
    ks.foreach { i =>
      val w = orthAt(sent, i)
      ox.save(if (w != null && hasUpper(w)) w else null)
    }
  }

  @inline private def hasUpper(w: String): Boolean = {
    var i = 0
    while (i < w.length) {
      if (Character.isUpperCase(w.charAt(i))) return true
      i += 1
    }
    false
  }

  private def lowPrefixesB(ox: Ox, sent: Sent, ks: List[Int], ns: List[Int]): Unit =
    ks.foreach { i =>
      val w = lowOrthAt(sent, i)
      ns.foreach(n => ox.save(if (w == null) null else prefix(n, w)))
    }

  private def lowSuffixesB(ox: Ox, sent: Sent, ks: List[Int], ns: List[Int]): Unit =
    ks.foreach { i =>
      val w = lowOrthAt(sent, i)
      ns.foreach(n => ox.save(if (w == null) null else suffix(n, w)))
    }

  private def lemmaB(ox: Ox, sent: Sent, ks: List[Int], n: Int): Unit =
    ks.foreach { i =>
      val w = lowOrthAt(sent, i)
      // deltas [0, -1 .. -n] (Schema.hs:152); the reference nests these
      // under an Ox.group — flattened here, identity preserved by the
      // sequential site numbering
      var d = 0
      while (d >= -n) { ox.save(if (w == null) null else prefix(d, w)); d -= 1 }
      d = 0
      while (d >= -n) { ox.save(if (w == null) null else suffix(d, w)); d -= 1 }
    }

  private def shapeB(ox: Ox, sent: Sent, ks: List[Int]): Unit =
    ks.foreach { i =>
      val w = orthAt(sent, i)
      ox.save(if (w == null) null else shape(w))
    }

  private def packedB(ox: Ox, sent: Sent, ks: List[Int]): Unit =
    ks.foreach { i =>
      val w = orthAt(sent, i)
      ox.save(if (w == null) null else pack(shape(w)))
    }

  private def shapePairB(ox: Ox, sent: Sent, ks: List[Int]): Unit =
    ks.foreach { i =>
      val a = orthAt(sent, i); val b = orthAt(sent, i - 1)
      ox.save(if (a == null || b == null) null else shape(a) + "-" + shape(b))
    }

  private def packedPairB(ox: Ox, sent: Sent, ks: List[Int]): Unit =
    ks.foreach { i =>
      val a = orthAt(sent, i); val b = orthAt(sent, i - 1)
      ox.save(if (a == null || b == null) null
              else pack(shape(a)) + "-" + pack(shape(b)))
    }

  private val noHits: List[String] = Nil

  private def dictB(ox: Ox, sent: Sent, ks: List[Int],
                    dict: CompactDict): Unit =
    ks.foreach { i =>
      val w = orthAt(sent, i)
      val hits = if (w == null) noHits else dict.getOrElse(w, noHits)
      ox.saves(hits) // dict lists are pre-sorted (S.toList, Schema.hs:206-212)
    }

  // ---------------- schematize ----------------

  /** Extract per-position observations for a sentence
    * (Schema.hs:341-362: blocks composed in fixed order; fresh Ox per
    * position).
    */
  def schematize(conf: SchemaConf, tokens: IndexedSeq[String]): Array[PosObs] = {
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

  /** Total number of save sites for a config (site ids are < this). */
  def numSites(conf: SchemaConf): Int = {
    def len(o: Option[List[Int]]): Int = o.map(_.length).getOrElse(0)
    len(conf.orthC) +
      2 * len(conf.splitOrthC) +
      conf.lowPrefixesC.map { case (r, ns) => r.length * ns.length }.getOrElse(0) +
      conf.lowSuffixesC.map { case (r, ns) => r.length * ns.length }.getOrElse(0) +
      conf.lemmaC.map { case (r, n) => r.length * 2 * (n + 1) }.getOrElse(0) +
      len(conf.shapeC) + len(conf.packedC) +
      len(conf.shapePairC) + len(conf.packedPairC) +
      conf.dictC.map { case (r, ds) => r.length * ds.length }.getOrElse(0) +
      conf.intTrigsC.map(_._1.length).getOrElse(0) +
      conf.extTrigsC.map(_._1.length).getOrElse(0)
  }
}
