package graft.core

/** Broadcast-friendly immutable dictionary: sorted parallel arrays with
  * binary-search lookup.
  *
  * The reference compiles its lexicons into a DAWG
  * (/root/reference/src/NLP/Nerf/Dict/Base.hs:55-60) to fit multi-million
  * -form dictionaries in memory. The Spark analog has different
  * constraints — the structure is broadcast to every executor and read
  * concurrently, so what matters is compact contiguous serialization and
  * allocation-free lookup, not incremental construction. A
  * `HashMap[String, List[String]]` costs ~150 B/entry in node, tuple and
  * cons overhead; this layout costs three object references + 4 bytes
  * per entry beyond the string payloads themselves (~5x smaller, and it
  * serializes as three flat arrays instead of a node graph).
  *
  * Lookup is `O(log n)` string comparisons, zero allocation on miss, one
  * List materialization on hit (label lists are short by contract).
  * Label order within a key is preserved from the source exactly —
  * feature identity depends on it (SURVEY.md §4, save-call order).
  */
final class CompactDict private (
    private val keys: Array[String],
    private val offsets: Array[Int], // length = keys.length + 1
    private val labels: Array[String]) extends Serializable {

  def size: Int = keys.length
  def isEmpty: Boolean = keys.length == 0

  def contains(k: String): Boolean =
    java.util.Arrays.binarySearch(keys.asInstanceOf[Array[AnyRef]],
      k.asInstanceOf[AnyRef]) >= 0

  def getOrElse(k: String, default: List[String]): List[String] = {
    val i = java.util.Arrays.binarySearch(keys.asInstanceOf[Array[AnyRef]],
      k.asInstanceOf[AnyRef])
    if (i < 0) default
    else {
      var out: List[String] = Nil
      var j = offsets(i + 1) - 1
      while (j >= offsets(i)) { out = labels(j) :: out; j -= 1 }
      out
    }
  }

  def get(k: String): Option[List[String]] =
    if (contains(k)) Some(getOrElse(k, Nil)) else None

  /** Entries in key order (used by the model JSON writer). */
  def entries: Iterator[(String, List[String])] =
    keys.indices.iterator.map(i => keys(i) -> getOrElse(keys(i), Nil))

  def toMap: Map[String, List[String]] = entries.toMap

  override def equals(o: Any): Boolean = o match {
    case d: CompactDict =>
      java.util.Arrays.equals(keys.asInstanceOf[Array[AnyRef]],
        d.keys.asInstanceOf[Array[AnyRef]]) &&
        java.util.Arrays.equals(offsets, d.offsets) &&
        java.util.Arrays.equals(labels.asInstanceOf[Array[AnyRef]],
          d.labels.asInstanceOf[Array[AnyRef]])
    case _ => false
  }
  override def hashCode: Int =
    java.util.Arrays.hashCode(keys.asInstanceOf[Array[AnyRef]])
}

object CompactDict {

  /** Broadcast budget: the largest lexicon this structure will agree to
    * hold. ~50M entries ≈ several GB broadcast per executor — beyond
    * that the failure mode without a guard is an executor OOM at
    * broadcast time, discovered late on a long job. Lexicons above the
    * budget must take the distributed join path
    * (`DictBuild.lookupJoin`), which never materializes the dictionary
    * on a single host.
    */
  val MaxBroadcastEntries: Int = 50000000

  val empty: CompactDict = new CompactDict(Array.empty, Array(0), Array.empty)

  def fromMap(m: Map[String, List[String]],
              maxEntries: Int = MaxBroadcastEntries): CompactDict =
    fromPairs(m.iterator, maxEntries)

  def fromPairs(entries: Iterator[(String, List[String])],
                maxEntries: Int = MaxBroadcastEntries): CompactDict = {
    // guard WHILE consuming: materializing an oversized stream first and
    // checking after would OOM before the actionable message ever prints
    val buf = new scala.collection.mutable.ArrayBuffer[(String, List[String])]()
    while (entries.hasNext) {
      buf += entries.next()
      require(buf.length <= maxEntries,
        s"dictionary exceeds the broadcast budget of $maxEntries entries " +
          "— a broadcast this size OOMs executors; use the distributed " +
          "lookup join (graft.pipeline.DictBuild.lookupJoin) for lexicons " +
          "of this scale")
    }
    val sorted = buf.toArray.sortBy(_._1)
    val keys = new Array[String](sorted.length)
    val offsets = new Array[Int](sorted.length + 1)
    val labelBuf = new scala.collection.mutable.ArrayBuffer[String]()
    var i = 0
    while (i < sorted.length) {
      keys(i) = sorted(i)._1
      offsets(i) = labelBuf.length
      labelBuf ++= sorted(i)._2
      i += 1
    }
    offsets(sorted.length) = labelBuf.length
    new CompactDict(keys, offsets, labelBuf.toArray)
  }
}
