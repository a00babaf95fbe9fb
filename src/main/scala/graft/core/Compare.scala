package graft.core

/** Mention-level comparison of two NE-annotated corpora: per-type TP/FP/FN
  * on exact (label, whitespace-ignored char-span) match, plus a grand
  * total — the reference's evaluation mode
  * (/root/reference/src/NLP/Nerf/Compare.hs:59-119,
  * /root/reference/app/Main.hs:316-328).
  */
object CompareStats {

  final case class Stats(tp: Long, fp: Long, fn: Long) {
    def +(o: Stats): Stats = Stats(tp + o.tp, fp + o.fp, fn + o.fn)
    def precision: Double = if (tp + fp == 0) 0.0 else tp.toDouble / (tp + fp)
    def recall: Double = if (tp + fn == 0) 0.0 else tp.toDouble / (tp + fn)
    def f1: Double = {
      val p = precision; val r = recall
      if (p + r == 0) 0.0 else 2 * p * r / (p + r)
    }
  }

  val AllKey = "<all>"

  /** Per-type TP/FP/FN for ONE sentence pair's char-span sets — the
    * single definition of the matching rule, shared by the driver-side
    * `compare` and the distributed `Train.compareJob`.
    */
  def pairStats(rs: Set[(String, Int, Int)],
                cs: Set[(String, Int, Int)]): Seq[(String, Stats)] = {
    val keys = rs.map(_._1) ++ cs.map(_._1)
    keys.toSeq.map { k =>
      val r = rs.filter(_._1 == k)
      val c = cs.filter(_._1 == k)
      k -> Stats(
        tp = r.intersect(c).size,
        fp = c.diff(r).size,
        fn = r.diff(c).size)
    }
  }

  /** Compare sentence-aligned forest pairs (reference, compared). */
  def compare(pairs: Seq[(List[NeTree], List[NeTree])]): Map[String, Stats] = {
    val acc = scala.collection.mutable.Map.empty[String, Stats]
    for ((ref, cmp) <- pairs) {
      pairStats(Forest.charSpans(ref), Forest.charSpans(cmp)).foreach {
        case (k, s) => acc(k) = acc.getOrElse(k, Stats(0, 0, 0)) + s
      }
    }
    val total = acc.values.foldLeft(Stats(0, 0, 0))(_ + _)
    acc(AllKey) = total
    acc.toMap
  }
}
