package graft.core

import breeze.linalg.{DenseMatrix, DenseVector}

/** First-order linear-chain CRF: feature codec, Viterbi decoding, and
  * forward–backward marginals, Breeze-backed.
  *
  * Re-implements the documented semantics of the public `crf-chain1`
  * package at nerf's call sites (/root/reference/src/NLP/Nerf.hs:90,98):
  *  - three feature kinds: singular (initial label), transition
  *    (label-pair), observation (obs value × label);
  *  - the model contains only features *present* in the training data
  *    (`CRF.presentFeats`, Nerf.hs:90); absent features have weight 0;
  *  - observations unseen in training are dropped at tag time (codec);
  *  - inference is max-product (Viterbi) / sum-product (forward–backward)
  *    in the log domain (the reference links `logfloat`,
  *    /root/reference/stack.yaml:53).
  */
object Crf {

  sealed trait Feature
  final case class SFeat(y: Int) extends Feature
  final case class TFeat(yPrev: Int, y: Int) extends Feature
  final case class OFeat(ob: Int, y: Int) extends Feature

  /** Codec + dense weight views for fast inference.
    *
    * @param labels     label id -> rendered joined-IOB label
    * @param obsIds     per save-site: observation value -> obs id
    *                   (unknown observations dropped, crf-chain1 codec)
    * @param sing       initial-label weights, length L
    * @param trans      transition weights, (prev, cur), L×L
    * @param obsLabels  for each obs id, label ids with a present feature
    * @param obsWeights parallel to obsLabels: the feature weights
    */
  final case class Model(
      labels: Array[String],
      obsIds: Array[Map[String, Int]],
      sing: DenseVector[Double],
      trans: DenseMatrix[Double],
      obsLabels: Array[Array[Int]],
      obsWeights: Array[Array[Double]]) extends Serializable {

    def numLabels: Int = labels.length

    @transient lazy val labelIds: Map[String, Int] =
      labels.zipWithIndex.toMap

    /** labels parsed to IOB atom stacks, cached (hot path: one decode
      * per tagged token otherwise).
      */
    @transient lazy val parsedLabels: Array[Iob.Label] =
      labels.map(Iob.parseLabel)

    /** Open-addressed lookup view of obsIds: java.util.HashMap beats
      * scala immutable HashMap ~2x on the miss-heavy tag-time lookups
      * (most observations of unseen text are unknown -> miss).
      */
    @transient private lazy val fastObsIds: Array[java.util.HashMap[String, Integer]] =
      obsIds.map { m =>
        val h = new java.util.HashMap[String, Integer](m.size * 2)
        m.foreach { case (k, v) => h.put(k, Integer.valueOf(v)) }
        h
      }

    /** Per-position accumulated observation scores: out(k)(y) = sum of
      * weights of present (obs, y) features at position k.
      */
    def obsScores(sent: Array[Features.PosObs]): Array[Array[Double]] = {
      val L = numLabels
      val ids = fastObsIds
      val nSites = ids.length
      sent.map { obs =>
        val s = new Array[Double](L)
        var j = 0
        while (j < obs.size) {
          val site = obs.sites(j)
          if (site < nSites) {
            val boxed = ids(site).get(obs.values(j))
            val oid = if (boxed eq null) -1 else boxed.intValue()
            if (oid >= 0) {
              val ls = obsLabels(oid); val ws = obsWeights(oid)
              var i = 0
              while (i < ls.length) { s(ls(i)) += ws(i); i += 1 }
            }
          }
          j += 1
        }
        s
      }
    }

    /** Most-probable label sequence (max-product in log domain). */
    def viterbi(sent: Array[Features.PosObs]): Array[Int] = {
      val n = sent.length
      val L = numLabels
      if (n == 0) return Array.empty
      val os = obsScores(sent)
      val delta = Array.ofDim[Double](n, L)
      val back = Array.ofDim[Int](n, L)
      var y = 0
      while (y < L) { delta(0)(y) = sing(y) + os(0)(y); y += 1 }
      var k = 1
      val td = trans.data // column-major: trans(prev, cur) at cur*L + prev
      while (k < n) {
        var cur = 0
        while (cur < L) {
          var best = Double.NegativeInfinity
          var arg = 0
          var prev = 0
          val base = cur * L
          while (prev < L) {
            val v = delta(k - 1)(prev) + td(base + prev)
            if (v > best) { best = v; arg = prev }
            prev += 1
          }
          delta(k)(cur) = best + os(k)(cur)
          back(k)(cur) = arg
          cur += 1
        }
        k += 1
      }
      var bestY = 0
      var bestV = Double.NegativeInfinity
      y = 0
      while (y < L) { if (delta(n - 1)(y) > bestV) { bestV = delta(n - 1)(y); bestY = y }; y += 1 }
      val path = new Array[Int](n)
      path(n - 1) = bestY
      k = n - 1
      while (k > 0) { path(k - 1) = back(k)(path(k)); k -= 1 }
      path
    }

    def tag(sent: Array[Features.PosObs]): Array[String] =
      viterbi(sent).map(labels)
  }

  /** Shared by training (Sgd) and inference — one implementation, one
    * numerical behavior.
    */
  @inline private[core] def logSumExp(xs: Array[Double]): Double = {
    var m = Double.NegativeInfinity
    var i = 0
    while (i < xs.length) { if (xs(i) > m) m = xs(i); i += 1 }
    if (m == Double.NegativeInfinity) return m
    var s = 0.0
    i = 0
    while (i < xs.length) { s += math.exp(xs(i) - m); i += 1 }
    m + math.log(s)
  }

  /** Forward–backward in log domain. Returns (logAlpha, logBeta, logZ). */
  def forwardBackward(model: Model, os: Array[Array[Double]])
      : (Array[Array[Double]], Array[Array[Double]], Double) = {
    val n = os.length
    if (n == 0) return (Array.empty, Array.empty, 0.0)
    val L = model.numLabels
    val td = model.trans.data
    val alpha = Array.ofDim[Double](n, L)
    val beta = Array.ofDim[Double](n, L)
    val tmp = new Array[Double](L)
    var y = 0
    while (y < L) { alpha(0)(y) = model.sing(y) + os(0)(y); y += 1 }
    var k = 1
    while (k < n) {
      var cur = 0
      while (cur < L) {
        val base = cur * L
        var prev = 0
        while (prev < L) { tmp(prev) = alpha(k - 1)(prev) + td(base + prev); prev += 1 }
        alpha(k)(cur) = logSumExp(tmp) + os(k)(cur)
        cur += 1
      }
      k += 1
    }
    y = 0
    while (y < L) { beta(n - 1)(y) = 0.0; y += 1 }
    k = n - 2
    while (k >= 0) {
      var cur = 0
      while (cur < L) {
        var nxt = 0
        while (nxt < L) { tmp(nxt) = td(nxt * L + cur) + os(k + 1)(nxt) + beta(k + 1)(nxt); nxt += 1 }
        beta(k)(cur) = logSumExp(tmp)
        cur += 1
      }
      k -= 1
    }
    val logZ = logSumExp(alpha(n - 1))
    (alpha, beta, logZ)
  }
}
