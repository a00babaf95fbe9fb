package graft.core

import breeze.linalg.{DenseMatrix, DenseVector}
import scala.collection.mutable

/** Deterministic SGD trainer for the linear-chain CRF.
  *
  * Mirrors the documented training setup of the reference: stochastic
  * gradient descent over labeled sentences with L2 regularization and a
  * decaying gain schedule, defaults batchSize=30, regVar=10.0, iterNum=10,
  * gain0=1.0, tau=5.0 (/root/reference/app/Main.hs:119-123; SGD provided
  * by the public `sgd-0.2.3` package, invoked via `CRF.train` at
  * /root/reference/src/NLP/Nerf.hs:79-91 with `presentFeats`).
  *
  * The gradient is observed-minus-expected feature counts (expected via
  * forward–backward), computed only for features present in training
  * data. Batch order is a seeded shuffle -> bit-for-bit reproducible
  * runs, which the golden decodings rely on (SURVEY.md §7.4.2).
  */
object Sgd {

  final case class Config(
      batchSize: Int = 30,
      regVar: Double = 10.0,
      iterNum: Int = 10,
      gain0: Double = 1.0,
      tau: Double = 5.0,
      seed: Long = 42L)

  /** A training sentence: per-position observations + gold labels. */
  final case class TrainSent(obs: Array[Features.PosObs], labels: Array[String])

  /** The per-sentence gradient kernel — the ONE implementation of
    * "observed minus expected feature counts" shared by the driver-local
    * SGD loop below and the distributed batch-gradient trainer
    * ([[graft.pipeline.Train.trainDistributed]]). Serializable so it
    * broadcasts once per training run; all state is the frozen feature
    * codec — weights are passed per call, so one broadcast kernel serves
    * every epoch.
    *
    * Extraction note: [[accumulate]], [[obsScores]] and [[fb]] are the
    * former inline batch body / `obsScoresEnc` / `fbLocal` of
    * [[train]], moved VERBATIM — the committed golden decodings pin the
    * local trainer's floating-point evaluation order, so this class
    * must never reorder an operation the loop used to do inline.
    *
    * Feature id layout: `[0, L)` initial-label (sing) weights,
    * `[L, L + L*L)` transitions at `prev*L + cur`, then the present
    * (observation, label) features.
    */
  final class Kernel(
      val L: Int,
      val singPresent: Array[Boolean],
      val transPresent: Array[Boolean],
      val obsFeatIds: scala.collection.Map[Long, Int],
      val obsLabelArr: Array[Array[Int]],
      val obsFeatArr: Array[Array[Int]],
      val F: Int) extends Serializable {

    val singBase = 0
    val transBase: Int = L

    /** Per-position label scores for one encoded sentence under `w`. */
    def obsScores(obs: Array[Array[Int]], w: Array[Double]): Array[Array[Double]] =
      obs.map { oids =>
        val s = new Array[Double](L)
        oids.foreach { oid =>
          val ls = obsLabelArr(oid); val fs = obsFeatArr(oid)
          var i = 0
          while (i < ls.length) { s(ls(i)) += w(fs(i)); i += 1 }
        }
        s
      }

    /** Log-domain forward–backward over per-position scores `os` using
      * the trainer's sparse (w, transPresent) weight layout. Same
      * recursions as Crf.forwardBackward; logSumExp is shared, so the
      * two stay numerically aligned.
      */
    def fb(os: Array[Array[Double]], w: Array[Double])
        : (Array[Array[Double]], Array[Array[Double]], Double) = {
      val m = os.length
      val alpha = Array.ofDim[Double](m, L)
      val beta = Array.ofDim[Double](m, L)
      val tmp = new Array[Double](L)
      var y = 0
      while (y < L) {
        alpha(0)(y) = (if (singPresent(y)) w(singBase + y) else 0.0) + os(0)(y); y += 1
      }
      var k = 1
      while (k < m) {
        var cur = 0
        while (cur < L) {
          var prev = 0
          while (prev < L) {
            val idx = prev * L + cur
            tmp(prev) = alpha(k - 1)(prev) + (if (transPresent(idx)) w(transBase + idx) else 0.0)
            prev += 1
          }
          alpha(k)(cur) = logSumExp(tmp) + os(k)(cur)
          cur += 1
        }
        k += 1
      }
      y = 0
      while (y < L) { beta(m - 1)(y) = 0.0; y += 1 }
      k = m - 2
      while (k >= 0) {
        var cur = 0
        while (cur < L) {
          var nxt = 0
          while (nxt < L) {
            val idx = cur * L + nxt
            tmp(nxt) = (if (transPresent(idx)) w(transBase + idx) else 0.0) + os(k + 1)(nxt) + beta(k + 1)(nxt)
            nxt += 1
          }
          beta(k)(cur) = logSumExp(tmp)
          cur += 1
        }
        k -= 1
      }
      (alpha, beta, logSumExp(alpha(m - 1)))
    }

    /** Add one sentence's gradient (observed − expected counts) into
      * `gAdd`. Only valid feature ids reach the sink — an observation
      * whose (oid, label) pair has no present feature is skipped here,
      * not by the caller.
      */
    def accumulate(obs: Array[Array[Int]], lbs: Array[Int],
                   w: Array[Double], gAdd: (Int, Double) => Unit): Unit = {
      val m = lbs.length
      if (m > 0) {
        // observed counts
        gAdd(singBase + lbs(0), 1.0)
        var k = 1
        while (k < m) {
          val idx = lbs(k - 1) * L + lbs(k)
          if (transPresent(idx)) gAdd(transBase + idx, 1.0)
          k += 1
        }
        k = 0
        while (k < m) {
          obs(k).foreach { oid =>
            val fid = obsFeatIds.getOrElse(oid.toLong * L + lbs(k), -1)
            if (fid >= 0) gAdd(fid, 1.0)
          }
          k += 1
        }
        // expected counts via forward-backward
        val os = obsScores(obs, w)
        val (alpha, beta, logZ) = fb(os, w)
        k = 0
        while (k < m) {
          val marg = new Array[Double](L)
          var y = 0
          while (y < L) { marg(y) = math.exp(alpha(k)(y) + beta(k)(y) - logZ); y += 1 }
          if (k == 0) {
            y = 0
            while (y < L) { if (singPresent(y)) gAdd(singBase + y, -marg(y)); y += 1 }
          }
          obs(k).foreach { oid =>
            val ls = obsLabelArr(oid); val fs = obsFeatArr(oid)
            var i = 0
            while (i < ls.length) { gAdd(fs(i), -marg(ls(i))); i += 1 }
          }
          if (k > 0) {
            // pairwise marginals for present transitions
            var prev = 0
            while (prev < L) {
              var cur = 0
              while (cur < L) {
                val idx = prev * L + cur
                if (transPresent(idx)) {
                  val lp = alpha(k - 1)(prev) + w(transBase + idx) + os(k)(cur) + beta(k)(cur) - logZ
                  gAdd(transBase + idx, -math.exp(lp))
                }
                cur += 1
              }
              prev += 1
            }
          }
          k += 1
        }
      }
    }
  }

  /** Assemble a decodable model from a frozen codec + trained weights —
    * the same construction for both trainers.
    */
  def modelFrom(labels: Array[String], obsIds: Array[Map[String, Int]],
                kernel: Kernel, w: Array[Double]): Crf.Model = {
    val L = kernel.L
    val sing = DenseVector.tabulate(L)(y =>
      if (kernel.singPresent(y)) w(kernel.singBase + y) else 0.0)
    val trans = DenseMatrix.tabulate(L, L)((p, c) =>
      if (kernel.transPresent(p * L + c)) w(kernel.transBase + p * L + c) else 0.0)
    val ow = kernel.obsFeatArr.map(_.map(w))
    Crf.Model(labels, obsIds, sing, trans, kernel.obsLabelArr, ow)
  }

  def train(data: Seq[TrainSent], cfg: Config = Config(),
            log: String => Unit = _ => (),
            eval: Option[Seq[TrainSent]] = None): Crf.Model = {
    require(data.nonEmpty, "empty training set")

    // ---- codecs ----
    val labelIds = mutable.LinkedHashMap.empty[String, Int]
    data.foreach(_.labels.foreach(l => labelIds.getOrElseUpdate(l, labelIds.size)))
    val L = labelIds.size
    // an all-empty corpus (whitespace-only lines) passes data.nonEmpty
    // but yields zero labels — the model would save fine and crash with
    // ArrayIndexOutOfBounds on the first tag call; fail at train time
    require(L > 0, "no labeled tokens in the training data — every " +
      "sentence is empty; check the input corpus")
    // per save-site value -> global obs id (observation identity is the
    // (site, value) pair)
    val nSites = data.iterator.flatMap(_.obs.iterator)
      .flatMap(_.sites.iterator).maxOption.getOrElse(-1) + 1
    val obsIds = Array.fill(nSites)(mutable.LinkedHashMap.empty[String, Int])
    var obsCount = 0
    data.foreach(_.obs.foreach { p =>
      var j = 0
      while (j < p.size) {
        val m = obsIds(p.sites(j))
        if (!m.contains(p.values(j))) { m(p.values(j)) = obsCount; obsCount += 1 }
        j += 1
      }
    })
    val O = obsCount

    // encoded sentences
    val enc: Array[(Array[Array[Int]], Array[Int])] = data.map { s =>
      val obs = s.obs.map { p =>
        val a = new Array[Int](p.size)
        var j = 0
        while (j < p.size) { a(j) = obsIds(p.sites(j))(p.values(j)); j += 1 }
        java.util.Arrays.sort(a)
        a
      }
      val lbs = s.labels.map(labelIds)
      (obs, lbs)
    }.toArray

    // ---- present features (Nerf.hs:90 presentFeats) ----
    // feature ids: [0,L) sing; [L, L+L*L) trans(prev*L+cur); then obs feats
    val singBase = 0
    val transBase = L
    val obsFeatIds = mutable.HashMap.empty[Long, Int] // key = oid.toLong*L + y
    var nextId = transBase + L * L
    val singPresent = new Array[Boolean](L)
    val transPresent = new Array[Boolean](L * L)
    enc.foreach { case (obs, lbs) =>
      if (lbs.nonEmpty) {
        singPresent(lbs(0)) = true
        var k = 1
        while (k < lbs.length) { transPresent(lbs(k - 1) * L + lbs(k)) = true; k += 1 }
        k = 0
        while (k < lbs.length) {
          val y = lbs(k)
          obs(k).foreach { oid =>
            val key = oid.toLong * L + y
            if (!obsFeatIds.contains(key)) { obsFeatIds(key) = nextId; nextId += 1 }
          }
          k += 1
        }
      }
    }
    val F = nextId
    log(s"[sgd] labels=$L obs=$O features=$F sentences=${enc.length}")

    // per-obs present labels (sorted) + their feature ids, for fast scoring
    val obsLabelsB = Array.fill(O)(mutable.ArrayBuffer.empty[(Int, Int)])
    obsFeatIds.foreach { case (key, fid) =>
      val oid = (key / L).toInt; val y = (key % L).toInt
      obsLabelsB(oid) += ((y, fid))
    }
    // one sort per buffer; both parallel arrays project from the SAME
    // sorted sequence (no reliance on two sorts aligning)
    val obsSorted = obsLabelsB.map(_.sortBy(_._1))
    val obsLabelArr: Array[Array[Int]] = obsSorted.map(_.map(_._1).toArray)
    val obsFeatArr: Array[Array[Int]] = obsSorted.map(_.map(_._2).toArray)

    val w = new Array[Double](F)
    val kernel = new Kernel(L, singPresent, transPresent, obsFeatIds,
      obsLabelArr, obsFeatArr, F)

    def mkModel(): Crf.Model =
      modelFrom(labelIds.keys.toArray, obsIds.map(_.toMap), kernel, w)

    val n = enc.length
    val cfgBatch = math.max(1, math.min(cfg.batchSize, n))
    val rnd = new scala.util.Random(cfg.seed)
    var done = 0.0 // fractional epochs processed (sgd gain schedule)

    val grad = new mutable.HashMap[Int, Double]()
    def gAdd(fid: Int, v: Double): Unit =
      if (fid >= 0) grad(fid) = grad.getOrElse(fid, 0.0) + v

    for (epoch <- 1 to cfg.iterNum) {
      val order = rnd.shuffle((0 until n).toVector)
      var off = 0
      while (off < n) {
        val batch = order.slice(off, off + cfgBatch)
        off += cfgBatch
        grad.clear()
        batch.foreach { bi =>
          val (obs, lbs) = enc(bi)
          kernel.accumulate(obs, lbs, w, gAdd)
        }
        // gain schedule: gain0 * tau / (tau + done-epochs)
        val gain = cfg.gain0 * cfg.tau / (cfg.tau + done)
        // L2 global decay per batch. KNOWN O(F)-per-batch cost: a lazy
        // scalar multiplier (weights stored unscaled, folded in on read)
        // would make this O(1), but changes floating-point evaluation
        // order and therefore every trained model — the committed golden
        // decodings pin the current numerics, and training corpora are
        // driver-sized by contract, so the eager sweep stays.
        val decay = 1.0 - gain * batch.length / (cfg.regVar * n)
        if (decay < 1.0) {
          var i = 0
          while (i < F) { w(i) *= decay; i += 1 }
        }
        grad.foreach { case (fid, g) => w(fid) += gain * g }
        done += batch.length.toDouble / n
      }
      // per-epoch eval-set token accuracy, like the reference's `-e`
      // eval reporting (/root/reference/app/Main.hs:233-248)
      val evalMsg = eval.map { es =>
        val model = mkModel()
        var ok = 0L; var tot = 0L
        es.foreach { s =>
          val pred = model.tag(s.obs)
          var i = 0
          while (i < pred.length) {
            if (pred(i) == s.labels(i)) ok += 1
            tot += 1; i += 1
          }
        }
        f"; eval-acc=${if (tot == 0) 0.0 else ok.toDouble / tot}%.4f"
      }.getOrElse("")
      log(f"[sgd] epoch $epoch%2d done; gain=${cfg.gain0 * cfg.tau / (cfg.tau + done)}%.4f$evalMsg")
    }

    mkModel()
  }

  // one implementation shared with inference (identical numerics)
  @inline private[core] def logSumExp(xs: Array[Double]): Double = Crf.logSumExp(xs)
}
