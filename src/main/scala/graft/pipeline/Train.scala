package graft.pipeline

import graft.core._
import graft.NerfModel
import org.apache.spark.sql.{Dataset, SparkSession}

/** Spark training lifecycle (SURVEY.md §3.2) and cross-validation
  * (§2.8 X1).
  *
  * The corpus-side work — ENAMEX parsing, re-tokenization, IOB encoding,
  * feature extraction — runs distributed as a typed Dataset map; the SGD
  * loop itself runs on the driver over the (small by contract) encoded
  * training set, exactly mirroring the reference's single-process
  * training (/root/reference/src/NLP/Nerf.hs:79-91) but with the heavy
  * per-sentence preprocessing parallelized.
  */
object Train {

  /** A flattened labeled sentence, Spark-encodable: per-position
    * feature sites/values + joined-IOB labels.
    */
  final case class FlatSent(sites: Array[Array[Int]],
                            values: Array[Array[String]],
                            labels: Array[String])

  /** readDeep (S1): ENAMEX lines -> re-tokenized forests -> flattened
    * labeled sentences (/root/reference/src/NLP/Nerf.hs:43-64).
    */
  def flatten(spark: SparkSession, lines: Dataset[String],
              schema: Features.SchemaConf): Dataset[FlatSent] = {
    import spark.implicits._
    val bSchema = spark.sparkContext.broadcast(schema)
    lines.filter(_.nonEmpty).map { line =>
      val forest = Forest.reTokenize(Forest.parseEnamex(line))
      val enc = Iob.encodeForest(forest)
      val obs = Features.schematize(bSchema.value, enc.map(_._1))
      FlatSent(obs.map(_.sites), obs.map(_.values),
        enc.map(p => Iob.renderLabel(p._2)).toArray)
    }
  }

  private def toTrainSents(flat: Array[FlatSent]): Seq[Sgd.TrainSent] =
    flat.toSeq.map { f =>
      Sgd.TrainSent(
        f.sites.zip(f.values).map { case (s, v) => new Features.PosObs(s, v) },
        f.labels)
    }

  /** Driver-collect budget for [[train]]: annotated NER corpora are
    * thousands of sentences by contract (NKJP-scale; the reference
    * trains in one process the same way), so half a million flattened
    * sentences — roughly GBs of features — signals a caller pointing the
    * trainer at a corpus-scale table, which must fail loudly before the
    * collect OOMs the driver (VERDICT r3 #6, same hazard class as
    * `CompactDict.MaxBroadcastEntries`).
    */
  val MaxTrainSentences: Long = 500000L

  /** Train on an ENAMEX corpus Dataset: distributed flatten, driver SGD,
    * model ready to broadcast.
    *
    * Fails fast (cheap distributed count, no rows pulled) when the
    * corpus exceeds `maxSentences` instead of collecting until the
    * driver dies. For genuinely corpus-scale training use
    * [[trainDistributed]] (distributed batch gradient, SURVEY.md §2
    * C8's escape hatch) rather than raising the budget.
    */
  def train(spark: SparkSession, lines: Dataset[String],
            schema: Features.SchemaConf = graft.NerfModel.defaultSchema,
            cfg: Sgd.Config = Sgd.Config(),
            maxSentences: Long = MaxTrainSentences): NerfModel = {
    val n = lines.filter(_.nonEmpty).count()
    require(n <= maxSentences,
      s"training corpus has $n sentences, above the driver-collect budget " +
        s"of $maxSentences (Train.MaxTrainSentences) — driver SGD mirrors " +
        "the reference's single-process trainer and collects the encoded " +
        "corpus; for corpus-scale training use Train.trainDistributed " +
        "(distributed batch gradient, SURVEY.md §2 C8) instead of raising " +
        "the budget")
    val flat = flatten(spark, lines, schema).collect()
    NerfModel(schema, Sgd.train(toTrainSents(flat), cfg))
  }

  /** A fully id-encoded sentence — the distributed trainer's cached unit
    * of work (all strings resolved through the frozen codec, so epoch
    * scans shuffle/cache only ints).
    */
  final case class EncSent(obs: Array[Array[Int]], labels: Array[Int])

  /** The frozen feature codec of one distributed training run: label
    * ids, per-site observation ids, and the present-feature kernel.
    * Model-sized by construction (it IS the model's shape), so it
    * broadcasts; corpus size never enters.
    */
  final case class Codec(labels: Array[String],
                         obsIds: Array[Map[String, Int]],
                         kernel: Sgd.Kernel) extends Serializable

  /** Build the feature codec with distributed distincts — the
    * corpus-scale replacement for the driver pass in [[Sgd.train]].
    * Three aggregate jobs over `flat` (labels, (site, value) pairs,
    * present feature keys); each collect is bounded by VOCABULARY
    * (= model size, which must fit on the driver anyway to hold the
    * weight vector), not by corpus size. Id assignment is sorted, so
    * the codec is deterministic regardless of partitioning.
    */
  def buildCodec(spark: SparkSession, flat: Dataset[FlatSent]): Codec = {
    import spark.implicits._
    val labels = flat.flatMap(_.labels).distinct().collect().sorted
    require(labels.nonEmpty, "no labeled tokens in the training data — " +
      "every sentence is empty; check the input corpus")
    val L = labels.length
    val labelIds = labels.zipWithIndex.toMap
    val sitePairs = flat.flatMap { f =>
      f.sites.indices.iterator.flatMap { k =>
        f.sites(k).iterator.zip(f.values(k).iterator)
      }
    }.distinct().collect().sortBy(p => (p._1, p._2))
    val nSites = sitePairs.iterator.map(_._1).maxOption.getOrElse(-1) + 1
    val obsB = Array.fill(nSites)(Map.newBuilder[String, Int])
    sitePairs.zipWithIndex.foreach { case ((site, value), oid) =>
      obsB(site) += (value -> oid)
    }
    val obsIds = obsB.map(_.result())
    val O = sitePairs.length
    // present features (Nerf.hs:90 presentFeats), one distinct over
    // tagged keys: kind 0 = initial label, 1 = transition prev*L+cur,
    // 2 = (obs id)*L + label
    val bLabelIds = spark.sparkContext.broadcast(labelIds)
    val bObsIds = spark.sparkContext.broadcast(obsIds)
    val featKeys = flat.flatMap { f =>
      val lbs = f.labels.map(bLabelIds.value)
      val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Long)]
      if (lbs.nonEmpty) {
        out += ((0, lbs(0).toLong))
        var k = 1
        while (k < lbs.length) {
          out += ((1, (lbs(k - 1) * L + lbs(k)).toLong)); k += 1
        }
        k = 0
        while (k < lbs.length) {
          val sites = f.sites(k); val values = f.values(k)
          var j = 0
          while (j < sites.length) {
            val oid = bObsIds.value(sites(j))(values(j))
            out += ((2, oid.toLong * L + lbs(k)))
            j += 1
          }
          k += 1
        }
      }
      out
    }.distinct().collect()
    val singPresent = new Array[Boolean](L)
    val transPresent = new Array[Boolean](L * L)
    featKeys.foreach {
      case (0, y) => singPresent(y.toInt) = true
      case (1, idx) => transPresent(idx.toInt) = true
      case _ => ()
    }
    val obsKeys = featKeys.collect { case (2, key) => key }.sorted
    val transBase = L
    val obsFeatIds = scala.collection.mutable.HashMap.empty[Long, Int]
    var nextId = transBase + L * L
    obsKeys.foreach { key => obsFeatIds(key) = nextId; nextId += 1 }
    val F = nextId
    // per-obs present labels + feature ids, same projection as Sgd.train
    val obsLabelsB = Array.fill(O)(
      scala.collection.mutable.ArrayBuffer.empty[(Int, Int)])
    obsFeatIds.foreach { case (key, fid) =>
      obsLabelsB((key / L).toInt) += (((key % L).toInt, fid))
    }
    val obsSorted = obsLabelsB.map(_.sortBy(_._1))
    Codec(labels, obsIds,
      new Sgd.Kernel(L, singPresent, transPresent, obsFeatIds,
        obsSorted.map(_.map(_._1).toArray),
        obsSorted.map(_.map(_._2).toArray), F))
  }

  /** Encode flattened sentences through a broadcast codec — all-int
    * sentences, the distributed trainer's cache unit.
    */
  def encode(spark: SparkSession, flat: Dataset[FlatSent],
             codec: Codec): Dataset[EncSent] = {
    import spark.implicits._
    val bCodec = spark.sparkContext.broadcast(codec)
    flat.mapPartitions { it =>
      val c = bCodec.value
      val labelIds = c.labels.zipWithIndex.toMap
      it.map { f =>
        val obs = f.sites.indices.toArray.map { k =>
          val sites = f.sites(k); val values = f.values(k)
          val a = new Array[Int](sites.length)
          var j = 0
          while (j < sites.length) { a(j) = c.obsIds(sites(j))(values(j)); j += 1 }
          java.util.Arrays.sort(a)
          a
        }
        EncSent(obs, f.labels.map(labelIds))
      }
    }
  }

  /** One full-batch gradient (observed − expected counts, summed over
    * every sentence) under broadcast weights: `mapPartitions`-style
    * accumulation into a dense per-partition array, `treeAggregate`d to
    * the driver. Exposed for the parity gate in SgdSpec — this must
    * equal a sequential fold of [[Sgd.Kernel.accumulate]] over the same
    * sentences (up to summation-order float tolerance).
    */
  private[graft] def distributedGradient(spark: SparkSession,
                                         enc: Dataset[EncSent],
                                         kernel: Sgd.Kernel,
                                         w: Array[Double]): Array[Double] = {
    val bKernel = spark.sparkContext.broadcast(kernel)
    val bw = spark.sparkContext.broadcast(w)
    val F = kernel.F
    try {
      enc.rdd.treeAggregate(new Array[Double](F))(
        seqOp = (acc, s) => {
          bKernel.value.accumulate(s.obs, s.labels, bw.value,
            (fid, v) => acc(fid) += v)
          acc
        },
        combOp = (a, b) => {
          var i = 0
          while (i < F) { a(i) += b(i); i += 1 }
          a
        },
        depth = 2)
    } finally {
      bw.destroy()
      bKernel.destroy()
    }
  }

  /** Corpus-scale CRF training: distributed BATCH gradient descent —
    * the SURVEY §2.4 C8 scale path that [[train]]'s driver-collect
    * budget points at. Per epoch: broadcast the weights, sum each
    * sentence's observed−expected counts (the SAME [[Sgd.Kernel]] the
    * local loop runs) across the cluster via `treeAggregate`, apply one
    * driver-side step under the unchanged gain schedule. An epoch is
    * one batch of size n, so the decay that the local loop applies as
    * `(1 − gain·b/(regVar·n))` per size-b batch collapses to
    * `1 − gain/regVar` — first-order identical regularization per
    * epoch.
    *
    * Determinism: full-batch gradients are order-free up to float
    * summation, so no seeded shuffle is needed; the codec is sorted.
    * The optimizer trajectory deliberately differs from [[train]]'s
    * minibatch SGD (one step per epoch instead of n/b), so models are
    * not bit-comparable across the two trainers — the golden decodings
    * pin the LOCAL path, and SgdSpec pins this path's gradient to the
    * same kernel.
    *
    * Scale shape: epoch cost is one scan of the cached all-int encoded
    * corpus + a model-sized treeAggregate; nothing corpus-sized ever
    * reaches the driver. 500k sentences — where [[train]] fails fast —
    * is a smoke test here, not a ceiling.
    */
  def trainDistributed(spark: SparkSession, lines: Dataset[String],
                       schema: Features.SchemaConf = graft.NerfModel.defaultSchema,
                       cfg: Sgd.Config = Sgd.Config(),
                       log: String => Unit = _ => ()): NerfModel = {
    import org.apache.spark.storage.StorageLevel
    val flat = flatten(spark, lines, schema)
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val codec = buildCodec(spark, flat)
      val kernel = codec.kernel
      val enc = encode(spark, flat, codec).persist(StorageLevel.MEMORY_AND_DISK)
      try {
        val n = enc.count()
        log(s"[sgd-dist] labels=${codec.labels.length} " +
          s"features=${kernel.F} sentences=$n")
        flat.unpersist()
        val w = new Array[Double](kernel.F)
        var done = 0.0
        for (epoch <- 1 to cfg.iterNum) {
          val grad = distributedGradient(spark, enc, kernel, w)
          val gain = cfg.gain0 * cfg.tau / (cfg.tau + done)
          val decay = 1.0 - gain / cfg.regVar
          if (decay < 1.0) {
            var i = 0
            while (i < kernel.F) { w(i) *= decay; i += 1 }
          }
          // full-batch step NORMALIZED per sentence: the summed gradient
          // grows linearly with n, so an unnormalized `w += gain·grad`
          // would take corpus-sized steps and diverge on the first epoch;
          // gain·grad·(batchSize/n) keeps the step the size of one local
          // minibatch update, just pointed along the full-batch direction
          val step = gain * cfg.batchSize / n
          var i = 0
          while (i < kernel.F) { w(i) += step * grad(i); i += 1 }
          done += 1.0
          log(f"[sgd-dist] epoch $epoch%2d done; gain=$gain%.4f")
        }
        NerfModel(schema, Sgd.modelFrom(codec.labels, codec.obsIds, kernel, w))
      } finally enc.unpersist()
    } finally flat.unpersist()
  }

  /** Leave-one-part-out cross-validation
    * (/root/reference/app/Main.hs:251-271): fold-stamp the corpus, train
    * on the complement, evaluate mention-level P/R on the fold.
    * Returns per-fold `<all>` stats. When `modelDir` is set, each fold's
    * model is persisted as `fold-<i>.json` (the reference saves a model
    * per fold the same way, app/Main.hs:262-266).
    */
  def crossValidate(spark: SparkSession, lines: Dataset[String], k: Int,
                    schema: Features.SchemaConf = graft.NerfModel.defaultSchema,
                    cfg: Sgd.Config = Sgd.Config(),
                    modelDir: Option[String] = None)
      : Seq[(Int, CompareStats.Stats)] = {
    import spark.implicits._
    val stamped = lines.filter(_.nonEmpty).rdd.zipWithIndex()
      .map { case (l, i) => (l, (i % k).toInt) }.toDS()
      .toDF("line", "fold").cache()
    (0 until k).map { fold =>
      val trainLines = stamped.where($"fold" =!= fold).select("line").as[String]
      val evalLines = stamped.where($"fold" === fold).select("line").as[String]
      val model = train(spark, trainLines, schema, cfg)
      modelDir.foreach { d =>
        graft.NerfModel.save(model, java.nio.file.Paths.get(d, s"fold-$fold.json"))
      }
      val bModel = spark.sparkContext.broadcast(model)
      // distributed eval: decode each held-out sentence, compare spans
      val stats = evalLines.map { line =>
        val gold = Forest.reTokenize(Forest.parseEnamex(line))
        val text = gold.flatMap(_.leaves).mkString(" ")
        val pred = bModel.value.ner(text)
        val g = Forest.charSpans(gold)
        val p = Forest.charSpans(pred)
        (g.intersect(p).size.toLong, p.diff(g).size.toLong, g.diff(p).size.toLong)
      }.reduce((a, b) => (a._1 + b._1, a._2 + b._2, a._3 + b._3))
      fold -> CompareStats.Stats(stats._1, stats._2, stats._3)
    }
  }

  /** Distributed Compare (A4–A6): sentence-aligned (reference, compared)
    * ENAMEX pairs -> per-type TP/FP/FN + `<all>`, as one aggregation.
    */
  def compareJob(spark: SparkSession,
                 pairs: Dataset[(String, String)]): Map[String, CompareStats.Stats] = {
    import spark.implicits._
    val perType = pairs.flatMap { case (refL, cmpL) =>
      // the matching rule lives ONCE, in CompareStats.pairStats
      CompareStats.pairStats(
        Forest.charSpans(Forest.parseEnamex(refL)),
        Forest.charSpans(Forest.parseEnamex(cmpL)))
        .map { case (k, s) => (k, s.tp, s.fp, s.fn) }
    }.groupByKey(_._1)
      .mapValues(t => (t._2, t._3, t._4))
      .reduceGroups((a, b) => (a._1 + b._1, a._2 + b._2, a._3 + b._3))
      .collect()
      .map { case (k, (tp, fp, fn)) => k -> CompareStats.Stats(tp, fp, fn) }
      .toMap
    val total = perType.values.foldLeft(CompareStats.Stats(0, 0, 0))(_ + _)
    perType + (CompareStats.AllKey -> total)
  }
}
