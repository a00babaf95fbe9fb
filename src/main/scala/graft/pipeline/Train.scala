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
    * driver dies. For genuinely corpus-scale training, partition the
    * corpus and average per-partition gradients via `mapPartitions`
    * (SURVEY.md §2 C8's escape hatch) rather than raising the budget.
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
        "corpus; for corpus-scale training average per-partition gradients " +
        "via mapPartitions (SURVEY.md §2 C8) instead of raising the budget")
    val flat = flatten(spark, lines, schema).collect()
    NerfModel(schema, Sgd.train(toTrainSents(flat), cfg))
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
