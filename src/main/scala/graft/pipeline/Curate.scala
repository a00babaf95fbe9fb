package graft.pipeline

import graft.io.TableIO
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The end-to-end curation recipe a 100-TB training-data pipeline runs
  * FIRST, composed from the library's own operators (each individually
  * oracled or gated on its own):
  *
  *   1. exact dedup          — content-hash groupBy, keep the min-id
  *                             exemplar per identical text (q16's shape)
  *   2. boilerplate drop     — substring-level dedup at document
  *                             granularity: drop docs whose share of
  *                             duplicated 20-token spans exceeds a
  *                             threshold ([[TextDedup.boilerplateShare]],
  *                             the doc-level action of q51/q52)
  *   3. MinHash near-dup     — banded MinHash-LSH pairs at Jaccard ≥ 0.5
  *                             ([[TextDedup.minhashPairs]], q44), greedy
  *                             exemplar-keep (drop the max-id side)
  *   4. embedding near-dup   — sign-LSH cosine pairs over the embedding
  *                             column ([[Ann.lshCosinePairs]], q53),
  *                             same greedy policy
  *   5. hot-key detection    — CMS heavy hitters over the write key
  *                             ([[Sketches.heavyHitters]], q54), sizing
  *                             the salt fan-out of the final write
  *   6. salted resumable write — [[TableIO.writeResumable]] (q28's
  *                             salting + the manifest/resume contract)
  *
  * Greedy exemplar-keep (steps 3–4) drops every document that is the
  * LARGER id of any near-dup pair. On a chain a–b, b–c this also drops
  * c even though (a, c) may not be near-dups — deliberately the
  * conservative direction for training data: it can only remove extra
  * near-boilerplate, never let a duplicate through, and it needs no
  * connected-components pass over the pair graph. Mass-duplicate
  * CLUSTERS never reach pair enumeration at all: identical texts
  * collapse in step 1 and degenerate LSH buckets are capped inside the
  * pair operators themselves.
  *
  * Stage boundaries at real scale: each arrow above is where a
  * production run would [[TableIO.writeResumable]] a checkpoint and
  * resume after failure. Within one run, the composition holds a
  * ROLLING persist: each stage's survivor frame is cached until the
  * next stage's count has materialized, then released — so every
  * source scan and dedup shuffle executes once, instead of stage N's
  * count re-running stages 1..N-1 (quadratic full scans at 100 TB).
  * At most two stage frames are pinned at a time (MEMORY_AND_DISK —
  * spills rather than OOMs when executors are tight).
  */
object Curate {

  /** One curation run's accounting: row counts after each stage (the
    * numbers a data-quality report is built from), the detected hot
    * keys (key rendered as string, exact count), the salt fan-out the
    * write used, and the rows the write committed this run.
    */
  final case class Report(nInput: Long, nAfterExact: Long,
                          nAfterBoilerplate: Long, nAfterMinhash: Long,
                          nAfterEmbedding: Long,
                          hotKeys: Seq[(String, Long)], salts: Int,
                          nWritten: Long) {
    def json: String = {
      val hk = hotKeys.map { case (k, n) =>
        s"""{"key":${TableIO.jstr(k)},"n":$n}""" }.mkString("[", ",", "]")
      s"""{"n_input":$nInput,"n_after_exact":$nAfterExact,""" +
        s""""n_after_boilerplate":$nAfterBoilerplate,""" +
        s""""n_after_minhash":$nAfterMinhash,""" +
        s""""n_after_embedding":$nAfterEmbedding,""" +
        s""""hot_keys":$hk,"salts":$salts,"n_written":$nWritten}"""
    }
  }

  /** Run the full recipe over `docs` (and optionally `embeddings`,
    * joined on `docs(idCol) == embeddings(embIdCol)`), writing the
    * surviving rows — every original doc column — as a salted resumable
    * table under `outDir`, bucketed by `hotKeyCol`.
    *
    * @param maxDupSpanShare drop docs whose duplicated-span share is ≥
    *                        this (step 2); 1.0 keeps only docs that are
    *                        PURE boilerplate out
    * @param minCos          embedding near-dup threshold (step 4)
    * @param hotDenom        heavy-hitter share denominator (step 5): a
    *                        key is hot when it holds ≥ 1/hotDenom of
    *                        surviving rows
    */
  def run(spark: SparkSession, docs: DataFrame, idCol: String,
          textCol: String, embeddings: Option[DataFrame],
          embIdCol: String, embCol: String, outDir: String,
          hotKeyCol: String, maxDupSpanShare: Double = 0.8,
          minCos: Double = 0.95, spanN: Int = 20, hotDenom: Long = 16,
          buckets: Int = 16): Report = {
    require(maxDupSpanShare > 0.0 && maxDupSpanShare <= 1.0,
      s"maxDupSpanShare must be in (0, 1]: $maxDupSpanShare")
    val nInput = docs.count()

    // rolling persist (see scaladoc): pin this stage's survivors, force
    // them with the stage count, and only then release the PREVIOUS
    // stage's pin — every downstream consumer (the next stage's filter
    // derivation AND its anti-join left side) reads the cache instead
    // of re-running the chain
    // every frame currently pinned — the outer finally releases
    // whatever is left, so a stage that THROWS (wrong embedding column,
    // a failed count) cannot strand its predecessors' pins for the
    // session's lifetime
    val pinned = scala.collection.mutable.ListBuffer.empty[DataFrame]
    def pinAndCount(df: DataFrame, prev: Option[DataFrame]): Long = {
      if (df.storageLevel == org.apache.spark.storage.StorageLevel.NONE) {
        df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        pinned += df
      }
      val n = df.count()
      // `prev` can BE `df` (no embedding table -> stage 4 is stage 3):
      // releasing it would drop the pin the final consumers rely on
      prev.filter(_ ne df).foreach { p =>
        p.unpersist()
        pinned.filterInPlace(_ ne p)
      }
      n
    }

    try {
    // 1. exact dedup: min-id exemplar per 128-bit content hash (md5 —
    // an 8-byte hash collides at billions of docs; q16's convention).
    // The groupBy ships (hash, id) pairs with map-side combine; the
    // semi join restores the full doc row for exemplars only.
    val keepExact = docs
      .groupBy(md5(col(textCol)).as("h"))
      .agg(min(col(idCol)).as(idCol)).select(idCol)
    val afterExact = docs.join(keepExact, Seq(idCol), "left_semi")
    val nAfterExact = pinAndCount(afterExact, None)

    // 2. boilerplate: doc-level substring-dedup action
    val boiler = TextDedup.boilerplateShare(afterExact, idCol, textCol, spanN)
      .where(col("dup_share") >= maxDupSpanShare)
      .select(col("doc_id").as(idCol))
    val afterBoiler = afterExact.join(boiler, Seq(idCol), "left_anti")
    val nAfterBoiler = pinAndCount(afterBoiler, Some(afterExact))

    // 3. MinHash near-dup pairs -> greedy exemplar-keep
    val mhDrop = TextDedup.minhashPairs(afterBoiler, idCol, textCol)
      .select(col("d2").as(idCol)).distinct()
    val afterMinhash = afterBoiler.join(mhDrop, Seq(idCol), "left_anti")
    val nAfterMinhash = pinAndCount(afterMinhash, Some(afterBoiler))

    // 4. embedding near-dup pairs (when an embedding table exists):
    // restrict vectors to the SURVIVORS first — pairs among already-
    // dropped docs are wasted candidate work
    val afterEmb = embeddings match {
      case Some(emb) =>
        val vecs = emb
          .select(col(embIdCol).as(idCol), col(embCol).as("embedding"))
          .join(afterMinhash.select(idCol), Seq(idCol), "left_semi")
        val drop = Ann.lshCosinePairs(vecs, idCol, "embedding", minCos)
          .select(col("d2").as(idCol)).distinct()
        afterMinhash.join(drop, Seq(idCol), "left_anti")
      case None => afterMinhash
    }
      // final pin serves three consumers: the count, the hot-key scan,
      // and the salted write
      val nAfterEmbedding = pinAndCount(afterEmb, Some(afterMinhash))

      // 5. hot keys over the WRITE key: the detection a salting
      // pipeline runs before choosing its fan-out. The salt count is
      // sized so the hottest key's rows spread over enough tasks that
      // no task holds more than ~1/parallelism of the data.
      val hot = Sketches.heavyHitters(afterEmb, hotKeyCol, hotDenom)
        .collect()
        .map(r => (String.valueOf(r.get(0)), r.getLong(1)))
        .sortBy(-_._2).toSeq
      val par = spark.sparkContext.defaultParallelism
      val maxShare =
        if (hot.isEmpty || nAfterEmbedding == 0) 0.0
        else hot.head._2.toDouble / nAfterEmbedding
      val salts = math.min(64, math.max(8, math.ceil(maxShare * par).toInt))

      // 6. salted resumable write, bucketed by the hot-key column
      val commits = TableIO.writeResumable(afterEmb, outDir, buckets,
        Seq(hotKeyCol), lineage = Map("recipe" -> "curate"), salts = salts)
      Report(nInput, nAfterExact, nAfterBoiler, nAfterMinhash,
        nAfterEmbedding, hot, salts, commits.map(_.rows).sum)
    } finally pinned.foreach(_.unpersist())
  }
}
