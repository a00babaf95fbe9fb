package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
  * "Data Selection for Language Models via Importance Resampling"):
  * select raw-corpus documents that look like a small TARGET corpus
  * (the curated/high-quality distribution) by importance weighting in
  * a hashed n-gram feature space. Per the paper: featurize each doc as
  * hashed unigram+bigram counts, fit two bag-of-words categorical
  * distributions — `p` on the target corpus, `q` on the raw corpus —
  * and weight each raw doc by `log w = Σ_grams (log p_b − log q_b)`,
  * then resample by weight (Gumbel-top-k) to the training budget. The
  * model-free complement to a trained quality classifier: no labels,
  * just "more like THIS corpus".
  *
  * Feature hashing is the first 2 hex chars of `md5(gram)` — 256
  * buckets keyed by a string BOTH engines derive identically (the q65
  * md5 convention), so the whole weight computation is cross-engine
  * oracleable (q74). The paper uses 10k buckets; the bucket count only
  * trades estimator variance, not the operator's shape, and 256 keeps
  * the oracle's join exact while the smoothed estimator stays sound.
  *
  * Scale shape:
  *  - Fitting `p`/`q` ([[logRatios]]) is one pass per corpus that
  *    collapses to ≤ 256 rows at a partial agg — the shuffle carries
  *    (2-char bucket, long) pairs, never text. The target corpus is
  *    curated-sample-sized by construction (it is the thing humans
  *    vetted); the raw pass is the only corpus-wide scan.
  *  - Scoring ([[importanceWeights]]) is ZERO-shuffle: the 256-slot
  *    log-ratio table rides into the plan as ONE array literal and
  *    each doc's weight is a per-row `aggregate` fold over its grams
  *    (md5 → bucket index → array lookup, all codegen'd collection
  *    expressions, no UDF) fused into the scan stage. Scoring 100 TB
  *    is one pass that writes (doc_id, log_w).
  *  - Resampling ([[resampleGumbel]]) adds deterministic Gumbel noise
  *    derived from `md5(id:seed)` (no RNG state — stable under
  *    retries/resume, the `Sampling.stratifiedHashSample` convention)
  *    and takes the top k via TakeOrdered: k rows per partition, k at
  *    the driver, no global sort.
  *
  * NULL texts have no grams and are dropped (the q13/q68 convention);
  * a non-NULL text always has ≥ 1 unigram, so only NULLs drop.
  */
object Dsir {

  /** Hash-feature bucket count: 2 hex chars of md5. Fixed — the bucket
    * id doubles as the cross-engine join key, and the scoring literal
    * is sized by it.
    */
  val NumBuckets: Int = 256

  /** Unigram + bigram features of a space-tokenized text (the paper's
    * featurization), as one array column; empty for NULL.
    */
  def grams(text: Column): Column =
    concat(Decontam.shingles(text, 1), Decontam.shingles(text, 2))

  private def bucketOf(gram: Column): Column = substring(md5(gram), 1, 2)

  /** Per-bucket gram counts of one corpus: `(bucket, cnt)`, present
    * buckets only — one scan collapsing at a partial agg to ≤ 256 rows.
    */
  def bucketCounts(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(grams(col(textCol))).as("gram"))
      .groupBy(bucketOf(col("gram")).as("bucket"))
      .agg(count(lit(1)).as("cnt"))

  /** The fitted importance model: all 256 buckets with their target /
    * raw counts and the Laplace-smoothed log-likelihood ratio
    * `lr = ln((t_cnt+1)/(t_tot+256)) − ln((r_cnt+1)/(r_tot+256))`.
    * Add-one smoothing keeps every bucket finite, so unseen grams in
    * scored docs are defined (they score the prior ratio). The bucket
    * domain is generated, not observed — buckets absent from both
    * corpora still get a row, because scoring may meet them.
    */
  def logRatios(target: DataFrame, raw: DataFrame,
                textCol: String): DataFrame = {
    val spark = target.sparkSession
    val domain = spark.range(NumBuckets)
      .select(lpad(lower(hex(col("id"))), 2, "0").as("bucket"))
    val tc = bucketCounts(target, textCol).withColumnRenamed("cnt", "t_cnt")
    val rc = bucketCounts(raw, textCol).withColumnRenamed("cnt", "r_cnt")
    val joined = domain
      .join(broadcast(tc), Seq("bucket"), "left")
      .join(broadcast(rc), Seq("bucket"), "left")
      .select(col("bucket"),
        coalesce(col("t_cnt"), lit(0L)).as("t_cnt"),
        coalesce(col("r_cnt"), lit(0L)).as("r_cnt"))
    val tots = joined.agg(sum("t_cnt").as("t_tot"), sum("r_cnt").as("r_tot"))
    joined.crossJoin(broadcast(tots))
      .select(col("bucket"), col("t_cnt"), col("r_cnt"),
        (log((col("t_cnt") + lit(1L)).cast("double")
            / (col("t_tot") + lit(NumBuckets.toLong)))
          - log((col("r_cnt") + lit(1L)).cast("double")
            / (col("r_tot") + lit(NumBuckets.toLong)))).as("lr"))
  }

  /** Collect a [[logRatios]] frame to the 256-slot lookup array
    * (index = bucket hex value). Bounded by construction; the require
    * catches a caller passing something that is not a ratio table.
    */
  private[pipeline] def ratioArray(ratios: DataFrame): Array[Double] = {
    val rows = ratios.select("bucket", "lr").collect()
    require(rows.length == NumBuckets,
      s"expected a $NumBuckets-row logRatios table, got ${rows.length} rows")
    val arr = new Array[Double](NumBuckets)
    rows.foreach { r =>
      arr(Integer.parseInt(r.getString(0), 16)) = r.getDouble(1)
    }
    arr
  }

  /** The unrounded per-doc log importance weight — a per-row fold over
    * the doc's grams against the 256-slot literal `arr`, fused into the
    * scan stage (zero shuffles).
    */
  private def weightExpr(text: Column, arr: Column): Column =
    aggregate(grams(text), lit(0.0), (acc, g) =>
      acc + element_at(arr,
        conv(substring(md5(g), 1, 2), 16, 10).cast("int") + 1))

  /** Per-document log importance weights under a fitted [[logRatios]]
    * model: `(doc_id, n_grams, log_w)`, log_w rounded to 6 digits (the
    * q64 convention — the sum is float, both engines agree except
    * within ~1e-9 of a rounding boundary). Zero-shuffle: one scan-side
    * fold per row.
    */
  def importanceWeights(docs: DataFrame, idCol: String, textCol: String,
                        ratios: DataFrame): DataFrame = {
    val arr = typedLit(ratioArray(ratios))
    val gs = grams(col(textCol))
    docs
      .select(col(idCol).as("doc_id"),
        size(gs).cast("long").as("n_grams"),
        weightExpr(col(textCol), arr).as("w"))
      .where(col("n_grams") > 0)
      .select(col("doc_id"), col("n_grams"), round(col("w"), 6).as("log_w"))
  }

  /** Gumbel-top-k importance resampling (the paper's sampling-without-
    * replacement rule): keep the k docs maximizing `log_w + g_i` where
    * `g_i = −ln(−ln u_i)` is Gumbel noise derived DETERMINISTICALLY
    * from `md5(id:seed)` — `u_i = (hash32 + 0.5) / 2^32 ∈ (0,1)`, so
    * the sample is a pure function of (corpus, ratios, seed): stable
    * under retries, resumable writes, and re-runs (the q65 sampler's
    * contract), and seed rotation redraws the noise. Returns
    * `(doc_id, n_grams, log_w, key)` with key = the noised score,
    * both rounded; ordering and the k-boundary are decided on the
    * UNROUNDED key with doc_id tie-break. TakeOrdered — no global sort.
    */
  def resampleGumbel(docs: DataFrame, idCol: String, textCol: String,
                     ratios: DataFrame, k: Int, seed: Long): DataFrame = {
    require(k >= 1, s"resample budget must be >= 1: $k")
    val arr = typedLit(ratioArray(ratios))
    val gs = grams(col(textCol))
    val u = (conv(substring(md5(concat(col(idCol).cast("string"), lit(":"),
      lit(seed.toString))), 1, 8), 16, 10).cast("double") + lit(0.5)) /
      lit(4294967296.0)
    val gumbel = -log(-log(u))
    docs
      .select(col(idCol).as("doc_id"),
        size(gs).cast("long").as("n_grams"),
        weightExpr(col(textCol), arr).as("w"),
        gumbel.as("g"))
      .where(col("n_grams") > 0)
      .withColumn("k0", col("w") + col("g"))
      .orderBy(col("k0").desc, col("doc_id").asc)
      .limit(k)
      .select(col("doc_id"), col("n_grams"),
        round(col("w"), 6).as("log_w"), round(col("k0"), 6).as("key"))
  }
}
