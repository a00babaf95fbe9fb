package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental (delta) near-duplicate detection against a PERSISTED
  * MinHash index — the shape a production crawl actually runs: the
  * historical corpus was deduplicated once, its signatures were saved,
  * and every new batch is checked against history WITHOUT recomputing
  * anything over the old documents. Batch [[TextDedup.minhashPairs]]
  * covers one-shot dedup; [[graft.streaming.StreamingNer.nearDupStream]]
  * covers ingest-time suppression with bounded TTL state; this covers
  * the third regime — unbounded history, incremental batches.
  *
  * The index under `dir`:
  *   - `bands/`    (doc_id, band, bk) — the banded MinHash signatures,
  *                 the candidate-generation side,
  *   - `shingles/` (doc_id, gh)       — the distinct xxhash64 shingle
  *                 hashes, the EXACT-verify side (~one long per corpus
  *                 token: the price of exact delta verification; an
  *                 LSH-only index would be smaller but its decisions
  *                 approximate),
  *   - `sizes/`    (doc_id, sz)       — distinct-shingle counts (the
  *                 Jaccard denominator),
  *   - `_minhash_meta.json` — k / numHashes / bands, written LAST
  *                 (atomic rename; dropped FIRST on re-save) so a
  *                 half-written index is unloadable, and so the PROBE
  *                 side can never band with different parameters than
  *                 the index (a silent parameter drift would zero the
  *                 candidate recall, not error).
  *
  * Scale shape of [[nearDupsAgainstIndex]]: the new batch pays its own
  * shingle + signature pass (it must — the docs are new); the index
  * side is READ, never recomputed. The candidate join keys on
  * (band, bk) — 12 bytes a row on both sides; the verify join touches
  * only candidate old-doc shingle rows. All shuffles carry 8-byte
  * hashes (the q52 convention), never text.
  */
object DeltaDedup {

  private def metaPath(dir: String) = s"$dir/_minhash_meta.json"

  /** Build and persist the index of a (deduplicated) corpus. */
  def saveMinhashIndex(docs: DataFrame, idCol: String, textCol: String,
                       dir: String, k: Int = 3, numHashes: Int = 16,
                       bands: Int = 4): Unit = {
    require(numHashes >= 1 && numHashes % bands == 0,
      s"numHashes ($numHashes) must be >= 1 and divide into bands ($bands)")
    val spark = docs.sparkSession
    val conf = spark.sessionState.newHadoopConf()
    // drop the old meta BEFORE rewriting tables: a crash mid-rewrite
    // leaves an unloadable directory, never old-meta-over-new-tables
    val meta = new org.apache.hadoop.fs.Path(metaPath(dir))
    val fs = meta.getFileSystem(conf)
    if (fs.exists(meta)) fs.delete(meta, false)
    val toks = TextDedup.shingleHashes(docs, idCol, textCol, k)
    toks.write.mode("overwrite").parquet(s"$dir/shingles")
    // derive sizes and bands from the WRITTEN shingles, not the live
    // plan — one shingle computation, and the three tables cannot
    // disagree about a doc
    val written = spark.read.parquet(s"$dir/shingles")
    written.groupBy("doc_id").agg(count(lit(1)).as("sz"))
      .write.mode("overwrite").parquet(s"$dir/sizes")
    TextDedup.minhashBands(written, numHashes, bands)
      .write.mode("overwrite").parquet(s"$dir/bands")
    graft.io.TableIO.atomicWrite(metaPath(dir),
      s"""{"format":"graft-minhash-index","version":1,"k":$k,""" +
        s""""num_hashes":$numHashes,"bands":$bands}""", conf)
  }

  private[pipeline] def readMeta(spark: SparkSession,
                                 dir: String): (Int, Int, Int) = {
    val conf = spark.sessionState.newHadoopConf()
    val p = new org.apache.hadoop.fs.Path(metaPath(dir))
    val fs = p.getFileSystem(conf)
    require(fs.exists(p),
      s"$dir is not a graft MinHash index (no _minhash_meta.json — " +
        "half-written save or wrong path)")
    val in = fs.open(p)
    val json = try new String(in.readAllBytes(),
      java.nio.charset.StandardCharsets.UTF_8) finally in.close()
    require(json.contains("\"format\":\"graft-minhash-index\""),
      s"${metaPath(dir)} is not a graft MinHash index meta file")
    def field(name: String): Int =
      (s""""$name":(\\d+)""").r.findFirstMatchIn(json)
        .map(_.group(1).toInt)
        .getOrElse(throw new IllegalArgumentException(
          s"${metaPath(dir)}: $name missing"))
    (field("k"), field("num_hashes"), field("bands"))
  }

  /** New-batch docs near-duplicating an indexed old doc:
    * `(new_id, old_id, shared, jaccard)` at exact shingle-Jaccard ≥
    * `minJaccard`, candidates from the banded index join, verification
    * exact. Banding parameters come FROM THE INDEX META — the caller
    * cannot drift them.
    */
  def nearDupsAgainstIndex(newDocs: DataFrame, idCol: String,
                           textCol: String, dir: String,
                           minJaccard: Double = 0.5): DataFrame = {
    require(minJaccard > 0.0 && minJaccard <= 1.0,
      s"minJaccard must be in (0, 1]: $minJaccard")
    val spark = newDocs.sparkSession
    val (k, numHashes, bands) = readMeta(spark, dir)
    val oldBands = spark.read.parquet(s"$dir/bands")
    val oldToks = spark.read.parquet(s"$dir/shingles")
    val oldSizes = spark.read.parquet(s"$dir/sizes")
    // the delta's shingle pass (split + k-gram explode + distinct — the
    // dominant text cost) feeds three consumers: banding, the verify
    // join, and the sz_new denominators. Persist it and pin the (delta-
    // bounded) result so it runs ONCE, not three times per call.
    val newToks = TextDedup.shingleHashes(newDocs, idCol, textCol, k)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val newBanded = TextDedup.minhashBands(newToks, numHashes, bands)
    val cand = newBanded
      .select(col("doc_id").as("new_id"), col("band"), col("bk"))
      .join(oldBands.select(col("doc_id").as("old_id"), col("band"),
        col("bk")), Seq("band", "bk"))
      .select("new_id", "old_id").distinct()
    val shared = cand
      .join(newToks.select(col("doc_id").as("new_id"), col("gh")), "new_id")
      .join(oldToks.select(col("doc_id").as("old_id"), col("gh")),
        Seq("old_id", "gh"))
      .groupBy("new_id", "old_id").agg(count(lit(1)).as("shared"))
    val out = shared
      .join(newToks.groupBy("doc_id").agg(count(lit(1)).as("sz_new"))
        .withColumnRenamed("doc_id", "new_id"), "new_id")
      .join(oldSizes.select(col("doc_id").as("old_id"),
        col("sz").as("sz_old")), "old_id")
      .withColumn("jaccard", round(col("shared").cast("double") /
        (col("sz_new") + col("sz_old") - col("shared")), 6))
      .where(col("shared").cast("double") >= lit(minJaccard) *
        (col("sz_new") + col("sz_old") - col("shared")))
      .select(col("new_id"), col("old_id"), col("shared"), col("jaccard"))
    // eager by design: the decision pairs are delta-bounded (tiny), and
    // pinning them is what lets the shingle cache be released before
    // returning — a lazy return would either leak the cache or silently
    // recompute the pass per downstream action
    val pinned = Lineage.chk(out)
    newToks.unpersist()
    pinned
  }

  /** Append a (deduplicated) new batch's rows to the index so the NEXT
    * delta sees them — the maintenance half of the incremental story.
    * Parameters come from the meta, so an appended batch can never be
    * banded differently from the resident corpus. Caller contract:
    * `newDocs` ids are disjoint from the indexed ids (append, not
    * upsert — the same contract as `TableIO.writeResumable`'s caller).
    *
    * Crash safety = the save's meta-drop-first convention: the meta is
    * deleted before the first append and restored after the last, so an
    * interrupted append leaves an UNLOADABLE index (rebuild via
    * [[saveMinhashIndex]]) — never three tables that silently disagree
    * about a doc (shingle rows without band rows would make the doc
    * invisible to candidate generation while still inflating Jaccard
    * denominators, and a blind retry would double-append).
    */
  def appendToIndex(newDocs: DataFrame, idCol: String, textCol: String,
                    dir: String): Unit = {
    val spark = newDocs.sparkSession
    val (k, numHashes, bands) = readMeta(spark, dir)
    val conf = spark.sessionState.newHadoopConf()
    val meta = new org.apache.hadoop.fs.Path(metaPath(dir))
    meta.getFileSystem(conf).delete(meta, false)
    val toks = TextDedup.shingleHashes(newDocs, idCol, textCol, k)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      toks.write.mode("append").parquet(s"$dir/shingles")
      toks.groupBy("doc_id").agg(count(lit(1)).as("sz"))
        .write.mode("append").parquet(s"$dir/sizes")
      TextDedup.minhashBands(toks, numHashes, bands)
        .write.mode("append").parquet(s"$dir/bands")
      // all three landed — the index is consistent again
      graft.io.TableIO.atomicWrite(metaPath(dir),
        s"""{"format":"graft-minhash-index","version":1,"k":$k,""" +
          s""""num_hashes":$numHashes,"bands":$bands}""", conf)
    } finally toks.unpersist(blocking = false)
  }
}
