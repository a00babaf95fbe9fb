package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing — the pretraining chunking step: documents are
  * (conceptually) concatenated in id order into one token stream and cut
  * into fixed-size context windows; each document is assigned the
  * chunk(s) it lands in. This is the concatenate-and-chunk packing real
  * LLM pretraining uses (documents may straddle a window boundary), so
  * the assignment is a CLOSED FORM of the global token prefix-sum:
  * a doc occupying stream offsets `[start, end]` spans chunks
  * `start div C .. end div C`.
  *
  * Scale shape — the whole operator is "compute a global running sum
  * without a global window". The naive rendition
  * (`Window.orderBy(id)` with no partition key) plans a SINGLE-TASK
  * window over the entire corpus: one executor sorts and scans 100 TB.
  * Instead the prefix-sum runs as a bucketed two-pass:
  *
  *   1. two TINY aggregate jobs over the pruned (id, n_toks) columns:
  *      id min/max to size deterministic id-range buckets, then
  *      per-bucket token sums (partial-agg collapses each task to
  *      ≤ nBuckets rows before the exchange — driver state is
  *      O(nBuckets) longs, never corpus rows);
  *   2. the driver scan-left's bucket prefix offsets (a literal map in
  *      the plan), and ONE corpus-sized hash exchange runs the running
  *      sum as `Window.partitionBy(bucket).orderBy(id)` — every bucket
  *      is an independent task, plus its broadcast prefix offset.
  *
  * Buckets derive from the ID VALUES (`(id - minId) div width`), not
  * `spark_partition_id()` or a range-sampled shuffle, so the bucketing
  * is deterministic from the data alone — no persist-to-freeze-sampling
  * step, no recompute hazard, bit-identical output on every run.
  * Sparse/skewed id ranges only unbalance bucket SIZES (parallelism),
  * never correctness; `buckets` defaults to 4x shuffle partitions so
  * moderate density skew still spreads across the cluster.
  *
  * Contract: `idCol` must be unique per row (ties inside a bucket would
  * make the running sum order-dependent); `nToksCol` is coalesced to 0
  * and zero-token docs are dropped from the output (they occupy no
  * stream positions). Offsets are stable under APPEND-ONLY growth:
  * adding docs with larger ids never moves existing chunks.
  */
object Pack {

  /** Per-document chunk assignments for fixed `chunkTokens` windows.
    *
    * Output: one row per (doc, chunk) the doc overlaps —
    * `(doc_id, chunk_id, tok_start, tok_end)` with tok offsets GLOBAL
    * stream positions (`tok_start = max(docStart, chunk start)`,
    * `tok_end = min(docEnd, chunk end)`, inclusive), so
    * `tok_end - tok_start + 1` is the doc's token count inside that
    * chunk and chunk occupancy sums reconstruct exactly.
    */
  def packChunks(docs: DataFrame, idCol: String, nToksCol: String,
                 chunkTokens: Long, buckets: Int = 0): DataFrame = {
    require(chunkTokens >= 1, s"chunkTokens must be >= 1: $chunkTokens")
    val spark = docs.sparkSession
    val nBuckets =
      if (buckets > 0) buckets
      else spark.sessionState.conf.numShufflePartitions * 4
    val base = docs.select(col(idCol).cast("long").as("doc_id"),
      coalesce(col(nToksCol).cast("long"), lit(0L)).as("n_toks"))

    // pass 1a: id range (column-pruned scan, 1-row result)
    val head = base.agg(min("doc_id"), max("doc_id")).head()
    require(!head.isNullAt(0), "packChunks: empty input")
    val minId = head.getLong(0)
    val maxId = head.getLong(1)
    val width = math.max(1L, (maxId - minId) / nBuckets + 1)
    // DIV (not `/`) keeps the arithmetic in exact 64-bit integers —
    // a double division would lose ulps above 2^53 and misplace ids
    // near bucket borders
    val bucketOf: Column =
      expr(s"CAST((doc_id - ${minId}L) DIV ${width}L AS BIGINT)")

    // pass 1b: per-bucket token sums -> driver scan-left prefix offsets.
    // Result size is #OBSERVED buckets (<= nBuckets), independent of
    // corpus rows; partial aggregation collapses before the exchange.
    val bucketSums = base
      .groupBy(bucketOf.as("bucket"))
      .agg(sum("n_toks").as("s"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(_._1)
    var acc = 0L
    val prefix: Map[Long, Long] = bucketSums.map { case (b, s) =>
      val p = (b, acc); acc += s; p
    }.toMap

    // pass 2: per-bucket running sum + broadcast prefix = global cumsum
    val w = Window.partitionBy("bucket").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    base
      .withColumn("bucket", bucketOf)
      .withColumn("cum",
        sum("n_toks").over(w) + element_at(typedLit(prefix), col("bucket")))
      .where(col("n_toks") > 0)
      .withColumn("start_off", col("cum") - col("n_toks"))
      .withColumn("chunk_id", explode(sequence(
        expr(s"start_off DIV $chunkTokens"),
        expr(s"(cum - 1) DIV $chunkTokens"))))
      .select(col("doc_id"), col("chunk_id"),
        greatest(col("start_off"), col("chunk_id") * chunkTokens)
          .as("tok_start"),
        least(col("cum") - 1, (col("chunk_id") + 1) * chunkTokens - 1)
          .as("tok_end"))
  }
}
