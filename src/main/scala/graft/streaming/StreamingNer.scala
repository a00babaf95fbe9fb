package graft.streaming

import graft.NerfModel
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Structured Streaming rendition of the reference's streaming surface.
  *
  * The reference streams stdin lazily, one stateless NER call per line
  * (/root/reference/app/Main.hs:277-280, SURVEY.md §2.7 T3), and serves
  * request/response over TCP (T1/T2). Neither needs state, so the
  * faithful Spark mapping is a stateless `readStream -> flatMap ->
  * writeStream`; on top of that we add the event-time machinery a
  * training-data pipeline wants (watermark + tumbling-window mention
  * counts), which the reference has no counterpart for.
  */
object StreamingNer {

  /** Stateless streaming NER: a streaming Dataset of raw lines ->
    * streaming mention rows. Works with any streaming source (file
    * dir, socket — the TCP-server equivalent, rate, memory).
    */
  def mentionStream(spark: SparkSession, lines: Dataset[String],
                    model: NerfModel): DataFrame = {
    import spark.implicits._
    val bModel = spark.sparkContext.broadcast(model)
    lines.flatMap { line =>
      val (toks, spans) = bModel.value.mentions(line)
      spans.map { sp =>
        (sp.neType, sp.begin, sp.end, sp.depth,
          toks.slice(sp.begin, sp.end).mkString(" "))
      }
    }.toDF("neType", "begin", "end", "depth", "surface")
  }

  /** Streaming exact deduplication with custom state
    * (`mapGroupsWithState`): documents keyed by content fingerprint;
    * only the FIRST occurrence of each fingerprint is emitted, with a
    * running duplicate count carried in state — the streaming rendition
    * of the batch exact-dedup operator (q16).
    *
    * State growth is the 100-TB hazard: one entry per distinct
    * fingerprint, forever. `stateTtl` bounds it and is a REQUIRED,
    * explicit choice (no default — an accidental unbounded-state
    * deployment is exactly the failure a production brief must rule
    * out, VERDICT r2 #7):
    *  - `Some(ttl)`: a fingerprint unseen for `ttl` is evicted
    *    (`ProcessingTimeTimeout`) and a later re-occurrence is
    *    RE-EMITTED — the standard windowed-dedup trade-off.
    *  - `None`: exact unbounded semantics (and deterministic tests —
    *    the timeout makes the engine self-trigger housekeeping
    *    batches). Only sane for bounded-cardinality inputs.
    * Input: streaming (doc_id long, text string).
    */
  def dedupStream(spark: SparkSession,
                  docs: Dataset[(Long, String)],
                  stateTtl: Option[scala.concurrent.duration.FiniteDuration])
      : Dataset[(Long, String, Long)] = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
    val keyed = docs.map { case (id, text) =>
      (graft.core.Digests.md5Hex(text), id, text)
    }.groupByKey(_._1)
    val timeoutConf = if (stateTtl.isDefined)
      GroupStateTimeout.ProcessingTimeTimeout else GroupStateTimeout.NoTimeout
    val ttlMs = stateTtl.map(_.toMillis)
    keyed.mapGroupsWithState(timeoutConf) {
      (fp: String, rows: Iterator[(String, Long, String)],
       state: GroupState[Long]) =>
        if (state.hasTimedOut) {
          state.remove() // evict idle fingerprint; no output row
          (false, 0L, "", 0L)
        } else {
          // single pass over the micro-batch: a viral fingerprint may
          // repeat millions of times per batch — never buffer the texts
          var n = 0L
          var minId = Long.MaxValue
          var minText = ""
          rows.foreach { case (_, id, text) =>
            n += 1
            if (id < minId) { minId = id; minText = text }
          }
          val seenBefore = state.getOption.getOrElse(0L)
          state.update(seenBefore + n)
          ttlMs.foreach(state.setTimeoutDuration)
          // emission via an explicit flag — an in-band id sentinel would
          // silently swallow documents with negative ids
          if (seenBefore == 0L) (true, minId, minText, n)
          else (false, 0L, "", seenBefore + n) // already emitted
        }
    }.filter(_._1).map(r => (r._2, r._3, r._4))
  }

  /** Streaming NEAR-duplicate suppression — the ingest-time rendition
    * of the batch SimHash grouping (q45): every document is
    * fingerprinted with [[graft.pipeline.TextDedup.simhash64]] (bit-
    * parity with the batch pipeline, pinned in LibrarySurfaceSpec — a
    * doc suppressed at ingest must also collapse in a batch pass and
    * vice versa), state is keyed by the fingerprint, the FIRST document
    * of each fingerprint is emitted as the canonical exemplar and later
    * colliders are suppressed with a running collision count in state.
    *
    * Same required-TTL contract as [[dedupStream]]: `Some(ttl)` bounds
    * state at one entry per fingerprint seen within the horizon (a
    * re-occurrence after eviction re-emits — the windowed trade-off);
    * `None` is exact and unbounded, sane only for bounded-cardinality
    * inputs. Output: (doc_id, text, simhash, n_seen_so_far).
    */
  def nearDupStream(spark: SparkSession,
                    docs: Dataset[(Long, String)], bits: Int = 32,
                    stateTtl: Option[scala.concurrent.duration.FiniteDuration])
      : Dataset[(Long, String, Long, Long)] = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
    val keyed = docs.map { case (id, text) =>
      (graft.pipeline.TextDedup.simhash64(text, bits), id, text)
    }.groupByKey(_._1)
    val timeoutConf = if (stateTtl.isDefined)
      GroupStateTimeout.ProcessingTimeTimeout else GroupStateTimeout.NoTimeout
    val ttlMs = stateTtl.map(_.toMillis)
    keyed.mapGroupsWithState(timeoutConf) {
      (fp: Long, rows: Iterator[(Long, Long, String)],
       state: GroupState[Long]) =>
        if (state.hasTimedOut) {
          state.remove()
          (false, 0L, "", 0L, 0L)
        } else {
          // single pass, never buffering texts (see dedupStream — a
          // boilerplate fingerprint can repeat millions of times/batch)
          var n = 0L
          var minId = Long.MaxValue
          var minText = ""
          rows.foreach { case (_, id, text) =>
            n += 1
            if (id < minId) { minId = id; minText = text }
          }
          val seenBefore = state.getOption.getOrElse(0L)
          state.update(seenBefore + n)
          ttlMs.foreach(state.setTimeoutDuration)
          if (seenBefore == 0L) (true, minId, minText, fp, n)
          else (false, 0L, "", fp, seenBefore + n)
        }
    }.filter(_._1).map(r => (r._2, r._3, r._4, r._5))
  }

  /** Event-time windowed mention counts with a watermark: tumbling
    * 10-second windows per NE type, late data bounded at 30 seconds.
    * Input: streaming (ts timestamp, line string).
    */
  def windowedMentionCounts(spark: SparkSession, lines: DataFrame,
                            model: NerfModel): DataFrame = {
    import spark.implicits._
    val bModel = spark.sparkContext.broadcast(model)
    val mentions = lines.as[(java.sql.Timestamp, String)].flatMap {
      case (ts, line) =>
        bModel.value.mentions(line)._2.map(sp => (ts, sp.neType))
    }.toDF("ts", "neType")
    mentions
      .withWatermark("ts", "30 seconds")
      .groupBy(window(col("ts"), "10 seconds"), col("neType"))
      .agg(count(lit(1)).as("n_mentions"))
      .select(col("window.start").as("win_start"), col("neType"),
        col("n_mentions"))
  }
}
