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
    firstWinsStream[String](docs, graft.core.Digests.md5Hex, stateTtl)
      .map(r => (r._1, r._2, r._4))
  }

  /** The ONE first-wins keyed-state machine behind both dedup variants
    * (exact by content hash, near by SimHash) — shared so the state
    * semantics (TTL eviction, never-buffer-texts, min-id exemplar,
    * explicit emission flag) cannot diverge between them. Output:
    * (doc_id, text, fingerprint, n_seen) for each fingerprint's FIRST
    * emission only.
    *
    * Invariants the body maintains:
    *  - single pass over the micro-batch, never buffering texts (a
    *    viral fingerprint may repeat millions of times per batch);
    *  - emission via an explicit flag, not an in-band id sentinel
    *    (which would silently swallow documents with negative ids);
    *  - `stateTtl` is the caller's REQUIRED choice between bounded
    *    state (eviction + re-emit) and exact unbounded semantics.
    */
  private def firstWinsStream[K](
      docs: Dataset[(Long, String)], fp: String => K,
      stateTtl: Option[scala.concurrent.duration.FiniteDuration])(
      implicit ek: org.apache.spark.sql.Encoder[K],
      ekey: org.apache.spark.sql.Encoder[(K, Long, String)],
      eraw: org.apache.spark.sql.Encoder[(Boolean, Long, String, K, Long)],
      eout: org.apache.spark.sql.Encoder[(Long, String, K, Long)])
      : Dataset[(Long, String, K, Long)] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
    // the Long STATE encoder; the K-containing row encoders come from
    // the caller (spark.implicits cannot synthesize them for a type
    // parameter, so they ride in as implicit params)
    implicit val stateEnc: org.apache.spark.sql.Encoder[Long] =
      org.apache.spark.sql.Encoders.scalaLong
    val keyed = docs.map { case (id, text) => (fp(text), id, text) }
      .groupByKey(_._1)
    val timeoutConf = if (stateTtl.isDefined)
      GroupStateTimeout.ProcessingTimeTimeout else GroupStateTimeout.NoTimeout
    val ttlMs = stateTtl.map(_.toMillis)
    val default = null.asInstanceOf[K]
    keyed.mapGroupsWithState(timeoutConf) {
      (key: K, rows: Iterator[(K, Long, String)], state: GroupState[Long]) =>
        if (state.hasTimedOut) {
          state.remove() // evict idle fingerprint; no output row
          (false, 0L, "", default, 0L)
        } else {
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
          if (seenBefore == 0L) (true, minId, minText, key, n)
          else (false, 0L, "", default, seenBefore + n) // already emitted
        }
    }.filter(_._1).map(r => (r._2, r._3, r._4, r._5))
  }

  /** Streaming NEAR-duplicate suppression — the ingest-time rendition
    * of the batch SimHash grouping (q45): every document is
    * fingerprinted with [[graft.pipeline.TextDedup.simhash64]] (bit-
    * parity with the batch pipeline, pinned in StreamingDedupSpec (CoverageSpec.scala) — a
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
    firstWinsStream[Long](docs,
      graft.pipeline.TextDedup.simhash64(_, bits), stateTtl)
  }

  /** Streaming decontamination — the ingest-time rendition of the batch
    * operator ([[graft.pipeline.Decontam.contaminated]], q67): docs
    * sharing an n-token shingle with the held-out eval set are dropped
    * BEFORE they ever land in the corpus, so eval data can't leak into
    * a continuously-ingested training table. The eval shingle set is
    * computed once as a batch job over the static eval frame (same
    * `MaxEvalShingles` broadcast contract as the batch path) and
    * broadcast; each micro-batch then applies a STATELESS per-row
    * predicate — no state store, no shuffle, and the filter composes
    * with the dedup streams downstream. Membership uses
    * [[graft.pipeline.Decontam.shinglesOf]], bit-parity with the batch
    * shingle expression (pinned in StreamingDedupSpec): a doc dropped
    * here is exactly a doc the batch operator would flag.
    *
    * NULL texts shingle to nothing and pass (the batch operator never
    * flags them either). Returns the CLEAN stream.
    */
  def decontamStream(spark: SparkSession, docs: Dataset[(Long, String)],
                     evalSet: DataFrame, evalTextCol: String, n: Int,
                     maxEvalShingles: Long =
                       graft.pipeline.Decontam.MaxEvalShingles)
      : Dataset[(Long, String)] = {
    val evalGrams = evalSet
      .select(explode(graft.pipeline.Decontam
        .shingles(col(evalTextCol), n)).as("gram"))
      .distinct()
    val nEval = evalGrams.count()
    require(nEval <= maxEvalShingles,
      s"eval set has $nEval distinct $n-gram shingles, above the " +
        s"broadcast budget of $maxEvalShingles — shard the eval set " +
        "(Decontam.MaxEvalShingles)")
    val grams = evalGrams.collect().map(_.getString(0)).toSet
    val bGrams = spark.sparkContext.broadcast(grams)
    docs.filter { case (_, text) =>
      !graft.pipeline.Decontam.shinglesOf(text, n)
        .exists(bGrams.value.contains)
    }
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
