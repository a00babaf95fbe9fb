package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Streaming rendition of the batch sessionizer
  * ([[graft.pipeline.Sessionize.sessions]], q58): gap-based per-user
  * sessions emitted INCREMENTALLY as the event-time watermark closes
  * them, instead of in one batch pass at the end of the day.
  *
  * Semantics contract (parity-gated in SessionizeStreamSpec): on the
  * same event set, the emitted rows equal the batch operator's output —
  * same (user_id, session_id ordinal, n_events, sess_start_ms), same
  * strictly-greater-than-gap break rule — provided every event arrives
  * within the watermark delay of its event time. Events later than the
  * watermark are dropped by the engine (the standard event-time
  * contract; the batch pass is the backfill path for them).
  */
object StreamingSessionize {

  /** Gap-based sessionization over a streaming Dataset of
    * (user_id, ms-since-epoch) with custom keyed state
    * (`flatMapGroupsWithState` + `EventTimeTimeout`).
    *
    * State per user is ONE open session plus the next session ordinal —
    * four longs, independent of event volume: each micro-batch folds
    * its events into (start, last, count) and only closed sessions are
    * emitted. A session closes two ways: a later event of the same user
    * arrives more than `gapMs` after the session's last event (emitted
    * in that batch), or the watermark passes `last + gapMs` with no
    * such event (emitted by the event-time timeout — this is what makes
    * an ABANDONED session eventually emit without waiting for its user
    * to return).
    *
    * In-batch ordering: one user's events within a micro-batch are
    * sorted by event time before folding (per-user-per-batch sized
    * buffer — bounded by the trigger interval, not the stream). Across
    * batches, an out-of-order event still merges correctly as long as
    * it lands within `gapMs` of the open session's span (interval
    * extension); with a watermark delay ≤ `gapMs` an admitted event can
    * never belong to an already-CLOSED session, so the parity contract
    * holds for any arrival order the watermark admits.
    *
    * Output: (user_id, session_id, n_events, sess_start_ms) — the batch
    * operator's exact shape.
    *
    * `ordinalTtl` is the REQUIRED bounded-state choice (the same
    * contract as the dedup streams' `stateTtl`): the per-user session
    * ORDINAL must survive the session that produced it or a user whose
    * session closed by timeout restarts at session_id 1 and diverges
    * from the batch numbering. `Some(ttl)` keeps a 4-long ordinal stub
    * per user for `ttl` of event time past each close — state is one
    * stub per user active within the horizon, and batch parity holds
    * for users that return within it. `None` drops state at timeout —
    * minimal state, sane when session COUNT per user doesn't matter
    * downstream (the session rows themselves are still correct; only
    * the ordinals restart).
    */
  def sessionStream(spark: SparkSession, events: Dataset[(Long, Long)],
                    gapMs: Long, watermarkDelayMs: Long,
                    ordinalTtl: Option[scala.concurrent.duration.FiniteDuration])
      : Dataset[(Long, Long, Long, Long)] = {
    import spark.implicits._
    require(gapMs >= 1, s"gapMs must be >= 1: $gapMs")
    require(watermarkDelayMs >= 0 && watermarkDelayMs <= gapMs,
      s"watermarkDelayMs must be in [0, gapMs] so admitted events can " +
        s"never reach into a closed session: $watermarkDelayMs")
    val ordinalTtlMs = ordinalTtl.map(_.toMillis)
    // the watermarked TIMESTAMP column must survive into the keyed
    // Dataset — projecting it away detaches the EventTimeWatermark node
    // from the stateful operator and the engine rejects EventTimeTimeout
    val withTs = events.toDF("user_id", "ms")
      .withColumn("ts", timestamp_millis(col("ms")))
      .withWatermark("ts", s"$watermarkDelayMs milliseconds")
      .as[(Long, Long, java.sql.Timestamp)]
    withTs.groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Long, Long, Long),
                              (Long, Long, Long, Long)](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user, rows, state) =>
          if (state.hasTimedOut) {
            val (sid, start, last, cnt) = state.get
            if (cnt == 0L) {
              // ordinal stub idle past its TTL: forget the user
              state.remove()
              Iterator.empty
            } else {
              // watermark passed last+gap: the open session can no
              // longer gain admitted events — emit it
              ordinalTtlMs match {
                case Some(ttl) =>
                  // keep a counter-only stub so the user's NEXT session
                  // numbers sid+1 (batch parity); the stub evicts itself
                  // after ttl of further event-time silence
                  state.update((sid + 1L, 0L, 0L, 0L))
                  state.setTimeoutTimestamp(math.max(
                    last + gapMs + ttl, state.getCurrentWatermarkMs + 1))
                case None => state.remove()
              }
              Iterator.single((user, sid, cnt, start))
            }
          } else {
            val sorted = rows.map(_._2).toArray
            java.util.Arrays.sort(sorted)
            var out = List.empty[(Long, Long, Long, Long)]
            var (sid, start, last, cnt) =
              state.getOption.getOrElse((1L, 0L, 0L, 0L))
            sorted.foreach { ms =>
              if (cnt == 0L) { start = ms; last = ms; cnt = 1L }
              else if (ms > last + gapMs) {
                out ::= ((user, sid, cnt, start))
                sid += 1L; start = ms; last = ms; cnt = 1L
              } else {
                cnt += 1L
                if (ms > last) last = ms
                if (ms < start) start = ms
              }
            }
            state.update((sid, start, last, cnt))
            // must exceed the current watermark or the engine rejects it
            // (a badly late batch can otherwise set a timeout in the past)
            state.setTimeoutTimestamp(
              math.max(last + gapMs + 1, state.getCurrentWatermarkMs + 1))
            out.reverse.iterator
          }
      }
  }
}
