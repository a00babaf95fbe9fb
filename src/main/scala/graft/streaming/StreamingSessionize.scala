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
  * watermark are dropped by the engine — the filter is `ts <= watermark`,
  * so an event AT the watermark (including ts=0 against the initial
  * watermark of 0) is already late (the standard event-time contract;
  * the batch pass is the backfill path for them).
  */
object StreamingSessionize {

  /** Keyed state of one user: the next session ordinal to assign, the
    * PENDING sessions (start, last, count) ordered by start — sessions
    * the watermark has not yet sealed, so a late-but-admitted event may
    * still extend or bridge them — and the close anchor (last emitted
    * session's `last + gap`, the ordinal stub's TTL clock).
    */
  final case class SessState(nextSid: Long,
                             pending: Seq[(Long, Long, Long)],
                             closeAnchor: Long)

  /** Interval-merge a user's pending sessions with a sorted batch of
    * event times: every point is a 1-event session; anything within
    * `gapMs` chains together (the batch operator's strictly-greater
    * break rule). A point that lands between two pending sessions and
    * closes the gap BRIDGES them into one — the progressive fold
    * handles that for free because each merge extends `last` before
    * the next interval is considered.
    */
  private def mergeSessions(pending: Seq[(Long, Long, Long)],
                            pts: Array[Long],
                            gapMs: Long): List[(Long, Long, Long)] = {
    val all = (pending.iterator ++ pts.iterator.map(ms => (ms, ms, 1L)))
      .toArray.sortBy(s => (s._1, s._2))
    val out = List.newBuilder[(Long, Long, Long)]
    var cur: (Long, Long, Long) = null
    all.foreach { s =>
      if (cur == null) cur = s
      else if (s._1 <= cur._2 + gapMs)
        cur = (cur._1, math.max(cur._2, s._2), cur._3 + s._3)
      else { out += cur; cur = s }
    }
    if (cur != null) out += cur
    out.result()
  }

  /** Gap-based sessionization over a streaming Dataset of
    * (user_id, ms-since-epoch) with custom keyed state
    * (`flatMapGroupsWithState` + `EventTimeTimeout`).
    *
    * A session is emitted ONLY once the watermark passes
    * `last + gapMs` — before that, an admitted out-of-order event can
    * still extend it, or bridge it into its successor, so an eager
    * in-batch emit would diverge from the batch pass (a session "closed"
    * by a later event in the same micro-batch is merely PENDING: the
    * watermark may still trail its span). Sessions the watermark has
    * sealed are provably final — the engine's late-row filter drops any
    * event older than the watermark, and an admitted event
    * (`ts >= watermark > last + gapMs`) can neither join a sealed
    * session nor start one that sorts before it, so emission order (and
    * the per-user ordinal) matches the batch numbering.
    *
    * State per user is the PENDING session list plus two longs — bounded
    * by sessions within one watermark horizon of the stream head (≈
    * `2 + watermarkDelayMs / gapMs` in steady state, plus whatever a
    * single micro-batch carries beyond the watermark), never by event
    * volume: each batch folds its events into (start, last, count)
    * triples. Sessions seal two ways: a data batch whose watermark has
    * passed `last + gapMs`, or the event-time timeout firing at
    * `head.last + gapMs + 1` with no such batch (what makes an ABANDONED
    * session eventually emit without waiting for its user to return).
    *
    * In-batch ordering: one user's events within a micro-batch are
    * sorted by event time before folding (per-user-per-batch sized
    * buffer — bounded by the trigger interval, not the stream). Across
    * batches, any admitted arrival order converges to the same sessions
    * because pending sessions re-merge each batch.
    *
    * Output: (user_id, session_id, n_events, sess_start_ms) — the batch
    * operator's exact shape.
    *
    * `ordinalTtl` is the REQUIRED bounded-state choice (the same
    * contract as the dedup streams' `stateTtl`): the per-user session
    * ORDINAL must survive the session that produced it or a user whose
    * session sealed by timeout restarts at session_id 1 and diverges
    * from the batch numbering. `Some(ttl)` keeps a small ordinal stub
    * per user for `ttl` of event time past each close — state is one
    * stub per user active within the horizon, and batch parity holds
    * for users that return within it. `None` drops state once every
    * session is sealed — minimal state, sane when session COUNT per
    * user doesn't matter downstream (the session rows themselves are
    * still correct; only the ordinals restart).
    */
  def sessionStream(spark: SparkSession, events: Dataset[(Long, Long)],
                    gapMs: Long, watermarkDelayMs: Long,
                    ordinalTtl: Option[scala.concurrent.duration.FiniteDuration])
      : Dataset[(Long, Long, Long, Long)] = {
    import spark.implicits._
    require(gapMs >= 1, s"gapMs must be >= 1: $gapMs")
    require(watermarkDelayMs >= 0,
      s"watermarkDelayMs must be >= 0: $watermarkDelayMs")
    val ordinalTtlMs = ordinalTtl.map(_.toMillis)
    // the watermarked TIMESTAMP column must survive into the keyed
    // Dataset — projecting it away detaches the EventTimeWatermark node
    // from the stateful operator and the engine rejects EventTimeTimeout
    val withTs = events.toDF("user_id", "ms")
      .withColumn("ts", timestamp_millis(col("ms")))
      .withWatermark("ts", s"$watermarkDelayMs milliseconds")
      .as[(Long, Long, java.sql.Timestamp)]
    withTs.groupByKey(_._1)
      .flatMapGroupsWithState[SessState, (Long, Long, Long, Long)](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user, rows, state) =>
          val wm = state.getCurrentWatermarkMs
          val st0 = state.getOption.getOrElse(SessState(1L, Nil, Long.MinValue))
          val pts = rows.map(_._2).toArray
          java.util.Arrays.sort(pts)
          var rest = mergeSessions(st0.pending, pts, gapMs)
          // emit the prefix the watermark has sealed, in start order —
          // later pending sessions have later `last`, so stop at the
          // first unsealed one
          var sid = st0.nextSid
          var anchor = st0.closeAnchor
          val out = List.newBuilder[(Long, Long, Long, Long)]
          while (rest.nonEmpty && rest.head._2 + gapMs < wm) {
            val (start, last, cnt) = rest.head
            out += ((user, sid, cnt, start))
            sid += 1L
            anchor = last + gapMs
            rest = rest.tail
          }
          if (rest.nonEmpty) {
            state.update(SessState(sid, rest, anchor))
            // must exceed the current watermark or the engine rejects it
            // (a badly late batch can otherwise set a timeout in the past)
            state.setTimeoutTimestamp(
              math.max(rest.head._2 + gapMs + 1, wm + 1))
          } else ordinalTtlMs match {
            case Some(ttl) if anchor != Long.MinValue && anchor + ttl > wm =>
              // counter-only stub so the user's NEXT session numbers
              // sid (batch parity); evicts itself after ttl of further
              // event-time silence
              state.update(SessState(sid, Nil, anchor))
              state.setTimeoutTimestamp(anchor + ttl)
            case _ =>
              // no pending work and either no TTL, or the stub's TTL
              // already lapsed (this IS the stub-expiry timeout firing)
              state.remove()
          }
          out.result().iterator
      }
  }
}
