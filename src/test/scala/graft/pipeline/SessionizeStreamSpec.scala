package graft.pipeline

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import scala.concurrent.duration._
import org.scalatest.funsuite.AnyFunSuite

/** Parity gates for the two non-lag sessionization renditions: the
  * native `session_window` aggregate (batch mode here; the operator is
  * streaming-capable unchanged) and the `flatMapGroupsWithState`
  * streaming sessionizer — both must reproduce the lag-based batch
  * operator ([[Sessionize.sessions]], the q58 oracle semantics) row for
  * row, including the exactly-on-gap boundary where the half-open
  * native window would otherwise split.
  */
class SessionizeStreamSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val Gap = 1000L

  /** Deterministic multi-user event set with hostile boundaries: gaps of
    * exactly `Gap` (must NOT split), `Gap + 1` (must split), plus a
    * pseudo-random mix. (user_id, ms, event_id); ms unique per user so
    * the tie column never decides.
    */
  private def fixture: Seq[(Long, Long, Long)] = {
    val rnd = new scala.util.Random(4242)
    val rows = Seq.newBuilder[(Long, Long, Long)]
    var eid = 0L
    (1L to 8L).foreach { u =>
      var ms = u * 17
      // forced boundaries first: same-session at exactly Gap, split at Gap+1
      val forced = Seq(0L, Gap, Gap + 1, 3, Gap)
      val steps = forced ++ Seq.fill(25)(
        if (rnd.nextInt(4) == 0) Gap + 1 + rnd.nextInt(5000)
        else 1L + rnd.nextInt(Gap.toInt))
      steps.foreach { d =>
        ms += d; eid += 1; rows += ((u, ms, eid))
      }
    }
    rows.result()
  }

  private def batchSessions(rows: Seq[(Long, Long, Long)]) = {
    import spark.implicits._
    Sessionize.sessions(rows.toDF("user_id", "ms", "event_id"),
        "user_id", "ms", "event_id", Gap)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
  }

  test("native session_window aggregate matches the lag-based sessionizer") {
    import spark.implicits._
    val rows = fixture
    val expected = batchSessions(rows)
      .map { case (u, _, n, start) => (u, start, n) }
    val got = Sessionize.sessionWindowAgg(
        rows.toDF("user_id", "ms", "event_id"), "user_id", "ms", Gap)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expected,
      s"native window diverged: missing=${expected -- got} extra=${got -- expected}")
    // the exactly-on-gap pair really is in the fixture (gate not vacuous):
    // without the +1 boundary fix these sessions would split
    assert(rows.sliding(2).exists { case Seq((u1, m1, _), (u2, m2, _)) =>
      u1 == u2 && m2 - m1 == Gap },
      "fixture lost its exact-gap boundary pair")
  }

  test("native session_window works UNCHANGED in streaming append mode") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = fixture
    val expected = batchSessions(rows)
      .map { case (u, _, n, start) => (u, start, n) }
    val sorted = rows.sortBy(_._2).map(r => (r._1, r._2))
    val batches = sorted.grouped((sorted.size + 2) / 3).toSeq
    val input = MemoryStream[(Long, Long)]
    // the caller-side watermark contract of sessionWindowAggTs: derive
    // the ts column, watermark it, pass it through untouched
    val streamDf = input.toDS().toDF("user_id", "ms")
      .withColumn("ts", timestamp_millis(col("ms")))
      .withWatermark("ts", "1 second")
    val out = Sessionize.sessionWindowAggTs(streamDf, "user_id", "ts", Gap)
    val q = out.writeStream.format("memory").queryName("sess_native_stream")
      .outputMode("append").start()
    try {
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
      val far = sorted.last._2 + 100 * Gap
      input.addData((9999L, far)); q.processAllAvailable()
      input.addData((9999L, far + 1)); q.processAllAvailable()
      val got = spark.sql(
          "SELECT user_id, sess_start_ms, n_events FROM sess_native_stream")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .filter(_._1 != 9999L).toSet
      assert(got == expected,
        s"streaming native window diverged: missing=${expected -- got} extra=${got -- expected}")
    } finally q.stop()
  }

  test("streaming sessionizer emits the batch session set as the watermark closes sessions") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = fixture
    val expected = batchSessions(rows)
    // three event-time-ordered micro-batches over ALL users
    val sorted = rows.sortBy(_._2).map(r => (r._1, r._2))
    val batches = sorted.grouped((sorted.size + 2) / 3).toSeq
    val input = MemoryStream[(Long, Long)]
    val out = graft.streaming.StreamingSessionize
      .sessionStream(spark, input.toDS(), Gap, watermarkDelayMs = Gap,
        ordinalTtl = Some(1.hour))
      .toDF("user_id", "session_id", "n_events", "sess_start_ms")
    val q = out.writeStream.format("memory").queryName("sess_stream")
      .outputMode("append").start()
    try {
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
      // flush: two far-future sentinel events advance the watermark past
      // every open session's last+gap (first batch moves the watermark,
      // the next fires the event-time timeouts)
      val far = sorted.last._2 + 100 * Gap
      input.addData((9999L, far)); q.processAllAvailable()
      input.addData((9999L, far + 1)); q.processAllAvailable()
      val got = spark.sql(
          "SELECT user_id, session_id, n_events, sess_start_ms FROM sess_stream")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .filter(_._1 != 9999L).toSet
      assert(got == expected,
        s"stream diverged from batch: missing=${expected -- got} extra=${got -- expected}")
    } finally q.stop()
  }

  test("out-of-order arrival within the watermark does not change the stream's sessions") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = fixture
    val expected = batchSessions(rows)
    // shuffle WITHIN each event-time-ordered batch: arrival order inside
    // a micro-batch is arbitrary in production (tasks race)
    val rnd = new scala.util.Random(99)
    val sorted = rows.sortBy(_._2).map(r => (r._1, r._2))
    val batches = sorted.grouped((sorted.size + 2) / 3).toSeq
      .map(b => rnd.shuffle(b))
    val input = MemoryStream[(Long, Long)]
    val out = graft.streaming.StreamingSessionize
      .sessionStream(spark, input.toDS(), Gap, watermarkDelayMs = Gap,
        ordinalTtl = Some(1.hour))
      .toDF("user_id", "session_id", "n_events", "sess_start_ms")
    val q = out.writeStream.format("memory").queryName("sess_stream_ooo")
      .outputMode("append").start()
    try {
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
      val far = sorted.last._2 + 100 * Gap
      input.addData((9999L, far)); q.processAllAvailable()
      input.addData((9999L, far + 1)); q.processAllAvailable()
      val got = spark.sql(
          "SELECT user_id, session_id, n_events, sess_start_ms FROM sess_stream_ooo")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .filter(_._1 != 9999L).toSet
      assert(got == expected,
        s"shuffled arrival diverged: missing=${expected -- got} extra=${got -- expected}")
    } finally q.stop()
  }

  test("cross-batch late event merges into a session an eager close would have emitted") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // the adversarial arrival the watermark ADMITS but an eager in-batch
    // close gets wrong: batch 1 carries ts=1000 and ts=1150 (gap 100
    // split), batch 2 delivers ts=1080 — admitted (watermark is
    // 1150-100=1050 and 1080 > 1050), it
    // belongs to the "closed" {1000} session AND bridges it to {1150};
    // the batch operator on {1000, 1080, 1150} yields ONE 3-event
    // session, so the stream must too (this is the review regression:
    // the old code emitted {1000} in batch 1 and could never take it
    // back). Timestamps sit off the epoch boundary because the engine's
    // late filter drops ts <= watermark and the initial watermark is 0.
    val gap = 100L
    val input = MemoryStream[(Long, Long)]
    val out = graft.streaming.StreamingSessionize
      .sessionStream(spark, input.toDS(), gap, watermarkDelayMs = gap,
        ordinalTtl = Some(1.hour))
      .toDF("user_id", "session_id", "n_events", "sess_start_ms")
    val q = out.writeStream.format("memory").queryName("sess_stream_late")
      .outputMode("append").start()
    try {
      val q0 = spark.sql("SELECT * FROM sess_stream_late")
      input.addData((1L, 1000L), (1L, 1150L)); q.processAllAvailable()
      assert(q0.count() == 0L,
        "nothing is watermark-sealed after batch 1 — eager close regressed")
      input.addData((1L, 1080L)); q.processAllAvailable()
      // flush: advance the watermark far past last+gap, then fire timeouts
      input.addData((9999L, 100000L)); q.processAllAvailable()
      input.addData((9999L, 100001L)); q.processAllAvailable()
      val got = q0.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .filter(_._1 != 9999L).toSet
      val expected = Sessionize.sessions(
          Seq((1L, 1000L, 1L), (1L, 1080L, 2L), (1L, 1150L, 3L))
            .toDF("user_id", "ms", "event_id"),
          "user_id", "ms", "event_id", gap)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      assert(expected == Set((1L, 1L, 3L, 1000L)), s"fixture drifted: $expected")
      assert(got == expected,
        s"late admitted event diverged: missing=${expected -- got} extra=${got -- expected}")
    } finally q.stop()
  }
}
