package graft.pipeline

import graft.functions.SketchFunctions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Gates on the Count-Min-Sketch heavy-hitter operator (q54): exact
  * parity with brute force, and the one-sided-error property the recall
  * proof rests on.
  */
class SketchSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val dir = "/root/testdata/sf0.01"
  def available: Boolean = new java.io.File(s"$dir/events.parquet").exists()

  test("heavyHitters equals the brute-force groupBy-having answer") {
    assume(available)
    val events = spark.read.parquet(s"$dir/events.parquet")
    val got = Sketches.heavyHitters(events, "user_id", minShareDenom = 125)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val total = events.count()
    val want = events.groupBy("user_id").agg(count(lit(1)).as("n"))
      .where(col("n") * 125 >= lit(total))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(want.nonEmpty, "gate is vacuous: no heavy hitters at this SF")
    assert(got == want, s"extra=${got -- want} missing=${want -- got}")
  }

  /** Build the sketch exactly the way heavyHitters pass 1 does (the SQL
    * count_min_sketch aggregate) — a different builder could hash keys
    * differently and the parity tests would pin the wrong thing.
    */
  private def sqlSketch(df: org.apache.spark.sql.DataFrame, keyCol: String,
                        seed: Int): org.apache.spark.util.sketch.CountMinSketch = {
    val bytes = df.agg(
      expr(s"count_min_sketch(`$keyCol`, 0.001d, 0.99d, $seed)"))
      .head().getAs[Array[Byte]](0)
    org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(bytes))
  }

  test("CMS estimates are one-sided: estimate >= exact for every key") {
    assume(available)
    val events = spark.read.parquet(s"$dir/events.parquet")
    val sketch = sqlSketch(events, "user_id", 42)
    val rows = events.groupBy("user_id").agg(count(lit(1)).as("n"))
      .select(col("user_id"), col("n"),
        SketchFunctions.ner_cms_estimate(col("user_id"), sketch).as("est"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) >= r.getLong(1),
        s"user ${r.getLong(0)}: estimate ${r.getLong(2)} < exact " +
          s"${r.getLong(1)} — hash mismatch between sketch build and " +
          "lookup would break the guaranteed-recall argument")
    }
  }

  test("ner_cms_estimate handles string keys with builder-parity hashing") {
    import spark.implicits._
    val df = (Seq.fill(40)("hot") ++ Seq("a", "b", "c")).toDF("k")
    val sketch = sqlSketch(df, "k", 7)
    val est = df.distinct()
      .select(col("k"), SketchFunctions.ner_cms_estimate(col("k"), sketch))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est("hot") >= 40L, s"string hashing disagrees: ${est("hot")}")
    assert(est("a") >= 1L && est("a") <= 4L, s"gross overestimate: ${est("a")}")
  }

  test("heavyHitters pass-3 candidates join is a guaranteed broadcast") {
    assume(available)
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, ShuffledHashJoinExec, SortMergeJoinExec}
    val events = spark.read.parquet(s"$dir/events.parquet")
    val df = Sketches.heavyHitters(events, "user_id", minShareDenom = 125)
    df.collect() // AQE: gate the FINAL executed plan, not the static one
    val nodes = graft.plans.PlanInspector.allNodes(df.queryExecution.executedPlan)
    assert(nodes.exists(_.isInstanceOf[BroadcastHashJoinExec]),
      s"q54: candidates join is not a BroadcastHashJoin:\n" +
        s"${df.queryExecution.executedPlan}")
    // `candidates` is distinct() filtered by an opaque codegen sketch
    // lookup — Catalyst cannot estimate its cardinality, so without the
    // explicit hint the static plan is a SortMergeJoin shuffling the
    // FULL stream keyed by the heavy-hitter (maximally skewed) keys
    assert(!nodes.exists(n => n.isInstanceOf[SortMergeJoinExec] ||
        n.isInstanceOf[ShuffledHashJoinExec]),
      s"q54: plan shuffles the stream for the candidates join:\n" +
        s"${df.queryExecution.executedPlan}")
    // the surviving shuffles must be vocabulary/candidate-sized: the
    // candidates distinct() and the post-join exact-count aggregate —
    // none may sit UPSTREAM of the broadcast join's stream side (i.e.
    // the stream reaches the join unshuffled). Structural proof: every
    // shuffle's subtree either contains the distinct (HashAggregate on
    // the build side) or contains the join itself (post-join agg).
    val shuffles = nodes.collect { case s: ShuffleExchangeLike => s }
    shuffles.foreach { s =>
      val sub = graft.plans.PlanInspector.allNodes(s)
      val feedsJoin = sub.exists(_.isInstanceOf[BroadcastHashJoinExec])
      val isCandidateSide = s.output.size == 1 // distinct carries only the key
      assert(feedsJoin || isCandidateSide,
        s"q54: a shuffle carries the full stream before the candidates " +
          s"join:\n$s")
    }
  }

  test("heavyHitters refuses parameters whose candidate set is unbounded") {
    import spark.implicits._
    val df = Seq(1L, 2L, 3L).toDF("k")
    val ex = intercept[IllegalArgumentException] {
      // eps * denom = 0.1 * 125 = 12.5 > 0.5: the sketch is too coarse
      // to bound the candidate set, so the broadcast is no longer safe
      Sketches.heavyHitters(df, "k", minShareDenom = 125, eps = 0.1)
    }
    assert(ex.getMessage.contains("broadcast"), ex.getMessage)
  }

  test("NULL keys are excluded from heavy hitters (documented contract)") {
    import spark.implicits._
    // 60 null-key rows (heavy by share) + one hot key + noise keys
    val df = (Seq.fill[java.lang.Long](60)(null) ++
      Seq.fill[java.lang.Long](30)(7L) ++
      (100L to 109L).map(java.lang.Long.valueOf))
      .toDF("k")
    val got = Sketches.heavyHitters(df, "k", minShareDenom = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // threshold = 100/5 = 20: only key 7 qualifies; the NULL group is
    // excluded even though its 60 rows dwarf it
    assert(got == Set((7L, 30L)), s"got $got")
  }
}
