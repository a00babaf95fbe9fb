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
