package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Gates on DSIR importance resampling ([[Dsir]], Xie et al. 2023):
  * the fitted log-ratio table and the per-doc weights must equal an
  * independent driver-side recompute of the published formulas; the
  * weights must actually SEPARATE target-like from raw-like docs; the
  * Gumbel resample must be deterministic, seed-rotated, and prefer
  * high-weight docs; and scoring must stay a zero-shuffle scan-side
  * fold (the operator's 100-TB claim).
  */
class DsirSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val dir = "/root/testdata/sf0.01"
  def available: Boolean =
    new java.io.File(s"$dir/documents.parquet").exists()

  // target vocabulary disjoint from raw vocabulary: weights must
  // separate the two populations cleanly
  private def fixture() = {
    import spark.implicits._
    val target = (0 until 40).map(i =>
      (i.toLong, s"alpha beta gamma delta w$i alpha beta"))
      .toDF("doc_id", "text")
    val raw = (0 until 40).map(i =>
      (100L + i, s"noise junk filler w$i noise junk")).toDF("doc_id", "text")
    (target, target.unionAll(raw))
  }

  private def md5Hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    d.map("%02x".format(_)).mkString
  }

  private def gramsOf(text: String): Seq[String] =
    (Decontam.shinglesOf(text, 1) ++ Decontam.shinglesOf(text, 2)).toSeq

  private def bucketOf(g: String): Int =
    Integer.parseInt(md5Hex(g).substring(0, 2), 16)

  test("logRatios equals a driver recompute of the smoothed formula") {
    assume(available)
    val (target, raw) = fixture()
    val got = Dsir.logRatios(target, raw, "text").collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(got.size == Dsir.NumBuckets)
    val tCnt = new Array[Long](256)
    val rCnt = new Array[Long](256)
    target.collect().foreach(r =>
      gramsOf(r.getString(1)).foreach(g => tCnt(bucketOf(g)) += 1))
    raw.collect().foreach(r =>
      gramsOf(r.getString(1)).foreach(g => rCnt(bucketOf(g)) += 1))
    val tTot = tCnt.sum; val rTot = rCnt.sum
    assert(tTot > 0 && rTot > tTot, "fixture degenerate")
    (0 until 256).foreach { b =>
      val key = f"$b%02x"
      val (gt, gr, glr) = got(key)
      assert(gt == tCnt(b) && gr == rCnt(b),
        s"bucket $key counts: got ($gt, $gr), want (${tCnt(b)}, ${rCnt(b)})")
      val want = math.log((tCnt(b) + 1.0) / (tTot + 256)) -
        math.log((rCnt(b) + 1.0) / (rTot + 256))
      assert(math.abs(glr - want) < 1e-12,
        s"bucket $key lr: got $glr, want $want")
    }
  }

  test("importanceWeights equals a driver recompute and separates populations") {
    assume(available)
    val (target, raw) = fixture()
    val ratios = Dsir.logRatios(target, raw, "text")
    val lr = ratios.collect()
      .map(r => Integer.parseInt(r.getString(0), 16) -> r.getDouble(3)).toMap
    val got = Dsir.importanceWeights(raw, "doc_id", "text", ratios)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2)))).toMap
    assert(got.size == 80)
    raw.collect().foreach { r =>
      val gs = gramsOf(r.getString(1))
      // same left-fold order as the column expression
      val w = gs.foldLeft(0.0)((acc, g) => acc + lr(bucketOf(g)))
      val (n, gw) = got(r.getLong(0))
      assert(n == gs.length)
      assert(math.abs(gw - BigDecimal(w).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9,
        s"doc ${r.getLong(0)}: got $gw, want $w")
    }
    val targetLike = (0 until 40).map(i => got(i.toLong)._2)
    val rawLike = (0 until 40).map(i => got(100L + i)._2)
    assert(targetLike.min > rawLike.max,
      s"weights failed to separate: target-like min ${targetLike.min} <= " +
        s"raw-like max ${rawLike.max}")
  }

  test("resampleGumbel: deterministic, seed-rotated, k-bounded, weight-preferring") {
    assume(available)
    val (target, raw) = fixture()
    val ratios = Dsir.logRatios(target, raw, "text")
    def ids(seed: Long) = Dsir.resampleGumbel(
      raw, "doc_id", "text", ratios, k = 30, seed = seed)
      .collect().map(_.getLong(0)).toSet
    val a = ids(7); val b = ids(7); val c = ids(8)
    assert(a.size == 30)
    assert(a == b, "same seed must reproduce the same sample")
    assert(a != c, "a rotated seed should redraw the noise")
    // target-vocab docs dominate: their weight gap (>> Gumbel spread for
    // this fixture's ratios) must pull nearly all of them into the top 30
    val targetKept = a.count(_ < 100L)
    assert(targetKept >= 25,
      s"expected >=25 of 30 kept docs to be target-like, got $targetKept")
  }

  test("scoring is a zero-shuffle scan-side fold") {
    assume(available)
    val (target, raw) = fixture()
    val ratios = Dsir.logRatios(target, raw, "text")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val df = Dsir.importanceWeights(docs, "doc_id", "text", ratios)
    df.write.format("noop").mode("overwrite").save()
    val shuffles = graft.plans.PlanInspector
      .allNodes(df.queryExecution.executedPlan)
      .count(_.getClass.getSimpleName.contains("ShuffleExchange"))
    assert(shuffles == 0,
      s"importanceWeights must not shuffle, found $shuffles:\n" +
        df.queryExecution.executedPlan)
  }
}
