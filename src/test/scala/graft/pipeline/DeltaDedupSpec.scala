package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Gates on delta dedup against a persisted MinHash index
  * ([[DeltaDedup]]): the incremental probe must flag EXACTLY the
  * cross-corpus pairs the one-shot batch operator finds on the union
  * (same banding, same exact verify), the meta must pin the banding
  * parameters, and an appended batch must be visible to the next probe.
  */
class DeltaDedupSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val dir = "/root/testdata/sf0.001"
  def available: Boolean =
    new java.io.File(s"$dir/documents.parquet").exists()

  private def fixture() = {
    import spark.implicits._
    val old = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    // near-dup copies of every %10==3 old doc (tail-append keeps every
    // original shingle: Jaccard ~ 0.97) + fresh invented-vocab docs
    val copies = old.where(col("doc_id") % 10 === 3)
      .select((col("doc_id") + 10000L).as("doc_id"),
        concat(col("text"), lit(" zz qq")).as("text"))
    val fresh = (0 until 30).map(i => (20000L + i,
      (0 until 40).map(j => s"zq${i}w$j").mkString(" "))).toDF("doc_id", "text")
    (old, copies.unionAll(fresh))
  }

  test("delta probe equals the batch operator's cross pairs on the union") {
    assume(available)
    val (old, newDocs) = fixture()
    val base = java.nio.file.Files.createTempDirectory("graft_mhidx")
      .toString + "/idx"
    DeltaDedup.saveMinhashIndex(old, "doc_id", "text", base)
    val got = DeltaDedup.nearDupsAgainstIndex(newDocs, "doc_id", "text", base)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // one-shot batch over the union, restricted to (old, new) pairs:
    // old ids < 10000 <= new ids, and minhashPairs emits d1 < d2
    val want = TextDedup.minhashPairs(old.unionAll(newDocs), "doc_id", "text")
      .where(col("d1") < 10000L && col("d2") >= 10000L)
      .collect().map(r => (r.getLong(1), r.getLong(0), r.getLong(2))).toSet
    assert(want.nonEmpty, "fixture planted no cross near-dups — vacuous")
    assert(want.size >= 40, s"expected ~50 planted pairs, got ${want.size}")
    assert(got == want,
      s"delta diverged: extra=${(got -- want).take(5)} " +
        s"missing=${(want -- got).take(5)}")
  }

  test("probing a non-index directory fails loudly") {
    assume(available)
    val (_, newDocs) = fixture()
    val ex = intercept[IllegalArgumentException] {
      DeltaDedup.nearDupsAgainstIndex(newDocs, "doc_id", "text",
        java.nio.file.Files.createTempDirectory("graft_notidx").toString)
    }
    assert(ex.getMessage.contains("not a graft MinHash index"))
  }

  test("a crash mid-append leaves an UNLOADABLE index; a successful append restores the meta") {
    assume(available)
    import spark.implicits._
    val (old, _) = fixture()
    val base = java.nio.file.Files.createTempDirectory("graft_mhidx3")
      .toString + "/idx"
    DeltaDedup.saveMinhashIndex(old, "doc_id", "text", base)
    val meta = new java.io.File(s"$base/_minhash_meta.json")
    assert(meta.exists())
    // simulate the crash window: appendToIndex drops the meta FIRST,
    // then appends shingles/sizes/bands, then restores the meta — a
    // crash anywhere between leaves exactly this state. Both the probe
    // and a blind retry must refuse (a retry would double-append the
    // doc's shingle rows, corrupting every future Jaccard denominator).
    assert(meta.delete())
    val batch = (0 until 5).map(i => (40000L + i,
      (0 until 40).map(j => s"xw${i}v$j").mkString(" "))).toDF("doc_id", "text")
    val exProbe = intercept[IllegalArgumentException] {
      DeltaDedup.nearDupsAgainstIndex(batch, "doc_id", "text", base)
    }
    assert(exProbe.getMessage.contains("not a graft MinHash index"))
    val exRetry = intercept[IllegalArgumentException] {
      DeltaDedup.appendToIndex(batch, "doc_id", "text", base)
    }
    assert(exRetry.getMessage.contains("not a graft MinHash index"))
    // recovery path: rebuild, then a clean append restores the meta
    DeltaDedup.saveMinhashIndex(old, "doc_id", "text", base)
    DeltaDedup.appendToIndex(batch, "doc_id", "text", base)
    assert(meta.exists(), "append must restore the meta it dropped")
    assert(DeltaDedup.nearDupsAgainstIndex(
      batch.where(col("doc_id") === 40001L)
        .select((col("doc_id") + 100L).as("doc_id"), col("text")),
      "doc_id", "text", base).count() == 1L)
  }

  test("appended batches are visible to the next probe") {
    assume(available)
    import spark.implicits._
    val (old, _) = fixture()
    val base = java.nio.file.Files.createTempDirectory("graft_mhidx2")
      .toString + "/idx"
    DeltaDedup.saveMinhashIndex(old, "doc_id", "text", base)
    // batch 1: fresh docs, disjoint vocab — clean against the corpus
    val batch1 = (0 until 10).map(i => (30000L + i,
      (0 until 40).map(j => s"mn${i}k$j").mkString(" "))).toDF("doc_id", "text")
    assert(DeltaDedup.nearDupsAgainstIndex(batch1, "doc_id", "text", base)
      .count() == 0L)
    DeltaDedup.appendToIndex(batch1, "doc_id", "text", base)
    // batch 2: a near-dup of a batch-1 doc — only findable through the
    // append
    val batch2 = batch1.where(col("doc_id") === 30003L)
      .select((col("doc_id") + 100L).as("doc_id"),
        concat(col("text"), lit(" zz qq")).as("text"))
    val hits = DeltaDedup.nearDupsAgainstIndex(batch2, "doc_id", "text", base)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(hits == Set((30103L, 30003L)), s"got $hits")
  }
}
