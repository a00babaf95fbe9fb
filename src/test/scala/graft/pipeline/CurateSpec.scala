package graft.pipeline

import graft.io.TableIO
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Integration gate on the end-to-end curation recipe (Curate.run —
  * VERDICT r4 #6): the individually-gated operators must COMPOSE —
  * monotone survivor counts, independent parity on the exact stage,
  * brute-force parity on the hot-key stage, and a committed table that
  * reads back with exactly the surviving rows.
  */
class CurateSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val dir = "/root/testdata/sf0.001"
  def available: Boolean =
    new java.io.File(s"$dir/documents.parquet").exists() &&
      new java.io.File(s"$dir/embeddings.parquet").exists()

  test("curate recipe: stage counts, exact-stage parity, committed output") {
    assume(available)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val emb = Some(spark.read.parquet(s"$dir/embeddings.parquet"))
    val out = java.nio.file.Files.createTempDirectory("graft_curate")
      .toString + "/curated"
    // minCos 0.4: the uniform-random testdata holds ~66 true pairs at
    // this threshold (the q53 setting); the production default 0.95
    // would leave stage 4 vacuous on this fixture
    val pinsBefore = spark.sparkContext.getRDDStorageInfo.map(_.id).toSet
    val r = Curate.run(spark, docs, "doc_id", "text", emb, "vec_id",
      "embedding", out, hotKeyCol = "source", minCos = 0.4)
    // the rolling persist must release every stage pin it took — a
    // leaked pin per run would accumulate across a long-lived session.
    // unpersist is async; poll briefly before declaring a leak.
    def leakedNow = spark.sparkContext.getRDDStorageInfo.map(_.id).toSet --
      pinsBefore
    val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
    while (leakedNow.nonEmpty && System.nanoTime() < deadline)
      Thread.sleep(200)
    assert(leakedNow.isEmpty, s"curate leaked storage pins: $leakedNow")

    assert(r.nInput == docs.count())
    assert(r.nInput >= r.nAfterExact &&
      r.nAfterExact >= r.nAfterBoilerplate &&
      r.nAfterBoilerplate >= r.nAfterMinhash &&
      r.nAfterMinhash >= r.nAfterEmbedding,
      s"survivor counts must be monotone: $r")

    // stage 1 parity, independently recomputed: exact dedup keeps one
    // doc per distinct text
    val nDistinctTexts = docs.select(md5(col("text"))).distinct().count()
    assert(r.nAfterExact == nDistinctTexts,
      s"exact stage kept ${r.nAfterExact}, distinct texts $nDistinctTexts")

    // stage 4 must have acted on this fixture (see minCos note above)
    assert(r.nAfterEmbedding < r.nAfterMinhash,
      "embedding near-dup stage was vacuous at minCos 0.4")

    // the committed table reads back with exactly the survivors, ids
    // unique (dedup output, by definition)
    assert(r.nWritten == r.nAfterEmbedding, s"written ${r.nWritten}")
    val back = TableIO.readCommitted(spark, out, buckets = 16)
    assert(back.count() == r.nAfterEmbedding)
    assert(back.select("doc_id").distinct().count() == r.nAfterEmbedding,
      "curated table contains duplicate doc ids")

    // hot-key stage parity: brute-force groupBy-having over the same
    // survivors at the same 1/16 share threshold
    val want = back.groupBy(col("source")).agg(count(lit(1)).as("n"))
      .where(col("n") * 16 >= lit(r.nAfterEmbedding))
      .collect().map(row => (row.getString(0), row.getLong(1))).toSet
    assert(r.hotKeys.toSet == want,
      s"hot keys ${r.hotKeys} != brute force $want")
    assert(r.salts >= 8, s"salt fan-out must respect the floor: ${r.salts}")

    // the report serializes to one well-formed JSON line for the CLI
    assert(r.json.startsWith("{") && r.json.endsWith("}") &&
      r.json.contains("\"n_written\":"), r.json)

    // a SECOND run over the same outDir is a resume no-op: every bucket
    // is committed, nothing rewrites (the writeResumable contract holds
    // through the recipe)
    val r2 = Curate.run(spark, docs, "doc_id", "text", emb, "vec_id",
      "embedding", out, hotKeyCol = "source", minCos = 0.4)
    assert(r2.nWritten == 0, s"resume rewrote ${r2.nWritten} rows")
    assert(r2.nAfterEmbedding == r.nAfterEmbedding, "recipe is not deterministic")
  }

  test("boilerplate share: template docs flagged, unique docs at zero") {
    import spark.implicits._
    val template = (1 to 30).map(i => s"tok$i").mkString(" ")
    val df = Seq(
      (1L, template), // pure boilerplate: identical 30-token template
      (2L, template),
      (3L, (100 to 140).map(i => s"uniq$i").mkString(" ")) // all-unique
    ).toDF("doc_id", "text")
    val got = TextDedup.boilerplateShare(df, "doc_id", "text", n = 20)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // 30 tokens -> 11 spans of 20, all duplicated across docs 1 and 2
    assert(got(1L) == ((11L, 11L, 1.0)), s"doc 1: ${got(1L)}")
    assert(got(2L) == ((11L, 11L, 1.0)), s"doc 2: ${got(2L)}")
    val (s3, d3, share3) = got(3L)
    assert(s3 == 22L && d3 == 0L && share3 == 0.0, s"doc 3: ${got(3L)}")
  }
}
