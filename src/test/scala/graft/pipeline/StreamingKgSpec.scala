package graft.pipeline

import graft.KgMain
import graft.core.Synth
import graft.io.TableIO
import graft.streaming.StreamingKg
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** The streaming maintenance invariant: after every processed
  * micro-batch, the committed triples table equals a full BATCH
  * pipeline run over the union of all files ever ingested — the
  * PipelineSpec canonical-merge parity, held continuously through
  * `StreamingKg.maintainTriples` (foreachBatch over
  * `mergeDeltaCanonical` with persisted [[CanonState]]).
  */
class StreamingKgSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  lazy val model = KgMain.model

  test("maintainTriples: table == full batch re-run after every micro-batch") {
    import spark.implicits._
    val buckets = 8
    val base0 = java.nio.file.Files.createTempDirectory("kgstream").toString
    val dir = base0 + "/triples"
    val stateDir = base0 + "/canon_state"
    val ckpt = base0 + "/stream_ckpt"
    val n = 30L
    def ident(i: Long) = Synth.repoRow(i, 8, seed = 42L)
    def fileOf(r: Synth.RepoRow) =
      KgPipeline.RepoFile(r.repo, r.path, r.commit, r.lang, r.content)
    val base = (0L until n).map(i => fileOf(ident(i)))

    // bootstrap table + state (KgMain/KgDeltaMain's onboarding path)
    val r0 = KgPipeline.run(spark, spark.createDataset(base), model)
    TableIO.writeResumable(r0.triples, dir, buckets,
      Seq("src_repo", "src_path"))
    val kb = KgPipeline.kbAliasDf(spark, Synth.knowledgeBase)
    val cd0 = KgPipeline.canonicalizeWithState(spark, r0.linked, kb, stateDir)
    CanonState.save(spark, stateDir, cd0.edges, cd0.canon)
    KgPipeline.releaseCanon(spark, cd0.canon); cd0.edges.unpersist()
    KgPipeline.release(spark, r0)

    // two micro-batches of changed files (new content, same identities)
    def altFiles(lo: Long, hi: Long, seed: Long) = (lo until hi).map { i =>
      val id = ident(i)
      val alt = Synth.repoRow(i, 8, seed = seed)
      KgPipeline.RepoFile(id.repo, id.path, "e" * 40, id.lang, alt.content)
    }
    val d1 = altFiles(3, 7, 43L)
    val d2 = altFiles(20, 24, 44L)

    val cols = Seq("subj", "pred", "obj", "src_repo", "src_path",
      "src_commit")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select(cols.map(col): _*)
        .collect().map(r => cols.indices.map(r.getString).mkString(""))
        .toSet
    def fullRunRows(corpus: Seq[KgPipeline.RepoFile]) = {
      val rf = KgPipeline.run(spark, spark.createDataset(corpus), model)
      val w = rows(rf.triples)
      KgPipeline.release(spark, rf)
      w
    }

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[KgPipeline.RepoFile]
    val q = StreamingKg.maintainTriples(input.toDS(), dir, buckets, model,
      stateDir, ckpt)
    try {
      input.addData(d1: _*); q.processAllAvailable()
      val afterD1 = fullRunRows(base.take(3) ++ d1 ++ base.drop(7))
      assert(rows(TableIO.readCommitted(spark, dir, buckets)) == afterD1,
        "table diverges from the full batch run after micro-batch 1")
      input.addData(d2: _*); q.processAllAvailable()
      val afterD2 = fullRunRows(base.take(3) ++ d1 ++ base.slice(7, 20) ++
        d2 ++ base.drop(24))
      assert(rows(TableIO.readCommitted(spark, dir, buckets)) == afterD2,
        "table diverges from the full batch run after micro-batch 2")
      // an empty trigger must not bump the state version (no work)
      val verBefore = stateVersion(stateDir)
      q.processAllAvailable()
      assert(stateVersion(stateDir) == verBefore,
        "empty trigger bumped the canonical state version")
    } finally q.stop()
    assert(TableIO.verifyCommits(spark, dir, buckets).isEmpty)
    // state advanced once per non-empty micro-batch (bootstrap + 2)
    assert(stateVersion(stateDir) == 3L)
  }

  private def stateVersion(stateDir: String): Long = {
    val conf = spark.sessionState.newHadoopConf()
    val p = new org.apache.hadoop.fs.Path(stateDir + "/_current")
    val in = p.getFileSystem(conf).open(p)
    val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
              finally in.close()
    """"version"\s*:\s*(\d+)""".r.findFirstMatchIn(txt).get.group(1).toLong
  }
}
