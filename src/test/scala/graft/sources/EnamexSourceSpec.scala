package graft.sources

import graft.core.{Forest, Synth}
import graft.pipeline.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class EnamexSourceSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def writeCorpus(n: Int, seed: Long): String = {
    val p = java.nio.file.Files.createTempDirectory("enamex").resolve("c.nes")
    java.nio.file.Files.write(p,
      Synth.corpusLines(n, seed).mkString("\n").getBytes("UTF-8"))
    p.toString
  }

  test("reads sentences, tokens and spans") {
    val path = writeCorpus(50, 21)
    val df = spark.read.format("enamex").load(path)
    assert(df.count() == 50)
    val row = df.orderBy("sentence").collect()(0)
    assert(row.getString(0).nonEmpty)
    assert(row.getSeq[String](1).nonEmpty)
    // spans decode to valid nested structure on every row
    df.collect().foreach { r =>
      val toks = r.getSeq[String](1).toVector
      val spans = r.getSeq[org.apache.spark.sql.Row](2).map { s =>
        graft.core.Span(s.getString(0), s.getInt(1), s.getInt(2), s.getInt(3))
      }
      val rebuilt = Forest.fromSpans(toks, spans) // throws if ill-formed
      assert(rebuilt.flatMap(_.leaves) == toks.toList)
    }
  }

  test("matches driver-side parsing exactly") {
    val path = writeCorpus(80, 22)
    val got = spark.read.format("enamex").load(path)
      .select("sentence").collect().map(_.getString(0)).sorted
    val want = Synth.corpusLines(80, 22)
      .map(l => Forest.parseEnamex(l).flatMap(_.leaves).mkString(" "))
      .sorted.toArray
    assert(got.toSeq == want.toSeq)
  }

  test("byte-range splits lose and duplicate nothing") {
    val path = writeCorpus(500, 23)
    val conf = spark.sessionState.newHadoopConf()
    // force many tiny splits via the splitter directly
    val splits = EnamexSource.splits(Seq(path), targetBytes = 1024, conf)
    assert(splits.length > 10, s"expected many splits, got ${splits.length}")
    val lines = splits.flatMap { s =>
      val bl = new ByteLines(s.path, s.start, s.end, conf)
      try Iterator.continually(bl.next()).takeWhile(_ != null).toVector
      finally bl.close()
    }.filter(_.nonEmpty)
    val want = Synth.corpusLines(500, 23)
    assert(lines.size == want.size, "line count drift across splits")
    assert(lines.sorted == want.sorted.toSeq)
  }

  test("multi-path load and file:// URIs work (Hadoop FS API)") {
    val p1 = writeCorpus(30, 31)
    val p2 = writeCorpus(40, 32)
    val df = spark.read.format("enamex").load(p1, p2)
    assert(df.count() == 70, "both paths must contribute")
    val viaUri = spark.read.format("enamex").load("file://" + p1)
    assert(viaUri.count() == 30, "scheme-qualified URI must resolve")
  }

  test("column pruning reaches the reader") {
    val path = writeCorpus(20, 24)
    val df = spark.read.format("enamex").load(path).select("sentence")
    val plan = df.queryExecution.executedPlan.toString
    assert(df.count() == 20)
    assert(plan.contains("sentence"))
    assert(!plan.contains("spans"), s"spans not pruned:\n$plan")
  }

  test("nested-field selection stays correct under nested-schema pruning") {
    // with spark.sql.optimizer.nestedSchemaPruning.enabled (default),
    // Spark may ask the scan for spans:array<struct<begin:int>>; the
    // reader always emits the full 4-field struct, so the scan must
    // re-widen and let Spark project above it — reporting the pruned
    // type while emitting full rows misaligns ordinals (neType read as
    // begin)
    val path = writeCorpus(40, 25)
    val viaNested = spark.read.format("enamex").load(path)
      .select(explode(col("spans.begin")).as("b"))
      .collect().map(_.getInt(0)).sorted
    val viaFull = spark.read.format("enamex").load(path)
      .select(explode(col("spans")).as("s")).select(col("s.begin"))
      .collect().map(_.getInt(0)).sorted
    assert(viaNested.nonEmpty && viaNested.sameElements(viaFull))
    // single nested field through the struct, different ordinal
    val depths = spark.read.format("enamex").load(path)
      .select(explode(col("spans.depth")).as("d"))
      .collect().map(_.getInt(0))
    assert(depths.forall(d => d >= 0 && d < 8), s"garbage depths: ${depths.take(5).toSeq}")
  }
}
