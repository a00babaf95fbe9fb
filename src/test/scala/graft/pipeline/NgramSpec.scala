package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Gates on the stupid-backoff bigram LM ([[Ngram]], Brants et al.
  * 2007): exact closed-form scores on a hand fixture (both the seen-
  * bigram and both backoff branches), hashed-key scoring row-parity
  * with the text-keyed oracle rendition on real data, and the scale
  * gate — in hashed mode no scoring exchange carries a string.
  */
class NgramSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val dir = "/root/testdata/sf0.01"
  def available: Boolean =
    new java.io.File(s"$dir/documents.parquet").exists()

  test("closed-form scores: seen bigram, unseen bigram, OOV word") {
    assume(available)
    import spark.implicits._
    // train corpus: "a b" x3, "b c" x1 -> N = 8 tokens
    // uni: a=3, b=4, c=1; bi: (a,b)=3, (b,c)=1
    val train = Seq("a b", "a b", "a b", "b c").zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val lm = Ngram.train(train, "text")
    assert(lm.nTokens == 8L)
    // scored docs: seen bigram (a,b): s = 3/3 = 1
    //              unseen bigram (c,a): s = 0.4 * c1(a)/N = 0.4*3/8 = 0.15
    //              OOV next word (a,z): s = 0.4 * 1/N = 0.05
    val docs = Seq((100L, "a b"), (101L, "c a"), (102L, "a z"))
      .toDF("doc_id", "text")
    for (hashed <- Seq(true, false)) {
      val got = Ngram.scoreDocs(docs, "doc_id", "text", lm,
        hashedKeys = hashed)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2),
          r.getDouble(3))).toMap
      assert(got(100L)._1 == 1L && got(100L)._2 == 0.0 &&
        got(100L)._3 == 1.0, s"seen bigram (hashed=$hashed): ${got(100L)}")
      val lp101 = math.log(0.4 * 3.0 / 8)
      assert(math.abs(got(101L)._2 - BigDecimal(lp101).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9,
        s"backoff branch (hashed=$hashed): ${got(101L)}")
      val lp102 = math.log(0.4 * 1.0 / 8)
      assert(math.abs(got(102L)._2 - BigDecimal(lp102).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9,
        s"OOV floor (hashed=$hashed): ${got(102L)}")
    }
  }

  test("single-token and NULL docs are dropped; training skips NULLs") {
    import spark.implicits._
    val docs = Seq((0L, Option("a b")), (1L, Option("solo")),
      (2L, Option.empty[String])).toDF("doc_id", "text")
    val lm = Ngram.train(docs, "text")
    assert(lm.nTokens == 3L)
    val got = Ngram.scoreDocs(docs, "doc_id", "text", lm)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got == Set(0L), s"expected only the 2-token doc: $got")
  }

  test("hashed-key scoring is row-identical to the text-keyed rendition") {
    assume(available)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val lm = Ngram.train(docs.where(col("doc_id") % 3 =!= 0), "text")
    def rows(hashed: Boolean) =
      Ngram.scoreDocs(docs, "doc_id", "text", lm, hashedKeys = hashed)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
          r.getDouble(3))).toSet
    val text = rows(false)
    val hash = rows(true)
    assert(text.nonEmpty)
    assert(hash == text,
      s"hashed diverged: extra=${hash.diff(text).take(3)} " +
        s"missing=${text.diff(hash).take(3)}")
  }

  test("scoreDocsN(n=2) is row-identical to the oracled bigram operator") {
    assume(available)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val lm2 = Ngram.train(docs.where(col("doc_id") % 3 === 0), "text")
    val lmN = Ngram.trainN(docs.where(col("doc_id") % 3 === 0), "text", 2)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3))).toSet
    val a = rows(Ngram.scoreDocs(docs, "doc_id", "text", lm2))
    val b = rows(Ngram.scoreDocsN(docs, "doc_id", "text", lmN))
    assert(a.nonEmpty)
    assert(b == a, s"order-2 cascade diverged: extra=${(b -- a).take(3)} " +
      s"missing=${(a -- b).take(3)}")
  }

  test("order-3 cascade equals a driver recompute (truncation, backoff, OOV)") {
    assume(available)
    import spark.implicits._
    // trained on two docs; scored docs hit: full trigram, bigram
    // backoff, unigram backoff, OOV floor, and the doc-initial
    // truncated position
    val train = Seq((0L, "a b c d"), (1L, "b c d e")).toDF("doc_id", "text")
    val lm = Ngram.trainN(train, "text", 3)
    val score = Seq((10L, "a b c"), (11L, "c a b"), (12L, "a z b"),
      (13L, "b c"))
      .toDF("doc_id", "text")
    val got = Ngram.scoreDocsN(score, "doc_id", "text", lm)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    // driver recompute with string-keyed maps
    val tabs = (1 to 3).map(k => train.collect().flatMap(r =>
      Decontam.shinglesOf(r.getString(1), k)).groupBy(identity)
      .map { case (g, o) => g -> o.length.toLong })
    val N = 8.0
    def s1(w: String) = 0.4 * math.max(tabs(0).getOrElse(w, 0L), 1L) / N
    def sc(pos: Seq[String], kmax: Int): Double = {
      // pos = the up-to-3 tokens ending at the scored position
      val w = pos.last
      val avail = math.min(kmax, pos.length)
      def branch(k: Int): Option[Double] = {
        val gram = pos.takeRight(k).mkString(" ")
        val ctx = pos.takeRight(k).dropRight(1).mkString(" ")
        for {
          c <- tabs(k - 1).get(gram)
          cc <- tabs(k - 2).get(ctx)
        } yield math.pow(0.4, (avail - k).toDouble) * c.toDouble / cc
      }
      (avail to 2 by -1).view.flatMap(branch).headOption
        .getOrElse(math.pow(0.4, (avail - 1).toDouble) *
          math.max(tabs(0).getOrElse(w, 0L), 1L) / N)
    }
    def docScore(text: String): (Long, Double) = {
      val ws = text.split(" ", -1)
      val scores = (2 to ws.length).map { i =>
        sc(ws.slice(math.max(0, i - 3), i).toSeq, math.min(3, i))
      }
      val lp = scores.map(math.log).sum / scores.length
      (scores.length.toLong,
        BigDecimal(lp).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    Seq((10L, "a b c"), (11L, "c a b"), (12L, "a z b"), (13L, "b c"))
      .foreach { case (id, text) =>
        val (wantN, wantLp) = docScore(text)
        val (gotN, gotLp) = got(id)
        assert(gotN == wantN, s"doc $id positions: $gotN != $wantN")
        assert(math.abs(gotLp - wantLp) < 1e-9,
          s"doc $id ('$text'): got $gotLp, want $wantLp")
      }
  }

  test("saveLm/loadLm roundtrip scores identically; foreign dirs fail loudly") {
    assume(available)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .limit(100)
    val lm = Ngram.train(docs, "text")
    val base = java.nio.file.Files.createTempDirectory("graft_lm").toString
    Ngram.saveLm(lm, s"$base/lm")
    val back = Ngram.loadLm(spark, s"$base/lm")
    assert(back.nTokens == lm.nTokens)
    def rows(m: Ngram.Lm) =
      Ngram.scoreDocs(docs, "doc_id", "text", m).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
          r.getDouble(3))).toSet
    assert(rows(back) == rows(lm))
    val ex = intercept[IllegalArgumentException](
      Ngram.loadLm(spark, s"$base/nowhere"))
    assert(ex.getMessage.contains("not a graft LM directory"))
    // re-save over the same dir (exercises the drop-old-meta-first
    // crash-window ordering): the loaded model must be the NEW one
    val docs2 = spark.read.parquet(s"$dir/documents.parquet")
      .where(col("doc_id") % 2 === 0).limit(80)
    val lm2 = Ngram.train(docs2, "text")
    Ngram.saveLm(lm2, s"$base/lm")
    val back2 = Ngram.loadLm(spark, s"$base/lm")
    assert(back2.nTokens == lm2.nTokens && back2.nTokens != lm.nTokens)
    assert(rows(back2) != rows(lm), "re-save must replace the model")
  }

  test("hashed-mode scoring shuffles no strings once the LM is materialized") {
    assume(available)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val lm0 = Ngram.train(docs.where(col("doc_id") % 3 =!= 0), "text")
    // TRAINING legitimately shuffles distinct-gram strings once (the
    // model IS a string-keyed table); the scale claim is about SCORING
    // against a materialized model, so pin the count tables the way a
    // production job persists/buckets them before repeated scoring
    val lm = Ngram.Lm(lm0.unigrams.cache(), lm0.bigrams.cache(), lm0.nTokens)
    lm.unigrams.count(); lm.bigrams.count()
    val df = Ngram.scoreDocs(docs, "doc_id", "text", lm)
    try {
      df.write.format("noop").mode("overwrite").save()
      // assert while the cache is live: queryExecution plans lazily,
      // and an unpersist-first ordering would re-plan WITHOUT the
      // cache and re-derive training inside the asserted plan
      import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
      import org.apache.spark.sql.types.StringType
      val stringShuffles = graft.plans.PlanInspector
        .allNodes(df.queryExecution.executedPlan)
        .collect { case s: ShuffleExchangeExec => s }
        .filter(_.output.exists(_.dataType == StringType))
      assert(stringShuffles.isEmpty,
        s"scoring exchanges must carry only hashed keys:\n" +
          stringShuffles.map(_.output.mkString(", ")).mkString("\n"))
    } finally { lm.unigrams.unpersist(); lm.bigrams.unpersist() }
  }
}
