package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Gates on BPE training/encoding ([[Bpe]], Sennrich et al. 2016):
  * the published algorithm on a hand-checkable fixture, distributed
  * training merge-for-merge equal to the driver kernel, encode
  * consistency with training segmentation, decode roundtrip, and the
  * chained-replace equivalence the q76 oracle relies on.
  */
class BpeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val dir = "/root/testdata/sf0.01"
  def available: Boolean =
    new java.io.File(s"$dir/documents.parquet").exists()

  test("trainLocal reproduces the published algorithm on a hand fixture") {
    // Sennrich's worked example shape: 'low'x5 'lower'x2 'newest'x6
    // 'widest'x3. Pair counts, round 1: (e,s) 9, (s,t</w>)... marker
    // included: (t,</w>) 9, (e,s) 9, (s,t) 9 — tie broken
    // lexicographically: (e,s) < (s,t) < (t,</w>).
    val words = Seq(("low", 5L), ("lower", 2L), ("newest", 6L),
      ("widest", 3L))
    val merges = Bpe.trainLocal(words, nMerges = 4)
    assert(merges.take(3) == Seq(("e", "s"), ("es", "t"), ("est", "</w>")),
      s"unexpected merge order: $merges")
    // after est</w>: (l,o) 7 and (o,w) 7 lead — tie-break picks (l,o)
    assert(merges(3) == ("l", "o"), s"merge 4: ${merges(3)}")
  }

  test("minCount stops training before noise merges") {
    val words = Seq(("ab", 1L), ("cd", 1L))
    assert(Bpe.trainLocal(words, nMerges = 10).isEmpty)
    assert(Bpe.trainLocal(words, nMerges = 10, minCount = 1L).nonEmpty)
  }

  test("distributed training equals the driver kernel merge-for-merge") {
    assume(available)
    import spark.implicits._
    val docs = spark.read.parquet(s"$dir/documents.parquet").limit(120)
    val wc = Bpe.wordCounts(docs, "text")
    val local = Bpe.trainLocal(
      wc.as[(String, Long)].collect().toSeq.sortBy(_._1), nMerges = 25)
    val dist = Bpe.trainDistributed(wc, nMerges = 25)
    assert(dist == local,
      s"diverged at merge ${dist.zip(local).indexWhere(p => p._1 != p._2)}:" +
        s" dist=$dist local=$local")
  }

  test("encode with learned ranks reproduces the training segmentation") {
    val words = Seq(("low", 5L), ("lower", 2L), ("newest", 6L),
      ("widest", 3L), ("lowest", 4L))
    val merges = Bpe.trainLocal(words, nMerges = 8)
    val ranks = merges.zipWithIndex.toMap
    // replay training merges on the fixture to get the final states
    var seqs = words.map { case (w, c) => (w, Bpe.baseSymbols(w), c) }
    merges.foreach { case (a, b) =>
      seqs = seqs.map { case (w, s, c) => (w, Bpe.mergePair(s, a, b), c) }
    }
    seqs.foreach { case (w, want, _) =>
      val got = Bpe.encode(w, ranks)
      assert(got.sameElements(want),
        s"'$w': encode ${got.toSeq} != training state ${want.toSeq}")
    }
  }

  test("decode roundtrip: concat(encode(w)) strips back to w") {
    assume(available)
    import spark.implicits._
    val words = Bpe.wordCounts(
      spark.read.parquet(s"$dir/documents.parquet"), "text")
      .as[(String, Long)].collect()
    val merges = Bpe.trainLocal(words.toSeq.sortBy(_._1), nMerges = 30)
    val ranks = merges.zipWithIndex.toMap
    words.foreach { case (w, _) =>
      val dec = Bpe.encode(w, ranks).mkString("")
      assert(dec == w + Bpe.Marker, s"roundtrip broke on '$w': $dec")
    }
  }

  test("q76's chained-replace oracle semantics equal the greedy kernel") {
    assume(available)
    import spark.implicits._
    val merges = Seq(("t", "h"), ("a", "n"), ("th", "e"), ("an", "d"))
    val ranks = merges.zipWithIndex.toMap
    val sep = '\u0001'
    def viaReplace(w: String): Int = {
      var s = w.codePoints().toArray
        .map(cp => new String(Character.toChars(cp)))
        .mkString(sep.toString) + sep + Bpe.Marker
      merges.foreach { case (a, b) => s = s.replace(s"$a$sep$b", a + b) }
      s.split(sep).length
    }
    val words = spark.read.parquet(s"$dir/documents.parquet")
      .select(explode(split(col("text"), " ")).as("w"))
      .where(col("w") =!= "").distinct().as[String].collect()
    assert(words.nonEmpty)
    words.foreach { w =>
      assert(Bpe.encode(w, ranks).length == viaReplace(w),
        s"replace-chain diverged from greedy kernel on '$w'")
    }
  }

  test("encodeDocs tallies match a driver recompute") {
    assume(available)
    val merges = Seq(("t", "h"), ("a", "n"), ("th", "e"), ("an", "d"))
    val ranks = merges.zipWithIndex.toMap
    val docs = spark.read.parquet(s"$dir/documents.parquet").limit(80)
    val got = Bpe.encodeDocs(docs, "doc_id", "text", merges)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val want = docs.select("doc_id", "text").collect().flatMap { r =>
      Option(r.getString(1)).flatMap { t =>
        val ws = t.split(" ", -1).filter(_.nonEmpty)
        if (ws.isEmpty) None
        else Some(r.getLong(0) ->
          (ws.length.toLong, ws.map(Bpe.encode(_, ranks).length.toLong).sum))
      }
    }.toMap
    assert(got == want)
  }
}
