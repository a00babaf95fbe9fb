package graft.core

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based pinning of the core codecs (SURVEY.md §5.2).
  * Plain ScalaCheck generators sampled deterministically (the
  * scalatestplus bridge is not in the offline cache).
  */
class PropertySpec extends AnyFunSuite {

  /** Deterministic forAll: 200 samples from fixed seeds. */
  private def forAll[A](g: Gen[A])(body: A => Unit): Unit =
    (0 until 200).foreach { i =>
      g.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(body)
    }

  private val word: Gen[String] =
    Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString).map(_.take(8))

  private val neType: Gen[String] =
    Gen.oneOf("a", "b", "c", "x.y", "x.z")

  /** Well-formed NE forests with nesting depth <= 3; every node has at
    * least one leaf descendant.
    */
  private def tree(depth: Int): Gen[NeTree] =
    if (depth == 0) word.map(NeLeaf.apply)
    else Gen.frequency(
      3 -> word.map(NeLeaf.apply),
      2 -> (for {
        t <- neType
        n <- Gen.choose(1, 3)
        kids <- Gen.listOfN(n, tree(depth - 1))
      } yield NeNode(t, kids)))

  private val forest: Gen[List[NeTree]] =
    Gen.choose(1, 6).flatMap(n => Gen.listOfN(n, tree(3)))

  test("IOB decode . encode = identity on well-formed forests") {
    forAll(forest) { f =>
      assert(Iob.decodeForest(Iob.encodeForest(f)) == f)
    }
  }

  test("ENAMEX parse . render = identity") {
    forAll(forest) { f =>
      assert(Forest.parseEnamex(Forest.renderEnamex(f)) == f)
    }
  }

  test("span conversion roundtrips") {
    forAll(forest) { f =>
      val (toks, spans) = Forest.toSpans(f)
      assert(Forest.fromSpans(toks, spans) == f)
    }
  }

  test("sync onto the identical tokenization is identity") {
    forAll(forest) { f =>
      val toks = f.flatMap(_.leaves).toVector
      assert(Forest.sync(f, toks) == f)
    }
  }

  test("sync preserves total non-space text") {
    forAll(forest) { f =>
      val toks = f.flatMap(_.leaves).toVector
      // arbitrary re-tokenization: join everything, split every 3 chars
      val joined = toks.mkString
      val newToks = joined.grouped(3).toVector
      val synced = Forest.sync(f, newToks)
      assert(synced.flatMap(_.leaves).mkString == joined)
    }
  }

  test("decodeForest never throws on arbitrary label sequences (repair)") {
    val atom = for {
      b <- Gen.oneOf(true, false)
      t <- neType
    } yield Iob.Atom(b, t)
    val labeled = Gen.nonEmptyListOf(for {
      w <- word
      l <- Gen.choose(0, 3).flatMap(n => Gen.listOfN(n, atom))
    } yield (w, l))
    forAll(labeled) { seq =>
      val f = Iob.decodeForest(seq)
      assert(f.flatMap(_.leaves) == seq.map(_._1))
    }
  }

  test("forward-backward marginals sum to 1 for random tiny models") {
    import breeze.linalg.{DenseMatrix, DenseVector}
    val weights = Gen.choose(-2.0, 2.0)
    val gen = for {
      l <- Gen.choose(2, 4)
      sing <- Gen.listOfN(l, weights)
      trans <- Gen.listOfN(l * l, weights)
      obsW <- Gen.listOfN(l, weights)
      n <- Gen.choose(1, 6)
      obsAt <- Gen.listOfN(n, Gen.oneOf(true, false))
    } yield (l, sing, trans, obsW, obsAt)
    forAll(gen) { case (l, sing, trans, obsW, obsAt) =>
      val m = Crf.Model(
        labels = Array.tabulate(l)(i => s"L$i"),
        obsIds = Array(Map("o" -> 0)),
        sing = DenseVector(sing.toArray),
        trans = new DenseMatrix(l, l, trans.toArray),
        obsLabels = Array(Array.tabulate(l)(identity)),
        obsWeights = Array(obsW.toArray))
      val sent = obsAt.map { has =>
        new Features.PosObs(if (has) Array(0) else Array.empty[Int],
          if (has) Array("o") else Array.empty[String])
      }.toArray
      val os = m.obsScores(sent)
      val (a, b, logZ) = Crf.forwardBackward(m, os)
      for (k <- sent.indices) {
        val s = (0 until l).map(y => math.exp(a(k)(y) + b(k)(y) - logZ)).sum
        assert(math.abs(s - 1.0) < 1e-8)
      }
      // viterbi path score >= 30 random paths
      val vPath = m.viterbi(sent)
      def score(p: Seq[Int]): Double = {
        var s = m.sing(p.head) + os(0)(p.head)
        for (k <- 1 until p.length) s += m.trans(p(k - 1), p(k)) + os(k)(p(k))
        s
      }
      val best = score(vPath.toSeq)
      val rnd = new scala.util.Random(42)
      for (_ <- 1 to 30)
        assert(score(Seq.fill(sent.length)(rnd.nextInt(l))) <= best + 1e-9)
    }
  }

  // ---- XCES splice: group insertion never disturbs other bytes ----

  private val xcesToken: Gen[String] = for {
    w <- word
    id <- Gen.choose(0, 999)
    lex <- Gen.oneOf("", s"<lex disamb='1'><base>$w</base></lex>")
    ns <- Gen.oneOf("", "<ns/>")
  } yield s"""$ns<tok id="t$id"><orth>$w</orth>$lex</tok>"""

  private val xcesBody: Gen[String] = for {
    n <- Gen.choose(1, 8)
    toks <- Gen.listOfN(n, xcesToken)
    extra <- Gen.oneOf("", "<free attr=\"kept\"/>", "<!-- note -->")
    sep <- Gen.oneOf("", "\n", " ")
  } yield toks.mkString(sep) + extra

  /** Forests that may contain CHILDLESS NE nodes — Forest.toSpans emits
    * zero-width (begin == end) spans for them, the case the splicer must
    * nest by depth rather than through the open/close maps.
    */
  private def treeZ(depth: Int): Gen[NeTree] =
    if (depth == 0) word.map(NeLeaf.apply)
    else Gen.frequency(
      3 -> word.map(NeLeaf.apply),
      1 -> neType.map(t => NeNode(t, Nil)), // childless -> zero-width span
      2 -> (for {
        t <- neType
        n <- Gen.choose(1, 3)
        kids <- Gen.listOfN(n, treeZ(depth - 1))
      } yield NeNode(t, kids)))

  private val forestZ: Gen[List[NeTree]] =
    Gen.choose(1, 5).flatMap(n => Gen.listOfN(n, treeZ(3)))
      // at least one token, or there is no body to splice into
      .suchThat(f => f.exists(_.leaves.nonEmpty))

  test("spliceGroups: spans from any forest (incl. zero-width) splice well-formed") {
    forAll(forestZ) { f =>
      val (toks, spans) = Forest.toSpans(f)
      val body = toks.zipWithIndex.map { case (w, i) =>
        s"""<tok id="t$i"><orth>${Xces.escapeXml(w)}</orth></tok>"""
      }.mkString(" ")
      val out = Xces.spliceGroups(body, spans)
      // stripping every inserted group restores the body byte-identically
      val stripped = out
        .replaceAll("<group type=\"NE\" subtype=\"[^\"]*\">", "")
        .replace("</group>", "")
      assert(stripped == body)
      // group tags are BALANCED and PROPERLY NESTED (depth never dips
      // below zero, ends at zero) — the round-3 zero-width bug emitted a
      // close before its open
      var d = 0
      "<group |</group>".r.findAllIn(out).foreach { m =>
        d += (if (m == "</group>") -1 else 1)
        assert(d >= 0, s"close before open in:\n$out")
      }
      assert(d == 0, s"unbalanced groups in:\n$out")
      // token stream unchanged
      assert(Xces.parseBody(out).toks.map(_.orth) == toks)
    }
  }

  test("spliceGroups: stripping inserted groups restores the body byte-identically") {
    forAll(xcesBody) { body =>
      val sent = Xces.parseBody(body)
      val n = sent.toks.length
      if (n >= 2) {
        // a nested pair of spans over arbitrary token ranges
        val spans = Seq(Span("x.y", 0, n, 0), Span("a", n / 2, n, 1))
        val out = Xces.spliceGroups(body, spans)
        val stripped = out
          .replaceAll("<group type=\"NE\" subtype=\"[^\"]*\">", "")
          .replace("</group>", "")
        assert(stripped == body)
        // balance
        assert("<group".r.findAllIn(out).size ==
          "</group>".r.findAllIn(out).size)
        // re-parsing the annotated body yields the same token stream
        assert(Xces.parseBody(out).toks == sent.toks)
      }
    }
  }
}
