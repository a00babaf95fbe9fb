package graft.tools

import graft.KgMain
import graft.core._

/** Phase split of the per-sentence NER kernel (dev tool, r7): times
  * tokenize / schematize / obsScores / viterbi / decode separately over
  * the same synthetic sentences, single-threaded, to show which phase
  * the 100-TB-corpus hot loop actually spends its cycles in.
  */
object NerKernelBench {
  def main(args: Array[String]): Unit = {
    val nSents = args.headOption.map(_.toInt).getOrElse(50000)
    val model = KgMain.model
    val r = new scala.util.Random(7)
    val sents = Vector.fill(nSents)(
      Synth.sentence(r).flatMap(_.leaves).mkString(" "))

    def time[A](name: String, reps: Int)(f: => A): A = {
      var out: A = f // warm
      val t0 = System.nanoTime()
      var i = 1
      while (i < reps) { out = f; i += 1 }
      println(f"$name%-12s ${(System.nanoTime() - t0) / 1e9}%7.3f s " +
        f"(${reps - 1} reps)")
      out
    }

    // full pipeline twice for JIT
    sents.take(5000).foreach(model.ner)

    val toks = time("tokenize", 3)(sents.map(Tokenizer.tokenize))
    val obs = time("schematize", 3)(
      toks.map(t => Features.schematize(model.schema, t)))
    val scored = time("obsScores", 3)(obs.map(o => model.crf.obsScores(o)))
    val paths = time("viterbi", 3)(obs.map(o => model.crf.viterbi(o)))
    val parsed = model.crf.parsedLabels
    val dec = time("decode", 3)(toks.zip(paths).map { case (t, p) =>
      Iob.decodeForest(t.zip(p.map(parsed)))
    })
    val full = time("full ner", 3)(sents.map(model.ner))
    println(s"sanity: ${scored.length} ${dec.length} ${full.length}")
  }
}
