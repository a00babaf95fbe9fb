package graft.tools

import graft.KgMain
import graft.core.Synth

/** Raw thread-pool scaling of the NER closure, no Spark — isolates
  * shared-state contention in the model/feature code (dev tool).
  */
object NerThreadBench {
  def main(args: Array[String]): Unit = {
    val nt = args.headOption.getOrElse("8").toInt
    val nSents = args.lift(1).map(_.toInt).getOrElse(100000)
    // optional: idle SparkSession in this JVM to test environment impact
    if (args.contains("spark"))
      org.apache.spark.sql.SparkSession.builder().master(s"local[$nt]")
        .config("spark.ui.enabled", "false").getOrCreate()
    val model0 = KgMain.model
    // optional java-serialization round trip (mimics broadcast deser)
    val model = if (args.contains("deser")) {
      val bos = new java.io.ByteArrayOutputStream()
      val oos = new java.io.ObjectOutputStream(bos)
      oos.writeObject(model0); oos.close()
      val ois = new java.io.ObjectInputStream(
        new java.io.ByteArrayInputStream(bos.toByteArray))
      ois.readObject().asInstanceOf[graft.NerfModel]
    } else model0
    val r = new scala.util.Random(7)
    val sents = Vector.fill(nSents)(
      Synth.sentence(r).flatMap(_.leaves).mkString(" "))
    // warm
    sents.take(5000).foreach(model.ner)
    val t0 = System.nanoTime()
    val counts = new java.util.concurrent.atomic.AtomicLong()
    val threads = (0 until nt).map { id =>
      val t = new Thread(() => {
        var i = id
        var c = 0L
        while (i < nSents) { c += model.ner(sents(i)).length; i += nt }
        counts.addAndGet(c)
      })
      t.start(); t
    }
    threads.foreach(_.join())
    val secs = (System.nanoTime() - t0) / 1e9
    println(f"$nt threads: $nSents sents in $secs%.2f s = ${nSents / secs}%.0f sents/s (forest nodes=${counts.get()})")
  }
}
