package graft.tools

import graft.KgMain
import graft.core.Synth
import graft.pipeline.KgPipeline
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Per-stage wall-clock profile of the flagship pipeline at one thread
  * count (dev tool; not part of the driver contract).
  */
object StageProfile {
  def main(args: Array[String]): Unit = {
    val cpus = args.headOption.getOrElse("8").toInt
    val nFiles = args.lift(1).map(_.toLong).getOrElse(8000L)
    KgMain.model
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[stage] $name%-18s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    // run twice; report second (warm) pass
    for (pass <- 1 to 2) {
      println(s"--- pass $pass (cpus=$cpus, files=$nFiles) ---")
      val files = KgPipeline.synthInput(spark, nFiles, partitions = cpus * 2)
      time("synth")(files.write.mode("overwrite").format("noop").save())
      val ments = KgPipeline.detectMentions(spark, files, KgMain.model)
      time("ner")(ments.write.mode("overwrite").format("noop").save())
      val kb = KgPipeline.kbAliasDf(spark, Synth.knowledgeBase)
      val linked = KgPipeline.linkMentions(spark, ments, kb)
      time("ner+link")(linked.write.mode("overwrite").format("noop").save())
      val canon = time("canonicalize")(
        KgPipeline.canonicalize(spark, linked, kb).cache())
      time("canon-count")(canon.count())
      val triples = KgPipeline.triples(linked, canon)
      time("full-triples")(println("triples=" + triples.count()))
    }
    spark.stop()
  }
}
