package graft.tools

import graft.KgMain
import graft.core.Synth
import graft.pipeline.KgPipeline
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Bisect the map-stage anti-scaling: run increasing prefixes of the
  * pipeline in a fresh session (dev tool).
  * args: cpus mode(synth|ner|link|linkagg) nFiles
  */
object MicroSpark {
  def main(args: Array[String]): Unit = {
    val cpus = args(0).toInt
    val mode = args(1)
    val nFiles = args.lift(2).map(_.toLong).getOrElse(60000L)
    KgMain.model
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def run(): Long = {
      val files = KgPipeline.synthInput(spark, nFiles, partitions = cpus * 2)
      mode match {
        case "synth" => files.count()
        case "sents" =>
          files.flatMap(f => KgPipeline.sentencesOf(f.lang, f.content)).count()
        case "ner" =>
          KgPipeline.detectMentions(spark, files, KgMain.model).count()
        case "nerraw" =>
          // NER without the Dataset encoder round-trip: count only
          val b = spark.sparkContext.broadcast(KgMain.model)
          files.mapPartitions { it =>
            val m = b.value
            var c = 0L
            it.foreach { f =>
              KgPipeline.sentencesOf(f.lang, f.content).foreach { s =>
                c += m.mentions(s)._2.length
              }
            }
            Iterator.single(c)
          }.reduce(_ + _)
          0L
        case "closure" =>
          // pure closure volume inside Spark tasks, no row plumbing:
          // generate sentences locally per task and NER them
          val b = spark.sparkContext.broadcast(KgMain.model)
          spark.range(0, nFiles * 8, 1, cpus * 2).mapPartitions { it =>
            val m = b.value
            var c = 0L
            it.foreach { i =>
              val r = new scala.util.Random(i)
              val s = Synth.sentence(r).flatMap(_.leaves).mkString(" ")
              c += m.ner(s).length
            }
            Iterator.single(c)
          }.reduce(_ + _)
          0L
        case "link" =>
          val ments = KgPipeline.detectMentions(spark, files, KgMain.model)
          val kb = KgPipeline.kbAliasDf(spark, Synth.knowledgeBase)
          KgPipeline.linkMentions(spark, ments, kb).count()
        case "full" =>
          KgPipeline.run(spark, files, KgMain.model).triples.count()
      }
    }
    run() // warm (JIT + codegen)
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
    val gcBeans = java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
    val cpu0 = osBean.getProcessCpuTime
    val gc0 = gcBeans.stream.mapToLong(_.getCollectionTime).sum
    val t0 = System.nanoTime()
    run()
    val wall = (System.nanoTime() - t0) / 1e9
    val cpuS = (osBean.getProcessCpuTime - cpu0) / 1e9
    val gcMs = gcBeans.stream.mapToLong(_.getCollectionTime).sum - gc0
    println(f"MICRO cpus=$cpus mode=$mode files=$nFiles sec=$wall%.2f procCpu=$cpuS%.1f (=${cpuS / wall}%.1f cores) gc=${gcMs}ms")
    spark.stop()
  }
}
