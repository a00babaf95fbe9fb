package graft.tools

import graft.KgMain
import graft.pipeline.KgPipeline
import graft.plans.NerMentions
import org.apache.spark.sql.SparkSession

/** Micro-benchmark: NER via the custom physical operator
  * (NerMentionsExec, no encoder round-trip) vs the typed
  * Dataset.flatMap path (dev tool). args: [cpus] [nFiles] [trials]
  */
object NerPlanBench {
  def main(args: Array[String]): Unit = {
    val cpus = args.headOption.getOrElse("8").toInt
    val nFiles = args.lift(1).map(_.toLong).getOrElse(24000L)
    val trials = args.lift(2).map(_.toInt).getOrElse(3)
    KgMain.model
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def files = KgPipeline.synthInput(spark, nFiles, partitions = cpus * 2)
    def timePlan(): Double = {
      val t0 = System.nanoTime()
      val n = NerMentions.mentions(spark, files.toDF(), KgMain.model).count()
      val s = (System.nanoTime() - t0) / 1e9
      println(f"plan    $s%6.2f s  ($n mentions)"); s
    }
    def timeFlatMap(): Double = {
      val t0 = System.nanoTime()
      val n = KgPipeline.detectMentions(spark, files, KgMain.model).count()
      val s = (System.nanoTime() - t0) / 1e9
      println(f"flatMap $s%6.2f s  ($n mentions)"); s
    }
    timePlan(); timeFlatMap() // warmup
    val r = (1 to trials).map(_ => (timePlan(), timeFlatMap()))
    val bp = r.map(_._1).min; val bf = r.map(_._2).min
    println(f"files=$nFiles cpus=$cpus  plan=$bp%.2f s  flatMap=$bf%.2f s  speedup=${bf / bp}%.2fx")
    spark.stop()
  }
}
