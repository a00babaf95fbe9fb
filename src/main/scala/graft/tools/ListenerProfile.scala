package graft.tools

import graft.KgMain
import graft.pipeline.KgPipeline
import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession
import scala.collection.mutable

/** Task-metric profile of one end-to-end kgRun: per-stage task counts,
  * total task time, max single-task time (serialization detector).
  */
object ListenerProfile {
  def main(args: Array[String]): Unit = {
    val cpus = args.headOption.getOrElse("32").toInt
    val nFiles = args.lift(1).map(_.toLong).getOrElse(24000L)
    KgMain.model
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    final case class St(var n: Int = 0, var totalMs: Long = 0, var maxMs: Long = 0,
                        var cpuMs: Long = 0, var name: String = "")
    val stages = mutable.LinkedHashMap.empty[Int, St]
    val listener = new SparkListener {
      override def onStageSubmitted(e: SparkListenerStageSubmitted): Unit =
        stages.synchronized {
          stages.getOrElseUpdate(e.stageInfo.stageId, St()).name =
            e.stageInfo.name.take(60)
        }
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = stages.synchronized {
        val s = stages.getOrElseUpdate(e.stageId, St())
        s.n += 1
        val ms = e.taskInfo.duration
        s.totalMs += ms
        s.cpuMs += e.taskMetrics.executorCpuTime / 1000000
        if (ms > s.maxMs) s.maxMs = ms
      }
    }
    spark.sparkContext.addSparkListener(listener)

    // warm
    KgPipeline.run(spark, KgPipeline.synthInput(spark, 2000, partitions = cpus * 2), KgMain.model)
      .triples.count()
    stages.synchronized(stages.clear())

    val t0 = System.nanoTime()
    val n = KgPipeline.run(spark,
      KgPipeline.synthInput(spark, nFiles, partitions = cpus * 2),
      KgMain.model).triples.count()
    val wall = (System.nanoTime() - t0) / 1e9
    Thread.sleep(500)
    println(f"=== cpus=$cpus files=$nFiles triples=$n wall=$wall%.2f s ===")
    var taskSum = 0L; var cpuSum = 0L
    stages.synchronized {
      stages.toSeq.sortBy(-_._2.totalMs).take(20).foreach { case (id, s) =>
        println(f"stage $id%4d tasks=${s.n}%4d total=${s.totalMs}%7d ms cpu=${s.cpuMs}%7d ms max=${s.maxMs}%6d ms  ${s.name}")
      }
      stages.values.foreach { s => taskSum += s.totalMs; cpuSum += s.cpuMs }
    }
    println(f"task time sum: ${taskSum}%d ms; cpu sum: ${cpuSum}%d ms; wall*cpus: ${(wall * cpus * 1000).toLong}%d ms; parallel fraction=${taskSum / 1000.0 / wall / cpus}%.2f")
    spark.stop()
  }
}
