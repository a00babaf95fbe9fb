package graft.tools

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Per-job wall/task-time profile of one query (dev tool, r7): runs a
  * named SparkEntry query twice (warm second) and prints every job's
  * duration, stage count and task time — the "which action eats it"
  * view Bench's single number hides.
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q83_entity_rank")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    graft.KgMain.model
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    case class S(id: Int, name: String, details: String, var tasks: Int = 0,
                 var taskMs: Long = 0L)
    val stages = new java.util.concurrent.ConcurrentHashMap[Int, S]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageSubmitted(e: SparkListenerStageSubmitted): Unit =
        stages.put(e.stageInfo.stageId,
          S(e.stageInfo.stageId, e.stageInfo.name,
            e.stageInfo.details.linesIterator
              .filter(l => l.contains("graft") || l.contains("Dataset"))
              .take(3).mkString(" | ")))
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
        Option(stages.get(e.stageId)).foreach { s =>
          s.tasks += 1
          if (e.taskMetrics != null)
            s.taskMs += e.taskMetrics.executorRunTime
        }
    })

    val fn = graft.SparkEntry.queries(name)
    def run(tag: String): Unit = {
      graft.queries.PipelineQueries.releaseAll(spark)
      graft.pipeline.Graph.releaseAllRanks(spark)
      stages.clear()
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val secs = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500)
      import scala.jdk.CollectionConverters._
      val ss = stages.values.asScala.toSeq.sortBy(_.id)
      println(f"== $tag $name total=$secs%.2f s, ${ss.size} stages, " +
        f"sumTask=${ss.map(_.taskMs).sum / 1e3}%.1f s")
      ss.filter(_.taskMs > 2000).foreach { s =>
        println(f"  stage ${s.id}%4d tasks=${s.tasks}%4d taskTime=${s.taskMs / 1e3}%8.2f s  ${s.name.take(60)}")
        println(s"        ${s.details.take(300)}")
      }
    }
    run("cold"); run("warm")
    spark.stop()
  }
}
