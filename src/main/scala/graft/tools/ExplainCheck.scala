package graft.tools

import graft.KgMain
import graft.core.Synth
import graft.pipeline.KgPipeline
import graft.queries.RelationalQueries
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Physical-plan hygiene check (dev tool): asserts parquet filter
  * pushdown, column pruning, broadcast joins where intended, and prints
  * whole-stage-codegen span counts for the key queries.
  */
object ExplainCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    var failures = 0

    def plan(name: String, df: DataFrame,
             wantPushed: Boolean = false, wantBhj: Int = -1,
             maxReadCols: Int = -1): Unit = {
      val p = df.queryExecution.executedPlan.toString
      val pushed = "PushedFilters: \\[[^\\]]*\\]".r.findAllIn(p).toList.distinct
      val read = "ReadSchema: [^\\n]*".r.findFirstIn(p).getOrElse("")
      val bhj = p.linesIterator.count(_.contains("BroadcastHashJoin"))
      val smj = p.linesIterator.count(_.contains("SortMergeJoin"))
      val wsc = "WholeStageCodegen".r.findAllIn(p).size
      val nReadCols = "ReadSchema: struct<([^>]*)>".r.findFirstMatchIn(p)
        .map(_.group(1).count(_ == ':')).getOrElse(0)
      println(s"=== $name")
      println(s"  pushed=$pushed")
      println(s"  $read")
      println(s"  bhj=$bhj smj=$smj wholestage=$wsc readCols=$nReadCols")
      if (wantPushed && !pushed.exists(s => s.length > "PushedFilters: []".length)) {
        println(s"  !! FAIL: expected non-empty PushedFilters"); failures += 1
      }
      if (wantBhj >= 0 && bhj < wantBhj) {
        println(s"  !! FAIL: expected >=$wantBhj BroadcastHashJoin"); failures += 1
      }
      if (maxReadCols >= 0 && nReadCols > maxReadCols) {
        println(s"  !! FAIL: read $nReadCols cols, want <=$maxReadCols (pruning)")
        failures += 1
      }
    }

    plan("q01_dict_build", RelationalQueries.q01_dict_build(spark, dir),
      wantPushed = true, maxReadCols = 3)
    plan("q04_broadcast_join", RelationalQueries.q04_broadcast_join(spark, dir),
      wantBhj = 1, maxReadCols = 2)
    plan("q05_range_join", RelationalQueries.q05_range_join(spark, dir),
      wantBhj = 1)
    plan("q12_sha256", RelationalQueries.q12_sha256(spark, dir),
      wantPushed = true, maxReadCols = 2)
    plan("q10_topk", RelationalQueries.q10_topk(spark, dir), maxReadCols = 3)

    val files = KgPipeline.synthInput(spark, 50, partitions = 2)
    val ments = KgPipeline.detectMentions(spark, files, KgMain.model)
    val kb = KgPipeline.kbAliasDf(spark, Synth.knowledgeBase)
    plan("kg_link", KgPipeline.linkMentions(spark, ments, kb), wantBhj = 1)

    println(if (failures == 0) "PLAN CHECK: all OK"
            else s"PLAN CHECK: $failures failures")
    spark.stop()
    if (failures > 0) sys.exit(1)
  }
}
