package graft.plans

import graft.KgMain
import graft.pipeline.{KgPipeline, SparkTestSession}
import org.scalatest.funsuite.AnyFunSuite

/** The custom physical operator must produce EXACTLY the rows of the
  * typed Dataset.flatMap path — same mentions, same fields.
  */
class PlanParitySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  lazy val model = KgMain.model

  private def key(r: org.apache.spark.sql.Row) =
    (r.getAs[String]("repo"), r.getAs[String]("path"),
      r.getAs[String]("commit"), r.getAs[Int]("sentIdx"),
      r.getAs[Int]("begin"), r.getAs[Int]("end"), r.getAs[Int]("depth"),
      r.getAs[String]("neType"), r.getAs[String]("surface"),
      r.getAs[String]("context")).toString

  test("NerMentionsExec rows == Dataset.flatMap rows, field for field") {
    val files = KgPipeline.synthInput(spark, 60, partitions = 3)
    val viaPlan = NerMentions.mentions(spark, files.toDF(), model)
      .collect().map(key).sorted
    val viaFlatMap = KgPipeline.detectMentions(spark, files, model)
      .toDF().collect().map(key).sorted
    assert(viaPlan.nonEmpty)
    assert(viaPlan.toSeq == viaFlatMap.toSeq)
  }

  test("the custom node actually plans through NerMentionsExec") {
    val files = KgPipeline.synthInput(spark, 5, partitions = 1)
    val df = NerMentions.mentions(spark, files.toDF(), model)
    val fired = df.queryExecution.executedPlan.collectFirst {
      case e: NerMentionsExec => e
    }.isDefined
    assert(fired,
      s"strategy did not fire:\n${df.queryExecution.executedPlan}")
  }

  test("downstream aggregation over the custom node is correct (buffer reuse)") {
    import org.apache.spark.sql.functions._
    val files = KgPipeline.synthInput(spark, 40, partitions = 2)
    val viaPlan = NerMentions.mentions(spark, files.toDF(), model)
      .groupBy("neType").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val viaFlatMap = KgPipeline.detectMentions(spark, files, model)
      .toDF().groupBy("neType").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(viaPlan == viaFlatMap)
  }
}
