package graft

import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.queries.{RelationalQueries, PipelineQueries}
import graft.pipeline.KgPipeline

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship: end-to-end KG triples over the synthesized repo table
    * (BASELINE.json north_rule); driver smoke-checks rows > 0.
    */
  def entry(spark: SparkSession): DataFrame = {
    val files = KgPipeline.synthInput(spark, 80L, partitions = 4)
    KgPipeline.run(spark, files, KgMain.model).triples
  }

  /** One entry per implemented operator from SURVEY.md §2 (+ the
    * training-data-pipeline operators): oracle-checked relational
    * renditions plus rows-only CRF/LSH queries.
    */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.all.map { case (k, (fn, _)) => k -> fn } ++
      PipelineQueries.all

  /** DuckDB-runnable oracle SQL for every SQL-expressible query (same
    * column names as the Spark side; see RelationalQueries scaladoc for
    * the value-parity rules).
    */
  def oracleSql: Map[String, String] =
    RelationalQueries.all.map { case (k, (_, sql)) => k -> sql }
}
