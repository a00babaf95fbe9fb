package graft.functions

import graft.core.Features
import graft.pipeline.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ShapeExprSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  val words = Seq("McKay-3", "HELLO", "abc123", "..", "ŹdźBło9", "x")

  test("native expression matches the core function (Column API)") {
    import spark.implicits._
    val df = words.toDF("w")
      .select(col("w"),
        ShapeFunctions.ner_shape(col("w")).as("s"),
        ShapeFunctions.ner_packed_shape(col("w")).as("p"))
    df.collect().foreach { r =>
      val w = r.getString(0)
      assert(r.getString(1) == Features.shape(w))
      assert(r.getString(2) == Features.pack(Features.shape(w)))
    }
  }

  test("registered SQL functions work and survive codegen") {
    import spark.implicits._
    ShapeFunctions.register(spark)
    words.toDF("w").createOrReplaceTempView("words_t")
    val rows = spark.sql(
      "SELECT w, ner_shape(w) AS s, ner_packed_shape(w) AS p FROM words_t")
      .collect()
    rows.foreach { r =>
      assert(r.getString(1) == Features.shape(r.getString(0)))
      assert(r.getString(2) == Features.pack(Features.shape(r.getString(0))))
    }
    // null-safety
    val n = spark.sql("SELECT ner_shape(CAST(NULL AS STRING)) AS s").collect()
    assert(n.head.isNullAt(0))
  }

  test("expression participates in codegen over a real table scan") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val out = docs.select(ShapeFunctions.ner_packed_shape(col("text")).as("p"))
      .groupBy("p").count().collect()
    assert(out.nonEmpty)
  }
}
