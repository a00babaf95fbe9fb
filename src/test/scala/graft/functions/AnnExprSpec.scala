package graft.functions

import graft.pipeline.{Ann, SparkTestSession}
import graft.queries.VecOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the codegen ANN expressions (`ner_sign_buckets`,
  * `ner_nearest_cell`, `ner_top_cells`) exactly equal to the independent
  * Scala reference kernels they replaced on the hot path — including
  * evaluation THROUGH a Spark plan (codegen), not just interpreted eval.
  */
class AnnExprSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val rnd = new scala.util.Random(7)
  private def randVec(dim: Int): Array[Float] =
    Array.fill(dim)(rnd.nextGaussian().toFloat)

  private val dim = 16
  private val vecs: Seq[(Long, Array[Float])] =
    (0L until 64L).map(id => id -> randVec(dim))
  private val planes: Array[Array[Array[Double]]] =
    Array.fill(6, 5, dim)(rnd.nextGaussian())
  private val cents: Array[Array[Float]] = Array.fill(8)(randVec(dim))

  test("ner_sign_buckets matches the SignLsh reference kernel through codegen") {
    import spark.implicits._
    val got = vecs.toDF("vec_id", "embedding")
      .select(col("vec_id"),
        AnnFunctions.ner_sign_buckets(col("embedding"), planes).as("bks"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
    vecs.foreach { case (id, v) =>
      val want = Ann.SignLsh.buckets(planes, 5, v)
      assert(got(id).toSeq == want.toSeq, s"vec $id")
    }
  }

  test("ner_nearest_cell / ner_top_cells match VecOps through codegen") {
    import spark.implicits._
    val got = vecs.toDF("vec_id", "embedding")
      .select(col("vec_id"),
        AnnFunctions.ner_nearest_cell(col("embedding"), cents).as("cell"),
        AnnFunctions.ner_top_cells(col("embedding"), cents, 3).as("cells"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Int](2))).toList
    got.foreach { case (id, cell, cells) =>
      val v = vecs(id.toInt)._2
      assert(cell == VecOps.nearestCell(cents, v), s"vec $id nearest")
      assert(cells == VecOps.topCells(cents, v, 3), s"vec $id top cells")
      assert(cells.head == cell, s"vec $id: top-1 must equal nearest")
    }
  }

  test("null embedding elements read as 0.0 (defined bucket, no dropped row)") {
    // array<float> with a null element only arises from SQL construction
    val df = spark.sql(
      "SELECT array(cast(1.0 as float), cast(null as float)) AS embedding")
    val zeroed = spark.sql(
      "SELECT array(cast(1.0 as float), cast(0.0 as float)) AS embedding")
    val p2 = Array.fill(2, 2, 2)(0.5)
    def run(d: org.apache.spark.sql.DataFrame) = d.select(
      AnnFunctions.ner_sign_buckets(col("embedding"), p2).as("b"),
      AnnFunctions.ner_nearest_cell(col("embedding"),
        Array(Array(9f, 9f), Array(1f, 0f))).as("c"))
      .collect().map(r => (r.getSeq[Long](0), r.getInt(1))).head
    assert(run(df) == run(zeroed))
  }

  test("type check rejects a non-float-array child at analysis time") {
    import spark.implicits._
    val bad = Seq((1L, Array(1.0, 2.0))).toDF("vec_id", "embedding")
    val ex = intercept[Exception] {
      bad.select(AnnFunctions.ner_sign_buckets(col("embedding"), planes))
        .collect()
    }
    assert(ex.getMessage.contains("ner_sign_buckets") ||
      ex.getMessage.contains("DATATYPE_MISMATCH"), ex.getMessage)
  }
}
