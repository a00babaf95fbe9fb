package graft.tools

import graft.functions.VecFunctions
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Micro-benchmark: native codegen `ner_cosine` vs the SQL-lambda
  * `aggregate(zip_with(...))` formulation it replaced, on the q21
  * all-pairs shape (dev tool). args: [cpus] [nVecs] [trials]
  */
object CosineBench {
  def main(args: Array[String]): Unit = {
    val cpus = args.headOption.getOrElse("8").toInt
    val nVecs = args.lift(1).map(_.toInt).getOrElse(2000)
    val trials = args.lift(2).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // deterministic synthetic vectors, 64-dim (same shape as testdata)
    val vecs = spark.range(nVecs).map { i =>
      val r = new scala.util.Random(i)
      (i, Array.fill(64)(r.nextGaussian().toFloat))
    }.toDF("vec_id", "embedding").cache()
    vecs.count()

    val a = vecs.select(col("vec_id").as("a_id"), col("embedding").as("a_emb"))
    val b = vecs.select(col("vec_id").as("b_id"), col("embedding").as("b_emb"))
    val pairs = a.join(b, col("a_id") < col("b_id"))

    val lambdaCos = {
      val dot = expr(
        "aggregate(zip_with(a_emb, b_emb, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)")
      val nrm = (c: String) => expr(
        s"sqrt(aggregate($c, CAST(0.0 AS DOUBLE), (acc, v) -> acc + CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))")
      dot / (nrm("a_emb") * nrm("b_emb"))
    }
    val nativeCos = VecFunctions.ner_cosine(col("a_emb"), col("b_emb"))

    def time(name: String, c: org.apache.spark.sql.Column): Double = {
      val t0 = System.nanoTime()
      val n = pairs.select(c.as("cos")).where(col("cos") > 0.9).count()
      val s = (System.nanoTime() - t0) / 1e9
      println(f"$name%-8s $s%7.2f s  (matches=$n)")
      s
    }
    // warmup both, then interleave
    time("warm-nat", nativeCos); time("warm-lam", lambdaCos)
    val results = (1 to trials).map(_ => (time("native", nativeCos), time("lambda", lambdaCos)))
    val bestN = results.map(_._1).min
    val bestL = results.map(_._2).min
    println(f"pairs=${nVecs.toLong * (nVecs - 1) / 2}  native=$bestN%.2f s  lambda=$bestL%.2f s  speedup=${bestL / bestN}%.2fx")
    spark.stop()
  }
}
