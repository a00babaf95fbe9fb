package graft.queries

import graft.pipeline.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Quality gates on the ANN scale paths (q46/q49) against the driver's
  * sf0.001 embeddings table: the coarse quantizer must produce balanced
  * cells, the in-cell search must recover most of the brute-force
  * neighbors, and results must be deterministic across invocations.
  */
class AnnSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val dir = "/root/testdata/sf0.001"
  def available: Boolean = new java.io.File(s"$dir/embeddings.parquet").exists()

  private def vectors(): Array[(Long, Array[Float])] = {
    import spark.implicits._
    spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect()
  }

  private def cosine(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < math.min(a.length, b.length)) {
      dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
      nb += b(i).toDouble * b(i); i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Brute-force top-k neighbor ids per probe (the oracle). */
  private def bruteTopK(vs: Array[(Long, Array[Float])], k: Int)
      : Map[Long, Set[Long]] = {
    val probes = vs.filter(_._1 < 20)
    probes.map { case (qid, q) =>
      qid -> vs.filter(_._1 != qid)
        .map { case (id, v) => (id, cosine(q, v)) }
        .sortBy { case (id, c) => (-c, id) }.take(k).map(_._1).toSet
    }.toMap
  }

  test("IVF quantizer: k-means cells are populated and balanced") {
    assume(available)
    val vs = vectors()
    val vecsDf = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val cent = PipelineQueries.ivfCentroids(vecsDf, nCells = 8)
    assert(cent.length == 8)
    val sizes = vs.groupBy { case (_, v) =>
      PipelineQueries.nearestCell(cent, v) }.map(_._2.length)
    assert(sizes.size == 8, s"empty cells: only ${sizes.size} populated")
    val mean = vs.length.toDouble / 8
    assert(sizes.max <= 2 * mean,
      s"skewed cells: max=${sizes.max} vs mean=$mean")
  }

  test("IVF ANN recall@3 vs brute force on the probe set") {
    assume(available)
    val brute = bruteTopK(vectors(), 3)
    val got = PipelineQueries.q49_ann_ivf(spark, dir)
      .collect()
      .groupBy(_.getAs[Long]("q_id"))
      .map { case (q, rows) => q -> rows.map(_.getAs[Long]("vec_id")).toSet }
    val hits = brute.toSeq.map { case (q, want) =>
      got.getOrElse(q, Set.empty).intersect(want).size }.sum
    val recall = hits.toDouble / brute.map(_._2.size).sum
    info(f"IVF recall@3 = $recall%.3f")
    // kmeans++ seeding (round 3) lifted this from 0.65; gate at 0.8
    assert(recall >= 0.8, f"IVF recall@3 $recall%.3f below 0.8")
  }

  test("LSH ANN recall@3 vs brute force on the probe set") {
    assume(available)
    val brute = bruteTopK(vectors(), 3)
    val got = PipelineQueries.q46_ann_lsh(spark, dir)
      .collect()
      .groupBy(_.getAs[Long]("q_id"))
      .map { case (q, rows) => q -> rows.map(_.getAs[Long]("vec_id")).toSet }
    val hits = brute.toSeq.map { case (q, want) =>
      got.getOrElse(q, Set.empty).intersect(want).size }.sum
    val recall = hits.toDouble / brute.map(_._2.size).sum
    info(f"LSH recall@3 = $recall%.3f")
    assert(recall >= 0.8, f"LSH recall@3 $recall%.3f below 0.8")
  }

  test("q44 banded self-join reuses the signature exchange (one upstream pass)") {
    assume(new java.io.File(s"$dir/documents.parquet").exists())
    val df = PipelineQueries.q44_minhash_pairs(spark, dir)
    df.collect() // AQE: reuse only visible in the final executed plan
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ReusedExchange") || plan.contains("ReusedQueryStage"),
      s"signature pipeline not reused — upstream would run once per join side:\n$plan")
  }

  test("q44 minhash-LSH: exact precision, high recall vs brute-force Jaccard") {
    // gate on the CORRECTNESS-run scale (sf0.01), per VERDICT r2 #5
    val qDir = "/root/testdata/sf0.01"
    assume(new java.io.File(s"$qDir/documents.parquet").exists())
    import spark.implicits._
    // brute-force oracle: all pairs with shingle-Jaccard >= 0.5
    val docs = spark.read.parquet(s"$qDir/documents.parquet")
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
    def shingles(t: String): Set[String] = {
      val ws = t.split(" ")
      (0 to math.max(ws.length - 3, 0)).map(i =>
        ws.slice(i, i + 3).mkString(" ")).toSet
    }
    val sh = docs.map { case (id, t) => id -> shingles(t) }
    val truePairs = (for {
      i <- sh.indices.iterator
      j <- (i + 1) until sh.length
      (id1, s1) = sh(i); (id2, s2) = sh(j)
      inter = (s1 & s2).size
      if inter * 2 >= s1.size + s2.size - inter // J >= 0.5
    } yield (math.min(id1, id2), math.max(id1, id2))).toSet
    val got = PipelineQueries.q44_minhash_pairs(spark, qDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // the exact-Jaccard verify step makes precision 1.0 by construction
    assert(got.subsetOf(truePairs), s"false positives: ${got -- truePairs}")
    // banded LSH recall on the near-dup population
    val recall = if (truePairs.isEmpty) 1.0
                 else got.size.toDouble / truePairs.size
    info(f"q44 recall vs brute force = $recall%.3f (${got.size}/${truePairs.size})")
    assert(truePairs.nonEmpty, "gate is vacuous: no true near-dup pairs at this SF")
    assert(recall >= 0.9, f"LSH banding missed too many true pairs: $recall%.3f")
  }

  test("q45 simhash groups match a driver-side brute-force recompute") {
    val qDir = "/root/testdata/sf0.01"
    assume(new java.io.File(s"$qDir/documents.parquet").exists())
    import spark.implicits._
    val docs = spark.read.parquet(s"$qDir/documents.parquet")
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
    // shared primitive only: the engine's xxhash64 per DISTINCT token;
    // the bit-vote aggregation and the grouping are re-derived on the
    // driver, independently of the DataFrame pipeline under test
    val vocab = docs.flatMap(_._2.split(" ", -1)).distinct.toSeq
    val hashOf = vocab.toDF("tok")
      .select(col("tok"), xxhash64(col("tok")).as("h"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    def fingerprint(text: String): Long = {
      val votes = new Array[Long](32)
      text.split(" ", -1).foreach { t =>
        val h = hashOf(t)
        var b = 0
        while (b < 32) {
          votes(b) += (if (((h >> b) & 1L) == 1L) 1 else -1); b += 1
        }
      }
      (0 until 32).map(b => if (votes(b) > 0) 1L << b else 0L).sum
    }
    val want = docs.map { case (id, t) => (fingerprint(t), id) }
      .groupBy(_._1).filter(_._2.length > 1)
      .map { case (fp, members) =>
        val ids = members.map(_._2).sorted
        (fp, ids.length.toLong, ids.head, ids.last, ids.mkString(","))
      }.toSet
    val got = PipelineQueries.q45_simhash(spark, qDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4))).toSet
    assert(want.nonEmpty, "gate is vacuous: no simhash collisions at this SF")
    assert(got == want,
      s"simhash groups diverge from brute force: extra=${got -- want} missing=${want -- got}")
  }

  test("q50 bucketed join plans without a join-side shuffle") {
    assume(new java.io.File(s"$dir/lineitem.parquet").exists())
    val (lt, ot) = RelationalQueries.ensureBucketedTables(spark, dir)
    // join only (the groupBy after it legitimately shuffles its tiny agg)
    val joined = spark.table(lt).hint("merge")
      .join(spark.table(ot), col("l_orderkey") === col("o_orderkey"))
    joined.collect()
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
    assert(!plan.contains("Exchange"),
      s"bucketed join must not shuffle either side:\n$plan")
    // result parity with the unbucketed join
    val viaBuckets = RelationalQueries.q50_bucketed_join(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val plain = spark.read.parquet(s"$dir/lineitem.parquet")
      .join(spark.read.parquet(s"$dir/orders.parquet"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(viaBuckets == plain)
  }

  test("IVF results are deterministic across invocations") {
    assume(available)
    def runOnce() = PipelineQueries.q49_ann_ivf(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(runOnce() == runOnce())
  }
}
