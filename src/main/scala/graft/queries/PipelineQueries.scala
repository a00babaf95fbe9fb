package graft.queries

import graft.core.Synth
import graft.KgMain
import graft.pipeline.KgPipeline
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Queries with no DuckDB-expressible oracle (engine-specific hashes,
  * CRF decoding, LSH bucketing) — the driver records a rows-only check.
  * Determinism across runs/parallelism still holds for all of them.
  */
object PipelineQueries {

  private def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")

  private def emb(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/embeddings.parquet")

  /** Input scale for the synthetic KG pipeline keyed off the SF dir. */
  private def nFilesFor(dir: String): Long =
    if (dir.contains("sf0.1")) 600L
    else if (dir.contains("sf0.01")) 200L
    else 60L

  /** q40–q43 share the same upstream pipeline; memoize per (session,
    * dir) so the query surface doesn't recompute NER four times.
    */
  private val pipelineCache =
    scala.collection.mutable.Map.empty[(SparkSession, String), KgPipeline.Result]

  private def pipelineFor(s: SparkSession, dir: String): KgPipeline.Result =
    pipelineCache.synchronized {
      pipelineCache.getOrElseUpdate((s, dir), {
        val files = KgPipeline.synthInput(s, nFilesFor(dir), partitions = 8)
        val r = KgPipeline.run(s, files, KgMain.model)
        KgPipeline.Result(r.mentions, r.linked.cache(), r.canon,
          r.triples.cache())
      })
    }

  // =================================================================
  // MinHash + LSH near-duplicate detection (scale path for q17)
  // =================================================================

  /** MinHash signatures over distinct 3-gram word shingles (k=16 hash
    * fns via seeded xxhash64), banded 4×4; candidate pairs share a band
    * bucket; final verify by exact shingle-Jaccard >= 0.5. One shuffle
    * per agg + ONE band-bucket self-join — no all-pairs blowup (shingles,
    * not raw tokens: a small vocabulary would otherwise make most pairs
    * collide). Bands are EXPLODED into (band, hash) rows and self-joined
    * once on (band, bucket) instead of unioning one join per band: both
    * join inputs are then the identical plan, so Catalyst's ReuseExchange
    * computes the whole shingle→signature pipeline a single time — with
    * per-band joins the upstream ran once per band per side.
    */
  def q44_minhash_pairs(s: SparkSession, dir: String): DataFrame = {
    val k = 16
    val bands = 4
    val rows = bands // 4 rows per band
    val words = docs(s, dir)
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
    val toks = words
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, greatest(size(ws) - 3, 0)), i -> concat_ws(' ', slice(ws, i + 1, 3)))"))
        .as("tok"))
      .distinct()
    val sig = toks.select(col("doc_id") +:
        (0 until k).map(i => xxhash64(col("tok"), lit(i)).as(s"h$i")): _*)
      .groupBy("doc_id")
      .agg(min(col("h0")).as("m0"),
        (1 until k).map(i => min(col(s"h$i")).as(s"m$i")): _*)
    // one row per (doc, band): band id + the band's bucket hash
    val banded = sig.select(col("doc_id"), explode(array(
        (0 until bands).map { b =>
          struct(lit(b).as("band"),
            xxhash64((b * rows until (b + 1) * rows).map(i => col(s"m$i")): _*)
              .as("bk"))
        }: _*)).as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"), col("bb.bk").as("bk"))
    val candPairs = banded.select(col("doc_id").as("d1"), col("band"), col("bk"))
      .join(banded.select(col("doc_id").as("d2"), col("band"), col("bk")),
        Seq("band", "bk"))
      .where(col("d1") < col("d2"))
      .select("d1", "d2").distinct()
    // exact-Jaccard verification of candidates only
    val sizes = toks.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val shared = candPairs
      .join(toks.withColumnRenamed("doc_id", "d1").withColumnRenamed("tok", "t1"), "d1")
      .join(toks.withColumnRenamed("doc_id", "d2").withColumnRenamed("tok", "t2")
        .withColumnRenamed("t2", "t1"), Seq("d2", "t1"))
      .groupBy("d1", "d2").agg(count(lit(1)).as("shared"))
    shared
      .join(sizes.withColumnRenamed("doc_id", "d1").withColumnRenamed("sz", "sz1"), "d1")
      .join(sizes.withColumnRenamed("doc_id", "d2").withColumnRenamed("sz", "sz2"), "d2")
      .where(col("shared") * 2 >= (col("sz1") + col("sz2") - col("shared")))
      .select(col("d1"), col("d2"), col("shared"))
  }

  // =================================================================
  // SimHash near-dup fingerprinting
  // =================================================================

  /** 32-bit SimHash per document from token hashes; output docs grouped
    * by fingerprint where a collision exists (near/exact dups).
    */
  def q45_simhash(s: SparkSession, dir: String): DataFrame = {
    val toks = docs(s, dir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
    val withBits = toks.withColumn("h", xxhash64(col("tok")))
    val bitCols = (0 until 32).map { b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(1) === 1, 1).otherwise(-1))
        .as(s"b$b")
    }
    val sums = withBits.groupBy("doc_id").agg(bitCols.head, bitCols.tail: _*)
    val fp = sums.select(col("doc_id"),
      (0 until 32).map(b =>
        when(col(s"b$b") > 0, lit(1L) * lit(1L << b)).otherwise(lit(0L)))
        .reduce(_ + _).as("simhash"))
    // Scalar columns only: the driver's rows-only check sorts the result
    // with pandas, which cannot factorize array cells (round-1 q45 err).
    fp.groupBy("simhash").agg(count(lit(1)).as("n_docs"),
        min(col("doc_id")).as("min_doc"), max(col("doc_id")).as("max_doc"),
        concat_ws(",", sort_array(collect_list(col("doc_id")))).as("docs_csv"))
      .where(col("n_docs") > 1)
  }

  // =================================================================
  // LSH-bucketed approximate nearest neighbors (scale path for q20)
  // =================================================================

  /** Multi-table random-hyperplane LSH: `nTables` independent tables of
    * `nBits` sign bits each; a candidate only needs to collide in ONE
    * table, so recall = 1 − (1 − p^bits)^tables where p = 1 − θ/π. One
    * table of many bits has near-zero recall on weakly-clustered
    * embeddings (the standard amplification trade-off); at real scale
    * grow `nBits` with log(corpus) to hold bucket occupancy and keep
    * recall via more tables. Output: per probe vector (vec_id < 20), its
    * candidate-set top-3 by cosine.
    */
  def q46_ann_lsh(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val nBits = 4
    val nTables = 12
    val dim = 64
    // deterministic hyperplanes (seeded, driver-side tiny tensor)
    val rnd = new scala.util.Random(1234)
    val planes = Array.fill(nTables, nBits, dim)(rnd.nextGaussian())
    val bPlanes = s.sparkContext.broadcast(planes)
    val vecs = emb(s, dir).select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])]
    // each vector lands in one bucket per table (L-fold replication —
    // the standard multi-table cost; shuffle key is (table, bucket))
    val bucketed = vecs.flatMap { case (id, v) =>
      val ps = bPlanes.value
      (0 until nTables).map { t =>
        var bucket = 0L
        var b = 0
        while (b < nBits) {
          var dot = 0.0
          var i = 0
          val p = ps(t)(b)
          while (i < math.min(dim, v.length)) { dot += p(i) * v(i); i += 1 }
          if (dot > 0) bucket |= (1L << b)
          b += 1
        }
        (id, t, bucket, v)
      }
    }.toDF("vec_id", "tbl", "bucket", "embedding")
    val probes = bucketed.where(col("vec_id") < 20)
      .select(col("vec_id").as("q_id"), col("tbl"), col("bucket"),
        col("embedding").as("q_emb"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id").orderBy(col("cos").desc, col("vec_id").asc)
    bucketed.join(probes, Seq("tbl", "bucket"))
      .where(col("vec_id") =!= col("q_id"))
      // a pair colliding in several tables must score once
      .dropDuplicates("q_id", "vec_id")
      .withColumn("cos", round(
        graft.functions.VecFunctions.ner_cosine(col("embedding"), col("q_emb")), 6))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= 3)
      .select(col("q_id"), col("rank"), col("vec_id"), col("cos"))
  }

  /** Coarse IVF quantizer: a deterministic seeded sample of the corpus
    * (smallest xxhash64(vec_id) — uniform, partitioning-independent,
    * TakeOrdered so no full sort) + 3 Lloyd k-means iterations on the
    * driver. Sample and centroid set stay broadcast-sized at any corpus
    * scale; only the final assignment pass touches all vectors.
    */
  def ivfCentroids(vecs: DataFrame, nCells: Int,
                   sampleN: Int = 256): Array[Array[Float]] = {
    val s = vecs.sparkSession
    import s.implicits._
    val sample = vecs
      .select(col("vec_id"), col("embedding"),
        xxhash64(col("vec_id"), lit(7)).as("hk"))
      .orderBy(col("hk"), col("vec_id")).limit(sampleN)
      .select(col("vec_id"), col("embedding")).as[(Long, Array[Float])]
      .collect().map(_._2)
    require(sample.nonEmpty, "empty vector table")
    val dim = sample.head.length
    // init = first nCells sample vectors (hash order ≈ random, seeded)
    var cent = sample.take(nCells).map(_.clone)
    for (_ <- 0 until 3) {
      val sums = Array.fill(cent.length)(new Array[Double](dim))
      val cnts = new Array[Int](cent.length)
      sample.foreach { v =>
        val c = VecOps.nearestCell(cent, v)
        cnts(c) += 1
        var i = 0; while (i < v.length) { sums(c)(i) += v(i); i += 1 }
      }
      cent = Array.tabulate(cent.length) { c =>
        if (cnts(c) == 0) cent(c)
        else sums(c).map(x => (x / cnts(c)).toFloat)
      }
    }
    cent
  }

  /** IVF-bucketed approximate nearest neighbors — the second scale path
    * beside LSH (q46): k-means coarse centroids from a seeded sample,
    * assign every vector to its nearest centroid, search within-cell
    * only; probes search their `nprobe` nearest cells (the standard
    * recall lever — corpus-side cost is unchanged, probe-side fans out
    * nprobe-fold). At cluster scale the centroid table stays
    * broadcast-sized and the cell join shuffles once.
    */
  def q49_ann_ivf(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val nCells = 8
    val nProbe = 3
    val vecs = emb(s, dir).select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])]
    val bCent = s.sparkContext.broadcast(ivfCentroids(vecs.toDF(), nCells))
    val bucketed = vecs.map { case (id, v) =>
      (id, VecOps.nearestCell(bCent.value, v), v)
    }.toDF("vec_id", "cell", "embedding")
    val probes = vecs.filter(_._1 < 20).flatMap { case (id, v) =>
      VecOps.topCells(bCent.value, v, nProbe).map(c => (id, c, v))
    }.toDF("q_id", "cell", "q_emb")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id").orderBy(col("cos").desc, col("vec_id").asc)
    bucketed.join(probes, Seq("cell"))
      .where(col("vec_id") =!= col("q_id"))
      .withColumn("cos", round(
        graft.functions.VecFunctions.ner_cosine(col("embedding"), col("q_emb")), 6))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= 3)
      .select(col("q_id"), col("rank"), col("vec_id"), col("cos"))
  }

  // =================================================================
  // Multimodal: opaque payload + typed metadata; decode is a STUB
  // =================================================================

  /** Multimodal column plumbing: payloads as opaque binary with typed
    * metadata, batch-decoded per partition (Scala side of the
    * mapInPandas pattern). The actual media decode is STUBBED with a
    * deterministic fake (no image/audio libs in the sandbox); schema,
    * partitioning and batch shape are real.
    */
  def q47_media_decode(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val payloads = docs(s, dir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
    payloads.mapPartitions { batch =>
      batch.map { case (id, bytes) =>
        // STUB decode: a real implementation would hand `bytes` to an
        // image/audio codec; we derive deterministic fake dimensions.
        val w = 320 + (math.abs(bytes.headOption.getOrElse(0.toByte).toInt) % 4) * 160
        val h = w * 3 / 4
        val frames = 1 + bytes.length % 8
        (id, bytes.length.toLong, w, h, frames)
      }
    }.toDF("doc_id", "n_bytes", "width", "height", "n_frames")
  }

  /** Multimodal frame sampling: one row per sampled frame with typed
    * metadata (timestamp, dimensions, content hash), the flatMap shape a
    * real video pipeline needs — frame count scales the output, the
    * input partitioning carries over, no shuffle. The codec call is
    * STUBBED deterministically (no media libs in the sandbox); the
    * sampling policy (every ~2000 ms, max 8 frames) and schema are real.
    */
  def q48_media_frames(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val payloads = docs(s, dir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
    payloads.mapPartitions { batch =>
      batch.flatMap { case (id, bytes) =>
        // STUB decode: duration/dims derived deterministically from the
        // payload; a real build hands `bytes` to a demuxer here
        // floorMod: math.abs(Int.MinValue) is negative and would emit
        // zero frames for ~1-in-2^32 payloads
        val durationMs = 1000L + java.lang.Math.floorMod(
          scala.util.hashing.MurmurHash3.bytesHash(bytes, 7).toLong, 16000L)
        val w = 320 + (math.abs(bytes.headOption.getOrElse(0.toByte).toInt) % 4) * 160
        val h = w * 3 / 4
        val stepMs = 2000L
        val nFrames = math.min(8L, durationMs / stepMs + 1).toInt
        (0 until nFrames).map { f =>
          val ts = f * stepMs
          // stand-in for the sampled frame's content hash
          val fhash = java.util.Arrays.hashCode(bytes) * 31L + ts
          (id, f, ts, w, h, fhash)
        }
      }
    }.toDF("doc_id", "frame_idx", "ts_ms", "width", "height", "frame_hash")
  }

  // =================================================================
  // KG pipeline over the synthesized repo table (CRF path; rows-only)
  // =================================================================

  def q40_ner_mentions(s: SparkSession, dir: String): DataFrame =
    pipelineFor(s, dir).mentions.toDF()
      .groupBy(col("neType")).agg(count(lit(1)).as("n_mentions"))

  def q41_linked(s: SparkSession, dir: String): DataFrame =
    pipelineFor(s, dir).linked
      .groupBy(substring_index(col("entity_id"), ":", 1).as("kind"))
      .agg(count(lit(1)).as("n_linked"))

  def q42_canonical(s: SparkSession, dir: String): DataFrame =
    pipelineFor(s, dir).canon
      .groupBy(col("canon_id")).agg(count(lit(1)).as("n_merged"))
      .groupBy(col("n_merged")).agg(count(lit(1)).as("n_components"))

  def q43_triples(s: SparkSession, dir: String): DataFrame =
    pipelineFor(s, dir).triples
      .groupBy(col("pred")).agg(count(lit(1)).as("n_triples"),
        countDistinct(col("obj")).as("n_distinct_objects"))

  private[queries] def nearestCell(cs: Array[Array[Float]], v: Array[Float]): Int =
    VecOps.nearestCell(cs, v)

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q40_ner_mentions" -> (q40_ner_mentions _),
    "q41_linked" -> (q41_linked _),
    "q42_canonical" -> (q42_canonical _),
    "q43_triples" -> (q43_triples _),
    "q44_minhash_pairs" -> (q44_minhash_pairs _),
    "q45_simhash" -> (q45_simhash _),
    "q46_ann_lsh" -> (q46_ann_lsh _),
    "q47_media_decode" -> (q47_media_decode _),
    "q48_media_frames" -> (q48_media_frames _),
    "q49_ann_ivf" -> (q49_ann_ivf _))
}

/** Pure vector math, free of any Spark or session state: executor
  * closures reference these without dragging `PipelineQueries` (which
  * holds a SparkSession-keyed cache) into the serialized task.
  */
object VecOps extends Serializable {

  /** Squared-L2 nearest centroid, deterministic first-wins tie-break. */
  def nearestCell(cs: Array[Array[Float]], v: Array[Float]): Int = {
    var best = 0; var bestD = Double.MaxValue
    var c = 0
    while (c < cs.length) {
      var d = 0.0; var i = 0
      val cv = cs(c)
      while (i < math.min(cv.length, v.length)) {
        val diff = cv(i) - v(i); d += diff * diff; i += 1
      }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  /** Indices of the `n` nearest centroids, ascending distance,
    * deterministic index tie-break.
    */
  def topCells(cs: Array[Array[Float]], v: Array[Float], n: Int): Seq[Int] = {
    val ds = cs.indices.map { c =>
      var d = 0.0; var i = 0
      val cv = cs(c)
      while (i < math.min(cv.length, v.length)) {
        val diff = cv(i) - v(i); d += diff * diff; i += 1
      }
      (d, c)
    }
    ds.sortBy(identity).take(n).map(_._2)
  }
}
