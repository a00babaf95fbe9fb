package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

/** Iceberg-style table contract on plain parquet + JSON manifests.
  *
  * The sandbox has no Iceberg runtime jar (SURVEY.md §1.4), so the
  * north-rule requirements — per-partition commit files, checkpoint
  * resume, lineage + counter metrics, snapshot row invariant — are
  * implemented directly: each bucket's commit is a temp-file +
  * atomic-rename JSON manifest carrying row counts and an
  * order-independent content checksum. Swappable for real Iceberg behind
  * these same entry points.
  */
object TableIO {

  // ------------------------------------------------------------------
  // Input snapshot with sha256 invariant column
  // ------------------------------------------------------------------

  /** Write the input table with a `content_sha256` snapshot column
    * (BASELINE.json north_star per-row invariant) + table manifest.
    */
  def writeSnapshot(df: DataFrame, dir: String, snapshotId: String): Unit = {
    val withSha = df.withColumn("content_sha256", sha2(col("content"), 256))
    withSha.write.mode("overwrite").parquet(s"$dir/data")
    val rows = df.sparkSession.read.parquet(s"$dir/data").count()
    val manifest =
      s"""{"snapshot_id":${jstr(snapshotId)},"rows":$rows,"format":"parquet","invariant":"content_sha256"}"""
    atomicWrite(s"$dir/_snapshot.json", manifest)
  }

  /** Re-verify the per-row invariant: rows whose current sha256(content)
    * differs from the snapshot column. Must return 0.
    */
  def verifySnapshot(spark: SparkSession, dir: String): Long =
    spark.read.parquet(s"$dir/data")
      .where(sha2(col("content"), 256) =!= col("content_sha256"))
      .count()

  // ------------------------------------------------------------------
  // Resumable bucketed output (checkpoint per partition)
  // ------------------------------------------------------------------

  final case class BucketCommit(bucket: Int, rows: Long, checksum: Long)

  private def commitPath(dir: String, k: Int) = s"$dir/_commits/bucket-$k.json"

  def committedBuckets(dir: String, buckets: Int): Set[Int] =
    (0 until buckets).filter(k => Files.exists(Paths.get(commitPath(dir, k)))).toSet

  /** Write `df` bucketed by `pmod(hash(bucketCols), buckets)`, committing
    * each bucket atomically (write data → manifest via temp+rename).
    * Buckets with an existing commit manifest are skipped — re-running
    * after a crash resumes exactly where it stopped, and counters are
    * never double-counted (they live in the per-bucket manifest). A
    * resume against manifests recorded under a DIFFERENT lineage fails
    * fast: silently mixing two inputs' buckets into one table is the
    * worst failure mode a resumable writer can have.
    *
    * Skew/parallelism: rows are repartitioned on (_bucket, salt) where
    * the salt is a content hash — `salts` tasks per bucket, so write
    * parallelism is buckets×salts (not capped at the bucket count) and
    * a Zipf-hot key spreads over `salts` tasks. The per-bucket checksum
    * is an XOR fold, so it is independent of the file split.
    *
    * Returns the commits performed in this invocation.
    */
  def writeResumable(df: DataFrame, dir: String, buckets: Int,
                     bucketCols: Seq[String],
                     lineage: Map[String, String] = Map.empty,
                     salts: Int = 8): Seq[BucketCommit] = {
    val spark = df.sparkSession
    Files.createDirectories(Paths.get(s"$dir/_commits"))
    val done = committedBuckets(dir, buckets)
    // resume safety: every existing manifest must carry this lineage
    done.toSeq.sorted.foreach { k =>
      val existing = readLineage(dir, k)
      require(existing == lineage,
        s"resume lineage mismatch on bucket $k: committed=$existing, " +
          s"this run=$lineage — refusing to mix inputs in one table ($dir)")
    }
    val todo = (0 until buckets).filterNot(done)
    if (todo.isEmpty) return Seq.empty
    // Prune already-committed buckets BEFORE any compute, then write every
    // missing bucket in ONE job: shuffle rows to their bucket (salted),
    // sort within, emit as hive partitions with dynamic overwrite so
    // committed partitions on disk are never touched. (Round 1 filtered +
    // rewrote per bucket, re-running the whole upstream DAG `buckets`
    // times — a 100-TB scale-killer flagged in VERDICT r1.)
    val bucketed = df.withColumn("_bucket",
        pmod(hash(bucketCols.map(col): _*), lit(buckets)))
      .where(col("_bucket").isin(todo: _*))
    val saltCol = pmod(xxhash64(df.columns.map(col): _*), lit(salts))
    bucketed
      .repartition(todo.length * salts, col("_bucket"), saltCol)
      .sortWithinPartitions(col("_bucket"), col(bucketCols.head))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("_bucket")
      .parquet(s"$dir/data")
    // Publish per-bucket manifests from the WRITTEN files — reads back only
    // that bucket's parquet, never the upstream DAG. A bucket that received
    // ZERO rows gets no directory from the dynamic partitionBy write; it
    // must still commit (rows=0) or resume would recompute the whole input
    // forever chasing a bucket that can never appear.
    todo.map { k =>
      val path = s"$dir/data/_bucket=$k"
      val c = if (!Files.exists(Paths.get(path))) BucketCommit(k, 0L, 0L)
      else {
        val written = spark.read.parquet(path)
        val agg = written
          .select(xxhash64(written.columns.map(col): _*).as("h"))
          .agg(count(lit(1)).as("rows"),
               // XOR-fold: order-independent, overflow-free (ANSI mode)
               coalesce(expr("bit_xor(h)"), lit(0L)).as("checksum"))
          .collect()(0)
        BucketCommit(k, agg.getLong(0), agg.getLong(1))
      }
      val lineageJson = lineage.toSeq.sortBy(_._1).map { case (k2, v) =>
        s"${jstr(k2)}:${jstr(v)}" }.mkString(",")
      atomicWrite(commitPath(dir, k),
        s"""{"bucket":${c.bucket},"rows":${c.rows},"checksum":${c.checksum},"lineage":{$lineageJson}}""")
      c
    }
  }

  /** Parse the lineage map back out of a bucket manifest. */
  def readLineage(dir: String, bucket: Int): Map[String, String] = {
    val p = Paths.get(commitPath(dir, bucket))
    if (!Files.exists(p)) return Map.empty
    val txt = new String(Files.readAllBytes(p), "UTF-8")
    val body = "\"lineage\":\\{(.*)\\}".r
      .findFirstMatchIn(txt).map(_.group(1)).getOrElse("")
    "\"((?:[^\"\\\\]|\\\\.)*)\"\\s*:\\s*\"((?:[^\"\\\\]|\\\\.)*)\"".r
      .findAllMatchIn(body)
      .map(m => junescape(m.group(1)) -> junescape(m.group(2))).toMap
  }

  /** Minimal JSON string escape/unescape for manifest fields — a quote
    * or backslash in a snapshot id must not corrupt the manifest.
    */
  private[graft] def jstr(s: String): String = "\"" + s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  private def junescape(s: String): String = {
    val b = new StringBuilder
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 'n' => b += '\n'; i += 2
          case 'r' => b += '\r'; i += 2
          case 't' => b += '\t'; i += 2
          case 'u' =>
            b += Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar
            i += 6
          case c => b += c; i += 2
        }
      } else { b += s.charAt(i); i += 1 }
    }
    b.result()
  }

  /** Read back all committed bucket manifests (lineage + counters). */
  def readCommits(dir: String, buckets: Int): Seq[BucketCommit] =
    (0 until buckets).flatMap { k =>
      val p = Paths.get(commitPath(dir, k))
      if (!Files.exists(p)) None
      else {
        val txt = new String(Files.readAllBytes(p), "UTF-8")
        val rows = "\"rows\":(\\d+)".r.findFirstMatchIn(txt).map(_.group(1).toLong)
        val sum = "\"checksum\":(-?\\d+)".r.findFirstMatchIn(txt).map(_.group(1).toLong)
        Some(BucketCommit(k, rows.getOrElse(0L), sum.getOrElse(0L)))
      }
    }

  /** Temp-file + atomic-rename commit (provably-once manifest publish,
    * SURVEY.md §7.4.5).
    */
  private[graft] def atomicWrite(path: String, content: String): Unit = {
    val p = Paths.get(path)
    Files.createDirectories(p.toAbsolutePath.getParent)
    val tmp = Paths.get(path + ".tmp")
    Files.write(tmp, content.getBytes("UTF-8"))
    Files.move(tmp, p, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }
}
