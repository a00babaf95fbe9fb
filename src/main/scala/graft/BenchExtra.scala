package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Optimization-round measurement harness (guide §1.4) — NOT part of
  * the driver contract (Bench.scala is frozen; this main exists so the
  * round can isolate queries, repeat them, and capture
  * `.explain("formatted")` without touching the frozen harness).
  *
  * Usage: `sbt "runMain graft.BenchExtra [repeats=N] [plans=DIR] [q40 q60 ...]"`
  *  - same session config as Bench (master local[$SPARK_GRAFT_CPUS],
  *    shuffle.partitions = cpus, AQE on, noop-sink timing action);
  *  - each named query (prefix match, all when none given) runs
  *    `repeats` times after one untimed warmup of the first query;
  *  - `plans=DIR` writes DIR/<query>.txt with the formatted plan.
  */
object BenchExtra {

  private def force(df: org.apache.spark.sql.DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val repeats = args.collectFirst { case s if s.startsWith("repeats=") =>
      s.stripPrefix("repeats=").toInt }.getOrElse(3)
    val plansDir = args.collectFirst { case s if s.startsWith("plans=") =>
      s.stripPrefix("plans=") }
    val prefixes = args.filterNot(a =>
      a.startsWith("repeats=") || a.startsWith("plans=")).toSeq

    KgMain.model // untimed model training, as Bench does

    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-benchextra-$cpus")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val names = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) =>
        prefixes.isEmpty || prefixes.exists(p => n.startsWith(p)) }
    require(names.nonEmpty, s"no queries match ${prefixes.mkString(",")}")

    // same untimed setup as Bench: JIT warmup + bucketed/media tables
    SparkEntry.queries.toSeq.sortBy(_._1).headOption.foreach { case (_, fn) =>
      try force(fn(spark, sfDir)) catch { case _: Throwable => () }
    }
    graft.queries.RelationalQueries.ensureBucketedTables(spark, sfDir)
    graft.queries.PipelineQueries.ensureMediaPayloads(spark, sfDir)

    plansDir.foreach { d =>
      Files.createDirectories(Paths.get(d))
      names.foreach { case (name, fn) =>
        val plan = try fn(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        catch { case e: Throwable => s"PLAN FAILED: $e" }
        Files.write(Paths.get(d, s"$name.txt"), plan.getBytes("UTF-8"))
      }
    }
    // Bench's exact trial structure: trials outer, queries inner in
    // name order, memoized derivations released at trial start — so a
    // "q40 q83" subset charges the NER build to q40, as Bench does.
    val perTrial = (1 to repeats).map { t =>
      graft.queries.PipelineQueries.releaseAll(spark)
      graft.pipeline.Graph.releaseAllRanks(spark)
      names.map { case (name, fn) =>
        spark.sparkContext.setJobDescription(s"$name trial $t")
        val t0 = System.nanoTime()
        val ok = try { force(fn(spark, sfDir)); true }
                 catch { case e: Throwable =>
                   System.err.println(s"[benchextra] $name FAILED: $e"); false }
        val secs = (System.nanoTime() - t0) / 1e9
        spark.sparkContext.setJobDescription(null)
        name -> (if (ok) secs else -1.0)
      }
    }
    names.map(_._1).zipWithIndex.foreach { case (name, i) =>
      val ts = perTrial.map(_(i)._2)
      val good = ts.filter(_ >= 0)
      val minS = if (good.isEmpty) -1.0 else good.min
      println(f"[benchextra] $name%-28s min=$minS%8.3f  trials=${
        ts.map(x => f"$x%.3f").mkString(",")}")
    }
    graft.queries.PipelineQueries.releaseAll(spark)
    graft.pipeline.Graph.releaseAllRanks(spark)
    spark.stop()
  }
}
