package graft.pipeline

import org.apache.spark.sql.{Dataset, SparkSession}

/** Shared lineage-truncation helpers for iterative operators (the CC
  * fixpoint in [[KgPipeline]], the BPE merge loop in [[Bpe]]): without
  * truncation each round's plan nests the previous round's, and by a
  * few dozen iterations plan construction itself dominates (or OOMs
  * the driver building explain strings).
  */
private[graft] object Lineage {

  /** Truncate lineage: a RELIABLE checkpoint (to the session's
    * checkpoint dir) when one is configured — executor loss is routine
    * at the 1000-executor design point, and localCheckpoint blocks die
    * with their executor, killing the job — falling back to
    * localCheckpoint when no checkpoint dir is set (local mode, tests:
    * executors == driver, so executor loss IS job loss and the cheaper
    * truncation is sound). Eager in both modes.
    */
  def chk[T](ds: Dataset[T]): Dataset[T] =
    if (ds.sparkSession.sparkContext.getCheckpointDir.isDefined)
      ds.checkpoint()
    else ds.localCheckpoint()

  /** The reliable-checkpoint directory backing a [[chk]] result, when
    * it was a reliable checkpoint (None for localCheckpoint — local
    * blocks die with their executors and need no file cleanup).
    */
  def checkpointFileOf(ds: Dataset[_]): Option[String] =
    ds.queryExecution.logical match {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.getCheckpointFile
      case _ => None
    }

  /** Delete a superseded reliable checkpoint's files. Spark never
    * cleans these itself unless
    * `spark.cleaner.referenceTracking.cleanCheckpoints` is set (default
    * false), so every iteration would otherwise leak one checkpoint
    * directory into durable storage for the life of the cluster. Only
    * call once every consumer of the checkpointed frame has
    * materialized; cleanup failure is logged, not fatal — a leaked
    * directory beats a dead job.
    */
  def dropCheckpointFiles(spark: SparkSession, file: Option[String]): Unit =
    file.foreach { f =>
      try {
        val p = new org.apache.hadoop.fs.Path(f)
        p.getFileSystem(spark.sessionState.newHadoopConf()).delete(p, true)
      } catch {
        case e: Exception =>
          System.err.println(s"[Lineage] checkpoint cleanup of $f " +
            s"failed (${e.getMessage}) — remove it manually")
      }
    }

  /** Unpersist a locally-checkpointed RDD without the "can no longer
    * be recomputed" WARN: releasing a dead frame is the caller's
    * documented contract, not an incident, and repeated on every
    * iteration/trial the warning buries real ones (VERDICT r5).
    * Silences exactly that RDD class's logger for exactly this call,
    * restoring after; best-effort — a logging-backend change must not
    * break the release itself.
    */
  def quietUnpersist(rdd: org.apache.spark.rdd.RDD[_],
                     blocking: Boolean): Unit = {
    val loggerName = rdd.getClass.getName
    val prev =
      try {
        val lvl = org.apache.logging.log4j.LogManager
          .getLogger(loggerName).getLevel
        org.apache.logging.log4j.core.config.Configurator
          .setLevel(loggerName, org.apache.logging.log4j.Level.ERROR)
        Some(lvl)
      } catch { case scala.util.control.NonFatal(_) => None }
    try rdd.unpersist(blocking)
    finally prev.foreach { lvl =>
      try org.apache.logging.log4j.core.config.Configurator
        .setLevel(loggerName, lvl)
      catch { case scala.util.control.NonFatal(_) => () }
    }
  }

  /** Free a superseded [[chk]] result: reliable checkpoints drop their
    * files; local checkpoints quietly unpersist their blocks. The
    * frame is NOT recomputable afterwards — release means "done".
    */
  def release(ds: Dataset[_], blocking: Boolean = false): Unit =
    ds.queryExecution.logical match {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.getCheckpointFile match {
          case some @ Some(_) =>
            dropCheckpointFiles(ds.sparkSession, some)
          case None => quietUnpersist(lr.rdd, blocking)
        }
      case _ => ds.unpersist(blocking)
    }
}
