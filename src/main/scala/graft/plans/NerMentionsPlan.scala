package graft.plans

import graft.NerfModel
import graft.pipeline.KgPipeline
import org.apache.spark.broadcast.Broadcast
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, UnsafeProjection}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types.{IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** NER mention detection as a CUSTOM WHOLE OPERATOR — the option-(c)
  * extension path: a `LogicalPlan` node, a `SparkStrategy`, and a
  * `SparkPlan` that runs the fused tokenize→features→Viterbi→IOB-decode
  * kernel directly over `InternalRow`s.
  *
  * Versus `Dataset.flatMap` (which `KgPipeline.detectMentions` uses for
  * the typed API): the flatMap path pays a decode to `RepoFile` and an
  * encode from `MentionRow` per row; this node reads the five input
  * `UTF8String`s in place and emits `UnsafeRow`s through one
  * projection. Measured HONESTLY (tools/NerPlanBench, 24k files,
  * local[8]): throughput parity (~1.0x) — the CRF kernel dominates so
  * completely that the encoder boundary is noise here. The node's value
  * is architectural: the whole-operator extension stack exercised
  * end-to-end (strategy injection, stable output attrs, column-pruning
  * barrier, lazy UnsafeRow emission), with output rows pinned identical
  * to the typed path by PlanParitySpec.
  *
  * The operator stays a NARROW transformation — no shuffle: each input
  * partition maps to one output partition (`preservesPartitioning` at
  * the RDD level, `outputPartitioning` at the planner level). Because
  * the output schema REPLACES the child's attributes, an
  * attribute-based child partitioning (e.g. hash on `repo`) cannot be
  * claimed for the output — only attribute-free partitionings
  * (SinglePartition) survive; anything else is reported as
  * UnknownPartitioning over the same partition count, which is the
  * truthful contract for a schema-changing flatMap.
  */
object NerMentions {
  /** Output schema = KgPipeline.MentionRow, field for field. */
  def outputAttrs(): Seq[AttributeReference] = Seq(
    AttributeReference("repo", StringType, nullable = false)(),
    AttributeReference("path", StringType, nullable = false)(),
    AttributeReference("commit", StringType, nullable = false)(),
    AttributeReference("sentIdx", IntegerType, nullable = false)(),
    AttributeReference("begin", IntegerType, nullable = false)(),
    AttributeReference("end", IntegerType, nullable = false)(),
    AttributeReference("depth", IntegerType, nullable = false)(),
    AttributeReference("neType", StringType, nullable = false)(),
    AttributeReference("surface", StringType, nullable = false)(),
    AttributeReference("context", StringType, nullable = false)())

  /** Public entry: plan-based mention detection over a DataFrame with
    * (repo, path, commit, lang, content) columns. Idempotently installs
    * the strategy on the session (also injectable via GraftExtensions).
    */
  def mentions(spark: SparkSession, files: DataFrame,
               model: NerfModel): DataFrame = {
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    if (!classic.experimental.extraStrategies.exists(_.isInstanceOf[NerStrategy]))
      classic.experimental.extraStrategies =
        classic.experimental.extraStrategies :+ new NerStrategy
    val bModel = spark.sparkContext.broadcast(model)
    val child = files.select("repo", "path", "commit", "lang", "content")
      .queryExecution.analyzed
    org.apache.spark.sql.graft.Bridge.ofRows(spark,
      NerMentionsNode(bModel, child, NerMentions.outputAttrs()))
  }
}

/** Logical node: child must produce (repo, path, commit, lang, content).
  * `output` is CONSTRUCTOR STATE, not recomputed — expression ids must
  * stay stable across optimizer copies or downstream references break.
  */
final case class NerMentionsNode(
    bModel: Broadcast[NerfModel],
    child: LogicalPlan,
    override val output: Seq[Attribute]) extends UnaryNode {
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(output)
  // the kernel consumes ALL FIVE child columns — without this,
  // ColumnPruning sees no references into the child and prunes it empty
  override def references: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    child.outputSet
  override protected def withNewChildInternal(c: LogicalPlan): NerMentionsNode =
    copy(child = c)
}

/** Planner rule: logical NerMentionsNode -> physical NerMentionsExec. */
final class NerStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case n: NerMentionsNode =>
      NerMentionsExec(n.output, n.bModel, planLater(n.child)) :: Nil
    case _ => Nil
  }
}

final case class NerMentionsExec(
    output: Seq[Attribute],
    bModel: Broadcast[NerfModel],
    child: SparkPlan) extends UnaryExecNode {

  // the output attrs are GENERATED here, not consumed from the child —
  // without this, QueryPlan counts them as missing inputs
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(output)

  // narrow op: expose the no-shuffle fact to the planner. Child
  // partitionings expressed over child ATTRIBUTES can't be claimed for
  // the replaced output schema; attribute-free ones pass through.
  override def outputPartitioning: org.apache.spark.sql.catalyst.plans.physical.Partitioning =
    child.outputPartitioning match {
      case org.apache.spark.sql.catalyst.plans.physical.SinglePartition =>
        org.apache.spark.sql.catalyst.plans.physical.SinglePartition
      case p =>
        org.apache.spark.sql.catalyst.plans.physical.UnknownPartitioning(
          p.numPartitions)
    }

  override protected def withNewChildInternal(c: SparkPlan): NerMentionsExec =
    copy(child = c)

  override protected def doExecute(): RDD[InternalRow] = {
    val attrs = output
    val bc = bModel
    child.execute().mapPartitions({ iter =>
      val model = bc.value
      val proj = UnsafeProjection.create(attrs.map(_.dataType).toArray)
      val out = new GenericInternalRow(10)
      iter.flatMap { row =>
        // child column order fixed by the API: repo,path,commit,lang,content
        val repo = row.getUTF8String(0)
        val path = row.getUTF8String(1)
        val commit = row.getUTF8String(2)
        val lang = row.getUTF8String(3).toString
        val content = row.getUTF8String(4).toString
        // UTF8Strings may point into reused buffers; copy the ones we hold
        val repoC = repo.clone(); val pathC = path.clone(); val commitC = commit.clone()
        // fully LAZY iterators: proj(out) reuses one UnsafeRow buffer, so
        // each emitted row must be consumed before the next is produced —
        // the standard SparkPlan contract (buffering consumers copy).
        // A strict .map here would materialize N aliases of one buffer.
        KgPipeline.sentencesOf(lang, content).iterator.zipWithIndex.flatMap {
          case (sent, si) =>
            val (toks, spans) = model.mentions(sent)
            val ctx = UTF8String.fromString(toks.mkString(" "))
            spans.iterator.map { sp =>
              out.update(0, repoC)
              out.update(1, pathC)
              out.update(2, commitC)
              out.update(3, si)
              out.update(4, sp.begin)
              out.update(5, sp.end)
              out.update(6, sp.depth)
              out.update(7, UTF8String.fromString(sp.neType))
              out.update(8, UTF8String.fromString(
                toks.slice(sp.begin, sp.end).mkString(" ")))
              out.update(9, ctx)
              proj(out): InternalRow
            }
        }
      }
    }, preservesPartitioning = true)
  }
}
