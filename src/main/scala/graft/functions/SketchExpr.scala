package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.CountMinSketch

/** Codegen point-lookup into a Count-Min Sketch: `ner_cms_estimate(key)`
  * returns the sketch's (over-)estimate of the key's frequency.
  *
  * The sketch rides as a codegen reference object (the `ner_sign_buckets`
  * pattern) so the lookup participates in WholeStageCodegen — it exists
  * for the CANDIDATE pass of sketch-based heavy-hitter detection, which
  * filters the distinct-key set by estimated frequency without ever
  * materializing a full exact frequency table.
  *
  * Hash parity with the sketch builder: Spark's CountMinSketch aggregate
  * adds string keys as their UTF-8 bytes and integral keys as longs, so
  * this expression queries with the same representations — a String-vs-
  * bytes mismatch would silently estimate a DIFFERENT item (hashes
  * differ) and break the one-sided-error guarantee the heavy-hitter
  * recall proof rests on (pinned in SketchSpec: estimate >= exact for
  * every key).
  */
case class NerCmsEstimate(child: Expression, sketch: CountMinSketch)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | LongType | IntegerType | ShortType | ByteType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"ner_cms_estimate expects a string or integral key, got ${other.simpleString}")
  }
  override protected def nullSafeEval(v: Any): Any = v match {
    case s: UTF8String => sketch.estimateCount(s.getBytes)
    case n: Number => sketch.estimateCount(java.lang.Long.valueOf(n.longValue()))
    case other => sketch.estimateCount(other)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cms", sketch,
      classOf[CountMinSketch].getName)
    child.dataType match {
      case StringType =>
        defineCodeGen(ctx, ev, v => s"$ref.estimateCount($v.getBytes())")
      case _ =>
        defineCodeGen(ctx, ev,
          v => s"$ref.estimateCount(java.lang.Long.valueOf((long) $v))")
    }
  }
  override protected def withNewChildInternal(c: Expression): NerCmsEstimate =
    copy(child = c)
  override def prettyName: String = "ner_cms_estimate"
}

/** Column-API builder; not SQL-registered (parameterized by a sketch
  * object with no literal form — see AnnFunctions).
  */
object SketchFunctions {
  import org.apache.spark.sql.graft.Bridge

  def ner_cms_estimate(key: Column, sketch: CountMinSketch): Column =
    Bridge.column(NerCmsEstimate(Bridge.expression(key), sketch))
}
