package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the reference's character-shape
  * features (/root/reference/src/NLP/Nerf/Schema.hs:156-170): `shape`
  * maps upper→X, lower→x, digit→d, other→o; `packed` additionally
  * run-length-collapses. Implemented with `doGenCode` so shape
  * computation participates in whole-stage codegen (no UDF/serde
  * boundary) when used on the relational surface — the typed NER path
  * uses the identical pure function in graft.core.Features, pinned equal
  * by ShapeExprSpec.
  */
object ShapeKernels {
  // shared by interpreted eval and generated code
  def shape(s: UTF8String): UTF8String =
    UTF8String.fromString(graft.core.Features.shape(s.toString))
  def packedShape(s: UTF8String): UTF8String = {
    val sh = graft.core.Features.shape(s.toString)
    UTF8String.fromString(graft.core.Features.pack(sh))
  }
}

abstract class ShapeLike extends UnaryExpression {
  override def dataType: DataType = StringType
  // reject ner_shape(42) at ANALYSIS time — without this the generated
  // code passes a non-UTF8String to the kernel and fails mid-job with a
  // janino/ClassCastException instead of an AnalysisException
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string, got ${child.dataType.simpleString}")
  protected def kernel: String // method name on ShapeKernels

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.ShapeKernels.$kernel($c)")
}

case class NerShape(child: Expression) extends ShapeLike {
  override protected def nullSafeEval(v: Any): Any =
    ShapeKernels.shape(v.asInstanceOf[UTF8String])
  override protected def kernel: String = "shape"
  override protected def withNewChildInternal(c: Expression): NerShape = copy(c)
  override def prettyName: String = "ner_shape"
}

case class NerPackedShape(child: Expression) extends ShapeLike {
  override protected def nullSafeEval(v: Any): Any =
    ShapeKernels.packedShape(v.asInstanceOf[UTF8String])
  override protected def kernel: String = "packedShape"
  override protected def withNewChildInternal(c: Expression): NerPackedShape = copy(c)
  override def prettyName: String = "ner_packed_shape"
}

object ShapeFunctions {
  import org.apache.spark.sql.graft.Bridge

  def ner_shape(c: Column): Column =
    Bridge.column(NerShape(Bridge.expression(c)))
  def ner_packed_shape(c: Column): Column =
    Bridge.column(NerPackedShape(Bridge.expression(c)))

  /** Register `ner_shape` / `ner_packed_shape` for spark.sql use. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("ner_shape",
      FnBuilders.nerShape, "built-in")
    reg.createOrReplaceTempFunction("ner_packed_shape",
      FnBuilders.nerPackedShape, "built-in")
  }
}
