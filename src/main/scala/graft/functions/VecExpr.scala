package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression for cosine similarity over
  * `array<float>` embedding columns.
  *
  * The SQL-lambda formulation
  * `aggregate(zip_with(a, b, (x,y) -> x*y), 0d, (acc,v) -> acc+v)`
  * builds an intermediate product array per row and evaluates the lambda
  * through interpreted HigherOrderFunction plumbing — per-element
  * closure dispatch, no whole-stage codegen. This expression reads both
  * `ArrayData` buffers directly in one fused loop (dot and both norms
  * together) and participates in codegen via a static kernel call, so
  * ANN scoring stays inside the generated stage. On well-formed
  * embeddings (equal-length arrays, no null elements — the contract of
  * every embedding column here) accumulation order and double-casting
  * match the lambda formulation exactly (pinned bit-identical by
  * VecExprSpec). Deliberate divergence on MALFORMED rows: the lambda
  * null-poisons a length-mismatched pair (zip_with pads with null),
  * while this kernel scores the common prefix with full-array norms —
  * a defined value instead of a silent NULL drop. Measured 34x faster
  * than the lambda on the q21 all-pairs shape (2M pairs, 64-dim,
  * local[8] — `tools/CosineBench`). A NULL ELEMENT anywhere in either
  * array null-poisons the result, exactly like the lambda (reading the
  * slot as 0.0 would produce a defined-but-wrong similarity).
  */
object VecKernels {
  /** dot(a,b) / (|a|·|b|) over the common prefix; null if either array
    * has a null element (lambda parity); NaN-free for zero vectors is
    * the caller's concern (mirrors the lambda formulation, which also
    * divides by zero into NaN/Infinity).
    */
  def cosine(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    // norms must cover the FULL arrays (not just the common prefix) to
    // match sqrt(aggregate(a, ...)) over each array independently
    var j = n
    while (j < a.numElements()) {
      if (a.isNullAt(j)) return null
      val x = a.getFloat(j).toDouble; na += x * x; j += 1
    }
    var k = n
    while (k < b.numElements()) {
      if (b.isNullAt(k)) return null
      val y = b.getFloat(k).toDouble; nb += y * y; k += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }
}

case class NerCosine(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"ner_cosine expects (array<float>, array<float>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def nullable: Boolean = true
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecKernels.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    // nullSafeCodeGen (not defineCodeGen): the kernel returns null for
    // arrays with null elements, which must surface as SQL NULL
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      |java.lang.Double ${ev.value}Box = graft.functions.VecKernels.cosine($a, $b);
      |if (${ev.value}Box == null) { ${ev.isNull} = true; }
      |else { ${ev.value} = ${ev.value}Box.doubleValue(); }
      |""".stripMargin)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): NerCosine =
    copy(left = l, right = r)
  override def prettyName: String = "ner_cosine"
}

/** Arity-checked expression builders, shared by session-level
  * registration (`register`) and catalog-level injection
  * (GraftExtensions) so both paths raise the same analysis error.
  */
private[graft] object FnBuilders {
  import org.apache.spark.sql.catalyst.expressions.Expression

  def checked(name: String, arity: Int)(build: Seq[Expression] => Expression)
      : Seq[Expression] => Expression = exprs => {
    if (exprs.length != arity)
      throw new org.apache.spark.sql.AnalysisException(
        errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
        messageParameters = Map(
          "functionName" -> name,
          "expectedNum" -> arity.toString,
          "actualNum" -> exprs.length.toString,
          "docroot" -> ""))
    build(exprs)
  }

  val nerShape = checked("ner_shape", 1)(e => NerShape(e.head))
  val nerPackedShape = checked("ner_packed_shape", 1)(e => NerPackedShape(e.head))
  val nerCosine = checked("ner_cosine", 2)(e => NerCosine(e(0), e(1)))
  val nerShingles = checked("ner_shingles", 2) { e =>
    import org.apache.spark.sql.catalyst.expressions.Literal
    e(1) match {
      case Literal(n: Int, org.apache.spark.sql.types.IntegerType) =>
        NerShingles(e(0), n)
      case other =>
        // surfaces at analysis time with this message (builder
        // exceptions abort resolution of the call site)
        throw new IllegalArgumentException(
          s"ner_shingles: the width argument must be an integer " +
            s"literal, got $other")
    }
  }
}

object VecFunctions {
  import org.apache.spark.sql.graft.Bridge

  def ner_cosine(a: Column, b: Column): Column =
    Bridge.column(NerCosine(Bridge.expression(a), Bridge.expression(b)))

  /** Register `ner_cosine` for spark.sql use. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "ner_cosine", FnBuilders.nerCosine, "built-in")
}
