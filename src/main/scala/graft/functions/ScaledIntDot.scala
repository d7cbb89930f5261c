package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}
import org.apache.spark.sql.GraftBridge

/** Oracle-exact scaled-integer dot product: Σ floor(xᵢ·10⁶)·floor(yᵢ·10⁶)
  * over the first `prefix` dimensions (full length when prefix covers the
  * array) as an exact BIGINT — the [[ScaledIntCosine]] numerator without
  * the norm division, for rankings that compare raw dots. Fused codegen
  * loop over the float arrays: no intermediate scaled array, no
  * interpreted `aggregate(zip_with(...))` lambdas (which Spark never
  * compiles — the round-7 k-NN eval hotspot).
  *
  * Input contract: both children must be `array<float>` (any other
  * element type fails ANALYSIS through [[checkInputDataTypes]] —
  * `getFloat` on an array<double> would silently read garbage bits).
  * Array ELEMENTS are assumed non-null (the embeddings schema):
  * `getFloat` reads a null slot as 0.0f rather than propagating null —
  * acceptable for the embedding corpus, wrong for nullable-element
  * arrays, hence the documented assumption.
  */
case class ScaledIntDot(left: Expression, right: Expression, prefix: Int)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"scaled_int_dot needs two array<float> inputs, got " +
          s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
    }

  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(prefix, math.min(x.numElements(), y.numElements()))
    var dot = 0L; var i = 0
    while (i < n) {
      val xi = math.floor(x.getFloat(i).toDouble * 1000000).toLong
      val yi = math.floor(y.getFloat(i).toDouble * 1000000).toLong
      dot += xi * yi; i += 1
    }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val xi = ctx.freshName("xi"); val yi = ctx.freshName("yi")
      s"""
         |int $n = java.lang.Math.min($prefix,
         |  java.lang.Math.min($x.numElements(), $y.numElements()));
         |long $dot = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  long $xi = (long) java.lang.Math.floor((double) $x.getFloat($i) * 1000000);
         |  long $yi = (long) java.lang.Math.floor((double) $y.getFloat($i) * 1000000);
         |  $dot += $xi * $yi;
         |}
         |${ev.value} = $dot;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ScaledIntDot =
    copy(left = newLeft, right = newRight)
}

object ScaledIntDot {
  /** Full-length scaled-int dot product of two float-array columns. */
  def scaledDot(a: Column, b: Column): Column =
    scaledDot(a, b, Int.MaxValue)

  /** Scaled-int dot product over the first `prefix` dimensions. */
  def scaledDot(a: Column, b: Column, prefix: Int): Column =
    GraftBridge.toColumn(ScaledIntDot(
      GraftBridge.toExpression(a), GraftBridge.toExpression(b), prefix))
}
