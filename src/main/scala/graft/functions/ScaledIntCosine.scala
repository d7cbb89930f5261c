package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}
import org.apache.spark.sql.GraftBridge

/** Oracle-exact cosine: scales each float to an exact integer
  * (floor(x·10⁶) as long), accumulates dot and norms as exact longs, and
  * divides only at the end — the same arithmetic the DuckDB oracle runs,
  * so the result is bit-identical across engines AND an order of
  * magnitude faster than the zip_with/aggregate formulation (fused
  * codegen loop, no intermediate arrays).
  *
  * Input contract (same as [[ScaledIntDot]]): children must be
  * `array<float>` — enforced at analysis via [[checkInputDataTypes]] —
  * and array elements are assumed non-null (a null slot reads as 0.0f).
  */
case class ScaledIntCosine(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"scaled_int_cosine needs two array<float> inputs, got " +
          s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
    }

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0L; var nx = 0L; var ny = 0L; var i = 0
    while (i < n) {
      val xi = math.floor(x.getFloat(i).toDouble * 1000000).toLong
      val yi = math.floor(y.getFloat(i).toDouble * 1000000).toLong
      dot += xi * yi; nx += xi * xi; ny += yi * yi; i += 1
    }
    val denom = math.sqrt(nx.toDouble) * math.sqrt(ny.toDouble)
    if (denom == 0.0) 0.0 else dot.toDouble / denom
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot"); val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny"); val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi"); val denom = ctx.freshName("denom")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |long $dot = 0L; long $nx = 0L; long $ny = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  long $xi = (long) java.lang.Math.floor((double) $x.getFloat($i) * 1000000);
         |  long $yi = (long) java.lang.Math.floor((double) $y.getFloat($i) * 1000000);
         |  $dot += $xi * $yi; $nx += $xi * $xi; $ny += $yi * $yi;
         |}
         |double $denom = java.lang.Math.sqrt((double) $nx) * java.lang.Math.sqrt((double) $ny);
         |${ev.value} = ($denom == 0.0) ? 0.0 : ((double) $dot) / $denom;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ScaledIntCosine =
    copy(left = newLeft, right = newRight)
}

object ScaledIntCosine {
  def scaledCosine(a: Column, b: Column): Column =
    GraftBridge.toColumn(ScaledIntCosine(
      GraftBridge.toExpression(a), GraftBridge.toExpression(b)))
}
