package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType}
import org.apache.spark.sql.GraftBridge

/** Dense matrix × vector over an `array<float>` column with the matrix
  * riding as a reference object (same shape as [[NearestCentroids]]):
  * the map-only projection primitive — Johnson–Lindenstrauss random
  * projection, a trained linear probe, a whitening transform — without
  * exploding rows or running a higher-order-function lambda through the
  * expression interpreter. One compiled loop per row; output length =
  * matrix row count. */
case class MatVec(child: Expression, m: Array[Array[Float]])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(FloatType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          "mat_vec needs an array<float> input")
    }

  override def nullSafeEval(input: Any): Any =
    MatVec.apply(input.asInstanceOf[ArrayData], m)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mRef = ctx.addReferenceObj("matrix", m, "float[][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MatVec.apply($c, $mRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): MatVec =
    copy(child = newChild)
}

object MatVec {

  /** The compiled kernel (shared by eval and codegen): per output row a
    * double-accumulated dot product, rounded once to float. */
  def apply(v: ArrayData, m: Array[Array[Float]]): ArrayData = {
    val out = new Array[Float](m.length)
    var j = 0
    while (j < m.length) {
      val row = m(j)
      // fail loudly on shape mismatch (same contract as ZOrderKey's
      // range check): truncating would return a plausible-but-wrong
      // projection
      if (v.numElements() != row.length)
        throw new IllegalArgumentException(
          s"mat_vec: vector length ${v.numElements()} != matrix row length " +
            s"${row.length}")
      val len = row.length
      var acc = 0.0
      var i = 0
      while (i < len) { acc += v.getFloat(i).toDouble * row(i).toDouble; i += 1 }
      out(j) = acc.toFloat
      j += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(out)
  }

  def matVec(v: Column, m: Array[Array[Float]]): Column =
    GraftBridge.toColumn(MatVec(GraftBridge.toExpression(v), m))
}
