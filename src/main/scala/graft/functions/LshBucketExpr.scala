package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.sql.GraftBridge

/** Random-hyperplane LSH bucket id for an `array<float>` vector: bit i =
  * sign of ⟨v, planeᵢ⟩. All plane dots run in one fused compiled loop
  * (the per-plane `zip_with`+`aggregate` HOF formulation is interpreted
  * per element and dominated ANN runtime).
  */
case class LshBucketExpr(child: Expression, planes: Array[Array[Double]])
    extends UnaryExpression {

  override def dataType: DataType = IntegerType

  private def compute(v: ArrayData): Int = {
    var bucket = 0
    var p = 0
    while (p < planes.length) {
      val plane = planes(p)
      val n = math.min(v.numElements(), plane.length)
      var dot = 0.0
      var i = 0
      while (i < n) { dot += v.getFloat(i).toDouble * plane(i); i += 1 }
      if (dot >= 0) bucket |= (1 << p)
      p += 1
    }
    bucket
  }

  override def nullSafeEval(a: Any): Any = compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("lshExpr", this, classOf[LshBucketExpr].getName)
    defineCodeGen(ctx, ev, v => s"$self.computeJava($v)")
  }

  /** Codegen entry point (public for generated code). */
  def computeJava(v: ArrayData): Int = compute(v)

  override protected def withNewChildInternal(newChild: Expression): LshBucketExpr =
    copy(child = newChild)
}

object LshBucketExpr {
  def lshBucket(v: Column, planes: Seq[Array[Double]]): Column =
    GraftBridge.toColumn(LshBucketExpr(GraftBridge.toExpression(v), planes.toArray))
}
