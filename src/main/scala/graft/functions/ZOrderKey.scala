package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}
import org.apache.spark.sql.GraftBridge

/** Z-order (Morton) key: interleaves the low 32 bits of two non-negative
  * integer columns into one 64-bit sort key — column a on even bit
  * positions, b on odd. Sorting/range-partitioning written files by this
  * key clusters rows that are close in BOTH dimensions, so parquet
  * row-group min/max statistics can skip on either column — the
  * multi-dimensional layout trick Delta's OPTIMIZE ZORDER applies, as a
  * plain codegen'd expression any writer can sort by.
  *
  * Codegen uses the classic shift-mask bit dilation (5 ops per operand
  * instead of a 32-step loop).
  */
case class ZOrderKey(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(e =>
      e.dataType == IntegerType || e.dataType == LongType)
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      "zorder_key needs integral inputs")
  }

  /** Dilate the low 32 bits of v: bit i → bit 2i. */
  @inline private def dilate(v: Long): Long = {
    var x = v & 0xffffffffL
    x = (x | (x << 16)) & 0x0000ffff0000ffffL
    x = (x | (x << 8)) & 0x00ff00ff00ff00ffL
    x = (x | (x << 4)) & 0x0f0f0f0f0f0f0f0fL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  private def toLong(e: Expression, v: Any): Long = e.dataType match {
    case IntegerType => v.asInstanceOf[Int].toLong
    case _ => v.asInstanceOf[Long]
  }

  /** Inputs outside [0, 2³²) would silently produce a key whose ordering
    * no longer clusters the true values (only the low 32 bits interleave)
    * — fail loudly instead of degrading the layout. */
  private def checkRange(v: Long): Long = {
    if (v < 0L || v > 0xffffffffL) throw new IllegalArgumentException(
      s"zorder_key input out of range [0, 2^32): $v")
    v
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    dilate(checkRange(toLong(left, a))) |
      (dilate(checkRange(toLong(right, b))) << 1)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val xa = ctx.freshName("xa"); val xb = ctx.freshName("xb")
      def dil(src: String, x: String) =
        s"""
           |if (((long) $src) < 0L || ((long) $src) > 4294967295L)
           |  throw new IllegalArgumentException(
           |    "zorder_key input out of range [0, 2^32): " + ((long) $src));
           |long $x = ((long) $src) & 0xffffffffL;
           |$x = ($x | ($x << 16)) & 0x0000ffff0000ffffL;
           |$x = ($x | ($x << 8))  & 0x00ff00ff00ff00ffL;
           |$x = ($x | ($x << 4))  & 0x0f0f0f0f0f0f0f0fL;
           |$x = ($x | ($x << 2))  & 0x3333333333333333L;
           |$x = ($x | ($x << 1))  & 0x5555555555555555L;
         """.stripMargin
      s"""
         |${dil(a, xa)}
         |${dil(b, xb)}
         |${ev.value} = $xa | ($xb << 1);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZOrderKey =
    copy(left = newLeft, right = newRight)
}

object ZOrderKey {
  def zorderKey(a: Column, b: Column): Column =
    GraftBridge.toColumn(ZOrderKey(
      GraftBridge.toExpression(a), GraftBridge.toExpression(b)))
}
