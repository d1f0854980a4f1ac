package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** `nibble_spread(hex)`: for each of the first 16 hex chars, spread the
  * nibble's 4 bits into 16-bit-wide lanes of one long (bit b → lane
  * 16·b). This is the per-row kernel of the packed 64-bit SimHash vote:
  * summing the lane-packed longs across a group counts, per signature
  * bit, how many tokens voted 1 — in 16 primitive sum buffers instead of
  * 64, and in ONE tiny codegen'd call instead of 16 conv(substring(...))
  * chains (whose inlined generated code blows the whole-stage-codegen
  * method budget and drops the stage to interpreted eval). */
final case class NibbleSpread(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "nibble_spread"

  protected override def nullSafeEval(input: Any): Any =
    NibbleSpread.spread(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.pipeline.NibbleSpread.spread($c)")

  override protected def withNewChildInternal(newChild: Expression): NibbleSpread =
    copy(child = newChild)
}

object NibbleSpread {

  def column(c: Column): Column =
    ColumnBridge.column(NibbleSpread(ColumnBridge.expression(c)))

  /** Static runtime kernel shared by interpreted and generated code. */
  def spread(hex: UTF8String): ArrayData = {
    val bytes = hex.getBytes
    val out = new Array[Long](16)
    var i = 0
    while (i < 16 && i < bytes.length) {
      val c = bytes(i)
      val nib =
        if (c >= '0' && c <= '9') c - '0'
        else if (c >= 'a' && c <= 'f') c - 'a' + 10
        else if (c >= 'A' && c <= 'F') c - 'A' + 10
        else 0
      out(i) = (nib & 1L) |
        ((nib >> 1) & 1L) << 16 |
        ((nib >> 2) & 1L) << 32 |
        ((nib >> 3) & 1L) << 48
      i += 1
    }
    new GenericArrayData(out)
  }
}
