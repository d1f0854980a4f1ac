package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `shingle_min(tokens, n)`: the minimum md5 (lowercase hex) over a
  * document's word n-shingles, as a native codegen kernel — the
  * [[TextAnalysis.fingerprint]] statistic. Returns null when the doc has
  * fewer than n tokens (the caller's fallback case).
  *
  * Why a kernel: the HOF formulation
  * (`array_min(transform(sequence(...), i -> md5(concat_ws(slice(...)))))`)
  * walks interpreted lambdas per window and materializes every shingle
  * string AND its 32-char hex into the row — 126 s at 1M docs. This
  * kernel runs one UTF-8 digest pass per window with a reused
  * MessageDigest, compares digests as unsigned bytes (equivalent to the
  * hex string order — hex is monotone in the nibble value), and
  * hex-encodes only the winner: same fingerprint bit-for-bit, the md5 of
  * exactly `concat_ws(" ", slice(tokens, i, n))`. */
final case class ShingleMin(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "shingle_min"

  protected override def nullSafeEval(input: Any): Any =
    ShingleMin.minHash(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.pipeline.ShingleMin.minHash($c, $n);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): ShingleMin =
    copy(child = newChild)
}

object ShingleMin {

  private val hexChars = "0123456789abcdef".toCharArray

  /** Static runtime kernel shared by interpreted and generated code.
    * Returns null when fewer than n tokens. */
  def minHash(tokens: ArrayData, n: Int): UTF8String = {
    val m = tokens.numElements()
    val total = m - (n - 1)
    if (total <= 0) return null
    val toks = new Array[Array[Byte]](m)
    var i = 0
    while (i < m) { toks(i) = tokens.getUTF8String(i).getBytes; i += 1 }
    val md = java.security.MessageDigest.getInstance("MD5")
    var best: Array[Byte] = null
    i = 0
    while (i < total) {
      md.reset()
      var j = 0
      while (j < n) {
        if (j > 0) md.update(' '.toByte)
        md.update(toks(i + j))
        j += 1
      }
      val d = md.digest()
      if (best == null || unsignedLess(d, best)) best = d
      i += 1
    }
    val hex = new Array[Char](32)
    i = 0
    while (i < 16) {
      hex(i * 2) = hexChars((best(i) >> 4) & 0xf)
      hex(i * 2 + 1) = hexChars(best(i) & 0xf)
      i += 1
    }
    UTF8String.fromString(new String(hex))
  }

  private def unsignedLess(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < 16) {
      val x = a(i) & 0xff
      val y = b(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    false
  }

  def column(tokens: Column, n: Int): Column =
    ColumnBridge.column(ShingleMin(ColumnBridge.expression(tokens), n))
}
