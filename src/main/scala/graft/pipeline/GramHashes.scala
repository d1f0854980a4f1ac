package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** `gram_hashes(tokens, n)`: the (pos, g1, g2) identity stream of a
  * document's token n-grams as a native codegen kernel — one
  * struct<pos:int, g1:long, g2:long> per window position (1-based),
  * where (g1, g2) is a 128-bit sequence-sensitive hash of the window.
  *
  * Built for [[Dedup.dupSpans]]' hot path: the HOF formulation
  * (`transform` + `slice` + `array_join` + md5) materializes every gram
  * as a string through interpreted lambdas — the dominant cost of the
  * 200M-gram corpus pass. This kernel hashes each TOKEN once (FNV-1a 64,
  * two seeds) and combines per window with O(n) long mixing: no gram
  * strings, no interpreter, same duplicate-detection equivalence classes
  * (equal windows ⇒ equal pairs; unequal windows collide with ~2⁻¹²⁸
  * odds).
  *
  * Documents shorter than n tokens emit their single whole-doc window,
  * mirroring the HOF formulation's greatest(…, 1) convention.
  */
final case class GramHashes(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("pos", IntegerType, nullable = false),
      StructField("g1", LongType, nullable = false),
      StructField("g2", LongType, nullable = false))),
    containsNull = false)

  override def prettyName: String = "gram_hashes"

  protected override def nullSafeEval(input: Any): Any =
    GramHashes.hashes(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.pipeline.GramHashes.hashes($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): GramHashes =
    copy(child = newChild)
}

object GramHashes {

  private final val Prime = 0x100000001b3L
  private final val Seed1 = 0xcbf29ce484222325L
  private final val Seed2 = 0x9e3779b97f4a7c15L

  private def fnv(bytes: Array[Byte], seed: Long): Long = {
    var h = seed
    var i = 0
    while (i < bytes.length) {
      h ^= bytes(i) & 0xffL
      h *= Prime
      i += 1
    }
    // close with a separator step so token boundaries can't alias
    h ^= 0x20L
    h * Prime
  }

  /** Static runtime kernel shared by interpreted and generated code. */
  def hashes(tokens: ArrayData, n: Int): GenericArrayData = {
    val m = tokens.numElements()
    // empty input emits NO grams: with the max(1, …) convention alone an
    // empty array would emit the constant (Seed1, Seed2) gram at pos 1,
    // making any two empty-array docs read as sharing a duplicated gram.
    // Unreachable via split() (which yields [""]) but reachable through
    // the SQL-registered function with array() input.
    if (m == 0) return new GenericArrayData(Array.empty[Any])
    val total = math.max(1, m - (n - 1))
    val h1 = new Array[Long](m)
    val h2 = new Array[Long](m)
    var i = 0
    while (i < m) {
      val b = tokens.getUTF8String(i).getBytes
      h1(i) = fnv(b, Seed1)
      h2(i) = fnv(b, Seed2)
      i += 1
    }
    val out = new Array[Any](total)
    i = 0
    while (i < total) {
      var g1 = Seed1
      var g2 = Seed2
      var j = i
      val end = math.min(i + n, m)
      while (j < end) {
        g1 = (g1 ^ h1(j)) * Prime
        g2 = java.lang.Long.rotateLeft(g2, 17) ^ h2(j)
        g2 *= Prime
        j += 1
      }
      out(i) = new GenericInternalRow(Array[Any](i + 1, g1, g2))
      i += 1
    }
    new GenericArrayData(out)
  }

  def column(tokens: Column, n: Int): Column =
    ColumnBridge.column(GramHashes(ColumnBridge.expression(tokens), n))
}
