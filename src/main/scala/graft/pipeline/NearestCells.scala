package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}

/** `nearest_cells(e)`: indices of the `n` nearest centroids to embedding
  * `e` (squared euclidean, ties by lower index) — the IVF coarse-quantizer
  * assignment as a NATIVE codegen expression, replacing the per-row Scala
  * UDFs that were the repo's last whole-stage-codegen break (a UDF forces
  * catalyst→scala conversion of every embedding array and an interpreted
  * call per row; this generates one static call on the unconverted
  * ArrayData). The centroid matrix rides the stage's reference array —
  * shipped once per executor with the broadcast task binary, the same
  * distribution a `Broadcast` handle gave the UDFs, without the per-row
  * closure indirection ([[NibbleSpread]] static-kernel pattern).
  */
final case class NearestCells(child: Expression, centroids: Array[Array[Double]],
                              n: Int, offset: Int = 0) extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "nearest_cells"

  private val dims: Int = if (centroids.isEmpty) 0 else centroids(0).length
  @transient private lazy val flat: Array[Double] = {
    val out = new Array[Double](centroids.length * dims)
    var i = 0
    while (i < centroids.length) {
      System.arraycopy(centroids(i), 0, out, i * dims, dims)
      i += 1
    }
    out
  }

  protected override def nullSafeEval(input: Any): Any =
    NearestCells.nearest(flat, dims, input.asInstanceOf[ArrayData], n, offset)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("centroids", flat, "double[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.pipeline.NearestCells.nearest($cRef, $dims, $c, $n, $offset)")
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCells =
    copy(child = newChild)
}

object NearestCells {

  /** The single nearest cell id (INT column). */
  def cell(e: Column, centroids: Array[Array[Double]]): Column =
    org.apache.spark.sql.functions.element_at(column(e, centroids, 1), 1)

  /** [[cell]] over the `dims`-wide slice of `e` starting at 0-based
    * `offset` — the IMI half-space assignment without a per-row
    * `slice()` array copy per half (the kernel reads at an offset; the
    * doubles are identical to slicing first). */
  def cellAt(e: Column, centroids: Array[Array[Double]], offset: Int): Column =
    org.apache.spark.sql.functions.element_at(
      ColumnBridge.column(NearestCells(ColumnBridge.expression(e), centroids,
        1, offset)), 1)

  /** The `n` nearest cell ids (ARRAY<INT> column, nearest first). */
  def column(e: Column, centroids: Array[Array[Double]], n: Int): Column =
    ColumnBridge.column(NearestCells(ColumnBridge.expression(e), centroids, n))

  /** Static runtime kernel shared by interpreted and generated code:
    * distances to all k centroids (read from `e` at `offset`), then
    * selection of the n smallest by (distance, index) — identical
    * ordering to a (d, i) sort. */
  def nearest(flat: Array[Double], dims: Int, e: ArrayData, n: Int,
              offset: Int): ArrayData = {
    // offset reads skip the per-row slice() copy, so the slice's implicit
    // length check moves here: a malformed (short) embedding must fail
    // loud, not read past the row buffer into garbage assignments
    if (e.numElements() < offset + dims)
      throw new IllegalArgumentException(
        s"nearest_cells: embedding has ${e.numElements()} elements, kernel " +
          s"reads ${offset + dims} (offset $offset, dims $dims) — malformed vector")
    val k = if (dims == 0) 0 else flat.length / dims
    val ds = new Array[Double](k)
    var i = 0
    while (i < k) {
      var d = 0.0
      var j = 0
      val off = i * dims
      while (j < dims) {
        val x = e.getDouble(offset + j) - flat(off + j)
        d += x * x
        j += 1
      }
      ds(i) = d
      i += 1
    }
    val m = math.min(n, k)
    val out = new Array[Int](m)
    val used = new Array[Boolean](k)
    var r = 0
    while (r < m) {
      var best = -1
      var bd = Double.PositiveInfinity
      var ii = 0
      while (ii < k) {
        if (!used(ii) && ds(ii) < bd) { bd = ds(ii); best = ii }
        ii += 1
      }
      if (best == -1) {
        // every remaining distance is NaN (NaN in the embedding): degrade
        // to the first unused index — an arbitrary but valid assignment,
        // matching the sortBy total-order behavior of the UDF this
        // replaced — instead of crashing the stage on used(-1)
        var jj = 0
        while (best == -1 && jj < k) { if (!used(jj)) best = jj; jj += 1 }
      }
      used(best) = true
      out(r) = best
      r += 1
    }
    new GenericArrayData(out)
  }
}
