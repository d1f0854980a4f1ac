package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** `rotate_vec(e)`: dense matrix × vector product `y = M·e` as a NATIVE
  * codegen expression — the orthogonal-rotation kernel of the OPQ path
  * ([[Similarity.opqTopK]], Ge/He/Ke/Sun "Optimized Product Quantization",
  * CVPR 2013): rotating before the subspace split re-aligns the embedding
  * axes so every PQ subquantizer carries comparable energy. A column-
  * expression formulation would be a dims² term projection (4096 terms at
  * 64 dims — past the codegen comfort zone); this generates one static
  * call on the unconverted ArrayData with the matrix riding the stage's
  * reference array, the [[NearestCells]] pattern. The inner accumulation
  * is a left fold, so an external oracle reproduces the doubles exactly.
  */
final case class RotateVec(child: Expression, mat: Array[Double], dims: Int)
  extends UnaryExpression {

  require(mat.length == dims * dims,
    s"rotate_vec: ${mat.length} matrix entries for dims=$dims")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "rotate_vec"

  protected override def nullSafeEval(input: Any): Any =
    RotateVec.rotate(mat, dims, input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mRef = ctx.addReferenceObj("mat", mat, "double[]")
    // the kernel must NOT be named `apply`: the case class inherits
    // TreeNode.apply(Int), so scalac emits no static forwarder for a
    // companion `apply` and Janino resolves the generated call to
    // TreeNode's — every rotation projection then silently fell back to
    // interpreter mode ("Failed to compile ... candidates are:
    // TreeNode.apply(int)"). A distinctly-named kernel gets its static
    // forwarder and the call compiles ([[NearestCells.nearest]] pattern).
    defineCodeGen(ctx, ev, c =>
      s"graft.pipeline.RotateVec.rotate($mRef, $dims, $c)")
  }

  override protected def withNewChildInternal(newChild: Expression): RotateVec =
    copy(child = newChild)
}

object RotateVec {

  /** `y = M·e` over a row-major flattened `dims × dims` matrix. */
  def column(e: Column, m: Array[Array[Double]]): Column = {
    val dims = m.length
    require(m.forall(_.length == dims), "rotate_vec: matrix must be square")
    val flat = new Array[Double](dims * dims)
    var i = 0
    while (i < dims) { System.arraycopy(m(i), 0, flat, i * dims, dims); i += 1 }
    ColumnBridge.column(RotateVec(ColumnBridge.expression(e), flat, dims))
  }

  /** Static runtime kernel shared by interpreted and generated code:
    * out[d] = Σ_e mat[d·dims + e] · x[e], accumulated left to right.
    * (Named `rotate`, not `apply` — see [[RotateVec.doGenCode]].) */
  def rotate(mat: Array[Double], dims: Int, e: ArrayData): ArrayData = {
    val out = new Array[Double](dims)
    var d = 0
    while (d < dims) {
      var s = 0.0
      var j = 0
      val off = d * dims
      while (j < dims) { s += mat(off + j) * e.getDouble(j); j += 1 }
      out(d) = s
      d += 1
    }
    new GenericArrayData(out)
  }
}
