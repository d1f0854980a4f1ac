package graft.engine

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.MapData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Canonical label string of a labels map — the engine's series identity —
  * as a NATIVE codegen-capable Catalyst expression.
  *
  * Semantically identical to the builtin-HOF formulation
  * `concat_ws(\u0001, transform(array_sort(map_entries(m)), kv ->
  * concat_ws(\u0002, kv.key, kv.value)))`, with an optional keep/drop key
  * filter fused in (aggregation by/without, vector-matching on/ignoring).
  * The HOF version is a CodegenFallback: one such expression in a Project
  * poisons whole-stage codegen for EVERY operator stacked above it — the
  * selector explode and the per-(series, step) hash aggregation would all
  * run interpreted. This expression generates a single static call, so the
  * whole pipeline stays inside WholeStageCodegen.
  *
  * Sort order is UTF8String's unsigned byte order — the same ordering
  * array_sort uses for strings — so produced strings (and therefore every
  * xxhash64 sig derived from them) are bit-identical to the HOF version.
  */
final case class CanonicalLabels(
    child: Expression,
    keep: Option[Seq[String]],
    drop: Seq[String]) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "canonical_labels"

  @transient private lazy val keepSet: java.util.HashSet[UTF8String] =
    keep.map { ks =>
      val s = new java.util.HashSet[UTF8String](ks.size * 2)
      ks.foreach(k => s.add(UTF8String.fromString(k)))
      s
    }.orNull

  @transient private lazy val dropSet: java.util.HashSet[UTF8String] =
    if (drop.isEmpty) null
    else {
      val s = new java.util.HashSet[UTF8String](drop.size * 2)
      drop.foreach(k => s.add(UTF8String.fromString(k)))
      s
    }

  override protected def nullSafeEval(input: Any): Any =
    CanonicalLabels.build(input.asInstanceOf[MapData], keepSet, dropSet)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val keepRef =
      if (keepSet == null) "null"
      else ctx.addReferenceObj("keepSet", keepSet, "java.util.HashSet")
    val dropRef =
      if (dropSet == null) "null"
      else ctx.addReferenceObj("dropSet", dropSet, "java.util.HashSet")
    defineCodeGen(ctx, ev, c =>
      s"graft.engine.CanonicalLabels.build($c, $keepRef, $dropRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): CanonicalLabels =
    copy(child = newChild)
}

object CanonicalLabels {
  private val SEP_ENTRY = UTF8String.fromString("\u0001")
  private val SEP_KV = UTF8String.fromString("\u0002")

  /** Build the canonical string: entries passing the keep/drop filter,
    * sorted by key (unsigned byte order), `key\u0002value` joined with
    * `\u0001`. Called from generated code — must stay a static signature. */
  def build(m: MapData, keepSet: java.util.HashSet[UTF8String],
            dropSet: java.util.HashSet[UTF8String]): UTF8String = {
    val n = m.numElements()
    if (n == 0) return UTF8String.EMPTY_UTF8
    val keys = m.keyArray()
    val vals = m.valueArray()
    val sel = new Array[Int](n)
    var cnt = 0
    var i = 0
    while (i < n) {
      val k = keys.getUTF8String(i)
      if ((keepSet == null || keepSet.contains(k)) &&
          (dropSet == null || !dropSet.contains(k))) {
        sel(cnt) = i; cnt += 1
      }
      i += 1
    }
    if (cnt == 0) return UTF8String.EMPTY_UTF8
    // insertion sort of the selected indices by key (maps are small)
    i = 1
    while (i < cnt) {
      val x = sel(i)
      val kx = keys.getUTF8String(x)
      var j = i - 1
      while (j >= 0 && keys.getUTF8String(sel(j)).compareTo(kx) > 0) {
        sel(j + 1) = sel(j); j -= 1
      }
      sel(j + 1) = x
      i += 1
    }
    val parts = new Array[UTF8String](cnt)
    var p = 0
    while (p < cnt) {
      val idx = sel(p)
      val k = keys.getUTF8String(idx)
      parts(p) =
        if (vals.isNullAt(idx)) k
        else UTF8String.concat(k, SEP_KV, vals.getUTF8String(idx))
      p += 1
    }
    UTF8String.concatWs(SEP_ENTRY, parts: _*)
  }

  // ---- Column factories -------------------------------------------------

  /** Full canonical string (all labels). */
  def column(labels: Column): Column =
    ColumnBridge.column(CanonicalLabels(ColumnBridge.expression(labels), None, Nil))

  /** Canonical string of the kept subset (aggregation `by`, matching `on`). */
  def keepColumn(labels: Column, keys: Seq[String]): Column =
    ColumnBridge.column(CanonicalLabels(ColumnBridge.expression(labels), Some(keys), Nil))

  /** Canonical string without the dropped keys (`without`, `ignoring`). */
  def dropColumn(labels: Column, keys: Seq[String]): Column =
    ColumnBridge.column(CanonicalLabels(ColumnBridge.expression(labels), None, keys))
}
