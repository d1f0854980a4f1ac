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

/** Exact inverse of [[CanonicalLabels]]: canonical string -> labels map,
  * undoing the separator escapes -- native and codegen'd for the same
  * reason as the builder (this sits in every selector's result
  * reconstruction). */
final case class CanonicalToMap(child: Expression) extends UnaryExpression {

  override def dataType: DataType =
    org.apache.spark.sql.types.MapType(StringType, StringType,
      valueContainsNull = false)
  override def prettyName: String = "canonical_to_map"

  override protected def nullSafeEval(input: Any): Any =
    CanonicalLabels.parse(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.engine.CanonicalLabels.parse($c)")

  override protected def withNewChildInternal(newChild: Expression): CanonicalToMap =
    copy(child = newChild)
}

/** The keep/drop subset of an ALREADY-CANONICAL string, computed by one
  * byte scan — no map materialization. A build-produced canonical has its
  * entries key-sorted and its separator bytes only at true boundaries
  * (escaping shifts \\u0001-\\u0003 out of content), so subsetting copies
  * kept entries VERBATIM: order and escaping preserved, output
  * bit-identical to `build(parse(c), keep, drop)`. This is the
  * dictionary-path twin of [[CanonicalLabels]]: aggregations' by/without
  * group keys and binops' matching signatures evaluate once per SERIES on
  * the dictionary's stored `_lc`, and the previous parse-map-rebuild per
  * dictionary row was a no-op round trip wrapped around this filter. */
final case class CanonicalSubset(
    child: Expression,
    keep: Option[Seq[String]],
    drop: Seq[String]) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "canonical_subset"

  @transient private lazy val keepSet: java.util.HashSet[UTF8String] =
    keep.map(CanonicalLabels.escapedSet).orNull

  @transient private lazy val dropSet: java.util.HashSet[UTF8String] =
    if (drop.isEmpty) null else CanonicalLabels.escapedSet(drop)

  override protected def nullSafeEval(input: Any): Any =
    CanonicalLabels.subset(input.asInstanceOf[UTF8String], keepSet, dropSet)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val keepRef =
      if (keepSet == null) "null"
      else ctx.addReferenceObj("keepSet", keepSet, "java.util.HashSet")
    val dropRef =
      if (dropSet == null) "null"
      else ctx.addReferenceObj("dropSet", dropSet, "java.util.HashSet")
    defineCodeGen(ctx, ev, c =>
      s"graft.engine.CanonicalLabels.subset($c, $keepRef, $dropRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): CanonicalSubset =
    copy(child = newChild)
}

object CanonicalLabels {

  private val SEP_ENTRY = UTF8String.fromString("\u0001")
  private val SEP_KV = UTF8String.fromString("\u0002")

  /** Escape the separator bytes so ARBITRARY label text round-trips: the
    * reference truncates but otherwise stores any label value
    * (persistence/appender.go:44,126-138 — only metric names and label
    * NAMES are sanitized), so a value containing \u0001/\u0002 must not
    * corrupt the canonical string that series identity hangs off.
    * \u0003 escapes \u0001/\u0002/\u0003 as ESC + (byte+4), i.e.
    * \u0003\u0005 / \u0003\u0006 / \u0003\u0007 (bijective). SHIFTING the
    * escaped byte keeps raw \u0001/\u0002 out of escaped content entirely,
    * so separator bytes occur ONLY at true entry/kv boundaries: a
    * substring search for `\u0001esc(k)\u0002esc(v)\u0001` over the
    * padded canonical (Compiler.matcherFilter's equality rewrite) is
    * EXACT, never matching inside an escape pair. The fast path is a byte
    * scan that allocates nothing when no escapable byte exists — every sanitized-ingest string. */
  private def escape(s: UTF8String): UTF8String = {
    val n = s.numBytes
    var extra = 0
    var i = 0
    while (i < n) {
      val b = s.getByte(i)
      if (b >= 1 && b <= 3) extra += 1
      i += 1
    }
    if (extra == 0) return s
    val in = s.getBytes
    val out = new Array[Byte](n + extra)
    var o = 0
    i = 0
    while (i < n) {
      val b = in(i)
      if (b >= 1 && b <= 3) {
        out(o) = 3; o += 1
        out(o) = (b + 4).toByte
      } else out(o) = b
      o += 1
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  /** Build the canonical string: entries passing the keep/drop filter,
    * sorted by RAW key (unsigned byte order), escaped `key\u0002value`
    * joined with `\u0001`. Called from generated code — must stay a
    * static signature. */
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
      val k = escape(keys.getUTF8String(idx))
      parts(p) =
        if (vals.isNullAt(idx)) k
        else UTF8String.concat(k, SEP_KV, escape(vals.getUTF8String(idx)))
      p += 1
    }
    UTF8String.concatWs(SEP_ENTRY, parts: _*)
  }

  /** Driver-side escape of a plan-time constant (matcher values), for
    * building substring predicates against the persisted canonical
    * column. */
  def escapeString(s: String): String = escape(UTF8String.fromString(s)).toString

  /** Exact inverse of [[build]] (full-map form): split on unescaped
    * \u0001/\u0002, undo the \u0003 escapes. Called from generated code. */
  def parse(c: UTF8String): MapData = {
    val bytes = c.getBytes
    val n = bytes.length
    val keys = new java.util.ArrayList[UTF8String]()
    val vals = new java.util.ArrayList[UTF8String]()
    val buf = new Array[Byte](n)
    var i = 0
    var len = 0
    var key: UTF8String = null
    def flush(endOfEntry: Boolean): Unit = {
      val s = UTF8String.fromBytes(java.util.Arrays.copyOf(buf, len))
      len = 0
      if (endOfEntry) {
        if (key == null) { keys.add(s); vals.add(UTF8String.EMPTY_UTF8) }
        else { keys.add(key); vals.add(s); key = null }
      } else key = s
    }
    if (n > 0) {
      while (i < n) {
        val b = bytes(i)
        if (b == 3 && i + 1 < n) { buf(len) = (bytes(i + 1) - 4).toByte; len += 1; i += 2 }
        else if (b == 1) { flush(endOfEntry = true); i += 1 }
        else if (b == 2 && key == null) { flush(endOfEntry = false); i += 1 }
        else { buf(len) = b; len += 1; i += 1 }
      }
      flush(endOfEntry = true)
    }
    org.apache.spark.sql.catalyst.util.ArrayBasedMapData(
      keys.toArray(Array.empty[UTF8String]).asInstanceOf[Array[Any]],
      vals.toArray(Array.empty[UTF8String]).asInstanceOf[Array[Any]])
  }


  /** ESCAPED key set for [[CanonicalSubset]]: entry keys inside a
    * canonical string are escaped, and escape is injective, so comparing
    * escaped bytes equals comparing raw keys. */
  private[engine] def escapedSet(ks: Seq[String]): java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](ks.size * 2)
    ks.foreach(k => s.add(escape(UTF8String.fromString(k))))
    s
  }

  /** Static kernel of [[CanonicalSubset]]: copy the entries whose
    * (escaped) key passes the keep/drop filter, verbatim. Called from
    * generated code — must stay a static signature. */
  def subset(c: UTF8String, keepSet: java.util.HashSet[UTF8String],
             dropSet: java.util.HashSet[UTF8String]): UTF8String = {
    val n = c.numBytes
    if (n == 0) return UTF8String.EMPTY_UTF8
    val bytes = c.getBytes
    val out = new Array[Byte](n)
    var o = 0
    var s = 0
    while (s < n) {
      var e = s
      var kEnd = -1
      while (e < n && bytes(e) != 1) {
        if (bytes(e) == 2 && kEnd < 0) kEnd = e
        e += 1
      }
      val key = UTF8String.fromBytes(bytes, s, (if (kEnd >= 0) kEnd else e) - s)
      if ((keepSet == null || keepSet.contains(key)) &&
          (dropSet == null || !dropSet.contains(key))) {
        if (o > 0) { out(o) = 1; o += 1 }
        System.arraycopy(bytes, s, out, o, e - s)
        o += e - s
      }
      s = e + 1
    }
    UTF8String.fromBytes(java.util.Arrays.copyOf(out, o))
  }

  /** [[CanonicalSubset]] column factories — subset of a CANONICAL STRING
    * column (the dictionary's `_lc`), no map round trip. */
  def keepOnCanonical(c: Column, keys: Seq[String]): Column =
    ColumnBridge.column(CanonicalSubset(ColumnBridge.expression(c), Some(keys), Nil))
  def dropOnCanonical(c: Column, keys: Seq[String]): Column =
    ColumnBridge.column(CanonicalSubset(ColumnBridge.expression(c), None, keys))

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
