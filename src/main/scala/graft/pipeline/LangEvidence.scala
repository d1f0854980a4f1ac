package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `lang_evidence(norm)`: per-language identification evidence for a
  * normalized document — trigram-profile hits + 10 × function-word hits
  * per language — as ONE native codegen pass over the string.
  *
  * The higher-order formulation (materialize every trigram substring and
  * the word array, then 16 `filter(_, isInCollection(...))` folds per
  * document) evaluated interpreted lambdas over ~2·len elements × 8
  * languages; at 1M × 200-token docs that was 750 s on 32 cores. This
  * kernel walks the string once: each trigram position is a 48-bit char
  * key into a perfect hash map of the 320 profile trigrams whose value
  * is the 8-language membership BITMASK (one lookup increments every
  * matching language), and each word is one lookup in the function-word
  * mask map. Integer counts — bit-identical to the HOF path and the SQL
  * oracle by construction.
  */
final case class LangEvidence(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "lang_evidence"

  protected override def nullSafeEval(input: Any): Any =
    LangEvidence.evidence(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.pipeline.LangEvidence.evidence($c)")

  override protected def withNewChildInternal(newChild: Expression): LangEvidence =
    copy(child = newChild)
}

/** `lang_pred(norm)`: the winning language of [[LangEvidence]] directly —
  * argmax with first-wins ties (the profile precedence order, identical
  * to [[TextAnalysis.langId]]'s CASE chain), in ONE kernel call.
  *
  * Why it exists: an argmax CASE chain over an ALIASED evidence array is
  * torn apart by predicate pushdown — the alias is inlined into every
  * pushed filter conjunct, and FilterExec's codegen does no
  * subexpression elimination, so a `lang_pred isin (...)` filter built
  * from the chain re-evaluated the evidence kernel (and the whole
  * text-cleaning chain feeding it) up to 56 times PER ROW in the
  * composed-curation plan. Any number of references to this expression
  * cost one evidence pass each. */
final case class LangPred(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "lang_pred"

  protected override def nullSafeEval(input: Any): Any =
    LangEvidence.pred(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.pipeline.LangEvidence.pred($c)")

  override protected def withNewChildInternal(newChild: Expression): LangPred =
    copy(child = newChild)
}

object LangPred {
  def column(norm: Column): Column =
    ColumnBridge.column(LangPred(ColumnBridge.expression(norm)))
}

object LangEvidence {

  val nLangs: Int = TextAnalysis.trigramProfiles.length

  /** trigram (3 BMP chars packed into 48 bits) → 8-language bitmask. */
  private val triMask: java.util.HashMap[java.lang.Long, Integer] = {
    val m = new java.util.HashMap[java.lang.Long, Integer]()
    TextAnalysis.trigramProfiles.zipWithIndex.foreach { case ((_, prof), li) =>
      prof.foreach { g =>
        require(g.length == 3, s"profile trigram '$g' must be 3 chars")
        val key = triKey(g.charAt(0), g.charAt(1), g.charAt(2))
        val prev = m.get(key)
        m.put(key, if (prev == null) 1 << li else prev | (1 << li))
      }
    }
    m
  }

  /** function word → 8-language bitmask. */
  private val wordMask: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer]()
    TextAnalysis.functionWords.zipWithIndex.foreach { case ((_, ws), li) =>
      ws.foreach { w =>
        val prev = m.get(w)
        m.put(w, if (prev == null) 1 << li else prev | (1 << li))
      }
    }
    m
  }

  private def triKey(a: Char, b: Char, c: Char): Long =
    (a.toLong << 32) | (b.toLong << 16) | c.toLong

  /** Static runtime kernel shared by interpreted and generated code. */
  def evidence(norm: UTF8String): GenericArrayData = {
    val s = norm.toString
    val scores = new Array[Long](nLangs)
    // trigram channel: every position's 3-char window, one mask lookup
    var i = 0
    val triEnd = s.length - 2
    while (i < triEnd) {
      val mask = triMask.get(triKey(s.charAt(i), s.charAt(i + 1), s.charAt(i + 2)))
      if (mask != null) {
        val m = mask.intValue()
        var l = 0
        while (l < nLangs) {
          if ((m & (1 << l)) != 0) scores(l) += 1
          l += 1
        }
      }
      i += 1
    }
    // function-word channel: words are the space-separated runs of the
    // trimmed string (the normalizer collapses non-letter runs to single
    // spaces, so no empty words occur between separators)
    var start = 0
    while (start < s.length && s.charAt(start) == ' ') start += 1
    var end = s.length
    while (end > start && s.charAt(end - 1) == ' ') end -= 1
    var w0 = start
    var j = start
    while (j <= end) {
      if (j == end || s.charAt(j) == ' ') {
        if (j > w0) {
          val mask = wordMask.get(s.substring(w0, j))
          if (mask != null) {
            val m = mask.intValue()
            var l = 0
            while (l < nLangs) {
              if ((m & (1 << l)) != 0)
                scores(l) += TextAnalysis.functionWordWeight
              l += 1
            }
          }
        }
        w0 = j + 1
      }
      j += 1
    }
    new GenericArrayData(scores)
  }

  private val langNames: Array[UTF8String] =
    TextAnalysis.trigramProfiles.map(p => UTF8String.fromString(p._1)).toArray

  /** Argmax of [[evidence]], first-wins ties — the kernel behind
    * [[LangPred]]. Strict `>` keeps the EARLIEST maximum, which equals
    * the CASE chain's "first language ≥ all later ones". */
  def pred(norm: UTF8String): UTF8String = {
    val e = evidence(norm)
    var best = 0
    var l = 1
    while (l < nLangs) {
      if (e.getLong(l) > e.getLong(best)) best = l
      l += 1
    }
    langNames(best)
  }

  def column(norm: Column): Column =
    ColumnBridge.column(LangEvidence(ColumnBridge.expression(norm)))
}
