package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** `quality_score(text)`: the fixed-weight logistic quality score as a
  * native codegen kernel — σ(−1 + 4·stop_ratio − 8·punct_ratio +
  * 0.35·ln(n_tok) − 0.15·avg_tok_len), one JVM pass over the document.
  *
  * Why a kernel: the column-expression form counts stopwords with the
  * `filter` higher-order function, whose lambda is INTERPRETED per
  * token — 122 s alone at 1M×200-token docs, and the composed curation
  * filter referenced it twice. This kernel computes every feature in
  * one walk (token count = spaces+1 exactly like `split(text, ' ', -1)`;
  * stop tokens by run comparison; punct = code points outside
  * `[A-Za-z0-9 ]`, the regex-removal count; lengths in code points like
  * SQL `length`) and evaluates the SAME double arithmetic in the same
  * left-associated order, so scores are bit-identical to the expression
  * form and stay within the shared round(6) of the DuckDB oracle. */
final case class QualityScore(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "quality_score"

  override def nullable: Boolean = true

  protected override def nullSafeEval(input: Any): Any =
    QualityScore.score(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val tmp = ctx.freshName("qs")
      s"""
        java.lang.Double $tmp = graft.pipeline.QualityScore.score($c);
        ${ev.isNull} = $tmp == null;
        ${ev.value} = ${ev.isNull} ? -1.0 : $tmp.doubleValue();
      """
    })

  override protected def withNewChildInternal(newChild: Expression): QualityScore =
    copy(child = newChild)
}

object QualityScore {

  // the SAME list TextAnalysis.quality's stop_ratio uses — one source of
  // truth so the two features can never drift
  private val stops: Array[String] = TextAnalysis.stopwords("en").toArray

  private def isStop(s: String, from: Int, until: Int): Boolean = {
    val len = until - from
    var k = 0
    while (k < stops.length) {
      val w = stops(k)
      if (w.length == len && s.regionMatches(from, w, 0, len)) return true
      k += 1
    }
    false
  }

  /** Static runtime kernel shared by interpreted and generated code.
    * Null (boxed) for empty text — the expression form's punct_ratio
    * divided by length 0, which Spark's non-ANSI Divide turns into NULL
    * (NaN here would sort ABOVE every real score and sail through
    * `>= minQuality` filters). */
  def score(text: UTF8String): java.lang.Double = {
    val s = text.toString
    if (s.isEmpty) return null
    // tokens of split(text, " ", -1): spaces + 1, empties included
    var nTok = 1L
    var nStop = 0L
    var w0 = 0
    var i = 0
    while (i <= s.length) {
      if (i == s.length || s.charAt(i) == ' ') {
        if (i < s.length) nTok += 1
        if (isStop(s, w0, i)) nStop += 1
        w0 = i + 1
      }
      i += 1
    }
    // lengths in CODE POINTS (SQL length semantics); punct = code points
    // outside [A-Za-z0-9 ] (what the regex removal counted)
    var len = 0L
    var nPunct = 0L
    i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      val keep = (cp >= 'A' && cp <= 'Z') || (cp >= 'a' && cp <= 'z') ||
        (cp >= '0' && cp <= '9') || cp == ' '
      if (!keep) nPunct += 1
      len += 1
      i += Character.charCount(cp)
    }
    val nTokD = nTok.toDouble
    val lenD = len.toDouble
    val stopRatio = nStop.toDouble / nTokD
    val punctRatio = nPunct.toDouble / lenD
    val avgTokLen = (lenD - (nTokD - 1.0)) / nTokD
    // same left-associated order as the expression form — bit-identical
    val z = -1.0 + 4.0 * stopRatio - 8.0 * punctRatio +
      0.35 * math.log(nTokD) - 0.15 * avgTokLen
    java.lang.Double.valueOf(1.0 / (1.0 + math.exp(-z)))
  }

  def column(text: Column): Column =
    ColumnBridge.column(QualityScore(ColumnBridge.expression(text)))
}
