package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.{ArrayType, IntegerType, StringType}

import graft.pipeline.{CharGrams, CosineSim, GramFrac, GramHashes, GramStats, LangEvidence, LangPred, NibbleSpread, QualityScore, ShingleMin, SpanCover}

/** SQL surface for the native kernels: makes every scalar Catalyst
  * expression this library ships callable from plain `spark.sql`, the
  * idiomatic Spark integration point — a user who only speaks SQL gets
  * the codegen'd kernels without touching the Scala API.
  *
  *   - new sessions: `--conf spark.sql.extensions=graft.GraftExtensions`
  *   - an existing session: `GraftExtensions.register(spark)`
  *
  * Registered (all codegen'd, same classes the DataFrame API uses):
  *   - `cosine_sim(a, b)`            — cosine over two array<double>
  *   - `lang_evidence(norm)`         — per-language trigram evidence
  *   - `gram_stats(tokens, n)`       — (positions, top freq, dup positions)
  *   - `gram_hashes(tokens, n)`      — 128-bit window hashes
  *   - `span_cover(tokens, dups, n)` — covered-token count + cleaned text
  *   - `nibble_spread(hex)`          — 64-bit sig → 16 pigeonhole lanes
  *   - `char_grams(text, n)`         — distinct char n-grams (key, count)
  *   - `shingle_min(tokens, n)`      — min md5 over word n-shingles
  *   - `lang_pred(norm)`             — winning language, first-wins ties
  *   - `quality_score(text)`         — fixed-weight logistic quality
  *   - `gram_frac(tokens, n, dup)`   — repetition fraction
  *
  * The `n` arguments must be integer LITERALS (they parameterize the
  * generated code, exactly like the Scala API's `Int` parameters).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(ext.injectFunction)
}

object GraftExtensions {

  private def intLit(e: Expression, fn: String): Int = e match {
    case Literal(v: Int, _) => v
    case Literal(v: Long, _) => v.toInt
    case Literal(v: Short, _) => v.toInt
    case Literal(v: Byte, _) => v.toInt
    case _ => throw new IllegalArgumentException(
      s"$fn: the gram width must be an integer literal, got $e")
  }

  private def boolLit(e: Expression, fn: String): Boolean = e match {
    case Literal(v: Boolean, _) => v
    case _ => throw new IllegalArgumentException(
      s"$fn: the mode flag must be a boolean literal, got $e")
  }

  private def arity(fn: String, n: Int, args: Seq[Expression]): Unit =
    if (args.length != n) throw new IllegalArgumentException(
      s"$fn expects $n arguments, got ${args.length}")

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft.GraftExtensions", null, name, usage, "")

  // kernels walk their inputs with fixed accessors (getUTF8String over an
  // int-backed array would reinterpret buffer words as (offset, length)
  // pairs — silent garbage), so every SQL argument is cast to the
  // kernel's input type here: wrong-typed calls get Cast's defined
  // conversion or analysis error instead of undefined reads
  private def asTokens(e: Expression): Expression =
    Cast(e, ArrayType(StringType))
  private def asString(e: Expression): Expression = Cast(e, StringType)

  /** (identifier, info, builder) triples in the shape
    * `SparkSessionExtensions.injectFunction` consumes. */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("cosine_sim"),
      info("cosine_sim", "cosine_sim(a, b) - cosine similarity of two array<double> (cast float embeddings first)"),
      args => { arity("cosine_sim", 2, args); CosineSim(args(0), args(1)) }),
    (FunctionIdentifier("lang_evidence"),
      info("lang_evidence", "lang_evidence(norm) - per-language trigram+function-word evidence over langNorm'd text"),
      args => { arity("lang_evidence", 1, args); LangEvidence(asString(args(0))) }),
    (FunctionIdentifier("gram_stats"),
      info("gram_stats", "gram_stats(tokens, n) - [n-gram positions, top gram count, duplicated positions]"),
      args => { arity("gram_stats", 2, args)
        GramStats(asTokens(args(0)), intLit(args(1), "gram_stats")) }),
    (FunctionIdentifier("gram_hashes"),
      info("gram_hashes", "gram_hashes(tokens, n) - 128-bit hash per n-token window"),
      args => { arity("gram_hashes", 2, args)
        GramHashes(asTokens(args(0)), intLit(args(1), "gram_hashes")) }),
    (FunctionIdentifier("span_cover"),
      info("span_cover", "span_cover(tokens, dup_positions, n) - (covered token count, cleaned text); positions are 1-based ascending gram starts"),
      args => { arity("span_cover", 3, args)
        SpanCover(asTokens(args(0)), Cast(args(1), ArrayType(IntegerType)),
          intLit(args(2), "span_cover")) }),
    (FunctionIdentifier("nibble_spread"),
      info("nibble_spread", "nibble_spread(hex16) - 16 pigeonhole band lanes of a 64-bit hex signature"),
      args => { arity("nibble_spread", 1, args); NibbleSpread(asString(args(0))) }),
    (FunctionIdentifier("char_grams"),
      info("char_grams", "char_grams(text, n) - distinct char n-grams as (packed code-point key, count); n in 1..3"),
      args => { arity("char_grams", 2, args)
        CharGrams(asString(args(0)), intLit(args(1), "char_grams")) }),
    (FunctionIdentifier("shingle_min"),
      info("shingle_min", "shingle_min(tokens, n) - min md5 over word n-shingles; null below n tokens"),
      args => { arity("shingle_min", 2, args)
        ShingleMin(asTokens(args(0)), intLit(args(1), "shingle_min")) }),
    (FunctionIdentifier("lang_pred"),
      info("lang_pred", "lang_pred(norm) - winning language of lang_evidence, first-wins ties"),
      args => { arity("lang_pred", 1, args); LangPred(asString(args(0))) }),
    (FunctionIdentifier("quality_score"),
      info("quality_score", "quality_score(text) - fixed-weight logistic quality score"),
      args => { arity("quality_score", 1, args); QualityScore(asString(args(0))) }),
    (FunctionIdentifier("gram_frac"),
      info("gram_frac", "gram_frac(tokens, n, dup) - top-gram share (dup=false) or duplicated-position share (dup=true); null without n-grams"),
      args => { arity("gram_frac", 3, args)
        GramFrac(asTokens(args(0)), intLit(args(1), "gram_frac"),
          boolLit(args(2), "gram_frac")) }))

  /** Register into an already-running session (same builders the
    * extension injects at session build). */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (id, inf, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, inf, builder)
    }
}
