package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text primitives for the LLM-pipeline operators — all native Column
  * expressions (codegen'd, no UDFs): tokenization, shingling, MinHash
  * signatures, SimHash, language-ID heuristic, quality scoring.
  */
object TextFunctions {

  /** Whitespace tokens — matches DuckDB `string_split(text, ' ')` exactly
    * (the oracle side), so token counts agree.
    */
  def wsTokens(text: Column): Column = split(text, " ")

  /** Regex tokens: lowercased alnum runs, empties dropped — the BPE-ish
    * robust tokenizer (matches DuckDB regexp_split_to_array + filter).
    */
  def reTokens(text: Column): Column =
    filter(split(lower(text), "[^a-z0-9]+"), t => t =!= "")

  /** COUNT of regex tokens — `regexp_count` of the complementary
    * pattern. Equal to `size(reTokens(text))` (a +-run count equals the
    * non-empty-token count of the complement split) but stays inside
    * whole-stage codegen: `filter` is a higher-order function and those
    * are CodegenFallback (interpreted). Use this wherever only the
    * count is needed.
    */
  def reTokenCount(text: Column): Column =
    regexp_count(lower(text), lit("[a-z0-9]+"))

  /** NOTE: the per-array shingle/minhash/simhash HOF variants that used
    * to live here were removed — higher-order functions are
    * CodegenFallback (interpreted, 10-100× slower). Signature and
    * band-key construction now lives in [[TextKernels]] (JVM kernels
    * that replicate the SQL xxhash64 fold order bit-for-bit).
    */

  /** Tiny per-language stopword profiles for the n-gram/stopword
    * language-ID heuristic (corpus langs: en de fr es zh).
    */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "that"),
    "de" -> Seq("der", "die", "das", "und", "ist", "von", "mit", "ein"),
    "fr" -> Seq("le", "la", "les", "et", "un", "une", "est", "que"),
    "es" -> Seq("el", "los", "las", "y", "un", "una", "es", "en"),
    "zh" -> Seq("的", "是", "了", "在", "我", "有", "和", "不")
  )

  /** Predicted language: argmax over per-language stopword hit counts
    * (ties broken by language code, deterministic). */
  def langId(text: Column): Column = {
    val toks = reTokens(text)
    val scored = stopwords.toSeq.sortBy(_._1).map { case (lang, words) =>
      val hits = size(filter(toks, t => t.isInCollection(words)))
      struct(hits.as("score"), lit(lang).as("lang"))
    }
    // struct max: compares score first, then lang (desc tie → max lang);
    // deterministic either way.
    array_max(array(scored: _*)).getField("lang")
  }

  /** Composite document quality score in [0,1]: stopword ratio, mean
    * word length (capped), alphabetic-character ratio. Mirrors the
    * SQL-expressible oracle formula exactly.
    *
    * Scored in EXACT integer arithmetic to kill cross-engine round-half
    * divergence (a small-denominator rational can land exactly on a half
    * of the 6dp grid — observed 2/5000 docs at sf0.1 with the
    * floating-point formulation): with n = tokens, c = chars,
    * s = stopword hits, a = alphabetic chars,
    *
    *   score = (40·s·c + 3·min((c−n+1)·c, 10·n·c) + 30·a·n) / (100·n·c)
    *
    * is the same rational, and the emitted value is
    * round-half-up(score·1e6) computed as the integer
    * ⌊(2·num·1e6 + den) / (2·den)⌋ in pure LONG arithmetic (a native
    * IntegralDivide — doubles would lose exactness past 2^53, i.e. for
    * n·c ≳ 4.5e7), divided by 1e6. DuckDB computes the identical
    * integer with BIGINT `//`, then the identical double by the same
    * /1e6. Zero-length text (den = 0) yields NULL in both engines
    * instead of a division error / NaN.
    */
  def qualityScore(text: Column): Column = {
    import MathFunctions.intDiv
    val toks = wsTokens(text)
    val n = size(toks).cast("long")
    val c = length(text).cast("long")
    val s = size(filter(toks, t => t.isInCollection(stopwords("en")))).cast("long")
    val a = length(regexp_replace(text, "[^a-z ]", "")).cast("long")
    val num = lit(40L) * s * c +
      lit(3L) * least((c - n + lit(1L)) * c, lit(10L) * n * c) +
      lit(30L) * a * n
    val den = lit(100L) * n * c
    // the ×2e6 scaling step runs in DECIMAL(38,0): num ≈ 100·n·c stays
    // inside LONG up to ~300 MB documents, but num·2e6 overflows LONG
    // already at n·c ≈ 4.6e10 (a ~600 kB web document) — ANSI would
    // kill the whole query on one big doc. The oracle widens the same
    // step to HUGEINT; IntegralDivide on decimals still returns the
    // exact BIGINT ppm.
    val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val ppm = intDiv(num.cast(dec38) * lit(2000000L) + den.cast(dec38),
      den.cast(dec38) * lit(2L))
    when(c === 0, lit(null).cast("double"))
      .otherwise(ppm.cast("double") / lit(1000000.0))
  }
}
