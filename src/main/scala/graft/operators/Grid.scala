package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The integer-grid discipline's non-finite boundary (round-16 NaN/Inf
  * lane). Grid queries compare exactly across engines by mapping a
  * double onto an integer lattice — `round(x * scale)` cast to LONG.
  * NaN and ±Inf have no lattice image: under Spark's ANSI mode the
  * cast throws CAST_OVERFLOW and kills the whole query (DuckDB's
  * equivalent cast aborts identically), so one NaN row in 10^12 would
  * take down the pipeline. The pinned semantic instead: NON-FINITE
  * VALUES MAP TO NULL at the grid boundary — they carry no magnitude
  * information the lattice can hold, and NULL already has defined
  * behavior in every downstream aggregate (skipped) and key (never
  * matches). On NaN-free data the mapping is the identity it always
  * was. FuzzSemanticsSpec pins the class; the VerifyFuzz naninf lane
  * replays the whole registry against NaN/Inf-bearing corpora.
  */
object Grid {

  /** `round(c * scale)` as LONG, non-finite (NaN, ±Inf) → NULL. A NULL
    * input stays NULL (abs(NULL) <= x is NULL → no-else CaseWhen → NULL).
    *
    * One predicate, not three: `abs(c) <= Double.MaxValue` is false for
    * every non-finite double under Spark's comparison ordering (NaN sorts
    * GREATER than any value, so `abs(NaN) <= MaxValue` is false, and
    * ±Inf exceeds MaxValue by magnitude). The round-16 three-branch form
    * (`isnan || === +Inf || === -Inf`) measured ~0.1–0.2 s on
    * ts_outlier_mad at sf0.1 — this query evaluates the grid cast on
    * three corpus-sized passes — and the single-comparison form recovers
    * about a third of that (r17 A/B receipt in BASELINE.md). The cast
    * stays INSIDE the when-branch: conditional evaluation is what keeps
    * ANSI CAST_OVERFLOW unreachable, and an upstream guard filter was
    * proven unsound under Catalyst reordering/CSE (FuzzSemanticsSpec).
    */
  def gridLong(c: Column, scale: Double): Column =
    when(abs(c) <= Double.MaxValue, round(c * scale, 0).cast("long"))

  /** The identical mapping as a DuckDB SQL fragment, so oracle strings
    * cannot drift from [[gridLong]].
    */
  def gridSql(expr: String, scale: String): String =
    s"CAST(round((CASE WHEN isnan($expr) OR isinf($expr) THEN NULL ELSE $expr END) * $scale, 0) AS BIGINT)"

  /** Non-finite double → NULL, finite passes through. The moment/
    * percentile family consumes values through this: Spark's moment
    * aggregates return NaN on non-finite input while DuckDB's THROW
    * ("Out of Range"), so neither engine has usable native semantics —
    * the pinned behavior is that non-finite carries no magnitude and
    * is absent (NULL), which both engines then treat identically.
    *
    * Same single-predicate form as [[gridLong]] (r17 A/B receipt):
    * `abs(c) <= Double.MaxValue` is false for NaN (Spark orders NaN
    * greatest) and both infinities, and NULL stays NULL (abs(NULL) <= x
    * is NULL, and a no-else CaseWhen yields NULL) — one comparison where
    * the round-16 form paid isnan plus two equality branches on every
    * row of every moment pass.
    */
  def finiteD(c: Column): Column =
    when(abs(c) <= Double.MaxValue, c)

  /** DuckDB fragment of [[finiteD]]. */
  def finiteSql(expr: String): String =
    s"(CASE WHEN isnan($expr) OR isinf($expr) THEN NULL ELSE $expr END)"

  /** Spark-SQL fragment of [[finiteD]] for `expr(...)` strings — the
    * same single `abs(x) <= Double.MaxValue` predicate (false for NaN
    * and ±Inf, NULL-preserving via the no-else CASE).
    */
  def finiteSparkSql(expr: String): String =
    s"(CASE WHEN abs($expr) <= 1.7976931348623157E308 THEN $expr END)"

  /** A float/double vector with ANY non-finite component is treated as
    * a NULL vector (absent): component-wise NULL would poison distance
    * sums element-by-element in engine-dependent ways, while a NULL
    * vector is already skipped by every embed/sim operator's
    * `IS NOT NULL` ingestion filter.
    *
    * Detected via array_max/array_min, NOT an exists() HOF: higher-
    * order functions are CodegenFallback and an interpreted projection
    * on the sim hot path measured ~2× on sim_cosine_topk (the same
    * cost the round-11 note pinned for transform()). array_max/min are
    * codegen'd, and Spark orders NaN greatest — so any NaN makes
    * array_max NaN, a +Inf without NaN makes it +Inf, and a -Inf
    * surfaces as array_min (NaN cannot mask it at the min end).
    */
  def finiteVec(c: Column): Column = {
    val mx = array_max(c)
    when(isnan(mx) || mx === Float.PositiveInfinity ||
      array_min(c) === Float.NegativeInfinity, lit(null))
      .otherwise(c)
  }

  /** Filter form of [[finiteVec]]: TRUE iff the vector is non-NULL with
    * every component finite. Prefer this where the consumer drops
    * non-finite vectors anyway — a predicate keeps the scan projection
    * untouched (no array rebuild) and fuses into the scan filter.
    */
  def isFiniteVec(c: Column): Column = {
    val mx = array_max(c)
    // empty-array totality: array_max([]) is NULL, which would turn the
    // whole predicate NULL and silently DROP empty vectors that
    // [[finiteVec]] and [[finiteVecSql]] both pass through — the three
    // forms must agree or the engines drift the day a corpus carries a
    // zero-length embedding (none does today; pinned in
    // FuzzSemanticsSpec so that stays a choice, not an accident)
    // NULL-element totality: array_max/array_min SKIP NULL elements, so
    // a vector of all-NULL components makes mx NULL and the inner
    // conjunction NULL — which would silently DROP a row that
    // [[finiteVec]] (when(NULL) → otherwise → pass) and [[finiteVecSql]]
    // (isnan(NULL) lambda → not-true → filtered out → len 0 → pass) both
    // pass through. coalesce(…, true) restores the agreement; a vector
    // with SOME NULL components is unaffected (the non-NULL extremes
    // still surface any NaN/±Inf).
    c.isNotNull && (size(c) === 0 ||
      coalesce(!isnan(mx) && mx =!= Float.PositiveInfinity &&
        array_min(c) =!= Float.NegativeInfinity, lit(true)))
  }

  /** DuckDB fragment of [[finiteVec]]. */
  def finiteVecSql(expr: String): String =
    s"(CASE WHEN len(list_filter($expr, x -> isnan(x) OR isinf(x))) > 0 THEN NULL ELSE $expr END)"
}
