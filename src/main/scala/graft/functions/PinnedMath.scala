package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Engine-pinned rounded ratio of two INTEGER expressions — the
  * boundary-free replacement for `round(num.cast(double) / den, k)` on
  * count ratios (conversion rates, retention, shares, Jaccard, rank
  * statistics).
  *
  * Why the IEEE shape is not safe for counts: a ratio of integers is often
  * EXACTLY representable in binary (any denominator 2^m — 1/128 =
  * 0.0078125) and can therefore land EXACTLY on a k-decimal half boundary,
  * where Spark's `round` (BigDecimal HALF_UP over the shortest decimal
  * rendering) and DuckDB's (scaled libm nearbyint, ties to even) disagree:
  * round(1/128, 6) = 0.007813 vs 0.007812. Such data passes or fails the
  * driver gate by luck of the corpus — the q_doc_dsir class of failure.
  *
  * This helper never forms the quotient in floating point:
  *
  *   ratio·10^k = sign(num) · (2·|num|·10^k + den) div (2·den)
  *
  * — one integral division, half-away-from-zero (= BigDecimal HALF_UP for
  * both signs), all operands DECIMAL(38,0) so there is no BIGINT overflow
  * cliff (exact while 2·|num|·10^k < 10^38; `div` on decimals is
  * BigDecimal divideToIntegralValue — exact, truncating toward zero, and
  * both CASE branches keep operands non-negative so floor ≡ truncate).
  * The final `/10^k` maps a small integer through one exact IEEE double
  * division. Mirror: `Tables.pinnedRatioSql` (HUGEINT arithmetic).
  *
  * `num` may be negative; `den` must be strictly positive (a zero den is
  * a LOUD error under ANSI mode, exactly like DuckDB's `// 0` — callers
  * with a legitimate empty-denominator case guard with `when()`). Both
  * must be integer-valued expressions (counts, ranks, integer sums).
  */
object PinnedMath {

  def pinnedRatio(num: Column, den: Column, outScale: Int): Column = {
    require(outScale >= 0 && outScale <= 12, s"outScale $outScale out of range")
    val twoTenK = ("2" + "0" * outScale) // 2·10^k
    val n = num.cast("decimal(38,0)")
    val d = den.cast("decimal(38,0)")
    val pos = (n * expr(s"CAST($twoTenK AS DECIMAL(${outScale + 1},0))") + d)
    val neg = ((-n) * expr(s"CAST($twoTenK AS DECIMAL(${outScale + 1},0))") + d)
    val den2 = d * lit(2).cast("decimal(1,0)")
    when(n >= 0, expr_div(pos, den2))
      .otherwise(-expr_div(neg, den2))
      .cast("long") / lit(math.pow(10.0, outScale))
  }

  /** `a div b` as a Column (Spark has no Column-level integral-divide
    * helper; the SQL operator is exact divideToIntegralValue on decimals). */
  private def expr_div(a: Column, b: Column): Column =
    call_function("div", a, b)
}
