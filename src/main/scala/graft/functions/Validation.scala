package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality validation (the Deequ/Great-Expectations
  * shape): a rule set evaluated against a DataFrame produces one report row
  * per rule — (rule, column, n_rows, n_violations, passed).
  *
  * Scale contract: every ROW-LEVEL rule (not-null, range, set membership,
  * regex, cross-column predicate) folds into ONE shared aggregate pass over
  * the table — a 100 TB validation costs one scan regardless of how many
  * such rules are declared, each rule one `sum(violated)` counter inside
  * the same map-side-combined aggregate. Rules that are irreducibly
  * key-based add bounded extra passes: uniqueness is one groupBy on the
  * checked key (shuffles 8-byte hashes of the key columns, Σ(k−1)
  * violations); referential integrity is one broadcast anti-join count
  * against the (dimension-sized) reference keys.
  *
  * Everything is exact integer counting — no sampling, no floats — so the
  * report is oracle-mirrorable verbatim.
  */
object Validation {

  sealed trait Rule { def name: String; def column: String }
  /** value must be non-null */
  case class NotNull(column: String) extends Rule { val name = "not_null" }
  /** value must lie in [lo, hi] (nulls violate) */
  case class InRange(column: String, lo: Double, hi: Double) extends Rule { val name = "in_range" }
  /** value must be one of the given strings (nulls violate) */
  case class InSet(column: String, values: Seq[String]) extends Rule { val name = "in_set" }
  /** string must match the regex (nulls violate) */
  case class MatchesRegex(column: String, regex: String) extends Rule { val name = "matches" }
  /** arbitrary row predicate that must hold (false/null violates); `column`
    * is a label for the report */
  case class Satisfies(column: String, predicate: Column) extends Rule { val name = "satisfies" }
  /** the column combination must be unique across the table */
  case class Unique(columns: Seq[String]) extends Rule {
    val name = "unique"; val column: String = columns.mkString(",")
  }
  /** every non-null value must appear in refKeys(refColumn) */
  case class RefIntegrity(column: String, refKeys: DataFrame, refColumn: String) extends Rule { val name = "ref_integrity" }

  /** Evaluate all rules; returns (rule, column, n_rows, n_violations,
    * passed) with one row per rule in declaration order. */
  def check(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    val rowRules = rules.zipWithIndex.collect {
      case (r: NotNull, i)      => (r: Rule, i, col(r.column).isNull)
      case (r: InRange, i)      => (r: Rule, i,
        !(col(r.column).isNotNull && col(r.column) >= r.lo && col(r.column) <= r.hi))
      case (r: InSet, i)        => (r: Rule, i,
        !(col(r.column).isNotNull && col(r.column).isin(r.values: _*)))
      case (r: MatchesRegex, i) => (r: Rule, i,
        !(col(r.column).isNotNull && col(r.column).rlike(r.regex)))
      case (r: Satisfies, i)    => (r: Rule, i, !coalesce(r.predicate, lit(false)))
    }
    val aggs = count(lit(1)).as("__n") +:
      rowRules.map { case (_, i, viol) =>
        sum(when(viol, 1L).otherwise(0L)).as(s"__v$i")
      }
    val rowReport: Seq[DataFrame] =
      if (rowRules.isEmpty) Seq.empty
      else {
        // ONE aggregate row exploded into the per-rule report rows — the
        // union must not re-execute the scan once per rule.
        val one = df.agg(aggs.head, aggs.tail: _*)
        val entries = array(rowRules.map { case (r, i, _) =>
          struct(lit(r.name).as("rule"), lit(r.column).as("column"),
            col("__n").as("n_rows"), col(s"__v$i").as("n_violations"),
            (col(s"__v$i") === 0L).as("passed"))
        }: _*)
        Seq(one.select(explode(entries).as("__e")).select(
          col("__e.rule").as("rule"), col("__e.column").as("column"),
          col("__e.n_rows").as("n_rows"),
          col("__e.n_violations").as("n_violations"),
          col("__e.passed").as("passed")))
      }
    val keyReport: Seq[DataFrame] = rules.collect {
      case r: Unique =>
        // Σ(k−1) over duplicated key groups; the aggregate carries only the
        // key columns through the shuffle.
        val dups = df.groupBy(r.columns.map(col): _*)
          .agg(count(lit(1)).as("__k"))
          .agg(coalesce(sum(col("__k") - 1), lit(0L)).as("__v"),
            coalesce(sum(col("__k")), lit(0L)).as("__n"))
        dups.select(lit(r.name).as("rule"), lit(r.column).as("column"),
          col("__n").as("n_rows"), col("__v").as("n_violations"),
          (col("__v") === 0L).as("passed"))
      case r: RefIntegrity =>
        val keys = r.refKeys.select(col(r.refColumn).as(r.column)).distinct()
        val miss = df.select(col(r.column)).filter(col(r.column).isNotNull)
          .join(broadcast(keys), Seq(r.column), "left_anti")
        val n = df.select(count(lit(1)).as("__n"))
        val v = miss.agg(count(lit(1)).as("__v"))
        n.crossJoin(v).select(lit(r.name).as("rule"),
          lit(r.column).as("column"), col("__n").as("n_rows"),
          col("__v").as("n_violations"), (col("__v") === 0L).as("passed"))
    }
    (rowReport ++ keyReport).reduce(_.unionByName(_))
  }

  /** Pre-join diagnostics — answer "what happens if I join these on k?"
    * BEFORE burning a cluster-hour finding out: exact row/distinct-key
    * counts per side, matched-key count, the EXACT output cardinality
    * Σ cnt_a(k)·cnt_b(k), and the worst per-key fan-out (the row that
    * becomes one task's skew partition). All from the two key-count
    * tables — one aggregate per side plus a key-keyed join of
    * vocabulary-sized frames; the fact rows are read once and never
    * shuffled whole.
    *
    * Null keys are excluded (they never match in SQL). Returns ONE row:
    * (n_left, n_right, keys_left, keys_right, keys_matched,
    * est_output_rows, max_fanout_key, max_fanout). */
  def joinDiagnostics(left: DataFrame, right: DataFrame,
                      leftKey: String, rightKey: String): DataFrame = {
    val lc = left.filter(col(leftKey).isNotNull)
      .groupBy(col(leftKey).as("__k")).agg(count(lit(1)).as("__ca"))
    val rc = right.filter(col(rightKey).isNotNull)
      .groupBy(col(rightKey).as("__k")).agg(count(lit(1)).as("__cb"))
    val joined = lc.join(rc, Seq("__k"))
      .select(col("__k"), (col("__ca") * col("__cb")).as("__f"))
    val lStats = lc.agg(sum(col("__ca")).as("n_left"),
      count(lit(1)).as("keys_left"))
    val rStats = rc.agg(sum(col("__cb")).as("n_right"),
      count(lit(1)).as("keys_right"))
    val jStats = joined.agg(
      count(lit(1)).as("keys_matched"),
      sum(col("__f")).as("est_output_rows"),
      max(struct(col("__f"), col("__k").cast("string").as("__ks")))
        .as("__worst"))
    lStats.crossJoin(rStats).crossJoin(jStats)
      .select(
        coalesce(col("n_left"), lit(0L)).as("n_left"),
        coalesce(col("n_right"), lit(0L)).as("n_right"),
        col("keys_left"), col("keys_right"), col("keys_matched"),
        coalesce(col("est_output_rows"), lit(0L)).as("est_output_rows"),
        col("__worst.__ks").as("max_fanout_key"),
        coalesce(col("__worst.__f"), lit(0L)).as("max_fanout"))
  }

  /** One-sweep column profiler — the first query against an unfamiliar
    * table: per column, row/null/EXACT-distinct counts, lexicographic
    * min/max, and the modal value with a deterministic tie-break.
    *
    * Scale shape: the table is stacked to (col_name, value-as-string)
    * rows — a d× map-side explode that partial-aggregates in place, so
    * the shuffle carries one row per DISTINCT (column, value), i.e. the
    * vocabulary, never the data. Exact distincts come from the two-level
    * collapse (value-level groupBy, then column-level count) instead of d
    * count(DISTINCT) aggregates, whose Expand would copy the fact table
    * d times in one pass. The mode is argmax over the value-level counts
    * with ties to the SMALLEST value string — a total order, so the whole
    * profile is engine-independent.
    *
    * Values are compared as STRINGS (callers cast floats to a fixed-scale
    * decimal first for canonical text); min/max/mode order is UTF-8
    * binary in both Spark and DuckDB. Returns one row per profiled
    * column: (col_name, n_rows, n_nulls, n_distinct, min_value,
    * max_value, top_value, top_count). */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile: no columns")
    val stacked = df.select(explode(array(cols.map(c =>
        struct(lit(c).as("col_name"), col(c).cast("string").as("value"))): _*))
        .as("cv"))
      .select(col("cv.col_name").as("col_name"), col("cv.value").as("value"))
    val rowStats = stacked.groupBy(col("col_name")).agg(
      count(lit(1)).as("n_rows"),
      sum(when(col("value").isNull, 1L).otherwise(0L)).as("n_nulls"))
    val vc = stacked.filter(col("value").isNotNull)
      .groupBy(col("col_name"), col("value"))
      .agg(count(lit(1)).as("c"))
    val colStats = vc.groupBy(col("col_name")).agg(
      count(lit(1)).as("n_distinct"),
      min(col("value")).as("min_value"),
      max(col("value")).as("max_value"),
      max(col("c")).as("top_count"))
    val modes = vc
      .join(colStats.select(col("col_name"), col("top_count")),
        Seq("col_name"))
      .filter(col("c") === col("top_count"))
      .groupBy(col("col_name")).agg(min(col("value")).as("top_value"))
    rowStats.join(colStats, Seq("col_name"), "left")
      .join(modes, Seq("col_name"), "left")
      .select(col("col_name"), col("n_rows"), col("n_nulls"),
        coalesce(col("n_distinct"), lit(0L)).as("n_distinct"),
        col("min_value"), col("max_value"), col("top_value"),
        coalesce(col("top_count"), lit(0L)).as("top_count"))
  }

  /** Cumulative Poisson(1) thresholds for the inverse-CDF bootstrap
    * weight: w = #{k : threshold_k ≤ u}, capped at 6 events (P > 6 is
    * 8×10⁻⁵ — the truncation bias is far below bootstrap noise). Decimal
    * literals parse to identical doubles in every engine. */
  private val PoissonCdf = Seq(
    0.36787944117144233, 0.7357588823428847, 0.9196986029286058,
    0.9810118431238462, 0.9963401531726563, 0.9994058151824183)

  /** Deterministic Poisson-bootstrap confidence interval for the mean of
    * `valueCol` (Chamandy et al. 2012, "Estimating Uncertainty for
    * Massive Data Streams" — the bootstrap that works in one distributed
    * pass: each (row, resample) draws an independent Poisson(1) weight
    * instead of multinomial resampling, which would need global
    * coordination). The weight is a PURE FUNCTION of (id, resample) —
    * u = (md5₄₈(id:b)+0.5)/2⁴⁸ through the inverse CDF — so the interval
    * is reproducible across runs, partitioning, and engines; values are
    * rounded to 6 decimals and DECIMAL-summed per resample (the
    * determinism scheme), making every resample mean exact.
    *
    * Scale shape: the corpus × `resamples` expansion collapses in
    * map-side partial aggregation — the shuffle carries `resamples` ×
    * partitions partial rows, never data; the percentile window runs
    * over `resamples` rows only. Returns ONE row: (n_rows, resamples,
    * mean, ci_lo, ci_hi) with nearest-rank percentiles. */
  def bootstrapCI(df: DataFrame, idCol: String, value: Column,
                  resamples: Int = 100, loPct: Int = 5, hiPct: Int = 95,
                  outScale: Int = 6): DataFrame = {
    require(resamples > 1, s"resamples must be > 1, got $resamples")
    require(loPct >= 1 && hiPct <= 100 && loPct < hiPct,
      s"need 1 <= loPct < hiPct <= 100, got $loPct/$hiPct")
    val dec = round(value.cast("double"), 6).cast("decimal(28,6)")
    val base = df.select(col(idCol).as("__id"), dec.as("__x"))
    val expanded = base
      .select(col("__id"), col("__x"),
        explode(sequence(lit(0), lit(resamples - 1))).as("__b"))
    val u = (conv(substring(md5(
        concat(col("__id").cast("string"), lit(":"), col("__b"))), 1, 12),
      16, 10).cast("double") + lit(0.5)) / lit(281474976710656.0)
    val w = PoissonCdf.zipWithIndex.foldRight(lit(PoissonCdf.size): Column) {
      case ((c, i), rest) => when(u < lit(c), i).otherwise(rest)
    }
    val means = expanded
      .select(col("__b"), col("__x"), w.cast("decimal(9,0)").as("__w"))
      .groupBy(col("__b"))
      .agg(sum(col("__x") * col("__w")).as("__swx"), sum(col("__w")).as("__sw"))
      .select(col("__b"),
        // Σxw/Σw with Σxw integral·10^-6: scale both by 10^6 and take the
        // pinned integer ratio (a boundary-free rounded mean)
        PinnedMath.pinnedRatio(col("__swx") * lit(1000000L),
          col("__sw") * lit(1000000L), outScale).as("__m"))
    val ranked = means.withColumn("__rn",
      row_number().over(org.apache.spark.sql.expressions.Window
        .orderBy(col("__m"), col("__b")))) // resamples rows only
    def pick(p: Int) = ranked
      .filter(col("__rn") === lit((p * resamples + 99) / 100))
      .select(col("__m"))
    val overall = base.agg(
      count(lit(1)).as("n_rows"),
      PinnedMath.pinnedRatio(sum(col("__x")) * lit(1000000L),
        count(lit(1)) * lit(1000000L), outScale).as("mean"))
    overall
      .crossJoin(broadcast(pick(loPct).select(col("__m").as("ci_lo"))))
      .crossJoin(broadcast(pick(hiPct).select(col("__m").as("ci_hi"))))
      .select(col("n_rows"), lit(resamples).cast("long").as("resamples"),
        col("mean"), col("ci_lo"), col("ci_hi"))
  }
}
