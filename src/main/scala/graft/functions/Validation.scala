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
}
