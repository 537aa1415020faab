package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bin-and-verify range join: `points.t ∈ [intervals.lo, intervals.hi]`
  * (optionally per partition key, e.g. user_id).
  *
  * A naive non-equi join plans as BroadcastNestedLoopJoin or a cartesian
  * product — quadratic at scale. Here intervals explode to the time bins
  * they overlap, points carry their single bin, and the join is a plain
  * hash equi-join on (partition keys, bin) with the exact range predicate
  * verified on the matches. Each qualifying (point, interval) pair joins
  * in EXACTLY one bin (the point's), so no dedup pass is needed.
  *
  * Choose `binSeconds` near the typical interval length: explode factor is
  * `1 + span/bin`, collision rate per bin is `points_per_bin ×
  * intervals_overlapping_bin`.
  *
  * Bin arithmetic uses integer `div` on epoch microseconds — double
  * division would lose precision past 2^53 µs.
  */
object RangeJoin {

  private def binOf(ts: Column, binUs: Long): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    // FLOOR division: IntegralDivide truncates toward zero, which would
    // mis-bin pre-1970 timestamps; subtracting the non-negative pmod first
    // makes the dividend an exact multiple, so truncation == floor.
    val us = unix_micros(ts)
    val floored = us - pmod(us, lit(binUs))
    ColumnBridge.column(org.apache.spark.sql.catalyst.expressions.IntegralDivide(
      ColumnBridge.expression(floored),
      ColumnBridge.expression(lit(binUs)))).cast("long")
  }

  /** Inner range join; all columns of both inputs survive (prefix-rename
    * before calling if names collide). */
  def binnedRangeJoin(points: DataFrame, intervals: DataFrame,
                      pointTime: String, lo: String, hi: String,
                      partitionCols: Seq[String], binSeconds: Long): DataFrame = {
    val binUs = binSeconds * 1000000L
    val p = points.withColumn("__bin", binOf(col(pointTime), binUs))
    val iv = intervals.withColumn("__bin",
      explode(sequence(binOf(col(lo), binUs), binOf(col(hi), binUs))))
    p.join(iv, partitionCols :+ "__bin")
      .filter(col(pointTime) >= col(lo) && col(pointTime) <= col(hi))
      .drop("__bin")
  }
}
