package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustering for multi-dimensional data skipping —
  * the write-layout operator behind "cluster by (a, b)" in lakehouse table
  * formats.
  *
  * Why it matters at 100 TB: parquet row-group pruning skips a row group
  * when the predicate contradicts the group's column min/max. A table
  * sorted LINEARLY on `a` has tight min/max only for `a` — a predicate on
  * `b` scans everything. Sorting by the interleaved-bit Morton value gives
  * every clustered dimension locality: each row group covers a small
  * hyper-rectangle of the key space, so a selective predicate on ANY
  * clustered column (or any subset) skips most row groups. That is the
  * difference between a full 100 TB scan and reading a few hundred GB for
  * a two-column box query.
  *
  * Mechanics (all exact integer arithmetic — engine-independent and
  * SQL-mirrorable):
  *   1. each dimension is bucketized to `bits` bits with the ceil-width
  *      rule  w = ceil(range / 2^bits),  b = min((x − min) div w, 2^bits−1)
  *      — pure int ops, no floating point, overflow-free for any Long
  *      range (the width division never multiplies by the range);
  *   2. the z-value interleaves the bucket bits round-robin:
  *      bit k of bucket i lands at position k·n + i — a sum of disjoint
  *      single-bit terms built from builtin shift/and ops, so the whole
  *      expression stays inside whole-stage codegen (no UDF, no custom
  *      expression needed);
  *   3. the write path range-partitions + sorts by the z-value and drops
  *      it — the layout is the product; the data is unchanged.
  *
  * The min/max stats come from one tiny aggregate collected on the driver
  * (2n scalars — the kmeans-init class of justified collect) so the bucket
  * parameters are plan CONSTANTS: codegen folds them, and the z expression
  * is identical on every executor.
  */
object ZOrder {

  private def intDiv(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(org.apache.spark.sql.catalyst.expressions.IntegralDivide(
      ColumnBridge.expression(a.cast("long")),
      ColumnBridge.expression(b.cast("long")))).cast("long")
  }

  /** Bucket index of `x` within [min, max] at 2^bits resolution:
    * min((x − min) div ceil(range / 2^bits), 2^bits − 1). Exact integer
    * arithmetic; values outside [min, max] clamp to the edge buckets. */
  def bucket(x: Column, minV: Long, maxV: Long, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bucket: bits must be in [1,31], got $bits")
    require(maxV >= minV, s"bucket: max $maxV < min $minV")
    val k = 1L << bits
    // ceil-width computed on the DRIVER in Long arithmetic. Algebraic
    // identity: ceil((r+1)/k) = r/k + 1 for r ≥ 0 — used instead of
    // (r + k)/k, whose addition overflows Long when the column range is
    // within 2^bits of Long.MaxValue (w would silently become 1 and every
    // row clamp into the top bucket, collapsing the clustering).
    require(maxV - minV >= 0, "bucket: column range overflows Long")
    val w = (maxV - minV) / k + 1L // = ceil((max-min+1)/k), ≥ 1
    val raw = intDiv(greatest(x.cast("long") - lit(minV), lit(0L)), lit(w))
    least(raw, lit(k - 1L))
  }

  /** Morton interleave of pre-computed bucket columns (each in
    * [0, 2^bits)): bit k of bucket i → position k·n + i. Disjoint
    * single-bit terms summed — codegen-friendly builtin ops only. */
  def interleave(buckets: Seq[Column], bits: Int): Column = {
    val n = buckets.size
    require(n >= 2, s"interleave: need >= 2 dimensions, got $n")
    require(n * bits <= 62, s"interleave: $n dims x $bits bits exceeds 62")
    val terms = for {
      k <- 0 until bits
      (b, i) <- buckets.zipWithIndex
    } yield shiftleft(shiftrightunsigned(b, k).bitwiseAND(lit(1L)), k * n + i)
    terms.reduce(_ + _)
  }

  /** Column stats for the bucketizer: one driver-side (min, max) per
    * clustered column — 2n scalars, a plan-constant-producing collect. */
  def stats(df: DataFrame, cols: Seq[String]): Seq[(Long, Long)] = {
    val aggs = cols.flatMap(c =>
      Seq(min(col(c)).cast("long").as(s"__mn_$c"),
        max(col(c)).cast("long").as(s"__mx_$c")))
    val row = df.agg(aggs.head, aggs.tail: _*).collect().head
    cols.indices.map { i =>
      // min/max aggregate to NULL for an empty table or an all-null
      // column; getLong on those would throw an unhelpful NPE.
      require(!row.isNullAt(2 * i) && !row.isNullAt(2 * i + 1),
        s"ZOrder.stats: column '${cols(i)}' has no non-null values " +
          "(empty table or all-null column) — nothing to cluster on")
      (row.getLong(2 * i), row.getLong(2 * i + 1))
    }
  }

  /** `df` plus a z-value column over `cols` (integer-typed), bucketized to
    * `bits` bits per dimension against the full-df min/max. */
  def withZ(df: DataFrame, cols: Seq[String], bits: Int,
            zCol: String = "__z"): DataFrame = {
    val st = stats(df, cols)
    val buckets = cols.zip(st).map { case (c, (mn, mx)) =>
      bucket(col(c), mn, mx, bits)
    }
    df.withColumn(zCol, interleave(buckets, bits))
  }

  /** Write `df` to parquet clustered on the Morton curve over `cols`:
    * range-partition into `numFiles` z-runs, sort each by z, drop the
    * helper column. Every output file then covers a compact
    * hyper-rectangle per row group, so predicates on any clustered column
    * prune at the footer level. The range boundaries come from Spark's
    * reservoir sampling (layout-only nondeterminism — row CONTENT and
    * per-file sortedness are deterministic). */
  def writeZOrdered(df: DataFrame, path: String, cols: Seq[String],
                    bits: Int = 16, numFiles: Int = 0): Unit = {
    val z = withZ(df, cols, bits)
    val parts = if (numFiles > 0) numFiles
    else df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    z.repartitionByRange(parts, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }
}
