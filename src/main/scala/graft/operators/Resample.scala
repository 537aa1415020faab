package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series resampling: regular time-grid per key with
  * last-observation-carried-forward gap filling — the pandas
  * `resample().ffill()` analog, built distributively:
  *
  *   1. aggregate observations into their bins (one shuffle on key+bin);
  *   2. per key, generate the full bin range with sequence+explode (no
  *      driver-side calendar);
  *   3. left-join observations onto the grid and forward-fill with a
  *      running `last(_, ignoreNulls)` window.
  *
  * The only shuffles are the bin aggregation and the per-key window sort —
  * both on (key), so the whole pipeline co-partitions.
  */
object Resample {

  /** Resample `valueCol` to `binSeconds` bins per `keyCol`, carrying the
    * last observed value forward across empty bins. Bins span each key's
    * own [min, max] observation range. Output: (key, bin_ts, value). */
  def resampleLocf(df: DataFrame, keyCol: String, tsCol: String,
                   valueCol: String, binSeconds: Long,
                   agg: Column => Column = last(_, ignoreNulls = true)): DataFrame = {
    val bin = (unix_seconds(col(tsCol)) / binSeconds).cast("long") * binSeconds

    // 1. observations per occupied bin (value = aggregate within the bin)
    val binned = df
      .withColumn("__bin", bin)
      .groupBy(col(keyCol), col("__bin"))
      .agg(agg(col(valueCol)).as("__obs"))

    // 2. dense grid per key
    val grid = binned
      .groupBy(col(keyCol))
      .agg(min(col("__bin")).as("__lo"), max(col("__bin")).as("__hi"))
      .select(col(keyCol),
        explode(sequence(col("__lo"), col("__hi"), lit(binSeconds))).as("__bin"))

    // 3. join + forward fill
    val w = Window.partitionBy(col(keyCol)).orderBy(col("__bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(binned, Seq(keyCol, "__bin"), "left")
      .withColumn("value", last(col("__obs"), ignoreNulls = true).over(w))
      .select(col(keyCol), timestamp_seconds(col("__bin")).as("bin_ts"), col("value"))
  }

  /** Resample with LINEAR interpolation across empty bins — the
    * `resample().interpolate()` analog for quantities where carrying a
    * stale reading forward biases (sensor drift, prices, rates). Same
    * scale shape as [[resampleLocf]]: bin aggregation + per-key grid +
    * two gap-fill windows, everything partitioned by key.
    *
    * Empty interior bins get pval + (nval − pval)·(bin − pbin)/(nbin −
    * pbin) between the surrounding observed bins — one parenthesized
    * IEEE chain rounded to 6 decimals, so the fill is engine-mirrorable;
    * the grid spans each key's own observed range, so every gap has both
    * neighbors. Output: (key, bin_ts, value, interpolated). */
  def resampleInterp(df: DataFrame, keyCol: String, tsCol: String,
                     valueCol: String, binSeconds: Long,
                     agg: Column => Column = last(_, ignoreNulls = true)): DataFrame = {
    val bin = (unix_seconds(col(tsCol)) / binSeconds).cast("long") * binSeconds
    val binned = df
      .withColumn("__bin", bin)
      .groupBy(col(keyCol), col("__bin"))
      .agg(agg(col(valueCol)).as("__obs"))
    val grid = binned
      .groupBy(col(keyCol))
      .agg(min(col("__bin")).as("__lo"), max(col("__bin")).as("__hi"))
      .select(col(keyCol),
        explode(sequence(col("__lo"), col("__hi"), lit(binSeconds))).as("__bin"))
    val back = Window.partitionBy(col(keyCol)).orderBy(col("__bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = Window.partitionBy(col(keyCol)).orderBy(col("__bin"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val obsBin = when(col("__obs").isNotNull, col("__bin"))
    val lerp = col("__pv") + (col("__nv") - col("__pv")) *
      (col("__bin") - col("__pb")).cast("double") /
      (col("__nb") - col("__pb")).cast("double")
    grid.join(binned, Seq(keyCol, "__bin"), "left")
      .withColumn("__pb", last(obsBin, ignoreNulls = true).over(back))
      .withColumn("__pv", last(col("__obs"), ignoreNulls = true).over(back))
      .withColumn("__nb", first(obsBin, ignoreNulls = true).over(fwd))
      .withColumn("__nv", first(col("__obs"), ignoreNulls = true).over(fwd))
      .select(col(keyCol), timestamp_seconds(col("__bin")).as("bin_ts"),
        when(col("__obs").isNotNull, col("__obs"))
          .otherwise(round(lerp, 6)).as("value"),
        col("__obs").isNull.as("interpolated"))
  }
}

/** Skew mitigation for joins whose hot keys overwhelm single tasks and
  * whose build side is too large to broadcast outright: salt the probe side
  * into `buckets` sub-keys and replicate the build side across them, turning
  * one hot partition into `buckets` even ones. (For skewed aggregations,
  * Spark's map-side partial aggregation + AQE skew handling already cover
  * it; this is the join-side lever.)
  */
object SkewedJoin {

  def saltedJoin(probe: DataFrame, build: DataFrame, usingColumns: Seq[String],
                 buckets: Int, joinType: String = "inner"): DataFrame = {
    // deterministic salt: hash of the probe row's full key list + a spread
    // column would be ideal; a per-row uniform salt from the key hash and
    // monotonically varying bits is enough to spread hot keys
    val salted = probe.withColumn("__salt",
      pmod(xxhash64(struct(probe.columns.map(col).toIndexedSeq: _*)), lit(buckets)))
    val replicated = build
      .withColumn("__salt", explode(sequence(lit(0), lit(buckets - 1))))
      .withColumn("__salt", col("__salt").cast("long"))
    salted.join(replicated, usingColumns :+ "__salt", joinType).drop("__salt")
  }
}
