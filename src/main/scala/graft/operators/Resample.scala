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
