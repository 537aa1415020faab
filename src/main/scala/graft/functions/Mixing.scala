package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-mixture operators: deterministic per-group downsampling to hit a
  * target source mix — the "mixture weights" step of assembling a training
  * corpus from heterogeneous sources (web, code, books …).
  *
  * Scale shape: group sizes are one tiny aggregate (broadcast back); the
  * keep/drop decision is a pure per-row hash comparison — no shuffle of the
  * data, no sampling state, reproducible across engines, runs, partitioning
  * and cluster sizes (seeded `sample()` is none of those).
  */
object Mixing {

  /** Deterministic bucket in [0, 10000) from the md5 of a key column —
    * integer-exact in any engine (5 hex digits → mod; the ~5% modulo bias
    * is identical everywhere and irrelevant for rate thresholding). */
  def hashBucket10k(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 5), 16, 10).cast("long") % 10000

  /** Downsample every group to ~`targetPerGroup` rows: keep a row iff
    * bucket(key) · n_group < target · 10000 (pure integer arithmetic — the
    * exact same predicate is expressible in SQL for the oracle). Groups at
    * or under the target keep everything; larger groups keep a deterministic
    * ~target-sized hash slice. */
  def rebalanceGroups(df: DataFrame, keyCol: String, groupCol: String,
                      targetPerGroup: Long): DataFrame = {
    val counts = df.groupBy(col(groupCol)).agg(count(lit(1)).as("__n"))
    df.join(broadcast(counts), Seq(groupCol))
      .filter(hashBucket10k(col(keyCol)) * col("__n") <
        lit(targetPerGroup) * lit(10000L))
      .drop("__n")
  }

  /** Per-group kept/total report for a rebalanced frame — the mixture
    * audit a pipeline logs after resampling. */
  def mixReport(df: DataFrame, rebalanced: DataFrame,
                groupCol: String): DataFrame = {
    val before = df.groupBy(col(groupCol)).agg(count(lit(1)).as("n_before"))
    val after = rebalanced.groupBy(col(groupCol)).agg(count(lit(1)).as("n_after"))
    before.join(after, Seq(groupCol), "left")
      .select(col(groupCol), col("n_before"),
        coalesce(col("n_after"), lit(0L)).as("n_after"))
  }
}
