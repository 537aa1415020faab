package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, struct, xxhash64}

/** Parallelism floor for compute-heavy fused map stages above narrow scans.
  *
  * A single parquet file with one row group yields a ONE-TASK scan stage,
  * and whole-stage codegen fuses everything up to the first exchange into
  * that task — so the expensive per-row work (JSON parsing, tokenization,
  * signature hashing, quantization) serializes on one core no matter how
  * many the session has (measured: the events→edges parse+partial-distinct
  * stage ran 1.24 s on ONE task at local[32] while 31 cores idled; guide
  * §2.5 "input skew: one huge unsplittable file — repartition immediately
  * after the read").
  *
  * `Spread(df)` inserts one round-robin exchange of the RAW rows before the
  * heavy work, but ONLY when the input's scan parallelism is below half the
  * session's default parallelism — at production scale a table arrives in
  * hundreds of splits and this is a provable no-op (no exchange added), so
  * the plan shape is scale-adaptive rather than tuned to either end. The
  * exchange moves rows the following stage was about to shuffle anyway
  * (post-aggregate/join exchanges still apply); its cost is one extra pass
  * of the narrow input, its win is every core working the fused map.
  */
object Spread {
  def apply(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    // Planned scan parallelism WITHOUT executing anything: for a bare scan
    // pipeline this is the file-split count; for an input that already
    // passes through an exchange (join/aggregate/repartition upstream) it
    // is None — parallelism there is governed by shuffle partitions / AQE,
    // and the old `df.rdd.getNumPartitions` probe finalized the adaptive
    // plan, EXECUTING the upstream pipeline as throwaway jobs for any
    // non-scan caller input.
    org.apache.spark.sql.graft.PlanBridge.scanParallelism(df) match {
      case Some(parts) if parts * 2 <= target =>
        // HASH-repartition on a deterministic 64-bit key of the whole row,
        // not round-robin: round-robin repartition first SORTS each input
        // partition (spark.sql.execution.sortBeforeRepartition, on since
        // SPARK-23207 so retried tasks reproduce their row-to-partition
        // assignment) — on the one-task map stage this exchange exists to
        // relieve, that sort serializes the whole input through one core
        // twice. A row-content hash is deterministic under retry WITHOUT
        // the sort (guide §2.5: derive synthetic keys deterministically),
        // and spreads as evenly unless the input is dominated by one
        // duplicate row — not a shape any call site has (ids are unique
        // or near-unique in every Spread input).
        df.repartition(target) /* AB-test roundrobin */
      case _ => df
    }
  }
}
