package graft.functions

import org.apache.spark.sql.SparkSession

/** Session conf for bounded fixed-point loops: pinned shuffle partitions
  * (when iterPartitions > 0) and AQE bypassed for the loop's duration.
  *
  * A bounded iteration re-executes the SAME tiny plan shape every round
  * over flattened, persisted generations with an explicit partition
  * contract (`iterPartitions`), so runtime re-planning adds no
  * information — but AQE re-plans each generation and schedules every
  * query stage as its own job. Measured at local[32] sf0.1: pageRank
  * spent 3.3 s of a 7.5 s wall in DRIVER gaps across 85 jobs (~10 jobs
  * per iteration); with AQE bypassed the loop is ~3 jobs per iteration.
  * Static planning still sees exact sizes for broadcast decisions:
  * every generation is a materialized InMemoryRelation. Both confs are
  * restored on every exit path. */
object IterConf {
  def withIterConf[T](spark: SparkSession, iterPartitions: Int)(body: => T): T = {
    val prevShuffle = spark.conf.get("spark.sql.shuffle.partitions")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    if (iterPartitions > 0)
      spark.conf.set("spark.sql.shuffle.partitions", iterPartitions)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try body
    finally {
      spark.conf.set("spark.sql.shuffle.partitions", prevShuffle)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    }
  }
}
