package org.apache.spark.sql.graft

import org.apache.spark.sql.DataFrame

/** Bridge to `internalCreateDataFrame` (package `org.apache.spark.sql`
  * visibility): rebuilds a DataFrame over the physical rows of an existing
  * one, so the new frame's LOGICAL plan is a flat `LogicalRDD` instead of
  * the full upstream tree.
  *
  * Why this exists: an iteratively-built DataFrame (label propagation,
  * Lloyd iterations) has a logical plan that roughly DOUBLES per round —
  * the analyzer, cache-lookup canonicalization, and AQE re-planning walk
  * that whole tree on EVERY downstream action, which can cost tens of
  * driver seconds per action while the actual stages take milliseconds.
  * This is the same truncation `Dataset.checkpoint` performs, but over an
  * in-memory persisted plan instead of checkpoint files, so the normal
  * persist/unpersist cache contract keeps working.
  */
object PlanBridge {
  /** New DataFrame with identical rows/schema and a flat logical plan. The
    * result is LAZY and unpersisted; its lineage re-executes `df`'s
    * physical plan (hitting `df`'s cache while that is live).
    *
    * Rows are copied out of the physical iterator (as `Dataset.checkpoint`
    * does) because `execute()` may yield REUSED UnsafeRow buffers: without
    * the copy, a caller persisting or localCheckpointing the underlying RDD
    * would store aliased buffers and read corrupted rows. */
  def flattenPlan(df: DataFrame): DataFrame = {
    val sess = df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    sess.internalCreateDataFrame(
      df.queryExecution.toRdd.map(_.copy()).setName("graft_flattened_plan"),
      df.schema)
  }
}
