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

  /** Planned parallelism of a bare scan pipeline, WITHOUT executing any
    * upstream stage.
    *
    * Returns Some(partition count) when `df`'s physical plan is
    * exchange-free — a scan pipeline, possibly under projections, filters
    * or unions — in which case building the plan's RDD only enumerates the
    * planned input splits (no job runs, with or without AQE: adaptive
    * execution materializes query STAGES, and stages exist only at
    * exchanges). Returns None when the plan already contains an exchange:
    * there the downstream parallelism is governed by shuffle partitions /
    * AQE anyway, and probing it via `df.rdd` would finalize the adaptive
    * plan and EXECUTE every upstream shuffle stage as a throwaway job —
    * an arbitrary caller-supplied input would pay its whole pipeline
    * twice. */
  def scanParallelism(df: DataFrame): Option[Int] = {
    val plan = df.queryExecution.sparkPlan
    val hasExchange = plan.find {
      case _: org.apache.spark.sql.execution.exchange.Exchange => true
      case _ => false
    }.isDefined
    if (hasExchange) None
    else Some(df.queryExecution.toRdd.getNumPartitions)
  }
}
