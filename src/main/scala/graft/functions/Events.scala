package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Batch event-stream analytics: the funnel / cohort instruments every
  * product-event warehouse runs (reference analog: the events tables a
  * pdtable user would pivot in pandas — here declared as join chains
  * Catalyst plans distributively).
  *
  * Scale shape shared by both operators: per-user milestones are plain
  * `min(when(...))` aggregates (one shuffle on user_id with map-side
  * combine); step chaining is user-keyed equi-joins of those per-user
  * frames (each at most one row per user — never event-sized after the
  * first aggregate); final reports are group-bys over user-level rows.
  * Everything is exact timestamp/integer arithmetic — no windows over
  * event rows, no sessionization state, engine-mirrorable end to end. */
object Events {

  /** Ordered-funnel completion (the AARRR conversion instrument): for the
    * step sequence s₁ → s₂ → … → sₖ, a user REACHES step i when an
    * event of type sᵢ exists STRICTLY AFTER the user's earliest
    * completion time of step i−1 (the standard earliest-chain semantics:
    * each milestone is the MIN qualifying timestamp, which maximizes
    * downstream conversion and is order-deterministic). Returns one row
    * per step: (step 1-based, event_type, n_users, conversion = users
    * reaching the step / users reaching step 1, rounded to 6). */
  def funnel(events: DataFrame, userCol: String, typeCol: String,
             tsCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel: no steps")
    require(steps.distinct.size == steps.size, "funnel: duplicate steps")
    val u = col(userCol).as("__u")
    // milestone frame per step: (user, earliest qualifying ts)
    var reached = events.filter(col(typeCol) === steps.head)
      .groupBy(u).agg(min(col(tsCol)).as("__t1"))
    var frames = Vector(reached)
    steps.zipWithIndex.drop(1).foreach { case (s, i) =>
      val prev = frames.last.select(col("__u"), col(s"__t$i").as("__tp"))
      val next = events.filter(col(typeCol) === s)
        .select(col(userCol).as("__u"), col(tsCol).as("__ts"))
        .join(prev, Seq("__u"))
        .filter(col("__ts") > col("__tp"))
        .groupBy(col("__u")).agg(min(col("__ts")).as(s"__t${i + 1}"))
      frames = frames :+ next
    }
    val counts = frames.zipWithIndex.map { case (f, i) =>
      f.agg(count(lit(1)).as(s"__n${i + 1}"))
    }
    val joined = counts.reduce(_.crossJoin(_))
    val rows = steps.zipWithIndex.map { case (s, i) =>
      struct(lit(i + 1).as("step"), lit(s).as("event_type"),
        col(s"__n${i + 1}").as("n_users"))
    }
    joined
      .select(explode(array(rows: _*)).as("r"), col("__n1"))
      .select(col("r.step").cast("long").as("step"), col("r.event_type"),
        col("r.n_users"),
        // an empty first step yields 0/0 — report 0, not a silently
        // poisoned conversion column. The ratio itself is the pinned
        // integer form: n_users/n1 is a count ratio that can land exactly
        // on a 6-decimal half boundary, where the engines' round()
        // disagree (see PinnedMath).
        when(col("__n1") > 0,
          graft.functions.PinnedMath.pinnedRatio(
            col("r.n_users"), col("__n1"), 6)).otherwise(lit(0.0))
          .as("conversion"))
  }

  /** Day-granularity cohort retention: users are cohorted by their FIRST
    * event day; for each (cohort_day, day_offset) the count of cohort
    * members active that day. The activation/stickiness table behind
    * every retention curve. Returns (cohort_day date, day_offset,
    * n_users, retention = n_users / cohort size at offset 0, rounded 6).
    * Exact date arithmetic (datediff of truncated days). */
  def cohortRetention(events: DataFrame, userCol: String, tsCol: String,
                      maxOffsetDays: Int = 30): DataFrame = {
    require(maxOffsetDays >= 0, s"maxOffsetDays must be >= 0")
    val days = events.select(col(userCol).as("__u"),
      to_date(col(tsCol)).as("__d")).distinct()
    val first = days.groupBy(col("__u")).agg(min(col("__d")).as("__c"))
    val activity = days.join(first, Seq("__u"))
      .select(col("__c"), datediff(col("__d"), col("__c")).as("day_offset"))
      .filter(col("day_offset") <= maxOffsetDays)
      .groupBy(col("__c"), col("day_offset"))
      .agg(count(lit(1)).as("n_users"))
    val base = activity.filter(col("day_offset") === 0)
      .select(col("__c"), col("n_users").as("__n0"))
    activity.join(base, Seq("__c"))
      .select(col("__c").as("cohort_day"),
        col("day_offset").cast("long").as("day_offset"), col("n_users"),
        graft.functions.PinnedMath.pinnedRatio(
          col("n_users"), col("__n0"), 6).as("retention"))
  }
}
