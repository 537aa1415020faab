package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Events

/** Batch event analytics (functions.Events): funnel earliest-chain
  * semantics and cohort retention against hand-computed fixtures. */
class EventsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(day: Int, hour: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-$day%02d $hour%02d:00:00")

  test("funnel counts earliest-chain completions; out-of-order steps " +
    "don't convert; conversion is vs step 1") {
    val events = Seq(
      // user 1: full ordered funnel
      (1L, "signup", ts(1, 1)), (1L, "view", ts(1, 2)),
      (1L, "click", ts(1, 3)), (1L, "purchase", ts(1, 4)),
      // user 2: view BEFORE signup (must not count), then view after → ok
      (2L, "view", ts(1, 1)), (2L, "signup", ts(1, 2)), (2L, "view", ts(1, 3)),
      // user 3: signup only
      (3L, "signup", ts(2, 1)),
      // user 4: clicks without ever signing up — not in the funnel at all
      (4L, "view", ts(1, 1)), (4L, "click", ts(1, 2)),
      // user 5: signup then purchase but no view/click in between
      (5L, "signup", ts(3, 1)), (5L, "purchase", ts(3, 2))
    ).toDF("user_id", "event_type", "ts")
    val got = Events.funnel(events.repartition(5), "user_id", "event_type",
        "ts", Seq("signup", "view", "click", "purchase"))
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2), r.getDouble(3))).toMap
    assert(got(1L) == ("signup", 4L, 1.0))   // users 1,2,3,5
    assert(got(2L) == ("view", 2L, 0.5))     // users 1,2
    assert(got(3L) == ("click", 1L, 0.25))   // user 1
    assert(got(4L) == ("purchase", 1L, 0.25))
  }

  test("funnel strictly-after semantics: same-timestamp step does not " +
    "advance the chain") {
    val events = Seq(
      (1L, "signup", ts(1, 1)), (1L, "view", ts(1, 1)), // simultaneous
      (2L, "signup", ts(1, 1)), (2L, "view", ts(1, 2))
    ).toDF("user_id", "event_type", "ts")
    val got = Events.funnel(events, "user_id", "event_type", "ts",
        Seq("signup", "view"))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got == Map(1L -> 2L, 2L -> 1L))
  }

  test("funnel with an absent first step reports zero conversions, " +
    "not NaN") {
    val events = Seq((1L, "view", ts(1, 1))).toDF("user_id", "event_type", "ts")
    val got = Events.funnel(events, "user_id", "event_type", "ts",
        Seq("signup", "view"))
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
    assert(got.forall { case (_, n, c) => n == 0L && c == 0.0 }, got.toSeq)
  }

  test("cohortRetention: hand-computed cohorts, offsets capped, " +
    "retention vs day-0 size") {
    val events = Seq(
      // cohort 2024-01-01: users 1,2; user 1 active days 0,1,3; user 2 day 0
      (1L, ts(1, 5)), (1L, ts(1, 9)), (1L, ts(2, 1)), (1L, ts(4, 1)),
      (2L, ts(1, 1)),
      // cohort 2024-01-02: user 3 active days 0 and 9 (offset 9 > cap 7)
      (3L, ts(2, 1)), (3L, ts(11, 1))
    ).toDF("user_id", "ts")
    val got = Events.cohortRetention(events.repartition(3), "user_id", "ts",
        maxOffsetDays = 7)
      .collect().map(r => (r.getDate(0).toString, r.getLong(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    assert(got == Map(
      ("2024-01-01", 0L) -> (2L, 1.0),
      ("2024-01-01", 1L) -> (1L, 0.5),
      ("2024-01-01", 3L) -> (1L, 0.5),
      ("2024-01-02", 0L) -> (1L, 1.0)), got.toString)
  }
}
