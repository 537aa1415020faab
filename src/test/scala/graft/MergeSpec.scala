package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Merge

/** SCD-1 upsert (operators.Merge). */
class MergeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val snapshot =
    Seq((1L, "a", 10), (2L, "b", 20), (3L, "c", 30), (4L, "d", 40))
      .toDF("id", "v", "n")

  test("upsert replaces matched, inserts new, deletes tombstoned") {
    val changes = Seq(
      (2L, "b2", 21, false), // update
      (5L, "e", 50, false),  // insert
      (3L, "c", 30, true))   // delete
      .toDF("id", "v", "n", "del")
    val got = Merge.upsert(snapshot, changes, Seq("id"), Some("del"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    assert(got == Set((1L, "a", 10), (2L, "b2", 21), (4L, "d", 40), (5L, "e", 50)))
  }

  test("upsert without deleteCol is pure upsert; null delete flag means keep") {
    val changes = Seq((1L, "a9", 11)).toDF("id", "v", "n")
    val got = Merge.upsert(snapshot, changes, Seq("id"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(got == Map(1L -> "a9", 2L -> "b", 3L -> "c", 4L -> "d"))

    val withNull = Seq((1L, "a9", 11, null.asInstanceOf[java.lang.Boolean]))
      .toDF("id", "v", "n", "del")
    val got2 = Merge.upsert(snapshot, withNull, Seq("id"), Some("del"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(got2(1L) == "a9", "null tombstone flag must mean upsert, not delete")
  }

  test("upsert refuses duplicate change keys when strict") {
    val dup = Seq((2L, "x", 1, false), (2L, "y", 2, false))
      .toDF("id", "v", "n", "del")
    val e = intercept[IllegalArgumentException] {
      Merge.upsert(snapshot, dup, Seq("id"), Some("del"),
        requireUniqueKeys = true)
    }
    assert(e.getMessage.contains("duplicate key"))
    // non-strict passes the ambiguity through (documented contract)
    assert(Merge.upsert(snapshot, dup, Seq("id"), Some("del")).count() == 5)
  }

  test("plan: snapshot side is one broadcast left-anti join, no shuffle") {
    val changes = Seq((2L, "b2", 21)).toDF("id", "v", "n")
    val plan = Merge.upsert(snapshot, changes, Seq("id"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("LeftAnti"), s"no anti join:\n$plan")
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      s"change keys not broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"snapshot shuffled:\n$plan")
  }

  // --- SCD-2 ---------------------------------------------------------------

  private val ts = (s: String) => java.sql.Timestamp.valueOf(s)
  private val t1 = ts("2026-01-01 00:00:00")
  private val t2 = ts("2026-06-01 00:00:00")

  private def history = {
    // key 1: one closed v0 + current v1; keys 2-4: current only
    Seq(
      (1L, "a0", 10, ts("2025-01-01 00:00:00"), t1),
      (1L, "a", 10, t1, null.asInstanceOf[java.sql.Timestamp]),
      (2L, "b", 20, t1, null.asInstanceOf[java.sql.Timestamp]),
      (3L, "c", 30, t1, null.asInstanceOf[java.sql.Timestamp]),
      (4L, "d", 40, t1, null.asInstanceOf[java.sql.Timestamp]))
      .toDF("id", "v", "n", "valid_from", "valid_to")
  }

  test("scd2: close+insert on change, no-op on identical, insert new, tombstone closes") {
    val changes = Seq(
      (1L, "a2", 11, false), // real change → close v1, insert v2
      (2L, "b", 20, false),  // identical → NO version
      (3L, "c", 30, true),   // tombstone → close, no insert
      (5L, "e", 50, false))  // new key → first version
      .toDF("id", "v", "n", "del")
    val got = Merge.scd2Upsert(history, changes, Seq("id"), lit(t2),
        deleteCol = Some("del"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2),
        r.getTimestamp(3), r.getTimestamp(4))).toSet
    val expected = Set(
      (1L, "a0", 10, ts("2025-01-01 00:00:00"), t1), // closed passes through
      (1L, "a", 10, t1, t2),                          // superseded closes at t2
      (1L, "a2", 11, t2, null),                       // new current version
      (2L, "b", 20, t1, null),                        // identical: untouched
      (3L, "c", 30, t1, t2),                          // tombstoned: closed
      (4L, "d", 40, t1, null),                        // unmatched: untouched
      (5L, "e", 50, t2, null))                        // first version
    assert(got == expected, s"missing=${expected -- got} extra=${got -- expected}")
  }

  test("scd2: null-safe change detection (null -> value and value -> null both version)") {
    val h = Seq((1L, null.asInstanceOf[String], 1, t1, null.asInstanceOf[java.sql.Timestamp]),
                (2L, "x", 2, t1, null.asInstanceOf[java.sql.Timestamp]))
      .toDF("id", "v", "n", "valid_from", "valid_to")
    val changes = Seq((1L, "now-set", 1), (2L, null.asInstanceOf[String], 2))
      .toDF("id", "v", "n")
    val got = Merge.scd2Upsert(h, changes, Seq("id"), lit(t2))
      .collect().map(r => (r.getLong(0), Option(r.getString(1)),
        Option(r.getTimestamp(4)))).toSet
    assert(got == Set(
      (1L, None, Some(t2)), (1L, Some("now-set"), None),
      (2L, Some("x"), Some(t2)), (2L, None, None)))
  }

  test("scd2: tombstone for unknown key is ignored; duplicate keys refused") {
    val changes = Seq((99L, "zz", 0, true)).toDF("id", "v", "n", "del")
    val got = Merge.scd2Upsert(history, changes, Seq("id"), lit(t2),
      deleteCol = Some("del"))
    assert(got.count() == history.count())

    val dup = Seq((2L, "x", 1, false), (2L, "y", 2, false))
      .toDF("id", "v", "n", "del")
    val e = intercept[IllegalArgumentException] {
      Merge.scd2Upsert(history, dup, Seq("id"), lit(t2), deleteCol = Some("del"))
    }
    assert(e.getMessage.contains("duplicate key"))
  }

  test("maintainAggregate equals full recomputation on a randomized " +
    "fact/change pair") {
    val rnd = new scala.util.Random(11)
    val facts = (0 until 400).map(i =>
      (i.toLong, s"g${rnd.nextInt(6)}", (rnd.nextInt(2000) - 500) / 100.0))
    val factsDf = facts.toDF("id", "g", "x").repartition(5)
    val base = Merge.buildAggregate(factsDf, Seq("g"), Seq("x"))
    // delete a deterministic slice (carrying true row values), insert new
    val delRows = facts.filter(_._1 % 7 == 0)
    val insRows = Seq((9001L, "g1", 3.25), (9002L, "gNEW", 1.5),
      (9003L, "gNEW", -0.25))
    val changes =
      delRows.map(r => (r._2, r._3, "D")).toDF("g", "x", "op")
        .unionByName(insRows.map(r => (r._2, r._3, "I")).toDF("g", "x", "op"))
    val got = Merge.maintainAggregate(base, changes, Seq("g"), Seq("x"))
    val gotMap = got.collect()
      .map(r => r.getString(0) -> (r.getLong(1),
        r.getDecimal(2).doubleValue)).toMap
    got.unpersist()
    val survivors = facts.filterNot(_._1 % 7 == 0) ++ insRows
    val expected = survivors.groupBy(_._2).map { case (g, rs) =>
      g -> (rs.size.toLong,
        rs.map(r => BigDecimal(r._3).setScale(2)).sum.toDouble)
    }
    assert(gotMap == expected)
  }

  test("maintainAggregate drops groups whose count reaches zero") {
    val base = Merge.buildAggregate(
      Seq((1L, "only", 2.5), (2L, "keep", 1.0)).toDF("id", "g", "x"),
      Seq("g"), Seq("x"))
    val changes = Seq(("only", 2.5, "D")).toDF("g", "x", "op")
    val got = Merge.maintainAggregate(base, changes, Seq("g"), Seq("x"))
    val gs = got.collect().map(_.getString(0)).toSet
    got.unpersist()
    assert(gs == Set("keep"))
  }

  test("maintainAggregate refuses deletes of rows the view never saw") {
    val base = Merge.buildAggregate(
      Seq((1L, "g", 2.5)).toDF("id", "g", "x"), Seq("g"), Seq("x"))
    val changes = Seq(("g", 2.5, "D"), ("g", 9.9, "D")).toDF("g", "x", "op")
    val e = intercept[IllegalArgumentException] {
      Merge.maintainAggregate(base, changes, Seq("g"), Seq("x"))
    }
    assert(e.getMessage.contains("NEGATIVE"))
  }

  test("maintainAggregate refuses unknown op codes loudly") {
    val base = Merge.buildAggregate(
      Seq((1L, "g", 2.5)).toDF("id", "g", "x"), Seq("g"), Seq("x"))
    val changes = Seq(("g", 2.5, "UPSERT")).toDF("g", "x", "op")
    val e = intercept[Exception] {
      Merge.maintainAggregate(base, changes, Seq("g"), Seq("x")).collect()
    }
    assert(e.getMessage.contains("must be 'I' or 'D'"))
  }

  test("snapshotDiff classifies inserts/deletes/updates; null-safe both ways") {
    val before = Seq(
      (1L, "same"), (2L, "old"), (3L, "gone"),
      (4L, null.asInstanceOf[String]), (5L, "tonull"))
      .toDF("id", "v")
    val after = Seq(
      (1L, "same"), (2L, "new"),
      (4L, "fromnull"), (5L, null.asInstanceOf[String]), (6L, "born"))
      .toDF("id", "v")
    val got = Merge.snapshotDiff(before, after, Seq("id"), Seq("v"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getString(2)))
      .toMap
    assert(got == Map(
      2L -> ("new", "U"), 3L -> ("gone", "D"),
      4L -> ("fromnull", "U"), 5L -> (null, "U"), 6L -> ("born", "I")))
  }

  test("upsert of a snapshotDiff reconstructs the after-version exactly") {
    val rnd = new scala.util.Random(23)
    val before = (0L until 300L).map(i => (i, rnd.nextInt(50)))
    // after: drop some keys, change some values, add new keys
    val after = before.filter(_._1 % 11 != 0)
      .map { case (k, v) => if (k % 5 == 0) (k, v + 1000) else (k, v) } ++
      (400L until 420L).map(i => (i, rnd.nextInt(50)))
    val beforeDf = before.toDF("id", "v").repartition(4)
    val afterDf = after.toDF("id", "v").repartition(3)
    val diff = Merge.snapshotDiff(beforeDf, afterDf, Seq("id"), Seq("v"))
      .withColumn("__del", col("op") === "D").drop("op")
    val rebuilt = Merge.upsert(beforeDf, diff, Seq("id"),
      deleteCol = Some("__del"))
    assert(rebuilt.as[(Long, Int)].collect().sorted.toSeq == after.sorted)
  }

  test("scd2 plan: history only enters broadcast joins, never a shuffle join") {
    val changes = Seq((1L, "a2", 11)).toDF("id", "v", "n")
    val plan = Merge.scd2Upsert(history, changes, Seq("id"), lit(t2))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      s"history shuffled:\n$plan")
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast join:\n$plan")
  }
}
