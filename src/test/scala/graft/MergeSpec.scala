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
}
