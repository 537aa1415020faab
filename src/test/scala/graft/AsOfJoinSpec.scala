package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AsOfJoin

class AsOfJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("asofPrior picks most recent prior-or-equal right row per partition") {
    val left = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")),
      (2L, 10L, ts("2024-01-01 12:00:00")),
      (3L, 20L, ts("2024-01-01 09:00:00"))
    ).toDF("id", "user", "t")
    val right = Seq(
      (100L, 10L, ts("2024-01-01 09:30:00")),
      (101L, 10L, ts("2024-01-01 11:00:00")),
      (102L, 10L, ts("2024-01-01 12:00:00")), // equal to left id=2 → eligible
      (103L, 30L, ts("2024-01-01 00:00:00"))
    ).toDF("rid", "user", "rt")

    val out = AsOfJoin.asofPrior(left, right,
      partitionCols = Seq("user"), leftTime = "t", rightTime = "rt",
      rightPayload = Seq("rid"), rightTiebreak = Some("rid"))
      .orderBy("id").collect()

    assert(out(0).getAs[Any]("rid") == 100L)  // 09:30 before 10:00
    assert(out(1).getAs[Any]("rid") == 102L)  // equality wins over 11:00
    assert(out(2).getAs[Any]("rid") == null)  // user 20 has no right rows
  }

  test("tiebreak: among equal timestamps the greatest tiebreak wins") {
    val left = Seq((1L, 1L, ts("2024-01-01 10:00:00"))).toDF("id", "user", "t")
    val right = Seq(
      (7L, 1L, ts("2024-01-01 09:00:00")),
      (9L, 1L, ts("2024-01-01 09:00:00")),
      (8L, 1L, ts("2024-01-01 09:00:00"))
    ).toDF("rid", "user", "rt")
    val out = AsOfJoin.asofPrior(left, right, Seq("user"), "t", "rt",
      Seq("rid"), Some("rid")).collect()
    assert(out(0).getAs[Any]("rid") == 9L)
  }
}
