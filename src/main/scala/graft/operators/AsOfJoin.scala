package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, attach the single right row with the
  * greatest `rightTime <= leftTime` within the same partition keys — the
  * time-series "most recent prior observation" operator (DuckDB ASOF JOIN,
  * pandas merge_asof).
  *
  * Spark-first implementation by composition (preference (a) of the custom-
  * operator ladder): tag and union both sides, one sort per partition key,
  * and a running `last(_, ignoreNulls)` window — i.e. ONE shuffle on the
  * partition keys and no join explosion, vs the naive range-join + groupBy
  * which shuffles |L|×|R| candidate pairs. At 100 TB this is the difference
  * between a sort-merge pass and an O(n²) blowup on hot keys.
  *
  * Ties: a right row at exactly leftTime IS eligible (>= semantics, matching
  * DuckDB ASOF). Among right rows with identical (partition, time), the one
  * with the greatest `rightTiebreak` wins — pass a unique column for
  * deterministic results.
  */
object AsOfJoin {

  def asofPrior(
      left: DataFrame,
      right: DataFrame,
      partitionCols: Seq[String],
      leftTime: String,
      rightTime: String,
      rightPayload: Seq[String],
      rightTiebreak: Option[String] = None
  ): DataFrame = {
    val leftCols = left.columns.toSeq

    val payloadStruct = struct(
      (rightPayload ++ rightTiebreak.filterNot(rightPayload.contains)).distinct
        .map(c => col(c).as(c)): _*)

    val taggedLeft = left.select(
      partitionCols.map(col) ++ Seq(
        col(leftTime).as("__t"),
        lit(1).as("__is_left"),
        struct(leftCols.map(col): _*).as("__l"),
        lit(null).cast(right.select(payloadStruct).schema.head.dataType).as("__r")
      ): _*)

    val taggedRight = right.select(
      partitionCols.map(col) ++ Seq(
        col(rightTime).as("__t"),
        lit(0).as("__is_left"),
        lit(null).cast(left.select(struct(leftCols.map(col): _*)).schema.head.dataType).as("__l"),
        payloadStruct.as("__r")
      ): _*)

    // Order: time asc, right-before-left at equal times (so equality counts),
    // then the tiebreak so the LAST right row at a timestamp wins.
    val tiebreakOrder: Seq[Column] = rightTiebreak
      .map(tb => col("__r").getField(tb).asc_nulls_first).toSeq
    val w = Window
      .partitionBy(partitionCols.map(col): _*)
      .orderBy(Seq(col("__t").asc, col("__is_left").asc) ++ tiebreakOrder: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val joined = taggedLeft.unionByName(taggedRight)
      .withColumn("__match", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__is_left") === 1)

    val outLeft = leftCols.map(c => col("__l").getField(c).as(c))
    val outRight = rightPayload.map(c => col("__match").getField(c).as(c))
    joined.select(outLeft ++ outRight: _*)
  }
}
