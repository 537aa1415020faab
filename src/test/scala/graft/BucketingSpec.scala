package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Bucketing

/** Bucketed tables must deliver their one promise: same-key joins and
  * aggregations with NO exchange. */
class BucketingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def withNoBroadcast[T](f: => T): T = {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try f finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("same-key bucketed join plans with zero Exchange") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bucket").toString
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val lineitem = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    Bucketing.writeBucketed(orders, "b_orders", s"$dir/orders", "o_orderkey", 8)
    Bucketing.writeBucketed(
      lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
      "b_lineitem", s"$dir/lineitem", "o_orderkey", 8)
    withNoBroadcast {
      val joined = Bucketing.bucketedJoin(spark, "b_orders", "b_lineitem", "o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join still shuffles:\n$plan")
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        s"expected a co-located join:\n$plan")
      // and the result is right
      val n = joined.count()
      val expected = lineitem.join(orders,
        lineitem("l_orderkey") === orders("o_orderkey")).count()
      assert(n == expected)
    }
  }

  test("StarTable bucketed round trip keeps units and joins exchange-free") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bucket_st").toString
    val csv =
      """**weights
        |all
        |item;mass
        |text;kg
        |a;1
        |b;2
        |""".stripMargin
    val t = graft.io.CsvReader.readBundleFromString(spark, csv).unique("weights")
    Bucketing.writeBucketedStarTable(t, "b_weights", s"$dir/w", "item", 4)
    val back = Bucketing.readBucketedStarTable(spark, "b_weights", "weights")
    assert(back.unit("mass") == "kg")
    assert(t.equalsTable(back))
    Bucketing.writeBucketedStarTable(t, "b_weights2", s"$dir/w2", "item", 4)
    withNoBroadcast {
      val plan = Bucketing.bucketedJoin(spark, "b_weights", "b_weights2", "item")
        .queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"StarTable bucketed join shuffles:\n$plan")
    }
  }

  test("aggregation on the bucket key needs no exchange either") {
    withNoBroadcast {
      val agg = Bucketing.bucketedTable(spark, "b_lineitem")
        .groupBy("o_orderkey").agg(count(lit(1)).as("n"))
      val plan = agg.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed aggregation shuffles:\n$plan")
      assert(agg.count() > 0)
    }
  }
}
