package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
// (RangeJoin tests live here with the other time-series operators)

import graft.operators.{Resample, SkewedJoin}

class ResampleSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("resampleLocf fills gaps with the last observation") {
    val df = Seq(
      (1L, ts("2024-01-01 00:05:00"), 10.0),
      (1L, ts("2024-01-01 03:10:00"), 20.0), // 3 empty hours in between
      (2L, ts("2024-01-01 01:00:00"), 5.0)
    ).toDF("user_id", "ts", "value")
    val out = Resample.resampleLocf(df, "user_id", "ts", "value", 3600L)
      .orderBy("user_id", "bin_ts").collect()
    val u1 = out.filter(_.getLong(0) == 1L)
    assert(u1.length == 4) // hours 00,01,02,03
    assert(u1.map(_.getDouble(2)).toSeq == Seq(10.0, 10.0, 10.0, 20.0))
    val u2 = out.filter(_.getLong(0) == 2L)
    assert(u2.length == 1 && u2(0).getDouble(2) == 5.0)
  }

  test("saltedJoin equals plain join (correctness under salting)") {
    val probe = (1 to 1000).map(i => (i.toLong % 3, i.toLong)).toDF("k", "v")
    val build = Seq((0L, "a"), (1L, "b"), (2L, "c")).toDF("k", "name")
    val plain = probe.join(build, Seq("k")).groupBy("name").count()
    val salted = SkewedJoin.saltedJoin(probe, build, Seq("k"), buckets = 8)
      .groupBy("name").count()
    assert(plain.exceptAll(salted).isEmpty && salted.exceptAll(plain).isEmpty)
  }

  test("resampleInterp lerps interior gaps, keeps observed bins verbatim") {
    // key a: observations at bins 0 and 3 (values 10 and 40) with a
    // two-bin gap -> lerp 20, 30; key b: single observation, no gaps
    val df = Seq(
      ("a", ts("2024-01-01 00:00:10"), 10.0),
      ("a", ts("2024-01-01 03:00:20"), 40.0),
      ("b", ts("2024-01-01 05:00:00"), 7.0))
      .toDF("k", "t", "v").repartition(3)
    val got = Resample.resampleInterp(df, "k", "t", "v", binSeconds = 3600L)
      .collect()
      .map(r => (r.getString(0), r.getTimestamp(1).toString,
        r.getDouble(2), r.getBoolean(3))).toSet
    assert(got == Set(
      ("a", "2024-01-01 00:00:00.0", 10.0, false),
      ("a", "2024-01-01 01:00:00.0", 20.0, true),
      ("a", "2024-01-01 02:00:00.0", 30.0, true),
      ("a", "2024-01-01 03:00:00.0", 40.0, false),
      ("b", "2024-01-01 05:00:00.0", 7.0, false)))
  }

  test("binnedRangeJoin equals the naive range join and stays an equi-join") {
    import graft.operators.RangeJoin
    val rnd = new scala.util.Random(5)
    val points = (0 until 400).map(i =>
      (i.toLong % 5, Timestamp.valueOf(
        java.time.LocalDateTime.ofEpochSecond(1700000000L + rnd.nextInt(86400), 0,
          java.time.ZoneOffset.UTC)), i.toLong)).toDF("user_id", "t", "pid")
    val intervals = (0 until 60).map { i =>
      val lo = 1700000000L + rnd.nextInt(86400)
      (i.toLong % 5, Timestamp.valueOf(java.time.LocalDateTime.ofEpochSecond(lo, 0,
        java.time.ZoneOffset.UTC)),
        Timestamp.valueOf(java.time.LocalDateTime.ofEpochSecond(lo + 1 + rnd.nextInt(7200), 0,
          java.time.ZoneOffset.UTC)), i.toLong)
    }.toDF("user_id", "lo", "hi", "iid")
    val binned = RangeJoin.binnedRangeJoin(points, intervals, "t", "lo", "hi",
      Seq("user_id"), binSeconds = 3600L)
      .select("pid", "iid")
    val naive = points.join(intervals, Seq("user_id"))
      .filter(col("t") >= col("lo") && col("t") <= col("hi"))
      .select("pid", "iid")
    assert(binned.count() == naive.count())
    assert(binned.exceptAll(naive).isEmpty && naive.exceptAll(binned).isEmpty)
    val plan = binned.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"range join fell back to a product:\n$plan")
  }

  test("binnedRangeJoin bins pre-1970 timestamps with floor semantics") {
    import graft.operators.RangeJoin
    // a point just before the epoch must land in the interval spanning it —
    // truncate-toward-zero division would put point and interval bounds in
    // the wrong bins relative to each other
    val p = Seq((1L, Timestamp.valueOf("1969-12-31 23:59:00"), 10L))
      .toDF("user_id", "t", "pid")
    val iv = Seq((1L, Timestamp.valueOf("1969-12-31 23:00:00"),
      Timestamp.valueOf("1970-01-01 01:00:00"), 20L))
      .toDF("user_id", "lo", "hi", "iid")
    val got = RangeJoin.binnedRangeJoin(p, iv, "t", "lo", "hi",
      Seq("user_id"), binSeconds = 1800L).select("pid", "iid").collect()
    assert(got.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((10L, 20L)))
  }

  test("AQE splits a planted skewed join partition (runtime skew handling)") {
    // One key carries ~90% of the probe side. With skew thresholds tuned to
    // the test's data volume, AQE must mark the sort-merge join skew=true
    // in the final adaptive plan — the runtime complement to saltedJoin.
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      import spark.implicits._
      val probe = ((1 to 200000).map(i => (0L, s"payload_$i" * 3)) ++
        (1 to 2000).map(i => (i.toLong % 50 + 1, s"p_$i"))).toDF("k", "v")
      val build = (0L to 50L).map(k => (k, s"dim_$k")).toDF("k", "name")
      val joined = probe.join(build, "k")
      // collect() drives THIS dataframe's own QueryExecution, so its
      // AdaptiveSparkPlan reaches the final re-optimized state (count() or
      // a write would plan and execute a separate QueryExecution)
      assert(joined.collect().length == 202000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE did not flag the skewed partition:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("saltedJoin spreads a hot key across buckets") {
    val probe = (1 to 100).map(i => (0L, i.toLong)).toDF("k", "v") // all one key
    val build = Seq((0L, "hot")).toDF("k", "name")
    val salted = SkewedJoin.saltedJoin(probe, build, Seq("k"), buckets = 4)
    assert(salted.count() == 100)
    // distinct salt values used > 1 proves the key was actually spread
    val salts = probe.withColumn("__salt",
      pmod(xxhash64(struct(probe.columns.map(col).toIndexedSeq: _*)), lit(4)))
      .select("__salt").distinct().count()
    assert(salts > 1)
  }
}
