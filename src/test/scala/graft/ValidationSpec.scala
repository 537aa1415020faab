package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Validation
import graft.functions.Validation._

class ValidationSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def df = Seq(
    (1L, Some(5.0), "A", "ok"),
    (2L, Some(50.0), "B", "ok"),   // in_range + in_set violations
    (3L, None, "A", "bad!"),       // null range violation + regex violation
    (3L, Some(1.0), "A", "ok")     // duplicate id
  ).toDF("id", "x", "flag", "tag")

  test("each rule counts its planted violations") {
    val ref = Seq(1L, 2L).toDF("k")
    val rep = Validation.check(df, Seq(
      NotNull("x"),
      InRange("x", 0.0, 10.0),
      InSet("flag", Seq("A")),
      MatchesRegex("tag", "^[a-z]+$"),
      Satisfies("id_pos", col("id") > 0),
      Unique(Seq("id")),
      RefIntegrity("id", ref, "k")))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getBoolean(4)))
    val byRule = rep.map(r => r._1 -> r).toMap
    assert(byRule("not_null") == (("not_null", "x", 4L, 1L, false)))
    assert(byRule("in_range") == (("in_range", "x", 4L, 2L, false))) // 50.0 + null
    assert(byRule("in_set") == (("in_set", "flag", 4L, 1L, false)))
    assert(byRule("matches") == (("matches", "tag", 4L, 1L, false)))
    assert(byRule("satisfies") == (("satisfies", "id_pos", 4L, 0L, true)))
    assert(byRule("unique") == (("unique", "id", 4L, 1L, false))) // one extra 3
    assert(byRule("ref_integrity") == (("ref_integrity", "id", 4L, 2L, false)))
  }

  test("all-green report on clean data") {
    val rep = Validation.check(df.filter(col("id") === 1L), Seq(
      NotNull("x"), InRange("x", 0.0, 10.0), Unique(Seq("id"))))
      .collect()
    assert(rep.length == 3 && rep.forall(_.getBoolean(4)))
  }

  test("row-level rules share ONE scan") {
    val rep = Validation.check(df, Seq(
      NotNull("x"), InRange("x", 0.0, 10.0), InSet("flag", Seq("A", "B")),
      MatchesRegex("tag", "^[a-z]+$")))
    val plan = rep.queryExecution.optimizedPlan.toString
    // 4 row-level rules → 4 report rows exploded off ONE aggregate over
    // ONE scan — no per-rule re-execution of the input
    val scans = "LocalRelation|LogicalRDD".r.findAllIn(plan).length
    assert(scans == 1, s"expected one shared scan, got plan:\n$plan")
    val aggs = "Aggregate".r.findAllIn(plan).length
    assert(aggs == 1, s"expected one aggregate, got:\n$plan")
  }

  test("empty rule classes don't break the union") {
    val rep = Validation.check(df, Seq(Unique(Seq("id"))))
    assert(rep.collect().length == 1)
  }

  test("profile: hand-computed counts, nulls, distincts, mode tie to the " +
    "smallest value") {
    val d = Seq(
      ("a", java.lang.Long.valueOf(1L)), ("b", java.lang.Long.valueOf(2L)),
      ("b", null.asInstanceOf[java.lang.Long]),
      ("c", java.lang.Long.valueOf(2L)), ("c", java.lang.Long.valueOf(1L)))
      .toDF("s", "v").repartition(3)
    val got = Validation.profile(d, Seq("s", "v")).collect()
      .map(r => r.getString(0) -> r).toMap
    val s = got("s")
    assert(s.getLong(1) == 5L && s.getLong(2) == 0L && s.getLong(3) == 3L)
    assert(s.getString(4) == "a" && s.getString(5) == "c")
    // b and c both occur twice → tie broken to the smaller string "b"
    assert(s.getString(6) == "b" && s.getLong(7) == 2L)
    val v = got("v")
    assert(v.getLong(1) == 5L && v.getLong(2) == 1L && v.getLong(3) == 2L)
    assert(v.getString(4) == "1" && v.getString(5) == "2")
    assert(v.getString(6) == "1" && v.getLong(7) == 2L)
  }

  test("joinDiagnostics: exact cardinality, matched keys, worst fan-out, " +
    "nulls excluded") {
    val left = Seq[java.lang.Long](1L, 1L, 1L, 2L, 3L, null).toDF("k")
    val right = Seq[java.lang.Long](1L, 1L, 2L, 4L, null).toDF("k2")
    val r = Validation.joinDiagnostics(left, right, "k", "k2").collect().head
    assert(r.getAs[Long]("n_left") == 5L)
    assert(r.getAs[Long]("n_right") == 4L)
    assert(r.getAs[Long]("keys_left") == 3L)
    assert(r.getAs[Long]("keys_right") == 3L)
    assert(r.getAs[Long]("keys_matched") == 2L)
    // 1: 3x2=6, 2: 1x1=1 -> 7 output rows, worst key 1 at fan-out 6
    assert(r.getAs[Long]("est_output_rows") == 7L)
    assert(r.getAs[String]("max_fanout_key") == "1")
    assert(r.getAs[Long]("max_fanout") == 6L)
  }

  test("joinDiagnostics with zero matches reports empty-join shape") {
    val r = Validation.joinDiagnostics(
      Seq(1L).toDF("a"), Seq(2L).toDF("b"), "a", "b").collect().head
    assert(r.getAs[Long]("keys_matched") == 0L)
    assert(r.getAs[Long]("est_output_rows") == 0L)
    assert(r.getAs[Long]("max_fanout") == 0L)
  }

  test("profile of an all-null column reports zero distincts, null extremes") {
    val d = Seq((1L, null.asInstanceOf[String]), (2L, null.asInstanceOf[String]))
      .toDF("id", "x")
    val row = Validation.profile(d, Seq("x")).collect().head
    assert(row.getLong(1) == 2L && row.getLong(2) == 2L && row.getLong(3) == 0L)
    assert(row.isNullAt(4) && row.isNullAt(5) && row.isNullAt(6))
    assert(row.getLong(7) == 0L)
  }

  test("bootstrapCI matches the sequential Poisson-bootstrap mirror and " +
    "is partitioning-independent") {
    import org.apache.spark.sql.functions.col
    val rows = (0L until 80L).map(i => (i, (i % 13).toDouble + 1.0))
    val df = rows.toDF("id", "v")
    def run(parts: Int) = graft.functions.Validation.bootstrapCI(
        df.repartition(parts), "id", col("v"), resamples = 20,
        loPct = 10, hiPct = 90)
      .collect().head
    val got = run(3)

    // sequential mirror of the exact chain
    val cdf = Seq(0.36787944117144233, 0.7357588823428847,
      0.9196986029286058, 0.9810118431238462, 0.9963401531726563,
      0.9994058151824183)
    def weight(id: Long, b: Int): Int = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$id:$b".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(12)
      val u = (java.lang.Long.parseLong(hex, 16) + 0.5) / 281474976710656.0
      cdf.count(_ <= u)
    }
    val means = (0 until 20).map { b =>
      val ws = rows.map { case (id, v) => (weight(id, b), v) }
      val swx = ws.map { case (w, v) => BigDecimal(v).setScale(6) * w }.sum
      val sw = ws.map(_._1).sum
      (BigDecimal(swx.toDouble / sw).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble, b)
    }.sorted
    val (lo, hi) = (means((10 * 20 + 99) / 100 - 1)._1,
      means((90 * 20 + 99) / 100 - 1)._1)
    assert(got.getLong(0) == 80L && got.getLong(1) == 20L)
    assert(got.getDouble(3) == lo, s"ci_lo ${got.getDouble(3)} != $lo")
    assert(got.getDouble(4) == hi, s"ci_hi ${got.getDouble(4)} != $hi")
    assert(got.getDouble(3) <= got.getDouble(2) &&
      got.getDouble(2) <= got.getDouble(4), "CI must bracket the mean here")
    assert(run(13) == got, "partitioning changed the interval")
  }
}
