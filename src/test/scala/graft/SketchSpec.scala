package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Sketches

class SketchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tokens1k = {
    // 1000 values over ~300 distinct with a skewed head
    val rows = (0 until 1000).map { i =>
      val v = if (i % 3 == 0) s"hot_${i % 7}" else s"v_${i % 300}"
      (i % 5, v)
    }
    rows.toDF("g", "v")
  }

  test("KMV is exact below capacity and estimates above it") {
    val df = tokens1k
    val exact = df.groupBy("g").agg(countDistinct("v").as("ex"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    // k larger than any group's distinct count → exact
    val big = Sketches.kmvDistinct(df, Seq("g"), "v", k = 1000)
      .collect().map(r => r.getInt(0) -> r.getDouble(3)).toMap
    exact.foreach { case (g, ex) => assert(big(g) == ex.toDouble) }
    // k = 64 → within the theoretical ~1/sqrt(k-2) ≈ 13% (3 sigma ≈ 38%)
    val est = Sketches.kmvDistinct(df, Seq("g"), "v", k = 64)
      .collect().map(r => r.getInt(0) -> r.getDouble(3)).toMap
    exact.foreach { case (g, ex) =>
      assert(math.abs(est(g) / ex - 1.0) < 0.5, s"group $g: ${est(g)} vs $ex")
    }
  }

  test("KMV sketch is partitioning-independent") {
    val df = tokens1k
    val a = Sketches.kmvDistinct(df.repartition(1), Seq("g"), "v", 32)
      .orderBy("g").collect().toSeq
    val b = Sketches.kmvDistinct(df.repartition(13, col("v")), Seq("g"), "v", 32)
      .orderBy("g").collect().toSeq
    assert(a == b)
  }

  test("KMV buffer keeps the k smallest distinct values") {
    import graft.functions.expressions.MinKDistinctAgg
    import org.apache.spark.sql.catalyst.expressions.Literal
    val agg = MinKDistinctAgg(Literal(0L), k = 3)
    val buf = agg.createAggregationBuffer()
    Seq(9L, 5L, 5L, 7L, 1L, 8L, 1L).foreach { v =>
      val b2 = agg.createAggregationBuffer(); b2.add(v)
      agg.merge(buf, b2)
    }
    val out = buf
    assert(out.size == 3)
    val arr = out.toArray(new Array[java.lang.Long](3)).map(_.longValue).toSeq
    assert(arr == Seq(1L, 5L, 7L)) // distinct, smallest-3, ascending
  }

  test("HLL registers match a sequential reference") {
    val df = tokens1k
    val b = 5 // 32 buckets so the reference is small
    val w = 48 - b
    // sequential reference over the same md5-derived hashes
    val hashes = df.select(Sketches.h48(col("v")).as("h"), col("g"))
      .collect().map(r => (r.getInt(1), r.getLong(0)))
    val ref = hashes.groupBy(_._1).map { case (g, hs) =>
      val regs = hs.map(_._2).map { h =>
        val bucket = h >>> w
        val rest = h & ((1L << w) - 1)
        val rho = if (rest == 0) w + 1
          else w - (64 - java.lang.Long.numberOfLeadingZeros(rest)) + 1
        bucket -> rho
      }.groupBy(_._1).map { case (bk, rs) => bk -> rs.map(_._2).max }
      g -> regs
    }
    val k = w + 2
    val expected = ref.map { case (g, regs) =>
      val m = 1 << b
      val s = regs.values.map(r => 1L << (k - r)).sum +
        (m - regs.size).toLong * (1L << k)
      (g, (m - regs.size).toLong, s)
    }
    val got = Sketches.hllDistinct(df, Seq("g"), "v", b)
      .collect().map(r => (r.getInt(0), r.getLong(2), r.getLong(3))).toSeq
    expected.toSeq.sorted.zip(got.sortBy(_._1)).foreach { case ((g, z, s), (g2, z2, s2)) =>
      assert(g == g2 && z == z2 && s == s2, s"group $g: ($z,$s) vs ($z2,$s2)")
    }
  }

  test("HLL estimate within expected error and partitioning-independent") {
    val df = (0 until 20000).map(i => ("all", s"val_$i")).toDF("g", "v")
    val out = Sketches.hllDistinct(df, Seq("g"), "v", b = 9)
      .head()
    val est = out.getAs[Double]("est_distinct")
    // 1.04/sqrt(512) ≈ 4.6%; allow 4 sigma
    assert(math.abs(est / 20000.0 - 1.0) < 0.2, s"est $est")
    val a = Sketches.hllDistinct(df.repartition(1), Seq("g"), "v", 9).collect().toSeq
    val c = Sketches.hllDistinct(df.repartition(17, col("v")), Seq("g"), "v", 9).collect().toSeq
    assert(a == c)
  }

  test("CMS never underestimates, and is exact without collisions") {
    val df = tokens1k.select(col("v"))
    val exact = df.groupBy("v").agg(count(lit(1)).as("c"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val sketch = Sketches.cmsSketch(df, "v", depth = 4, width = 512)
    val est = Sketches.cmsEstimate(sketch, df, "v", depth = 4, width = 512)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (v, c) =>
      assert(est(v) >= c, s"$v underestimated: ${est(v)} < $c")
      // ε = e/w ≈ 0.53%: overcount ≤ εn with prob 1 − e^-d per row; with
      // 4 rows a > 3εn overcount would be astronomically unlikely
      assert(est(v) - c <= (3 * math.E / 512 * 1000).toLong + 1,
        s"$v overcount ${est(v) - c}")
    }
    // a huge sketch has no collisions at this scale → exact
    val wide = Sketches.cmsSketch(df, "v", depth = 4, width = 1 << 20)
    val est2 = Sketches.cmsEstimate(wide, df, "v", depth = 4, width = 1 << 20)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (v, c) => assert(est2(v) == c) }
  }

  test("CMS cells are partitioning-independent") {
    val df = tokens1k.select(col("v"))
    val a = Sketches.cmsSketch(df.repartition(1), "v", 4, 64)
      .orderBy("r", "bucket").collect().toSeq
    val b = Sketches.cmsSketch(df.repartition(11, col("v")), "v", 4, 64)
      .orderBy("r", "bucket").collect().toSeq
    assert(a == b)
  }
}
