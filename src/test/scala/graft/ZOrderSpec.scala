package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.ZOrder

/** Morton-curve clustering (operators.ZOrder): exact bucket/interleave
  * arithmetic and the row-group/file skipping the layout exists for. */
class ZOrderSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Sequential mirror of bucket + interleave. */
  private def zRef(vals: Seq[Long], stats: Seq[(Long, Long)],
                   bits: Int): Long = {
    val k = 1L << bits
    val bs = vals.zip(stats).map { case (v, (mn, mx)) =>
      val w = math.max(1L, (mx - mn + k) / k)
      math.min(math.max(v - mn, 0L) / w, k - 1)
    }
    val n = bs.size
    (0 until bits).flatMap(i => bs.zipWithIndex.map { case (b, j) =>
      ((b >> i) & 1L) << (i * n + j)
    }).sum
  }

  test("withZ matches the sequential reference (negatives, odd ranges, " +
    "edge clamps)") {
    val rows = Seq(
      (-37L, 12L), (-37L, 999L), (0L, 12L), (411L, 500L), (410L, 501L),
      (123L, 456L), (1L, 13L), (-36L, 998L))
    val df = rows.toDF("x", "y").repartition(3)
    val st = ZOrder.stats(df, Seq("x", "y"))
    assert(st == Seq((-37L, 411L), (12L, 999L)))
    val got = ZOrder.withZ(df, Seq("x", "y"), bits = 8, zCol = "z")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    rows.foreach { case (x, y) =>
      assert(got((x, y)) == zRef(Seq(x, y), st, 8), s"($x,$y)")
    }
  }

  test("bucket width survives near-Long-max ranges (no additive overflow) " +
    "and stats refuses empty/all-null columns loudly") {
    // Pre-fix, (max - min + 2^bits) overflowed Long for ranges within
    // 2^bits of Long.MaxValue, silently collapsing w to 1 (every row in
    // the top bucket). The ceil identity r/k + 1 cannot overflow.
    // range = Long.MaxValue - 1: fits Long, but old (range + 2^bits)
    // addition overflowed; full-domain ranges still refuse via the
    // separate range guard
    val rows = Seq(0L, Long.MaxValue / 2, Long.MaxValue - 1).toDF("x")
    val b = ZOrder.bucket(col("x"), 0L, Long.MaxValue - 1, 8)
    val got = rows.select(b.as("b")).collect().map(_.getLong(0)).toSeq
    assert(got.distinct.size > 1, s"clustering collapsed: $got")
    assert(got.forall(v => v >= 0 && v < 256))
    // min/max/extremes map to edge buckets monotonically
    assert(got.head == 0L && got.last == 255L)

    val e1 = intercept[IllegalArgumentException] {
      ZOrder.stats(Seq.empty[Long].toDF("x"), Seq("x"))
    }
    assert(e1.getMessage.contains("no non-null values"))
    val e2 = intercept[IllegalArgumentException] {
      ZOrder.stats(Seq[Option[Long]](None, None).toDF("x"), Seq("x"))
    }
    assert(e2.getMessage.contains("'x'"))
  }

  test("interleave is a bijection on the bucket grid (4 bits, 2 dims)") {
    val pts = for (a <- 0L until 16L; b <- 0L until 16L) yield (a, b)
    val df = pts.toDF("a", "b")
      .withColumn("z", ZOrder.interleave(Seq(col("a"), col("b")), 4))
    val zs = df.collect().map(_.getLong(2))
    assert(zs.toSet == (0L until 256L).toSet)
  }

  test("three-dimensional interleave stays within bit budget and is exact") {
    val df = Seq((1L, 2L, 3L), (7L, 0L, 5L)).toDF("a", "b", "c")
      .withColumn("z",
        ZOrder.interleave(Seq(col("a"), col("b"), col("c")), 3))
    val got = df.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2)) -> r.getLong(3)).toMap
    def ref(a: Long, b: Long, c: Long) =
      (0 until 3).flatMap(i => Seq(
        ((a >> i) & 1L) << (3 * i),
        ((b >> i) & 1L) << (3 * i + 1),
        ((c >> i) & 1L) << (3 * i + 2))).sum
    got.foreach { case ((a, b, c), z) => assert(z == ref(a, b, c)) }
  }

  test("z-ordered layout skips files on the NON-leading dimension where a " +
    "linear sort cannot") {
    // 64x64 grid, 4 rows per cell — both dims uniform
    val n = 64
    val rows = for (x <- 0 until n; y <- 0 until n; r <- 0 until 4)
      yield (x.toLong, y.toLong, r.toLong)
    val df = rows.toDF("x", "y", "payload").repartition(8)
    val zPath = java.nio.file.Files.createTempDirectory("zord").toString + "/t"
    val linPath = java.nio.file.Files.createTempDirectory("lin").toString + "/t"
    ZOrder.writeZOrdered(df, zPath, Seq("x", "y"), bits = 6, numFiles = 16)
    df.repartitionByRange(16, col("x")).sortWithinPartitions("x")
      .write.parquet(linPath)

    // candidate files for the box predicate y in [0, 7] (x unconstrained):
    // a file survives pruning iff its [min_y, max_y] intersects the box
    def candidates(path: String): (Long, Long) = {
      val stats = spark.read.parquet(path)
        .groupBy(input_file_name().as("f"))
        .agg(min(col("y")).as("mn"), max(col("y")).as("mx"))
        .collect()
      (stats.count(r => r.getLong(1) <= 7 && r.getLong(2) >= 0).toLong,
        stats.length.toLong)
    }
    val (zCand, zTotal) = candidates(zPath)
    val (lCand, lTotal) = candidates(linPath)
    assert(zTotal >= 8 && lTotal >= 8)
    // linear-by-x: every file spans the full y range → nothing prunes
    assert(lCand == lTotal)
    // z-order: the y<=7 band touches ~1/8 of the curve; allow slack for
    // range-boundary sampling but demand real pruning
    assert(zCand * 2 <= zTotal, s"z candidates $zCand of $zTotal")
    // content round-trips unchanged
    val back = spark.read.parquet(zPath)
    assert(back.count() == rows.size)
    assert(back.select("x", "y", "payload").as[(Long, Long, Long)]
      .collect().sorted.toSeq == rows.sorted)
  }
}
