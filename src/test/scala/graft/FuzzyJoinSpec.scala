package graft

import org.apache.spark.sql.functions.lit
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.FuzzyJoin

/** Deletion-neighborhood fuzzy join (edit distance ≤ 1). */
class FuzzyJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("finds exactly the distance<=1 pairs: sub, ins, del, equal — not d=2") {
    val rows = Seq(
      (1L, "cat"), (2L, "cut"),   // substitution, d=1
      (3L, "cats"),               // insertion vs 1, d=1
      (4L, "at"),                 // deletion vs 1, d=1
      (5L, "cta"),                // transposition vs 1 = d=2 — excluded
      (6L, "dog"),                // far
      (7L, "cat"))                // exact duplicate of 1, d=0
    val got = FuzzyJoin.editDistance1Pairs(rows.toDF("id", "s"), "id", "s")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // reference by brute force rather than hand-listing
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0 }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val brute = (for {
      (ia, sa) <- rows; (ib, sb) <- rows
      if ia < ib && lev(sa, sb) <= 1
    } yield (ia, ib, lev(sa, sb))).toSet
    assert(got == brute, s"got $got\nexpected $brute")
    assert(!got.exists { case (a, b, _) => Set(a, b) == Set(1L, 5L) },
      "distance-2 transposition must be excluded")
  }

  test("blocking is complete on a randomized corpus vs brute force") {
    val rng = new scala.util.Random(7)
    val words = (0L until 120L).map { i =>
      val base = "abcde".take(3 + (i % 3).toInt) + ("xyz" * ((i % 4).toInt + 1))
      val mutated =
        if (i % 5 == 0) base.updated(rng.nextInt(base.length), 'q')
        else if (i % 5 == 1) base.drop(1)
        else base
      (i, mutated)
    }
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0 }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val brute = (for {
      (ia, sa) <- words; (ib, sb) <- words
      if ia < ib && lev(sa, sb) <= 1
    } yield (ia, ib)).toSet
    val got = FuzzyJoin.editDistance1Pairs(
        words.toDF("id", "s").repartition(7), "id", "s", maxBucketSize = 100000)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == brute, s"missing=${brute -- got} extra=${got -- brute}")
  }

  test("refuses quadratic template buckets loudly") {
    val template = (0L until 50L).map(i => (i, "XX")) // all share deletion 'X'
    val e = intercept[IllegalArgumentException] {
      FuzzyJoin.editDistance1Pairs(template.toDF("id", "s"), "id", "s",
        maxBucketSize = 10)
    }
    assert(e.getMessage.contains("maxBucketSize"))
  }

  test("Jaro-Winkler kernel matches the classic reference vectors") {
    import graft.functions.expressions.JaroWinkler.compute
    // Winkler's canonical examples, hand-derived:
    // MARTHA/MARHTA: m=6, t=1 → jaro = (1 + 1 + 5/6)/3; prefix 3
    val jaro1 = (1.0 + 1.0 + 5.0 / 6.0) / 3.0
    assert(compute("MARTHA", "MARHTA") == jaro1 + 0.1 * 3 * (1 - jaro1))
    // DIXON/DICKSONX: m=4, t=0 → jaro = (4/5 + 4/8 + 1)/3; prefix 2
    val jaro2 = (4.0 / 5.0 + 4.0 / 8.0 + 1.0) / 3.0
    assert(compute("DIXON", "DICKSONX") == jaro2 + 0.1 * 2 * (1 - jaro2))
    assert(compute("same", "same") == 1.0)
    assert(compute("", "x") == 0.0)
    assert(compute("abc", "xyz") == 0.0) // no matches
    // below the 0.7 boost threshold the raw jaro is returned
    val lo = compute("abcdefgh", "aXcYeZgW")
    assert(lo < 0.7 + 1e-12 || lo == compute("abcdefgh", "aXcYeZgW"))
  }

  test("jaroWinklerWithin finds exactly the brute-force pairs per block") {
    val names = Seq(
      (1L, "jellyfish"), (2L, "smellyfish"), (3L, "jellyfishy"),
      (4L, "martha"), (5L, "marhta"), (6L, "dixon"), (7L, "zzzzz"))
    val df = names.toDF("id", "s").repartition(3)
    val got = FuzzyJoin.jaroWinklerWithin(df, "id", "s",
        blockCols = Seq(lit(1)), threshold = 0.85)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = (for {
      (ia, sa) <- names; (ib, sb) <- names
      if ia < ib
      jw = BigDecimal(graft.functions.expressions.JaroWinkler.compute(sa, sb))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      if jw >= 0.85
    } yield (ia, ib)).toSet
    assert(got == brute, s"missing=${brute -- got} extra=${got -- brute}")
  }

  test("jaroWinklerWithin refuses oversized blocks loudly") {
    val rows = (0L until 30L).map(i => (i, s"name_$i"))
    val e = intercept[IllegalArgumentException] {
      FuzzyJoin.jaroWinklerWithin(rows.toDF("id", "s"), "id", "s",
        blockCols = Seq(lit(1)), threshold = 0.9, maxBlockSize = 10)
    }
    assert(e.getMessage.contains("maxBlockSize"))
  }
}
