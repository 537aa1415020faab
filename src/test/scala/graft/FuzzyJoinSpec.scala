package graft

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
}
