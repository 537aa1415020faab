package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SetSimilarityJoin

/** Prefix-filtered exact Jaccard self-join (AllPairs/PPJoin). */
class SetSimilarityJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def brute(rows: Seq[(Long, Seq[String])], t: Double): Set[(Long, Long, Int)] =
    (for {
      (ia, sa) <- rows.map { case (i, s) => (i, s.toSet) }
      (ib, sb) <- rows.map { case (i, s) => (i, s.toSet) }
      if ia < ib
      ov = (sa intersect sb).size
      un = (sa union sb).size
      if un > 0 && ov.toDouble / un >= t
    } yield (ia, ib, ov)).toSet

  test("prefix filtering is complete vs brute force on a randomized corpus") {
    val rng = new scala.util.Random(11)
    val vocab = (0 until 60).map(i => s"w$i")
    val rows = (0L until 100L).map { i =>
      // overlapping families: base sets with random mutations
      val base = vocab.slice((i % 7).toInt * 6, (i % 7).toInt * 6 + 12)
      val mutated = base.filter(_ => rng.nextDouble() > 0.15) ++
        (if (i % 3 == 0) Seq(vocab(rng.nextInt(vocab.size))) else Nil)
      (i, mutated.distinct)
    }
    for (t <- Seq(0.5, 0.7, 0.9)) {
      val got = SetSimilarityJoin.jaccardPairs(
          rows.toDF("id", "toks").repartition(7), "id", "toks", t)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2).toInt)).toSet
      assert(got == brute(rows, t),
        s"t=$t missing=${brute(rows, t) -- got} extra=${got -- brute(rows, t)}")
    }
  }

  test("exact-threshold pair (jac == t) is included, strictly-below excluded") {
    // b ⊂ a with |b|=9, |a|=10 → jac = 9/10 exactly
    val a = (0 until 10).map(i => s"t$i")
    val rows = Seq((1L, a), (2L, a.take(9)), (3L, a.take(8)))
    val got = SetSimilarityJoin.jaccardPairs(rows.toDF("id", "toks"), "id", "toks", 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 2L)), s"got $got") // 1-3: 8/10, 2-3: 8/9 — both < 0.9
  }


  // ------------------------------------------------------- containment ---

  private def bruteContain(rows: Seq[(Long, Seq[String])],
                           t: Double): Set[(Long, Long, Int)] =
    (for {
      (ia, sa) <- rows.map { case (i, s) => (i, s.toSet) }
      (ib, sb) <- rows.map { case (i, s) => (i, s.toSet) }
      if ia != ib && sa.nonEmpty
      ov = (sa intersect sb).size
      if ov.toDouble / sa.size >= t
    } yield (ia, ib, ov)).toSet

  test("containment prefix filtering is complete vs brute force") {
    val rng = new scala.util.Random(23)
    val vocab = (0 until 50).map(i => s"w$i")
    val rows = (0L until 90L).map { i =>
      val n = 4 + rng.nextInt(12)
      val start = rng.nextInt(vocab.size - n)
      (i, vocab.slice(start, start + n))
    } ++ Seq((900L, vocab.slice(3, 9)), (901L, vocab.slice(0, 30))) // subset
    for (t <- Seq(0.6, 0.9, 1.0)) {
      val got = SetSimilarityJoin.containmentPairs(
          rows.toDF("id", "toks").repartition(7), "id", "toks", t)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(got == bruteContain(rows, t),
        s"t=$t missing=${bruteContain(rows, t) -- got} " +
          s"extra=${got -- bruteContain(rows, t)}")
    }
  }

  test("containment is asymmetric: the quote finds its page, not vice versa") {
    val page = (0 until 100).map(i => s"p$i")
    val rows = Seq((1L, page), (2L, page.slice(10, 20)))
    val got = SetSimilarityJoin.containmentPairs(
        rows.toDF("id", "toks"), "id", "toks", 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3))).toSet
    assert(got == Set((2L, 1L, 1.0)), s"got $got")
  }


  test("containment refuses near-quadratic join volume loudly") {
    // tiny vocabulary relative to doc count: genuine containment output
    // is near-quadratic — the maxJoinRows guard must refuse, not grind
    val vocab = (0 until 6).map(i => s"v$i")
    val rows = (0L until 50L).map(i => (i, vocab.drop((i % 3).toInt)))
    val e = intercept[IllegalArgumentException] {
      SetSimilarityJoin.containmentPairs(
        rows.toDF("id", "toks"), "id", "toks", 0.9, maxJoinRows = 50L)
    }
    assert(e.getMessage.contains("maxJoinRows"))
  }

  test("result is partitioning independent") {
    val rows = (0L until 80L).map { i =>
      (i, (0 until 10).map(j => s"w${(i / 4 + j) % 25}"))
    }
    def run(parts: Int) = SetSimilarityJoin.jaccardPairs(
        rows.toDF("id", "toks").repartition(parts), "id", "toks", 0.6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2).toInt, r.getDouble(3)))
      .toSet
    assert(run(2) == run(13))
  }

  test("refuses template-dominated corpora loudly") {
    val rows = (0L until 40L).map(i => (i, Seq("same", "tokens", "everywhere")))
    val e = intercept[IllegalArgumentException] {
      SetSimilarityJoin.jaccardPairs(rows.toDF("id", "toks"), "id", "toks", 0.9,
        maxBucketSize = 10)
    }
    assert(e.getMessage.contains("maxBucketSize"))
  }

  test("no leaked internal caches after the EAGER build") {
    val rows = (0L until 20L).map(i => (i, Seq(s"a$i", "b", "c")))
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val out = SetSimilarityJoin.jaccardPairs(rows.toDF("id", "toks"), "id", "toks", 0.9)
    out.count()
    out.unpersist(blocking = true)
    val after = spark.sparkContext.getPersistentRDDs.keySet
    assert((after -- before).isEmpty, s"leaked RDDs: ${after -- before}")
  }
}
