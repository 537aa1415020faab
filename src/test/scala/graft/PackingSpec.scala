package graft

import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Packing, Text, UnigramLm}

/** Sequence packing, token chunking, and unigram-LM scoring. */
class PackingSpec extends AnyFunSuite with BeforeAndAfterAll {
  // Suites share one session: sweep this suite's leftover operator caches
  // (EAGER results some tests discard without unpersist) so later suites'
  // hygiene assertions see a clean slate. Unpersist never affects
  // correctness — lineage stays intact.
  override def afterAll(): Unit = {
    spark.sharedState.cacheManager.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
  }

  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def naivePack(counts: Seq[(Long, Long)], capacity: Long): Map[Long, (Long, Long)] = {
    // reference: sort by id, exclusive running sum, seq = start / capacity
    var acc = 0L
    counts.sortBy(_._1).map { case (id, n) =>
      val start = acc; acc += n
      id -> (start / capacity, start % capacity)
    }.toMap
  }

  test("packSequences matches the sequential reference on irregular counts") {
    val counts = (0L until 200L).map(i => (i * 3 + 7, (i * 37 % 90) + 1)) // sparse ids
    val df = counts.toDF("id", "n").repartition(7)
    val got = Packing.packSequences(df, "id", col("n"), capacity = 512,
        bucketWidth = 64)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    assert(got == naivePack(counts, 512))
  }

  test("packSequences is bucketWidth- and partitioning-independent") {
    val counts = (0L until 150L).map(i => (i, (i * 13 % 40) + 5))
    val expected = naivePack(counts, 256)
    for (bw <- Seq(1L, 17L, 1000000L); parts <- Seq(1, 11)) {
      val got = Packing.packSequences(counts.toDF("id", "n").repartition(parts),
          "id", col("n"), capacity = 256, bucketWidth = bw)
        .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
      assert(got == expected, s"bucketWidth=$bw parts=$parts diverged")
    }
  }

  test("a document longer than the capacity starts its own sequences (concat-slice)") {
    // doc 1: 100 tokens fills seq 0 and straddles into 1; doc 2 starts at
    // global token 100 → seq 1 offset 36; doc 3 at 150 → seq 2 offset 22
    val df = Seq((1L, 100L), (2L, 50L), (3L, 10L)).toDF("id", "n")
    val got = Packing.packSequences(df, "id", col("n"), capacity = 64)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).toSet
    assert(got == Set((1L, 0L, 0L), (2L, 1L, 36L), (3L, 2L, 22L)))
  }

  test("packedStats telescopes to the corpus token total") {
    val counts = (0L until 97L).map(i => (i, (i % 29) + 1))
    val stats = Packing.packedStats(counts.toDF("id", "n"), "id", col("n"),
      capacity = 100, bucketWidth = 10)
    assert(stats.agg(sum("n_tokens")).head().getLong(0) == counts.map(_._2).sum)
    assert(stats.agg(sum("n_docs")).head().getLong(0) == counts.length)
  }

  test("chunkTokens emits overlapping windows with exact boundaries") {
    val df = Seq((1L, "a b c d e f g"), (2L, "x")).toDF("id", "text")
    val rows = Packing.chunkTokens(df, "id", "text", window = 3, stride = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3),
        r.getString(4))).toSet
    assert(rows == Set(
      (1L, 0, 0, 3, "a b c"), (1L, 1, 2, 3, "c d e"),
      (1L, 2, 4, 3, "e f g"), (1L, 3, 6, 1, "g"),
      (2L, 0, 0, 1, "x")))
  }

  test("unigram scoring matches the hand-computed decimal arithmetic") {
    // corpus: "a a b" + "a c" → freqs a:3, b:1, c:1, total 5
    val docs = Seq((1L, "a a b"), (2L, "a c")).toDF("id", "text")
    def lp(cnt: Double): BigDecimal =
      BigDecimal(math.log(cnt / 5.0)).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    def xent(lps: Seq[BigDecimal]): Double =
      (-(lps.sum.toDouble) / lps.size * 10000).round / 10000.0
    val got = UnigramLm.score(docs, docs, "id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got(1L) == ((3L, xent(Seq(lp(3), lp(3), lp(1))))))
    assert(got(2L) == ((2L, xent(Seq(lp(3), lp(1))))))
  }

  test("bigram scoring matches hand-computed stupid backoff incl. OOV") {
    // corpus: uni a:3 b:2 c:3, total 8; bigrams (a,b):2 (b,a):1 (b,c):1 (c,c):1
    val ref = Seq((1L, "a b a"), (2L, "a b c"), (3L, "c c")).toDF("id", "text")
    def lp(x: Double): BigDecimal =
      BigDecimal(math.log(x)).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    def xent(lps: Seq[BigDecimal]): Double =
      (-(lps.sum.toDouble) / lps.size * 10000).round / 10000.0

    val self = UnigramLm.scoreBigram(ref, ref, "id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(self(1L) == ((3L, xent(Seq(lp(3.0 / 8), lp(2.0 / 3), lp(1.0 / 2))))))
    assert(self(2L) == ((3L, xent(Seq(lp(3.0 / 8), lp(2.0 / 3), lp(1.0 / 2))))))
    assert(self(3L) == ((2L, xent(Seq(lp(3.0 / 8), lp(1.0 / 3))))))

    // "b q": first b = 2/8; (b,q) unseen and q OOV -> 0.4 * 0.5 / 8
    val oov = UnigramLm.scoreBigram(Seq((9L, "b q")).toDF("id", "text"),
        ref, "id", "text").head()
    assert(oov.getLong(1) == 2L)
    assert(oov.getDouble(2) == xent(Seq(lp(2.0 / 8), lp(0.4 * 0.5 / 8))))

    // seen bigram whose score uses c2/c1, not the backoff: "c c"
    val seen = UnigramLm.scoreBigram(Seq((8L, "c c")).toDF("id", "text"),
        ref, "id", "text").head()
    assert(seen.getDouble(2) == xent(Seq(lp(3.0 / 8), lp(1.0 / 3))))
  }

  test("trigram scoring matches hand-computed chained backoff incl. double OOV") {
    // uni a:3 b:2 c:3 tot 8; bi (a,b):2 (b,a):1 (b,c):1 (c,c):1;
    // tri (a,b,a):1 (a,b,c):1
    val ref = Seq((1L, "a b a"), (2L, "a b c"), (3L, "c c")).toDF("id", "text")
    def lp(x: Double): BigDecimal =
      BigDecimal(math.log(x)).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    def xent(lps: Seq[BigDecimal]): Double =
      (-(lps.sum.toDouble) / lps.size * 10000).round / 10000.0

    val self = UnigramLm.scoreTrigram(ref, ref, "id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(self(1L) == ((3L, xent(Seq(lp(3.0 / 8), lp(2.0 / 3), lp(1.0 / 2))))))
    assert(self(3L) == ((2L, xent(Seq(lp(3.0 / 8), lp(1.0 / 3))))))

    // "b a b": trigram unseen -> 0.4 * bigram(a,b) = 0.4*(2/3)
    val one = UnigramLm.scoreTrigram(Seq((9L, "b a b")).toDF("id", "text"),
      ref, "id", "text").head()
    assert(one.getDouble(2) ==
      xent(Seq(lp(2.0 / 8), lp(1.0 / 2), lp(0.4 * (2.0 / 3)))))

    // "c a q": bigram (c,a) unseen -> 0.4*(3/8); trigram AND bigram (a,q)
    // unseen, q OOV -> 0.4*(0.4*(0.5/8))
    val two = UnigramLm.scoreTrigram(Seq((8L, "c a q")).toDF("id", "text"),
      ref, "id", "text").head()
    assert(two.getDouble(2) ==
      xent(Seq(lp(3.0 / 8), lp(0.4 * (3.0 / 8)), lp(0.4 * (0.4 * (0.5 / 8))))))
  }

  test("bigram scoring is partitioning-independent") {
    val docs = (0L until 40L).map(i =>
      (i, s"w${i % 5} w${(i * 3) % 7} w${i % 5} w${(i + 1) % 4}"))
    def run(parts: Int) =
      UnigramLm.scoreBigram(docs.toDF("id", "text").repartition(parts),
          docs.toDF("id", "text"), "id", "text")
        .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(run(1) == run(11))
  }

  test("out-of-vocabulary tokens score with the smoothing pseudo-count") {
    val ref = Seq((1L, "a a b")).toDF("id", "text") // total 3
    val target = Seq((9L, "a zz")).toDF("id", "text") // zz unseen
    def lp(cnt: Double): BigDecimal =
      BigDecimal(math.log(cnt / 3.0)).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val expected = (-((lp(2) + lp(0.5)).toDouble) / 2 * 10000).round / 10000.0
    val got = UnigramLm.score(target, ref, "id", "text")
      .head()
    assert(got.getLong(1) == 2L)
    assert(got.getDouble(2) == expected)
  }

  test("capped vocabulary broadcasts and keeps rare tokens as OOV mass") {
    val ref = Seq((1L, "a a a b b c")).toDF("id", "text")
    val scored = UnigramLm.score(ref, ref, "id", "text", maxVocab = 2)
    val plan = scored.queryExecution.executedPlan.toString
    assert(plan.contains("Broadcast"), s"capped vocab should broadcast:\n$plan")
    // c is outside the top-2 vocab → scored as OOV (0.5/6), not dropped
    def lp(cnt: Double): BigDecimal =
      BigDecimal(math.log(cnt / 6.0)).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val expected = (-((lp(3) * 3 + lp(2) * 2 + lp(0.5)).toDouble) / 6 * 10000)
      .round / 10000.0
    assert(scored.head().getDouble(2) == expected)
  }

  test("token-budget mixing matches the sequential per-group reference") {
    import graft.functions.Mixing
    val docs = (0L until 120L).map { i =>
      (i, s"src${i % 3}", ("tok " * (i % 17 + 1).toInt).trim)
    }.toDF("id", "grp", "text")
    val kept = Mixing.rebalanceTokenBudget(docs, "id", "grp",
        Text.tokenCount(col("text")), tokenBudgetPerGroup = 100L)
      .select("id").collect().map(_.getLong(0)).toSet
    // sequential reference: per group, md5-hash order, keep while the
    // exclusive running token total is under budget
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val expected = (0L until 120L).groupBy(_ % 3).values.flatMap { ids =>
      var acc = 0L
      ids.toSeq.sortBy(i => (md5hex(i.toString), i)).flatMap { i =>
        val n = i % 17 + 1
        val keep = acc < 100L; acc += n
        if (keep) Some(i) else None
      }
    }.toSet
    assert(kept == expected)
    // determinism under repartitioning
    val kept2 = Mixing.rebalanceTokenBudget(docs.repartition(13), "id", "grp",
        Text.tokenCount(col("text")), tokenBudgetPerGroup = 100L)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(kept2 == kept)
    // a group's kept token mass is budget + at most one straddler
    val mass = Mixing.rebalanceTokenBudget(docs, "id", "grp",
        Text.tokenCount(col("text")), tokenBudgetPerGroup = 100L)
      .groupBy("grp").agg(sum(Text.tokenCount(col("text"))).as("m"))
      .collect().map(_.getLong(1))
    assert(mass.forall(m => m >= 100L - 17 && m <= 100L + 17))
  }

  test("pack + chunk queries agree with Text.tokenCount semantics") {
    // the driver queries feed Text.tokenCount into packSequences — empty
    // and whitespace-heavy docs must count like the tokenizer does
    val df = Seq((1L, "  two  tokens  "), (2L, "one")).toDF("id", "text")
    val got = Packing.packSequences(df, "id", Text.tokenCount(col("text")),
        capacity = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 2L, 2L -> 1L))
  }

  test("content-defined chunking matches a sequential reference and tiles the text") {
    val w = 4; val div = 8L
    def md5hex(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    def winHash(s: String): Long =
      s.foldLeft(0L)((acc, c) => (acc * 257 + c.toLong) % 1048573)
    def ref(text: String): Seq[(Long, Long, Long, String)] = {
      val n = text.length
      val cuts = (w to n - 1).filter { i =>
        winHash(text.substring(i - w, i)) % div == 0
      }
      val bounds = 0 +: cuts :+ n
      bounds.zip(bounds.tail).zipWithIndex.map { case ((p, q), j) =>
        ((j + 1).toLong, (p + 1).toLong, q.toLong, md5hex(text.substring(p, q)))
      }
    }
    val rng = new scala.util.Random(3)
    val docs = (0L until 40L).map(i =>
      (i, (0 until 20 + rng.nextInt(180)).map(_ => ('a' + rng.nextInt(6)).toChar).mkString))
    val got = Packing.chunkContentDefined(
        docs.toDF("id", "text").repartition(7), "id", "text", window = w, divisor = div)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))))
      .groupBy(_._1).view.mapValues(_.map(_._2).sortBy(_._1).toSeq).toMap
    docs.foreach { case (i, text) =>
      assert(got(i) == ref(text), s"doc $i: got ${got(i)}\nexpected ${ref(text)}")
      // invariants: tiles [1, n] contiguously
      val ch = got(i)
      assert(ch.head._2 == 1L && ch.last._3 == text.length.toLong)
      ch.zip(ch.tail).foreach { case (a, b) => assert(b._2 == a._3 + 1) }
    }
    // a short doc (< window) is one whole chunk
    val one = Packing.chunkContentDefined(
        Seq((9L, "ab")).toDF("id", "text"), "id", "text", window = w, divisor = div)
      .collect()
    assert(one.length == 1 && one(0).getLong(2) == 1L && one(0).getLong(3) == 2L)
  }

  test("content-defined chunks are edit-local: an append only re-chunks the tail") {
    val base = ('a' to 'z').mkString * 12  // 312 chars
    val edited = base + "XYZQ"
    val Seq(c1, c2) = Seq(base, edited).map { t =>
      Packing.chunkContentDefined(Seq((1L, t)).toDF("id", "text"), "id", "text",
          window = 8, divisor = 16)
        .collect().map(r => (r.getLong(2), r.getLong(3), r.getString(4))).toSeq
        .sortBy(_._1)
    }
    // every chunk except possibly the last is identical
    assert(c1.dropRight(1) == c2.dropRight(1) ||
      c1.dropRight(1) == c2.dropRight(2).take(c1.length - 1),
      s"prefix chunks changed:\n$c1\n$c2")
  }
}
