package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Dedup
import graft.functions.expressions.MinHashExpression

/** Winnowing fingerprint selection (Schleimer et al. 2003): exactness vs a
  * reference implementation, the detection guarantee, and the selection
  * density bound. */
class WinnowSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Reference robust winnowing: rightmost minimum of each window, emit per
    * selected position. */
  private def winnowRef(h: Seq[Long], w: Int): Seq[Long] = {
    if (h.isEmpty) return Nil
    val nWin = math.max(1, h.size - w + 1)
    var prev = -1
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    for (i <- 0 until nWin) {
      val win = h.slice(i, math.min(i + w, h.size))
      val best = i + win.zipWithIndex.minBy { case (v, j) => (v, -j) }._2
      if (best != prev) { out += h(best); prev = best }
    }
    out.toSeq
  }

  private def winnowSpark(h: Seq[Long], w: Int): Seq[Long] =
    Seq(Tuple1(h)).toDF("h")
      .select(MinHashExpression.winnowMinHashes(col("h"), w))
      .head().getSeq[Long](0)

  test("matches the reference implementation on random inputs (codegen path)") {
    val rnd = new scala.util.Random(7)
    for (n <- Seq(0, 1, 3, 8, 50, 200); w <- Seq(1, 2, 4, 8)) {
      val h = Seq.fill(n)(rnd.nextLong())
      assert(winnowSpark(h, w) == winnowRef(h, w), s"n=$n w=$w")
    }
    // adversarial: runs of equal values (rightmost-min tie rule)
    assert(winnowSpark(Seq(5L, 5L, 5L, 5L), 2) == winnowRef(Seq(5L, 5L, 5L, 5L), 2))
    assert(winnowSpark(Seq(3L, 1L, 1L, 3L, 1L), 3) == winnowRef(Seq(3L, 1L, 1L, 3L, 1L), 3))
  }

  test("guarantee: a shared run of >= window+k-1 tokens yields a shared fingerprint") {
    val shared = "alpha bravo charlie delta echo foxtrot golf hotel india juliett " +
      "kilo lima mike november oscar papa"
    val docs = Seq(
      (1L, s"unique one two three $shared tail piece here"),
      (2L, s"$shared completely different ending text goes on")).toDF("doc_id", "text")
    // k=4, w=4: guarantee threshold = 7 tokens; the shared run is 16 tokens
    val fps = Dedup.winnowFingerprints(docs, "doc_id", "text",
      shingleSize = 4, window = 4)
    val sets = fps.collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    assert(sets(1L).intersect(sets(2L)).nonEmpty,
      "winnowing guarantee violated: no shared fingerprint for a 16-token shared run")
    // and the candidate generator surfaces the pair
    val pairs = Dedup.winnowCandidates(docs, "doc_id", "text",
      shingleSize = 4, window = 4)
    assert(pairs.collect().exists(r => r.getLong(0) == 1L && r.getLong(1) == 2L))
    pairs.unpersist()
  }

  test("density: selected fraction tracks the 2/(w+1) expectation") {
    val rnd = new scala.util.Random(42)
    val h = Seq.fill(4000)(rnd.nextLong())
    val w = 7
    val kept = winnowSpark(h, w).size.toDouble / h.size
    val expected = 2.0 / (w + 1)
    assert(kept > expected * 0.6 && kept < expected * 1.6,
      s"density $kept far from ${expected}")
  }

  test("document-frequency cap bounds planted-boilerplate pair volume") {
    // 1,000 docs share one 12-token boilerplate run (k=4, w=4 ⇒ guarantee
    // threshold 7 tokens, so every doc carries boilerplate fingerprints);
    // two docs (1, 2) are exact duplicates of each other beyond it. Without
    // a cap the boilerplate fingerprint group alone yields ~C(1000,2) ≈
    // 500k pairs; with the df cap the join must drop it and return ONLY the
    // planted duplicate pair (their non-boilerplate fingerprints have df=2).
    val boiler = "this text is standard corpus boilerplate shared by every document here"
    val docs = (1L to 1000L).map { i =>
      val tail = if (i <= 2) "identical planted duplicate body content"
      else s"unique tail $i alpha${i} beta${i} gamma${i} delta${i}"
      (i, s"$boiler $tail")
    }.toDF("doc_id", "text")
    val pairs = Dedup.winnowCandidates(docs, "doc_id", "text",
      shingleSize = 4, window = 4, maxDocFreq = 100)
    val got = pairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    pairs.unpersist()
    assert(got == Set((1L, 2L)),
      s"expected only the planted pair after the df cap, got ${got.size} pairs")

    // sanity: on a small slice the SAME boilerplate does pair when uncapped
    val small = docs.filter(col("doc_id") <= 10)
    val uncapped = Dedup.winnowCandidates(small, "doc_id", "text",
      shingleSize = 4, window = 4, maxDocFreq = 0)
    val nUncapped = uncapped.count()
    uncapped.unpersist()
    assert(nUncapped == 45L, // C(10,2): all-pairs via the shared fingerprint
      s"uncapped boilerplate should pair all docs, got $nUncapped")
  }

  test("positional selection matches the reference positions (codegen path)") {
    def winnowRefPos(h: Seq[Long], w: Int): Seq[Int] = {
      if (h.isEmpty) return Nil
      val nWin = math.max(1, h.size - w + 1)
      var prev = -1
      val out = scala.collection.mutable.ArrayBuffer.empty[Int]
      for (i <- 0 until nWin) {
        val win = h.slice(i, math.min(i + w, h.size))
        val best = i + win.zipWithIndex.minBy { case (v, j) => (v, -j) }._2
        if (best != prev) { out += best; prev = best }
      }
      out.toSeq
    }
    def sparkPos(h: Seq[Long], w: Int): Seq[Int] =
      Seq(Tuple1(h)).toDF("h")
        .select(MinHashExpression.winnowMinPositions(col("h"), w))
        .head().getSeq[Int](0)
    val rnd = new scala.util.Random(11)
    for (n <- Seq(0, 1, 5, 60, 300); w <- Seq(1, 3, 8)) {
      val h = Seq.fill(n)(rnd.nextLong())
      assert(sparkPos(h, w) == winnowRefPos(h, w), s"n=$n w=$w")
    }
    // positions and hashes must describe the same selection
    val h = Seq.fill(100)(rnd.nextLong())
    val pos = sparkPos(h, 5)
    assert(pos.map(h) == winnowSpark(h, 5))
  }

  test("matched-span reconstruction localizes a planted shared run") {
    // Docs share a 16-token run at DIFFERENT offsets: doc 1 at tokens 4..19,
    // doc 2 at tokens 0..15. k=4, w=4 ⇒ every window of the run selects a
    // fingerprint, so the reconstructed span must sit inside the run and
    // cover it to within ~w tokens at each edge, with the alignment offset
    // (startA - startB ≈ 4) recovered.
    val shared = "alpha bravo charlie delta echo foxtrot golf hotel india juliett " +
      "kilo lima mike november oscar papa"
    val docs = Seq(
      (1L, s"unique one two three $shared tail piece here"),
      (2L, s"$shared completely different ending text goes on")).toDF("doc_id", "text")
    val spans = Dedup.winnowMatchedSpans(docs, "doc_id", "text",
      shingleSize = 4, window = 4)
    val rows = spans.collect().map(r => (r.getLong(0), r.getLong(1),
      r.getInt(2), r.getInt(3), r.getInt(4), r.getInt(5), r.getLong(6)))
    spans.unpersist()
    assert(rows.nonEmpty, "no spans reconstructed for a 16-token shared run")
    // the dominant span (most fingerprints) must match the planted alignment
    val (idA, idB, startA, endA, startB, endB, nFps) = rows.maxBy(_._7)
    assert(idA == 1L && idB == 2L)
    assert(startA - startB == 4, s"alignment offset wrong: $startA - $startB")
    // doc1 run = tokens 4..19; doc2 run = tokens 0..15 (gram starts ..12)
    assert(startA >= 4 && endA <= 19 + 1, s"spanA [$startA,$endA] outside run")
    assert(startB >= 0 && endB <= 15 + 1, s"spanB [$startB,$endB] outside run")
    // coverage: the span reaches within ~window tokens of the run edges
    assert(endA - startA + 1 >= 16 - 4 - 3, s"spanA too short [$startA,$endA]")
    assert(nFps >= 2)
  }

  test("matched-span boilerplate cap drops loudly, not silently") {
    // Same planted shape as the winnowCandidates cap test: every doc opens
    // with shared boilerplate, docs 1-2 are full duplicates. The span path
    // must (a) suppress boilerplate-only spans via the df cap, and (b) SAY
    // SO on stderr — the same loud-drop contract as winnowCandidates, so a
    // span suppressed by the cap never vanishes without a trace.
    val boiler = "this text is standard corpus boilerplate shared by every document here"
    val docs = (1L to 50L).map { i =>
      val tail = if (i <= 2) "identical planted duplicate body content"
      else s"unique tail $i alpha${i} beta${i} gamma${i} delta${i}"
      (i, s"$boiler $tail")
    }.toDF("doc_id", "text")
    val captured = new java.io.ByteArrayOutputStream()
    val oldErr = System.err
    val spans = try {
      System.setErr(new java.io.PrintStream(captured, true))
      Dedup.winnowMatchedSpans(docs, "doc_id", "text",
        shingleSize = 4, window = 4, maxDocFreq = 10)
    } finally System.setErr(oldErr)
    val got = spans.select("idA", "idB").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    spans.unpersist()
    assert(got == Set((1L, 2L)),
      s"expected only the planted duplicate pair after the df cap, got $got")
    assert(captured.toString.contains("winnowMatchedSpans: dropping"),
      s"boilerplate drop was silent; stderr: ${captured.toString.take(500)}")
  }

  test("unrelated documents share no fingerprints") {
    val docs = Seq(
      (1L, "aa bb cc dd ee ff gg hh ii jj kk ll mm nn"),
      (2L, "one two three four five six seven eight nine ten eleven twelve")
    ).toDF("doc_id", "text")
    val pairs = Dedup.winnowCandidates(docs, "doc_id", "text",
      shingleSize = 3, window = 3)
    assert(pairs.collect().isEmpty)
    pairs.unpersist()
  }
}
