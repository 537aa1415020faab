package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Decontamination, Dedup, Packing}

/** Round-5 corpus-analytics operators: CDC dedup stats, leakage-free
  * cluster splits, closed-form per-group regression, quantized-exact
  * covariance. Each test pins the operator to a hand-computable input.
  */
class CorpusAnalyticsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("CDC corpus dedup stats: duplicated docs collapse to unique chunk bytes") {
    val base = "the quick brown fox jumps over the lazy dog again and again " * 4
    val docs = Seq((1L, base), (2L, base), (3L, base + " tail difference xyz"))
      .toDF("doc_id", "text")
    val chunks = Packing.chunkContentDefined(docs, "doc_id", "text")
    val perFp = chunks.groupBy(col("fp"))
      .agg(count(lit(1)).as("n"), max(col("cend") - col("cstart") + 1).as("len"))
    val r = perFp.agg(
      sum(col("n")).as("n_chunks"), count(lit(1)).as("n_unique"),
      sum(col("n") * col("len")).as("bytes_total"),
      sum(col("len")).as("bytes_unique")).head()
    val (nChunks, nUnique) = (r.getLong(0), r.getLong(1))
    val (bytesTotal, bytesUnique) = (r.getLong(2), r.getLong(3))
    // doc1 == doc2: every doc-1 chunk occurs at least twice
    assert(nChunks > nUnique)
    assert(bytesTotal === docs.select(sum(length(col("text")))).head().getLong(0))
    // unique bytes can't exceed one copy of doc1 + doc3's text
    assert(bytesUnique <= base.length + (base + " tail difference xyz").length)
    assert(bytesUnique < bytesTotal)
  }

  test("cluster split co-locates every identical-text family in ONE split") {
    val docs = (0L until 40L).map(i => (i, s"unique doc number $i with words"))
    val dups = Seq((1000L, docs(3)._2), (1001L, docs(3)._2),
      (2000L, docs(7)._2))
    val df = (docs ++ dups).toDF("doc_id", "text")
    val pairs = Dedup.minhashCandidates(df, "doc_id", "text",
        shingleSize = 2, numHashes = 32, bands = 8)
      .filter(col("jaccard_est") === 1.0)
      .join(df.select(col("doc_id").as("idA"), col("text").as("__ta")), "idA")
      .join(df.select(col("doc_id").as("idB"), col("text").as("__tb")), "idB")
      .filter(col("__ta") === col("__tb"))
      .select("idA", "idB")
    val comps = Dedup.connectedComponents(pairs)
      .withColumn("b", Decontamination.hashBucket(col("component")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // family {3, 1000, 1001} → rep 3; family {7, 2000} → rep 7
    val byId = comps.map(t => t._1 -> (t._2, t._3)).toMap
    assert(byId.keySet === Set(3L, 1000L, 1001L, 7L, 2000L))
    assert(Set(3L, 1000L, 1001L).map(byId(_)._1) === Set(3L))
    assert(Set(7L, 2000L).map(byId(_)._1) === Set(7L))
    // same representative ⇒ same bucket ⇒ same split: no family straddles
    assert(Set(3L, 1000L, 1001L).map(byId(_)._2).size === 1)
    assert(Set(7L, 2000L).map(byId(_)._2).size === 1)
  }

  test("closed-form regression matches the hand-computed least squares") {
    // y = 3x + 10 exactly: slope 3, intercept 10, any grouping
    val rows = Seq.tabulate(20)(i => ("g", (i + 1).toDouble, (3 * (i + 1) + 10).toDouble))
    val df = rows.toDF("grp", "x", "y")
    val cq = round(col("x") * 100).cast("long")
    val cp = round(col("y") * 100).cast("long")
    def dec(c: org.apache.spark.sql.Column) =
      sum(c.cast(org.apache.spark.sql.types.DecimalType(38, 0)))
    val r = df.select(col("grp"), cq.as("cx"), cp.as("cy"))
      .groupBy("grp")
      .agg(count(lit(1)).as("n"), dec(col("cx")).as("sx"), dec(col("cy")).as("sy"),
        dec(col("cx") * col("cx")).as("sxx"), dec(col("cx") * col("cy")).as("sxy"))
      .select(
        ((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
          (col("n") * col("sxx") - col("sx") * col("sx")).cast("double")).as("slope"),
        ((col("sy") * col("sxx") - col("sx") * col("sxy")).cast("double") /
          (col("n") * col("sxx") - col("sx") * col("sx")).cast("double") / 100)
          .as("intercept"))
      .head()
    assert(r.getDouble(0) === 3.0)
    assert(r.getDouble(1) === 10.0)
  }

  test("quantized covariance equals the brute-force definition on exact inputs") {
    // embeddings whose 1000-scaled values are exact integers: quantization
    // is lossless, so the operator must equal the textbook covariance
    val vecs = Seq(
      Array(0.001f, 0.004f, 0.010f),
      Array(0.002f, 0.006f, 0.020f),
      Array(0.003f, 0.008f, 0.060f),
      Array(0.004f, 0.010f, 0.080f))
    val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v.toSeq) }
      .toDF("vec_id", "embedding")
    val d = 3
    val q = transform(slice(col("embedding"), 1, d),
      e => floor(e.cast("double") * 1000 + lit(0.5)).cast("long"))
    val pairs = flatten(transform(sequence(lit(0), lit(d - 1)), i =>
      transform(sequence(i, lit(d - 1)), j =>
        struct(i.as("i"), j.as("j"),
          element_at(col("__q"), i + 1).as("qi"),
          element_at(col("__q"), j + 1).as("qj")))))
    val got = df.select(q.as("__q")).select(explode(pairs).as("pr"))
      .groupBy(col("pr.i").as("i"), col("pr.j").as("j"))
      .agg(count(lit(1)).as("n"), sum(col("pr.qi")).as("sqi"),
        sum(col("pr.qj")).as("sqj"), sum(col("pr.qi") * col("pr.qj")).as("spp"))
      .select(col("i"), col("j"),
        ((col("n") * col("spp") - col("sqi") * col("sqj")).cast("double") /
          (col("n").cast("double") * col("n").cast("double") * lit(1e6))).as("cov"))
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getDouble(2))).toMap
    // reference over the QUANTIZED values (the operator's contract):
    // q/1000 in exact double arithmetic
    val m = vecs.map(_.map(v => math.floor(v.toDouble * 1000 + 0.5) / 1000))
    val n = m.length
    def mean(k: Int) = m.map(_(k)).sum / n
    def cov(a: Int, b: Int) =
      m.map(v => (v(a) - mean(a)) * (v(b) - mean(b))).sum / n
    for (i <- 0 until d; j <- i until d)
      assert(math.abs(got((i, j)) - cov(i, j)) < 1e-12,
        s"cov($i,$j): got ${got((i, j))}, want ${cov(i, j)}")
  }

  test("CDC span dedup matches a sequential keep-first reference") {
    val w = 4; val div = 8L
    def winHash(s: String): Long =
      s.foldLeft(0L)((acc, c) => (acc * 257 + c.toLong) % 1048573)
    def chunksOf(text: String): Seq[(Long, String)] = {
      val n = text.length
      val cuts = (w to n - 1).filter(i => winHash(text.substring(i - w, i)) % div == 0)
      val bounds = 0 +: cuts :+ n
      bounds.zip(bounds.tail).zipWithIndex.map { case ((p, q), j) =>
        ((j + 1).toLong, text.substring(p, q))
      }
    }
    val rng = new scala.util.Random(11)
    val fresh = (0L until 20L).map(i =>
      (i, (0 until 60 + rng.nextInt(120)).map(_ => ('a' + rng.nextInt(6)).toChar).mkString))
    // planted exact copies (all chunks dup) + one partial overlap
    val corpus = fresh ++ Seq((100L, fresh(3)._2), (101L, fresh(7)._2),
      (102L, fresh(3)._2 + fresh(5)._2))
    // sequential reference: global keep-first over (id, chunk_idx)
    val all = corpus.flatMap { case (id, t) =>
      chunksOf(t).map { case (idx, txt) => (id, idx, txt) } }
    val first = all.groupBy(_._3).view.mapValues(_.minBy(c => (c._1, c._2))).toMap
    val expected = corpus.map { case (id, t) =>
      val ch = chunksOf(t)
      val kept = ch.filter { case (idx, txt) => first(txt) == ((id, idx, txt)) }
      (id, kept.map(_._2).mkString, kept.size.toLong, (ch.size - kept.size).toLong,
        ch.filter { case (idx, txt) => first(txt) != ((id, idx, txt)) }
          .map(_._2.length.toLong).sum)
    }.map { case (id, c, k, r, b) => id -> ((c, k, r, b)) }.toMap
    val got = Packing.dedupCdcChunks(
        corpus.toDF("doc_id", "text").repartition(7), "doc_id", "text",
        window = w, divisor = div)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got == expected)
    // the exact copies lost every chunk (all of them occur earlier); note
    // ORIGINALS may legitimately lose short chunks too — organic cross-doc
    // collisions are deduped exactly like planted ones (the map equality
    // above pins both cases to the reference)
    assert(got(100L)._1 == "" && got(101L)._1 == "")
    assert(got(100L)._2 == 0L &&
      got(100L)._3 == chunksOf(fresh(3)._2).size.toLong)
  }

  test("PMI collocations match the hand formula with min-count and ordering") {
    val docs = Seq(
      "new york new york new york",
      "new york city hall",
      "city hall city hall",
      "york city").zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val got = graft.functions.Text.pmiCollocations(docs, "text",
        minCount = 2, topK = 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    // hand counts: tokens n1=16; bigrams n2=12
    // "new york" c12=4 (3 in doc0 spans + 1 in doc1), c(new)=4, c(york)=5
    // "york new" c12=2, "york city" c12=2 (doc1 + doc3),
    // "city hall" c12=3 (1 + 2), c(city)=4, c(hall)=3
    // "hall city" c12=1 < minCount — dropped
    def pmi(c12: Long, c1: Long, c2: Long): Double =
      BigDecimal(math.log(c12.toDouble * 16 * 16 / (c1.toDouble * c2 * 12)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expected = Seq(
      ("city hall", 3L, pmi(3, 4, 3)),
      ("new york", 4L, pmi(4, 4, 5)),
      ("york city", 2L, pmi(2, 5, 4)),
      ("york new", 2L, pmi(2, 5, 4))).sortBy(x => (-x._3, x._1))
    assert(got.toSeq == expected)
  }

  test("gram novelty attributes first-seen grams by minimum doc id") {
    val docs = Seq((1L, "a b c"), (2L, "a b d"), (3L, "c d a b"), (4L, "x"))
      .toDF("doc_id", "text")
    val got = graft.functions.Text.gramNovelty(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    // d1 {a b, b c} both first; d2 {a b, b d} one first; d3 {c d, d a, a b} two first
    assert(got == Map(
      1L -> ((2L, 2L, 1.0)),
      2L -> ((2L, 1L, 0.5)),
      3L -> ((3L, 2L, 0.666667))))
    // single-token doc 4 has no grams and no row
    assert(!got.contains(4L))
  }

  test("keyness G2 matches the hand-computed Dunning statistic") {
    val docs = Seq((1L, "A", "cat cat cat cat cat dog"),
      (2L, "B", "dog dog dog dog dog bird"))
      .toDF("doc_id", "grp", "text").repartition(3)
    val got = graft.functions.Text.keynessTopTerms(docs, "grp", "text",
        topK = 5, minCount = 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3), r.getLong(4))).toSet
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // A: cat a=5 b=0 n1=6 N=12 ct=5 → 2·5·round(ln(2),6)
    val kCat = BigDecimal(2) * (BigDecimal(5) * BigDecimal(r6(math.log(2.0))))
    // B: dog a=5 b=1 n1=6 n2=6 ct=6
    val kDog = BigDecimal(2) * (
      BigDecimal(5) * BigDecimal(r6(math.log(5.0 * 12 / (6.0 * 6)))) +
        BigDecimal(1) * BigDecimal(r6(math.log(1.0 * 12 / (6.0 * 6)))))
    assert(got == Set(("A", "cat", 5L, kCat.toDouble, 1L),
      ("B", "dog", 5L, kDog.toDouble, 1L)))
  }

  test("zipf fit recovers the closed-form least squares on known counts") {
    val words = Seq.fill(8)("a") ++ Seq.fill(4)("b") ++ Seq.fill(2)("c") ++ Seq("d")
    val docs = Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
    val r = graft.functions.Text.zipfFit(docs, "text", topRanks = 100).head()
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val pts = Seq((1, 8), (2, 4), (3, 2), (4, 1))
      .map { case (rk, c) => (BigDecimal(r6(math.log(rk))), BigDecimal(r6(math.log(c)))) }
    val n = BigDecimal(pts.size)
    val sx = pts.map(_._1).sum; val sy = pts.map(_._2).sum
    val sxx = pts.map(p => p._1 * p._1).sum; val sxy = pts.map(p => p._1 * p._2).sum
    val slope = r6(((n * sxy - sx * sy) / (n * sxx - sx * sx)).toDouble)
    val slopeD = (n.toDouble * sxy.toDouble - sx.toDouble * sy.toDouble) /
      (n.toDouble * sxx.toDouble - sx.toDouble * sx.toDouble)
    val intercept = r6((sy.toDouble - r6(slopeD) * sx.toDouble) / n.toDouble)
    assert(r.getLong(0) == 4L)
    assert(math.abs(r.getDouble(1) - slope) < 2e-6, s"slope ${r.getDouble(1)} vs $slope")
    assert(math.abs(r.getDouble(2) - intercept) < 2e-6)
    // powers of two: slope must be exactly -ln(2)/mean-ish negative ≈ -1.5
    assert(r.getDouble(1) < -1.0 && r.getDouble(1) > -2.0)
  }

  test("templatePrefix: LCP(min,max) equals the brute-force group LCP on a " +
    "randomized corpus; planted headers recovered exactly") {
    val rnd = new scala.util.Random(23)
    val words = (0 until 12).map(i => s"w$i")
    val rows = (0L until 120L).flatMap { i =>
      val g = s"g${i % 4}"
      val hdr = if (i % 4 <= 1) s"hdr $g begin " else ""
      val body = (0 until 3 + rnd.nextInt(6))
        .map(_ => words(rnd.nextInt(words.size))).mkString(" ")
      Seq((i, g, hdr + body))
    } :+ ((999L, "solo", "only one document here"))
    val df = rows.toDF("id", "grp", "text")
    val got = graft.functions.Text.templatePrefix(df.repartition(7), "grp", "text")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap

    def lcp(a: Seq[String], b: Seq[String]): Seq[String] =
      a.zip(b).takeWhile { case (x, y) => x == y }.map(_._1)
    val want = rows.groupBy(_._2).map { case (g, rs) =>
      val toks = rs.map(_._3.split("\\s+").toSeq)
      val p = toks.reduce(lcp)
      g -> (rs.size.toLong, p.size.toLong, p.mkString(" "))
    }
    assert(got == want, s"got=$got\nwant=$want")
    // planted groups recovered their stamped 3-token headers
    assert(got("g0")._3.startsWith("hdr g0 begin") || got("g0")._2 >= 3L)
    // the solo group's template is its whole document
    assert(got("solo") == (1L, 4L, "only one document here"))
  }

  test("concordance: clamped contexts at doc edges, one row per " +
    "occurrence, absent terms produce nothing") {
    val df = Seq(
      (1L, "table at the start and table near the very end table"),
      (2L, "no hits here at all")).toDF("doc_id", "text")
    val got = graft.functions.Text.concordance(df, "doc_id", "text",
        "table", window = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getString(2), r.getString(3))).toSet
    assert(got == Set(
      (1L, 0L, "", "at the start"),
      (1L, 5L, "the start and", "near the very"),
      (1L, 10L, "the very end", "")),
      got.toString)
  }

  test("crossGramNovelty: hand-computed seen/novel fractions, " +
    "all-novel and all-seen docs") {
    val refd = Seq((100L, "a b c d e f")).toDF("doc_id", "text")
    val newd = Seq(
      (1L, "a b c d e f"),          // every 3-gram seen -> novelty 0
      (2L, "x y z w v u"),          // nothing seen -> novelty 1
      (3L, "a b c d q r s")).toDF("doc_id", "text") // 2 of 5 seen
    val got = graft.functions.Decontamination.crossGramNovelty(
        newd, refd, "doc_id", "text", n = 3)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(got(1L) == (4L, 0L, 0.0))
    assert(got(2L) == (4L, 4L, 1.0))
    assert(got(3L) == (5L, 3L, 0.6))
  }
}
