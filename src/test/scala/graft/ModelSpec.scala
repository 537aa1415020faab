package graft

import scala.math.BigDecimal.RoundingMode

import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{NaiveBayes, Similarity, Text, UnigramLm}

/** Naive Bayes classification and Kneser-Ney scoring vs sequential
  * references implementing the same arithmetic. */
class ModelSpec extends AnyFunSuite with BeforeAndAfterAll {
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

  private def rnd(x: Double, s: Int): BigDecimal =
    BigDecimal(x).setScale(s, RoundingMode.HALF_UP)

  // ---------------------------------------------------------------- NB ---

  /** Sequential multinomial NB with add-one smoothing, mirroring
    * NaiveBayes.trainAndPredict's rounding scheme operation for
    * operation. Returns id -> (pred, score rounded to 4). */
  private def nbRef(docs: Seq[(Long, String, String)]): Map[Long, (String, Double)] = {
    val toks = docs.map { case (id, lab, t) => (id, lab, t.trim.split("\\s+").toSeq) }
    val cnt = toks.flatMap { case (_, lab, ts) => ts.map(lab -> _) }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val nc = cnt.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val vocab = cnt.keys.map(_._2).toSet.size
    val nd = docs.groupBy(_._2).view.mapValues(_.size).toMap
    val labels = nd.keys.toSeq.sorted
    val td = docs.size
    toks.map { case (id, _, ts) =>
      val scores = labels.map { lab =>
        val prior = rnd(math.log(nd(lab).toDouble / td.toDouble), 6)
        val s = ts.map { t =>
          rnd(math.log((cnt.getOrElse((lab, t), 0L) + 1L).toDouble /
            (nc(lab) + vocab).toDouble), 6)
        }.sum + prior
        (lab, s)
      }
      // argmax: max(struct(score, label)) — best score, ties to the higher
      // label; final rounding happens in DOUBLE, as the operator's
      // round(cast(double), 4) does
      val best = scores.maxBy { case (lab, s) => (s, lab) }
      id -> (best._1, rnd(best._2.toDouble, 4).toDouble)
    }.toMap
  }

  private val nbCorpus = Seq(
    (1L, "en", "the cat sat on the mat"),
    (2L, "en", "the dog sat on the log"),
    (3L, "de", "die katze sass auf der matte"),
    (4L, "de", "der hund sass auf dem baum"),
    (5L, "en", "the cat and the dog"),
    (6L, "de", "die katze und der hund"))

  test("naive bayes matches the sequential reference (pred + score)") {
    val df = nbCorpus.toDF("id", "lang", "text").repartition(5)
    val out = NaiveBayes.trainAndPredict(df, "id", "text", "lang")
    val got = out.collect()
      .map(r => r.getLong(0) -> (r.getString(2), r.getDouble(3))).toMap
    out.unpersist()
    assert(got == nbRef(nbCorpus))
  }

  test("naive bayes self-classification recovers every training label here") {
    val df = nbCorpus.toDF("id", "lang", "text")
    val out = NaiveBayes.trainAndPredict(df, "id", "text", "lang")
    val ok = out.collect().map(r => r.getLong(0) -> r.getBoolean(4)).toMap
    out.unpersist()
    assert(ok.values.forall(identity), s"misclassified: $ok")
  }

  test("naive bayes is partitioning-independent") {
    val a = NaiveBayes.trainAndPredict(
      nbCorpus.toDF("id", "lang", "text").repartition(1), "id", "text", "lang")
    val b = NaiveBayes.trainAndPredict(
      nbCorpus.toDF("id", "lang", "text").repartition(13), "id", "text", "lang")
    val ra = a.collect().map(_.toSeq).toSet
    val rb = b.collect().map(_.toSeq).toSet
    a.unpersist(); b.unpersist()
    assert(ra == rb)
  }

  // ---------------------------------------------------------------- KN ---

  /** Sequential interpolated Kneser-Ney bigram scorer over a training
    * corpus, same discount/rounding chain as UnigramLm.scoreKneserNey. */
  private def knRef(score: Seq[(Long, String)], train: Seq[String],
                    d: Double = 0.75, oov: Double = 0.5): Map[Long, (Long, Double)] = {
    def bgs(t: String): Seq[(String, String)] = {
      val ts = t.trim.split("\\s+").toSeq
      if (ts.size < 2) Seq.empty else ts.zip(ts.tail)
    }
    val bc = train.flatMap(bgs).groupBy(identity).view.mapValues(_.size.toLong).toMap
    val c1 = bc.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val n1f = bc.groupBy(_._1._1).view.mapValues(_.size.toLong).toMap
    val ncont = bc.groupBy(_._1._2).view.mapValues(_.size.toLong).toMap
    val tt = bc.size.toDouble
    score.flatMap { case (id, t) =>
      val bs = bgs(t)
      if (bs.isEmpty) None else {
        val lps = bs.map { case (w1, w2) =>
          val pc = ncont.get(w2).map(_.toDouble).getOrElse(oov) / tt
          val p = c1.get(w1) match {
            case Some(c) =>
              (math.max(bc.getOrElse((w1, w2), 0L).toDouble - d, 0.0) +
                d * n1f(w1).toDouble * pc) / c.toDouble
            case None => pc
          }
          rnd(math.log(p), 6)
        }
        // final division + rounding in DOUBLE, as the operator does
        Some(id -> (bs.size.toLong, rnd(-lps.sum.toDouble / bs.size, 4).toDouble))
      }
    }.toMap
  }

  private val knCorpus = Seq(
    (1L, "a b a c a b"),
    (2L, "b a c a"),
    (3L, "c c a b a"),
    (4L, "a"), // no bigrams — absent from output
    (5L, "b a b a c"))

  test("kneser-ney self-scoring matches the sequential reference") {
    val df = knCorpus.toDF("id", "text").repartition(3)
    val out = UnigramLm.scoreKneserNey(df, df, "id", "text")
    val got = out.collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    out.unpersist()
    val want = knRef(knCorpus, knCorpus.map(_._2))
    assert(!got.contains(4L))
    assert(got == want)
  }

  test("kneser-ney cross-corpus scoring covers every fallback branch") {
    val train = Seq((10L, "a b a c"))
    val probe = Seq((1L, "a b z q b")) // seen pair / unseen pair-seen ctx /
                                       // unseen ctx / unseen continuation
    val out = UnigramLm.scoreKneserNey(
      probe.toDF("id", "text"), train.toDF("id", "text"), "id", "text")
    val got = out.collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    out.unpersist()
    assert(got == knRef(probe, train.map(_._2)))
  }

  // ------------------------------------------------------- cooccurrence ---

  /** Sequential reference: directed pairs within `w` tokens, weight
    * 1000000/d in integer arithmetic. */
  private def coocRef(texts: Seq[String], w: Int): Map[(String, String), (Long, Long)] = {
    val acc = scala.collection.mutable.Map.empty[(String, String), (Long, Long)]
    for (t <- texts) {
      val ts = t.trim.split("\\s+")
      for (i <- ts.indices; d <- 1 to w; if i + d < ts.length) {
        val k = (ts(i), ts(i + d))
        val (s, n) = acc.getOrElse(k, (0L, 0L))
        acc(k) = (s + 1000000L / d, n + 1)
      }
    }
    acc.toMap
  }

  test("cooccurrence matches the sequential reference incl. 1/d weights") {
    val texts = Seq("a b c a b", "b a a b", "c", "a b c d e a")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text").repartition(3)
    val k = 1000 // everything
    val got = Text.cooccurrenceTopK(df, "text", window = 3, topK = k)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    assert(got == coocRef(texts, 3))
  }

  test("cooccurrence ranking is a total order (wsum desc, w1, w2)") {
    val df = Seq((1L, "x y x y x")).toDF("id", "text")
    val rows = Text.cooccurrenceTopK(df, "text", window = 2, topK = 10)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(4)))
    val sorted = rows.sortBy { case (w1, w2, ws, _) => (-ws, w1, w2) }
    assert(rows.toSeq == sorted.toSeq)
    assert(rows.map(_._4).toSeq == (1L to rows.length).toSeq)
  }

  // --------------------------------------------------------------- kNN ---

  test("knnWithinGroups matches the brute-force quantized reference") {
    val rng = new scala.util.Random(7)
    val rows = (0L until 60L).map { i =>
      (i, (i % 2).toString, Array.fill(8)(rng.nextFloat() * 2 - 1))
    }
    val df = rows.toDF("vec_id", "grp", "embedding").repartition(5)
    val got = Similarity.knnWithinGroups(df, "grp", "embedding", "vec_id", k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(3)) -> r.getLong(1)).toMap

    def quant(v: Array[Float]): Array[Double] = {
      val s = v.map(x => math.abs(x.toDouble)).max
      v.map(x => if (s > 0) math.floor(x.toDouble / s * 127 + 0.5) else 0.0)
    }
    val codes = rows.map { case (id, g, v) => (id, g, quant(v)) }
    val want = codes.flatMap { case (id, g, c) =>
      val n2 = c.map(x => x * x).sum
      val nbrs = codes.filter(o => o._2 == g && o._1 != id).map { o =>
        val dot = c.zip(o._3).map { case (x, y) => x * y }.sum
        val den = math.sqrt(n2) * math.sqrt(o._3.map(x => x * x).sum)
        val cos = if (den > 0)
          BigDecimal(dot / den).setScale(6, RoundingMode.HALF_UP).toDouble
        else 0.0
        (o._1, cos)
      }.sortBy { case (nid, cos) => (-cos, nid) }.take(2)
      nbrs.zipWithIndex.map { case ((nid, _), r) => (id, r + 1L) -> nid }
    }.toMap
    assert(got == want)
  }

  test("mutualNearestNeighbors keeps only symmetric top-1 pairs (hubs drop)") {
    // 2D geometry: (0,1) tight pair; 2 is closest to 1 but 1's top-1 is 0
    // -> (1,2) not mutual; (3,4) mutual pair on another axis
    val rows = Seq(
      (0L, Array(1.00f, 0.00f, 0f, 0f)),
      (1L, Array(0.99f, 0.14f, 0f, 0f)),
      (2L, Array(0.80f, 0.60f, 0f, 0f)),
      (3L, Array(0.00f, 0.00f, 1.00f, 0.05f)),
      (4L, Array(0.00f, 0.00f, 0.98f, 0.20f)))
      .map { case (id, v) => (id, "g", v) }
    val df = rows.toDF("vec_id", "grp", "embedding").repartition(3)
    val got = Similarity.mutualNearestNeighbors(df, "grp", "embedding",
      "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((0L, 1L), (3L, 4L)))
  }

  test("hardPairs on an EMPTY corpus returns empty (guard must not NPE " +
    "on max(n) = NULL)") {
    val empty = Seq.empty[(Long, Long, String, Array[Float])]
      .toDF("vec_id", "blk", "lab", "embedding")
    assert(Similarity.hardPairs(empty, "blk", "lab", "embedding", "vec_id")
      .count() == 0L)
  }

  test("hardPairs mines the brute-force hardest negative and positive, " +
    "drops anchors without both, partitioning-independent") {
    val rng = new scala.util.Random(11)
    val rows = (0L until 60L).map { i =>
      (i, i % 3, (i % 2).toString, Array.fill(8)(rng.nextFloat() * 2 - 1))
    }
    val df = rows.toDF("vec_id", "blk", "lab", "embedding").repartition(5)
    val got = Similarity.hardPairs(df, "blk", "lab", "embedding", "vec_id")
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getDouble(3),
        r.getLong(4), r.getDouble(5))).toMap

    def quant(v: Array[Float]): Array[Double] = {
      val s = v.map(x => math.abs(x.toDouble)).max
      v.map(x => if (s > 0) math.floor(x.toDouble / s * 127 + 0.5) else 0.0)
    }
    val codes = rows.map { case (id, b, l, v) => (id, b, l, quant(v)) }
    def cosOf(c: Array[Double], o: Array[Double]): Double = {
      val den = math.sqrt(c.map(x => x * x).sum) *
        math.sqrt(o.map(x => x * x).sum)
      if (den > 0)
        BigDecimal(c.zip(o).map { case (x, y) => x * y }.sum / den)
          .setScale(6, RoundingMode.HALF_UP).toDouble
      else 0.0
    }
    val want = codes.flatMap { case (id, b, l, c) =>
      val others = codes.filter(o => o._2 == b && o._1 != id)
      val negs = others.filter(_._3 != l)
        .map(o => (cosOf(c, o._4), o._1)).sorted.reverse // max cos, max id
      val poss = others.filter(_._3 == l)
        .map(o => (cosOf(c, o._4), o._1)).sorted // min cos, min id
      if (negs.isEmpty || poss.isEmpty) None
      else Some(id -> (negs.head._2, negs.head._1, poss.head._2, poss.head._1))
    }.toMap
    assert(got == want)

    val again = Similarity.hardPairs(
      rows.toDF("vec_id", "blk", "lab", "embedding").repartition(13),
      "blk", "lab", "embedding", "vec_id")
      .collect().map(_.getLong(0)).toSet
    assert(again == got.keySet)

    // single-label population: every anchor lacks a negative -> empty
    val mono = rows.map { case (id, b, _, v) => (id, b, "same", v) }
      .toDF("vec_id", "blk", "lab", "embedding")
    assert(Similarity.hardPairs(mono, "blk", "lab", "embedding",
      "vec_id").count() == 0)
  }

  test("knnWithinGroups refuses oversized blocks loudly") {
    val df = (0L until 30L).map(i => (i, "one", Array.fill(4)(1.0f)))
      .toDF("vec_id", "grp", "embedding")
    val e = intercept[IllegalArgumentException] {
      Similarity.knnWithinGroups(df, "grp", "embedding", "vec_id", k = 1,
        maxGroupSize = 10)
    }
    assert(e.getMessage.contains("maxGroupSize"))
  }

  // -------------------------------------------------------------- pHash ---

  test("pHash stub is locality-preserving under in-place edits") {
    import org.apache.spark.unsafe.types.UTF8String
    def ph(t: String): Long = graft.functions.expressions.TextExprUtil
      .pHashStub(UTF8String.fromString(t), 15)
    def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    val base = "abcdefghij" * 30 // 300 chars
    // same length, last 10 chars overwritten → only the covering slices
    // (≤ 2 of 15) can change → ≤ 8 bits
    val edited = base.substring(0, 290) + ("z" * 10)
    assert(ham(ph(base), ph(edited)) > 0)
    assert(ham(ph(base), ph(edited)) <= 8)
    // a single mid-string in-place edit: ≤ 1 slice → ≤ 4 bits
    val mid = base.substring(0, 150) + "Q" + base.substring(151)
    assert(ham(ph(base), ph(mid)) <= 4)
    assert(ph("") == 0L)
  }

  test("kneser-ney is partitioning-independent") {
    val df1 = knCorpus.toDF("id", "text").repartition(1)
    val df2 = knCorpus.toDF("id", "text").repartition(11)
    val a = UnigramLm.scoreKneserNey(df1, df1, "id", "text")
    val b = UnigramLm.scoreKneserNey(df2, df2, "id", "text")
    val ra = a.collect().map(_.toSeq).toSet
    val rb = b.collect().map(_.toSeq).toSet
    a.unpersist(); b.unpersist()
    assert(ra == rb)
  }
}
