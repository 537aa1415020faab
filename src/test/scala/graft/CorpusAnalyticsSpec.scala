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
}
