package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.functions.Text
import graft.functions.expressions.MultiPattern

/** Aho–Corasick multi-pattern kernel (expressions.MultiPattern) vs the
  * brute-force contains() reference. */
class MultiPatternSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ref(text: String, terms: Seq[String]): Seq[Int] =
    terms.zipWithIndex.collect { case (t, i) if text.contains(t) => i }

  private def run(texts: Seq[String], terms: Seq[String]): Seq[Seq[Int]] = {
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "t")
      .withColumn("hits", MultiPattern.hits(col("t"), terms))
    df.orderBy("id").collect()
      .map(_.getSeq[Int](2).toSeq).toSeq
  }

  test("matches brute-force contains on a randomized corpus with " +
    "overlapping and nested patterns") {
    val terms = Seq("ab", "bab", "abab", "bb", "a", "cabd", "dd")
    val rnd = new scala.util.Random(7)
    val texts = (0 until 300).map(_ =>
      (0 until rnd.nextInt(40)).map(_ => "abcd".charAt(rnd.nextInt(4))).mkString)
    assert(run(texts, terms) == texts.map(ref(_, terms)))
  }

  test("multi-byte UTF-8 patterns match exactly (self-synchronizing bytes)") {
    val terms = Seq("héllo", "héll", "日本語", "本", "é", "x😀y")
    val texts = Seq(
      "say héllo to the 日本語 corpus", "nothing here", "x😀y emoji bridge",
      "日 alone then 本 alone", "ééé", "")
    assert(run(texts, terms) == texts.map(ref(_, terms)))
  }

  test("null text yields null hits; empty text yields empty hits") {
    val df = Seq((1L, null.asInstanceOf[String]), (2L, ""))
      .toDF("id", "t")
      .withColumn("hits", MultiPattern.hits(col("t"), Seq("a")))
      .orderBy("id").collect()
    assert(df(0).isNullAt(2))
    assert(df(1).getSeq[Int](2).isEmpty)
  }

  test("interpreted eval agrees with the codegen path") {
    val terms = Seq("scan", "can", "spark", "park")
    val text = "the scanner sparked"
    val e = graft.functions.expressions.MultiPatternHits(
      org.apache.spark.sql.catalyst.expressions.Literal(
        org.apache.spark.unsafe.types.UTF8String.fromString(text),
        org.apache.spark.sql.types.StringType), terms)
    val interp = e.eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toIntArray().toSeq
    assert(interp == ref(text, terms))
    assert(run(Seq(text), terms).head == ref(text, terms))
  }

  test("blocklistScreen returns ordered csv terms, counts and flag") {
    val docs = Seq((1L, "order a spark scan"), (2L, "quiet text")).toDF("doc_id", "text")
    val got = Text.blocklistScreen(docs, "doc_id", "text",
      Seq("spark", "scan", "order", "zzz"))
      .orderBy("doc_id").collect()
    assert(got(0).getLong(1) == 3L)
    assert(got(0).getString(2) == "spark,scan,order")
    assert(got(0).getBoolean(3))
    assert(got(1).getLong(1) == 0L)
    assert(got(1).getString(2) == "")
    assert(!got(1).getBoolean(3))
  }

  test("CSR mode (forced via denseMaxStates=1) agrees with the dense DFA " +
    "on a randomized corpus") {
    val terms = Seq("ab", "bab", "abab", "bb", "a", "cabd", "dd", "héllo", "本")
    val dense = graft.functions.expressions.AcAutomaton.build(terms)
    val sparse = graft.functions.expressions.AcAutomaton.build(terms, 1)
    assert(dense.dense != null && sparse.dense == null)
    val rnd = new scala.util.Random(13)
    val texts = (0 until 300).map(_ =>
      (0 until rnd.nextInt(60)).map(_ => "abcdé本".charAt(rnd.nextInt(6))).mkString)
    texts.foreach { t =>
      val bytes = t.getBytes("UTF-8")
      var sd = 0; var ss = 0
      bytes.foreach { b =>
        sd = dense.step(sd, b & 0xFF)
        ss = sparse.step(ss, b & 0xFF)
        // states are built in the same trie order, so they must agree
        // exactly, not just on outputs
        assert(sd == ss, s"state divergence on '$t'")
      }
    }
  }

  test("exact state count: shared prefixes dedupe (no sum-of-lengths " +
    "over-allocation)") {
    // "abcde","abcdf","abcdg": 15 pattern bytes but only 8 trie states
    val ac = graft.functions.expressions.AcAutomaton.build(
      Seq("abcde", "abcdf", "abcdg"))
    assert(ac.dense.length == 8 * 256)
  }

  test("automaton refuses empty pattern lists and empty patterns") {
    intercept[IllegalArgumentException] {
      graft.functions.expressions.AcAutomaton.build(Nil)
    }
    intercept[IllegalArgumentException] {
      graft.functions.expressions.AcAutomaton.build(Seq("ok", ""))
    }
  }
}
