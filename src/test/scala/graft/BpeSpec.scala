package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Bpe

/** BPE merge training against the hand-run algorithm on the classic
  * Sennrich-style corpus (low/lower/newest/widest), end-of-word markers
  * included, ties broken (count desc, left asc, right asc). */
class BpeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val words =
    Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")

  test("trainMerges reproduces the hand-run merge sequence") {
    // three docs, arbitrary split of the word stream, skewed partitioning
    val docs = words.grouped(6).zipWithIndex
      .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }.toSeq
      .toDF("doc_id", "text").repartition(5)
    val got = Bpe.trainMerges(docs, "text", numMerges = 6)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSeq.sortBy(_._1)
    val expected = Seq(
      (1, "e", "s", "es", 9L),
      (2, "es", "t", "est", 9L),
      (3, "est", "</w>", "est</w>", 9L),
      (4, "l", "o", "lo", 7L),
      (5, "lo", "w", "low", 7L),
      (6, "e", "w", "ew", 6L))
    assert(got == expected)
  }

  test("trainMerges is partitioning-independent") {
    val docs1 = words.map((0L, _)).toDF("doc_id", "text").repartition(1)
    val docs2 = words.map((0L, _)).toDF("doc_id", "text").repartition(13)
    val Seq(a, b) = Seq(docs1, docs2).map(d =>
      Bpe.trainMerges(d, "text", 4).collect().map(_.toSeq).toSeq)
    assert(a == b)
  }

  test("applyMerges tokenizes greedily with the trained merges") {
    val merges = Seq(("e", "s"), ("es", "t"), ("est", "</w>"),
      ("l", "o"), ("lo", "w"), ("e", "w"))
    val got = Seq((1L, "lowest low")).toDF("doc_id", "text")
      .select(Bpe.applyMerges(col("text"), merges).as("toks"))
      .head().getSeq[String](0)
    assert(got == Seq("low", "est</w>", "low", "</w>"))
  }

  test("trainMerges leaves no persisted RDDs behind") {
    // Diff-based (the OperatorHygieneSpec pattern): suites share one
    // session, so global emptiness would flake on another suite's
    // leftover caches depending on execution order.
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val docs = words.map((0L, _)).toDF("doc_id", "text")
    Bpe.trainMerges(docs, "text", 2).collect()
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty, s"trainMerges leaked persisted RDDs $leaked")
  }
}
