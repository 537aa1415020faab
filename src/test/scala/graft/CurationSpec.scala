package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Curation

/** The end-to-end curation pipeline on a planted corpus: every stage must
  * remove exactly the rows planted for it. */
class CurationSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("curate removes exact dups, near dups, contamination, and low quality") {
    val fluent = "the cat sat on the mat and the dog slept near the door all day"
    val docs = Seq(
      (1L, fluent + " while birds sang in the garden trees outside"),
      (2L, "The cat sat on the mat, and the dog slept near the door all day " +
        "while birds sang in the garden trees outside"), // exact dup of 1 modulo case/punct
      (3L, fluent + " while birds sang in the garden trees nearby"), // near dup of 1
      (4L, "the quick brown fox jumps over the lazy dog again and again " +
        "in the quiet morning light of the farm"), // contaminated vs benchmark
      (5L, "zz qq xx 123 456 789 000 111 222 333"), // low quality (no stopwords)
      (6L, "a completely fluent and original document that the pipeline " +
        "should keep because it is the only copy and it is clean")
    ).toDF("doc_id", "text")
    val benchmark = Seq(
      (100L, "the quick brown fox jumps over the lazy dog")).toDF("doc_id", "text")

    val (out, report) = Curation.curate(docs, benchmark, "doc_id", "text",
      nearDupThreshold = 0.6, decontamN = 6, minQuality = 0.3)

    assert(report.nInput == 6)
    assert(report.nAfterExact == 5)    // doc 2 dropped (normalized-exact dup)
    assert(report.nAfterNearDup == 4)  // doc 3 dropped (near dup)
    assert(report.nAfterDecontam == 3) // doc 4 dropped (benchmark 6-gram)
    assert(report.nAfterQuality == 2)  // doc 5 dropped (quality floor)
    val kept = out.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 6L))
    assert(report.splitCounts.values.sum == 2)
    // the split column is one of the three values
    val splits = out.select("split").collect().map(_.getString(0)).toSet
    assert(splits.subsetOf(Set("train", "validation", "test")))
  }

  test("curate frees every internal barrier when a stage fails") {
    // The benchmark table lacks the text column: decontamination (stage 3)
    // raises AnalysisException AFTER the exact-dedup survivors and the
    // near-dup loser ids have been persisted. The EAGER cache contract must
    // hold on the error path too — no internal barrier may outlive the call.
    val docs = Seq(
      (1L, "the cat sat on the mat and the dog slept near the door all day"),
      (2L, "a completely fluent and original document that the pipeline " +
        "should keep because it is the only copy and it is clean")
    ).toDF("doc_id", "text")
    val badBenchmark = Seq((100L, "x")).toDF("doc_id", "wrong_col")
    spark.sharedState.cacheManager.clearCache()
    val before = spark.sparkContext.getPersistentRDDs.keySet
    intercept[org.apache.spark.sql.AnalysisException] {
      Curation.curate(docs, badBenchmark, "doc_id", "text")
    }
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty,
      s"curate leaked persisted barriers on failure: $leaked")
  }

  test("curate with a reliable checkpointDir produces the same result") {
    // Same planted corpus; checkpointDir routes connectedComponents through
    // RELIABLE checkpoints (stable storage — survives executor loss on a
    // cluster) instead of localCheckpoint. Results must be identical, the
    // dir must be adopted by the context, and checkpoint files written
    // there must not leak as persisted RDDs afterwards.
    val fluent = "the cat sat on the mat and the dog slept near the door all day"
    val docs = Seq(
      (1L, fluent + " while birds sang in the garden trees outside"),
      (3L, fluent + " while birds sang in the garden trees nearby"), // near dup of 1
      (6L, "a completely fluent and original document that the pipeline " +
        "should keep because it is the only copy and it is clean")
    ).toDF("doc_id", "text")
    val benchmark = Seq(
      (100L, "the quick brown fox jumps over the lazy dog")).toDF("doc_id", "text")
    val cpDir = java.nio.file.Files.createTempDirectory("graft_cp").toString
    val before = spark.sparkContext.getPersistentRDDs.keySet
    try {
      val (out, report) = Curation.curate(docs, benchmark, "doc_id", "text",
        nearDupThreshold = 0.6, decontamN = 6, minQuality = 0.3,
        checkpointDir = Some(cpDir))
      assert(spark.sparkContext.getCheckpointDir.exists(_.contains(
        new java.io.File(cpDir).getName)))
      assert(report.nInput == 3 && report.nAfterNearDup == 2)
      assert(out.select("doc_id").collect().map(_.getLong(0)).toSet == Set(1L, 6L))
      // EAGER cache contract: only the result frame is live; one unpersist
      // returns the session to its starting cache state
      out.unpersist(blocking = true)
      val after = spark.sparkContext.getPersistentRDDs.keySet
      assert((after -- before).isEmpty,
        s"leaked persisted RDDs: ${(after -- before)}")
    } finally {
      spark.sparkContext.setCheckpointDir(null) // restore default for other suites
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(cpDir))
    }
  }

  test("regexRedact: counts per original text, ordered scrub, no-match " +
    "rows unchanged, replacements not re-matched") {
    import org.apache.spark.sql.functions.col
    val rules = Seq(
      ("email", "[a-z0-9._]+@[a-z0-9.]+\\.[a-z]{2,}", "[EMAIL]"),
      ("ip", "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "[IP]"))
    val docs = Seq(
      (1L, "mail a.b@x.org and c@y.co from 10.0.0.1 and 192.168.1.255"),
      (2L, "no pii here at all"),
      (3L, "edge 999.999.999.999 still matches the class pattern"),
      (4L, "a@b.com a@b.com")).toDF("doc_id", "text")
    val got = graft.functions.Text.regexRedact(docs, "doc_id", "text", rules)
      .orderBy(col("doc_id")).collect()
    assert(got(0).getLong(1) == 2 && got(0).getLong(2) == 2)
    assert(got(0).getString(3) ==
      "mail [EMAIL] and [EMAIL] from [IP] and [IP]")
    assert(got(1).getLong(1) == 0 && got(1).getLong(2) == 0)
    assert(got(1).getString(3) == "no pii here at all")
    assert(got(2).getLong(2) == 1, "class pattern is syntactic, not semantic")
    assert(got(3).getLong(1) == 2)
    assert(got(3).getString(3) == "[EMAIL] [EMAIL]")
    intercept[IllegalArgumentException] {
      graft.functions.Text.regexRedact(docs, "doc_id", "text", Nil)
    }
    intercept[IllegalArgumentException] {
      graft.functions.Text.regexRedact(docs, "doc_id", "text",
        Seq(("a", "x", "y"), ("a", "z", "w")))
    }
  }
}
