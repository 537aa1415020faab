package graft

import org.scalatest.funsuite.AnyFunSuite

class ExtensionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("graft_* functions usable from spark.sql after registration") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT graft_cosine(array(1.0F, 0.0F), array(1.0F, 0.0F)) AS c,
        |       graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d,
        |       size(graft_minhash(array(1L, 2L, 3L), 16, 42)) AS k
        |""".stripMargin).head()
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    assert(r.getDouble(1) == 11.0)
    assert(r.getInt(2) == 16)
  }

  test("round-2 graft_* functions: simhash/jaccard/agreement/bpeish/ngrams from SQL") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT graft_simhash(array('a', 'b'), 42) AS sh,
        |       graft_jaccard(array('a', 'b', 'c'), array('b', 'c', 'd')) AS j,
        |       graft_sig_agreement(array(1L, 2L, 3L), array(1L, 9L, 3L)) AS agree,
        |       graft_bpeish_count(array('short', 'a', 'sevenchars')) AS bpe,
        |       size(graft_ngram_hashes(array('a', 'b', 'c'), 2, 42)) AS ng,
        |       size(graft_minhash_tokens(array('a', 'b', 'c'), 2, 8, 42)) AS mh
        |""".stripMargin).head()
    assert(r.getLong(0) != 0L)
    assert(r.getDouble(1) == 0.5)
    assert(r.getInt(2) == 2)
    assert(r.getLong(3) == 2 + 1 + 3) // ceil(5/4)+ceil(1/4)+ceil(10/4)
    assert(r.getInt(4) == 2)
    assert(r.getInt(5) == 8)
  }

  test("extensions class wires into a fresh session builder") {
    // verify the SparkSessionExtensions path compiles/applies (shares the
    // local metastore, so reuse the active session's context)
    val ext = new GraftExtensions()
    val dummy = new org.apache.spark.sql.SparkSessionExtensions
    ext.apply(dummy) // must not throw; registration list is well-formed
  }

  test("round-3 graft_* functions: winnow and band hashes from SQL") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT size(graft_winnow(array(9L, 1L, 8L, 1L, 7L, 2L), 3)) AS wn,
        |       size(graft_band_hashes(graft_minhash_tokens(array('a','b','c'), 2, 8, 42), 4, 2)) AS bh,
        |       graft_winnow_positions(array(9L, 1L, 8L, 1L, 7L, 2L), 3) AS wp
        |""".stripMargin).head()
    assert(r.getInt(0) >= 1 && r.getInt(0) <= 4) // ~2/(w+1) of 6 kept
    assert(r.getInt(1) == 4)
    // positions name the same selection as the hash variant: rightmost min
    // of window 1 is the 1 at index 3
    assert(r.getSeq[Int](2).contains(3))
    // the band guard surfaces through SQL too
    val ex = intercept[Exception] {
      spark.sql("SELECT graft_band_hashes(array(1L, 2L), 3, 2)").collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ msgs(e.getCause))
    assert(msgs(ex).exists(_.contains("band_hashes")), ex.toString)
  }

  test("graft_pattern_hits from SQL: matched indices, literal-only patterns") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT graft_pattern_hits('the scanner sparked', " +
        "'scan', 'can', 'spark', 'park', 'zzz')").collect().head
    assert(r.getSeq[Int](0) == Seq(0, 1, 2, 3))
    val ex = intercept[Exception] {
      spark.sql("SELECT graft_pattern_hits('a', length('x'))").collect()
    }
    assert(ex.getMessage.contains("string literal"), ex.toString)
  }
}
