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

  test("extensions class wires into a fresh session builder") {
    // verify the SparkSessionExtensions path compiles/applies (shares the
    // local metastore, so reuse the active session's context)
    val ext = new GraftExtensions()
    val dummy = new org.apache.spark.sql.SparkSessionExtensions
    ext.apply(dummy) // must not throw; registration list is well-formed
  }
}
