package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver-contract surface: every declared query runs on sf0.001 and
  * returns rows; every oracle key corresponds to a query; entry() smokes.
  */
class QueriesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sfDir = "/root/testdata/sf0.001"

  test("entry() returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("no duplicate query keys anywhere (a duplicate silently shadows " +
    "an existing query — r6 nearly lost q_funnel this way)") {
    // Map literals collapse duplicates before runtime, so scan the SOURCE:
    // each key may appear at most twice per file (query + oracle) and at
    // most once across files for the queries map.
    import scala.jdk.CollectionConverters._
    val dir = java.nio.file.Paths.get("src/main/scala/graft/queries")
    val keyRe = """"(q[a-z0-9_]+)"\s*->""".r
    val counts = java.nio.file.Files.list(dir).iterator().asScala
      .filter(_.toString.endsWith(".scala"))
      .flatMap(p => keyRe.findAllMatchIn(
        java.nio.file.Files.readString(p)).map(_.group(1)))
      .toSeq.groupBy(identity).view.mapValues(_.size)
    val dups = counts.filter(_._2 > 2).toMap
    assert(dups.isEmpty, s"keys declared more than query+oracle: $dups")
    // cross-check: merged map sizes equal the source-level key count
    assert(SparkEntry.queries.size == counts.size,
      s"merged queries=${SparkEntry.queries.size} vs source keys=${counts.size}")
  }

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"$name runs on sf0.001 and returns rows") {
      val df = fn(spark, sfDir)
      assert(df.count() > 0, s"$name returned no rows")
    }
  }
}
