package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.io.CsvReader

class ParquetMetaSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("parquet round trip preserves units and table metadata") {
    val t = CsvReader.readBundleFromString(spark,
      """**places
        |dst_a dst_b
        |place;distance;ETA;is_hot
        |text;km;datetime;onoff
        |home;0;2020-08-04 08:00;1
        |wonderland;-;-;0
        |""".stripMargin).unique("places")
    val dir = java.nio.file.Files.createTempDirectory("graft_pq").toString + "/places"
    graft.model.StarTable.writeParquet(t, dir)
    val back = graft.model.StarTable.readParquet(spark, dir)
    assert(back.name == "places")
    assert(back.destinations == Set("dst_a", "dst_b"))
    assert(back.units == Seq("text", "km", "datetime", "onoff"))
    assert(t.equalsTable(back.copy(meta = back.meta.copy(destinations = t.destinations)))
      || t.df.exceptAll(back.df).isEmpty)
  }

  test("orc round trip preserves units (sidecar) and pushes filters down") {
    val t = CsvReader.readBundleFromString(spark,
      """**places
        |dst_a dst_b
        |place;distance;ETA;is_hot
        |text;km;datetime;onoff
        |home;0;2020-08-04 08:00;1
        |wonderland;-;-;0
        |""".stripMargin).unique("places")
    val dir = java.nio.file.Files.createTempDirectory("graft_orc").toString + "/places"
    graft.model.StarTable.writeOrc(t, dir)
    val back = graft.model.StarTable.readOrc(spark, dir)
    assert(back.name == "places")
    assert(back.destinations == Set("dst_a", "dst_b"))
    assert(back.units == Seq("text", "km", "datetime", "onoff"))
    assert(t.df.exceptAll(back.df).isEmpty && back.df.exceptAll(t.df).isEmpty)
    // native ORC scan: predicate pushdown must reach the reader
    val plan = back.df.filter(org.apache.spark.sql.functions.col("distance") > 100)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [") && plan.contains("distance"),
      s"orc pushdown missing:\n$plan")
  }

  test("bundle temp views make tables SQL-queryable") {
    val bundle = CsvReader.readBundleFromString(spark,
      "**sqlt\nall\na;b\n-;text\n1;x\n2;y\n")
    bundle.createTempViews()
    val n = spark.sql("SELECT count(*) FROM sqlt WHERE a > 1").head().getLong(0)
    assert(n == 1)
  }
}
