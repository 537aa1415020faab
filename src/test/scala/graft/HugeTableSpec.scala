package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.io.CsvReader

/** The distributed single-huge-file ingest path (SURVEY §7.4): block index
  * found by a distributed scan, payload parsed with vectorized casts, the
  * driver never holds table data. */
class HugeTableSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("readHugeTable parses one table out of a multi-table file distributively") {
    val dir = Files.createTempDirectory("graft_huge")
    val p = dir.resolve("big.csv")
    val sb = new StringBuilder
    sb.append("**small\nall\nx\n-\n1\n\n")
    sb.append("**big_table\nall\nid;name;qty;when;flag\n-;text;kg;datetime;onoff\n")
    (0 until 5000).foreach { i =>
      sb.append(s"$i;row_$i;${i % 97}.5;2024-01-0${i % 9 + 1} 0${i % 9}:00:00;${i % 2}\n")
    }
    sb.append("\n**after\nall\ny\n-\n2\n")
    Files.writeString(p, sb.toString)

    val t = CsvReader.readHugeTable(spark, p.toString, "big_table").get
    assert(t.name == "big_table")
    assert(t.columnNames == Seq("id", "name", "qty", "when", "flag"))
    assert(t.units == Seq("-", "text", "kg", "datetime", "onoff"))
    assert(t.df.count() == 5000)
    // typed columns, correct values
    val r = t.df.filter(org.apache.spark.sql.functions.col("id") === 42.0).head()
    assert(r.getString(1) == "row_42")
    assert(r.getDouble(2) == 42.5)
    assert(r.getBoolean(4) == false)

    // the driver-parsed bundle agrees with the distributed parse
    val viaDriver = CsvReader.readBundle(spark, p).unique("big_table")
    assert(viaDriver.equalsTable(
      t.copy(meta = t.meta.copy(origin = viaDriver.meta.origin))))

    // unmatched name → None
    assert(CsvReader.readHugeTable(spark, p.toString, "nope").isEmpty)
  }
}
