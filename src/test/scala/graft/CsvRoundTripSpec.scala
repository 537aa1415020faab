package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.io.{CsvReader, CsvWriter}
import graft.model._
import graft.parse._

/** Ports of the reference's CSV write goldens and round-trip invariance
  * (reference: pdtable/test/io/test_csv.py, esp.
  * test__table_is_preserved_when_written_to_and_read_from_csv at :400).
  */
class CsvRoundTripSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** The four-type places table (reference: pdtable/test/conftest.py:29-52). */
  def placesCsv: String =
    """**foo
      |all
      |place;distance;ETA;is_hot
      |text;km;datetime;onoff
      |home;0;2020-08-04 08:00;1
      |work;1;2020-08-04 09:00;0
      |beach;2;2020-08-04 17:00;1
      |wonderland;-;-;0
      |""".stripMargin

  def places: StarTable = {
    val t = CsvReader.readString(placesCsv).collectFirst {
      case (BlockType.Table, p: ParsedTable) => p
    }.get
    StarTable.fromParsed(spark, t)
  }

  test("write golden: four-type table renders per StarTable standard") {
    val out = CsvWriter.tableToCsvString(places)
    val expected =
      """**foo;
        |all
        |place;distance;ETA;is_hot
        |text;km;datetime;onoff
        |home;0.0;2020-08-04 08:00:00;1
        |work;1.0;2020-08-04 09:00:00;0
        |beach;2.0;2020-08-04 17:00:00;1
        |wonderland;-;-;0
        |
        |""".stripMargin
    assert(out == expected)
  }

  test("round trip: table is preserved when written to and read from CSV") {
    val t = places
    val written = CsvWriter.tableToCsvString(t)
    val back = CsvReader.readBundleFromString(spark, written).unique("foo")
    assert(t.equalsTable(back))
  }

  test("round trip with custom separator (test_csv.py:321)") {
    val t = places
    val written = CsvWriter.tableToCsvString(t, sep = ",")
    val back = TableBundle.fromBlocks(spark,
      CsvReader.readString(written, sep = ",")).unique("foo")
    assert(t.equalsTable(back))
  }

  test("transposed table round trip (test_csv.py:349)") {
    val csv =
      """**transposed_table*;
        |all
        |col1;-;1;3
        |col2;-;2;4
        |""".stripMargin
    val t = CsvReader.readBundleFromString(spark, csv).unique("transposed_table")
    assert(t.meta.transposed)
    val written = CsvWriter.tableToCsvString(t)
    assert(written.startsWith("**transposed_table*;\n"))
    val back = CsvReader.readBundleFromString(spark, written).unique("transposed_table")
    assert(back.meta.transposed)
    assert(t.equalsTable(back))
  }

  test("display format specifier honored on write (test_csv.py:208)") {
    val t = places.withFormat("distance", ColumnFormat(3))
    val out = CsvWriter.tableToCsvString(t)
    assert(out.contains("home;0.000;"))
  }

  test("na_rep override") {
    val out = CsvWriter.tableToCsvString(places, naRep = "NaN")
    assert(out.contains("wonderland;NaN;NaN;0"))
  }

  test("first-column empty text cell is sealed with '-' (_represent.py:38-40)") {
    // An empty first cell would end the block on read — which is exactly why
    // the writer seals it. Build the empty string via an op, then write.
    val csv =
      """**t
        |all
        |a;b
        |text;-
        |x;1
        |""".stripMargin
    val t = CsvReader.readBundleFromString(spark, csv).unique("t")
      .replace("a", Map("x" -> ""))
    val out = CsvWriter.tableToCsvString(t)
    assert(out.contains("-;1.0"))
  }

  test("represent: value coercion parity (test_formatting.py _represent_row_elements)") {
    import graft.io.CsvWriter.represent
    // standard values pass through; onoff → 0/1
    assert(represent("foo", "text", 1, "-") == "foo")
    assert(represent(123.0, "km", 1, "-") == 123.0)
    assert(represent(true, "onoff", 3, "-") == 1)
    assert(represent(false, "onoff", 3, "-") == 0)
    // NaN-like things → na_rep in non-text columns
    assert(represent(Double.NaN, "km", 1, "-") == "-")
    assert(represent(null, "datetime", 2, "-") == "-")
    assert(represent(Double.NaN, "km", 1, "NaN") == "NaN")
    // empty strings: sealed in the first column, kept elsewhere
    assert(represent("", "text", 0, "-") == "-")
    assert(represent("", "text", 1, "-") == "")
    // timestamps render python-str style
    assert(represent(java.sql.Timestamp.valueOf("2020-08-04 08:00:00"),
      "datetime", 2, "-") == "2020-08-04 08:00:00")
  }

  test("fractional-second timestamps round-trip (full 6-digit fraction)") {
    // Python str(datetime) keeps all 6 microsecond digits when nonzero; a
    // stripped ".1" would not re-parse under exactly-3-digit .SSS formats.
    val csv =
      """**ts
        |all
        |a;when
        |text;datetime
        |x;2020-08-04 08:00:00.1
        |y;2020-08-04 08:00:00.123456
        |z;2020-08-04 08:00:00
        |""".stripMargin
    val t = CsvReader.readBundleFromString(spark, csv).unique("ts")
    val written = CsvWriter.tableToCsvString(t)
    assert(written.contains("x;2020-08-04 08:00:00.100000"))
    assert(written.contains("y;2020-08-04 08:00:00.123456"))
    assert(written.contains("z;2020-08-04 08:00:00\n"))
    val back = CsvReader.readBundleFromString(spark, written).unique("ts")
    assert(t.equalsTable(back))
  }

  test("distributed write: null onoff is missing (naRep), null text empty, fraction kept") {
    import scala.collection.immutable.ListMap
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("place", StringType), StructField("flag", BooleanType),
      StructField("when", TimestampType), StructField("note", StringType)))
    val rows = Seq(
      Row("a", null, java.sql.Timestamp.valueOf("2020-08-04 08:00:00.1"), null),
      Row("b", java.lang.Boolean.TRUE, java.sql.Timestamp.valueOf("2020-08-04 08:00:00"), "hi"))
    val df = spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava), schema)
    val t = StarTable(df, TableMetadata("d"), ListMap(
      "place" -> ColumnMetadata("text"), "flag" -> ColumnMetadata("onoff"),
      "when" -> ColumnMetadata("datetime"), "note" -> ColumnMetadata("text")))
    val dir = java.nio.file.Files.createTempDirectory("graft_dist_null").toString
    CsvWriter.writeDistributed(t, s"$dir/out")
    import scala.jdk.CollectionConverters._
    val body = java.nio.file.Files.list(java.nio.file.Paths.get(s"$dir/out"))
      .iterator().asScala.filter(_.getFileName.toString.startsWith("part-"))
      .flatMap(p => java.nio.file.Files.readAllLines(p).asScala).toSeq.sorted
    assert(body == Seq(
      "a;-;2020-08-04 08:00:00.100000;",
      "b;1;2020-08-04 08:00:00;hi"))
  }

  test("unicode text (CJK, emoji, RTL, combining) and megabyte cells round-trip") {
    val big = "x" * 1000000
    val csv =
      s"""**uni
         |all
         |a;b
         |text;text
         |中文文本;😀🚀
         |العربية;ñoño é côté
         |combining éé;$big
         |""".stripMargin
    val t = CsvReader.readBundleFromString(spark, csv).unique("uni")
    assert(t.equalsTable(
      CsvReader.readBundleFromString(spark, CsvWriter.tableToCsvString(t)).unique("uni")))
    // and through the XLSX container (UTF-8 XML + inline strings)
    val p = java.nio.file.Files.createTempDirectory("graft_uni").resolve("u.xlsx")
    graft.io.Xlsx.write(Seq(t), p)
    assert(t.equalsTable(graft.io.Xlsx.readBundle(spark, p).unique("uni")))
    // and through JSON
    assert(t.equalsTable(graft.io.JsonIo.jsonDataToTable(spark,
      graft.io.JsonIo.tableToJsonString(t))))
  }

  test("mergeDistributed produces a single valid StarTable CSV file") {
    val t = places
    val dir = java.nio.file.Files.createTempDirectory("graft_merge").toString
    CsvWriter.writeDistributed(t, s"$dir/out")
    CsvWriter.mergeDistributed(s"$dir/out", s"$dir/merged.csv")
    val back = TableBundle.fromBlocks(spark,
      CsvReader.read(java.nio.file.Paths.get(s"$dir/merged.csv"))).unique("foo")
    assert(t.equalsTable(back))
  }

  test("distributed write produces equivalent rows at scale") {
    val t = places
    val dir = java.nio.file.Files.createTempDirectory("graft_dist_csv").toString
    CsvWriter.writeDistributed(t, s"$dir/out")
    val header = java.nio.file.Files.readString(java.nio.file.Paths.get(s"$dir/out/_header.txt"))
    import scala.jdk.CollectionConverters._
    val parts = java.nio.file.Files.list(java.nio.file.Paths.get(s"$dir/out"))
      .iterator().asScala.filter(_.getFileName.toString.startsWith("part-")).toSeq
    val body = parts.flatMap(p => java.nio.file.Files.readAllLines(p).asScala).sorted
    val full = header + body.mkString("\n") + "\n"
    val back = CsvReader.readBundleFromString(spark, full).unique("foo")
    assert(t.equalsTable(back))
  }

  test("writeDataset: every part is a complete StarTable CSV; the connector " +
    "reads the directory back losslessly (empty partitions included)") {
    val t = places
    val dir = java.nio.file.Files.createTempDirectory("graft_ds_csv").toString
    // more output files than rows forces at least one EMPTY partition —
    // its part must still be a valid header-only StarTable file
    CsvWriter.writeDataset(t, s"$dir/ds", numFiles = 8)
    import scala.jdk.CollectionConverters._
    val parts = java.nio.file.Files.list(java.nio.file.Paths.get(s"$dir/ds"))
      .iterator().asScala.map(_.getFileName.toString)
      .filter(n => !n.startsWith("_") && !n.startsWith(".")).toSeq
    assert(parts.size == 8, s"expected 8 part files, got $parts")
    parts.foreach { p =>
      val lines = java.nio.file.Files.readAllLines(
        java.nio.file.Paths.get(s"$dir/ds/$p")).asScala
      assert(lines.take(1).exists(_.startsWith("**foo")),
        s"part $p is not self-describing: ${lines.take(1)}")
      assert(lines.size >= 4, s"part $p lacks the 4-line header")
    }
    val back = StarTable.fromDataFrame(
      spark.read.format("startable").load(s"$dir/ds"), "foo",
      units = t.columnNames.map(c => c -> t.unit(c)).toMap)
    assert(t.equalsTable(back),
      "dataset-layout round trip lost rows, types, or values")
  }
}
