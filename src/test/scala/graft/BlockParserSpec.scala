package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.io.CsvReader
import graft.model._
import graft.parse._

/** Ports of the reference's block-parser tests
  * (reference: pdtable/test/io/parsers/test_block_parsers.py and
  * pdtable/test/io/input/bundle.csv).
  */
class BlockParserSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  // Canonical fixture, verbatim from pdtable/test/io/input/bundle.csv
  val bundleCsv: String =
    """author:;XYODA;;;
      |purpose:;Save the galaxy;;;
      |;;;;
      |***read_this_summer;;;;
      |War and Peace;;;;
      |Crime and Punishment;;;;
      |;;;;
      |**places_to_go;;;;
      |all;;;;
      |place;distance;is_hot;;
      |text;km;onoff;;
      |home;0;1;;
      |work;1;0;;
      |beach;2;TRUE;;
      |wonderland;-;FaLsE;;
      |;;;;
      |**spelling_numbers;;;;
      |all;;;;
      |number;spelling;;;
      |-;text;;;
      |1;one;;;
      |6;six;;;
      |42;forty-two;;;
      |;;;;
      |;;;;
      |**places_to_go;;;;
      |all;;;;
      |place;distance;is_hot;;
      |text;km;onoff;;
      |home;0;1;;
      |work;1;0;;
      |beach;2;TRUE;;
      |wonderland;-;FaLsE;;""".stripMargin

  def blocks: Seq[(BlockType, Block)] = CsvReader.readString(bundleCsv).toSeq

  test("bundle.csv parses into metadata + directive + 3 tables") {
    val bs = blocks
    assert(bs.count(_._1 == BlockType.Metadata) == 1)
    assert(bs.count(_._1 == BlockType.Directive) == 1)
    assert(bs.count(_._1 == BlockType.Table) == 3)
  }

  test("metadata block holds author and purpose") {
    val m = blocks.collectFirst { case (BlockType.Metadata, b: MetadataBlock) => b }.get
    assert(m.values("author") == "XYODA")
    assert(m.values("purpose") == "Save the galaxy")
  }

  test("directive holds name and lines") {
    val d = blocks.collectFirst { case (BlockType.Directive, b: Directive) => b }.get
    assert(d.name == "read_this_summer")
    assert(d.lines == Seq("War and Peace", "Crime and Punishment"))
  }

  test("places_to_go parses all four column types") {
    val t = blocks.collect { case (BlockType.Table, b: ParsedTable) => b }.head
    assert(t.name == "places_to_go")
    assert(t.destinations == Set("all"))
    assert(t.columnNames == Seq("place", "distance", "is_hot"))
    assert(t.units == Seq("text", "km", "onoff"))
    assert(t.numRows == 4)
    assert(t.columns(0) == Seq("home", "work", "beach", "wonderland"))
    assert(t.columns(1) == Seq(1.0 * 0, 1.0, 2.0, null).map {
      case d: Double => java.lang.Double.valueOf(d); case x => x
    })
    // onoff accepts 0/1/TRUE/FaLsE (reference: columns.py:41-55)
    assert(t.columns(2) == Seq(true, false, true, false).map(java.lang.Boolean.valueOf))
  }

  test("early filter skips non-matching tables cheaply") {
    val seen = CsvReader.readString(bundleCsv,
      filter = Some((bt, name) => bt == BlockType.Table && name == "spelling_numbers")).toSeq
    assert(seen.size == 1)
    val t = seen.head._2.asInstanceOf[ParsedTable]
    assert(t.name == "spelling_numbers")
    assert(t.columns(0) == Seq(1.0, 6.0, 42.0).map(java.lang.Double.valueOf))
  }

  test("transposed table parses to same logical schema") {
    val csv =
      """**transposed_table*;
        |all
        |col1;-;1;3
        |col2;-;2;4
        |""".stripMargin
    val t = CsvReader.readString(csv).collectFirst {
      case (BlockType.Table, b: ParsedTable) => b
    }.get
    assert(t.transposed)
    assert(t.columnNames == Seq("col1", "col2"))
    assert(t.numRows == 2)
    assert(t.columns(0) == Seq(1.0, 3.0).map(java.lang.Double.valueOf))
    assert(t.columns(1) == Seq(2.0, 4.0).map(java.lang.Double.valueOf))
  }

  test("comments after blank column-name cell are ignored") {
    val csv =
      """**t;;;
        |all;;;
        |a;b;;this is a comment
        |-;-;;
        |1;2;;
        |""".stripMargin
    val t = CsvReader.readString(csv).collectFirst {
      case (BlockType.Table, b: ParsedTable) => b
    }.get
    assert(t.columnNames == Seq("a", "b"))
  }

  test("datetime column parses and missing becomes null") {
    val csv =
      """**foo
        |all
        |place;ETA
        |text;datetime
        |home;2020-08-04 08:00
        |wonderland;-
        |""".stripMargin
    val t = CsvReader.readString(csv).collectFirst {
      case (BlockType.Table, b: ParsedTable) => b
    }.get
    assert(t.columns(1)(0) == java.sql.Timestamp.valueOf("2020-08-04 08:00:00"))
    assert(t.columns(1)(1) == null)
  }

  test("to=jsondata emits the JsonData shape (blocks.py:255-266,348-360)") {
    import graft.io.JsonValue._
    val tables = CsvReader.readString(bundleCsv, to = "jsondata").collect {
      case (BlockType.Table, j: JsonDataBlock) => j.json
    }.toSeq
    assert(tables.size == 3)
    val places = tables.head.fields
    assert(places("name") == JsonString("places_to_go"))
    assert(places("destinations").asInstanceOf[JsonObject].fields.keySet == Set("all"))
    val cols = places("columns").asInstanceOf[JsonObject].fields
    assert(cols.keys.toSeq == Seq("place", "distance", "is_hot"))
    val dist = cols("distance").asInstanceOf[JsonObject].fields
    assert(dist("unit") == JsonString("km"))
    // wonderland's '-' distance → null; onoff values → booleans
    assert(dist("values").asInstanceOf[JsonArray].values ==
      Vector(JsonNumber(0.0), JsonNumber(1.0), JsonNumber(2.0), JsonNull))
    val hot = cols("is_hot").asInstanceOf[JsonObject].fields
    assert(hot("values").asInstanceOf[JsonArray].values ==
      Vector(JsonBool(true), JsonBool(false), JsonBool(true), JsonBool(false)))
  }

  test("to=cellgrid emits raw cells; unknown target raises (blocks.py:352-356)") {
    val grids = CsvReader.readString(bundleCsv, to = "cellgrid").collect {
      case (BlockType.Table, r: RawCells) => r.grid
    }.toSeq
    assert(grids.size == 3)
    assert(grids.head.head.head == "**places_to_go")
    assert(grids.head(2).take(3) == Seq("place", "distance", "is_hot"))
    intercept[IllegalArgumentException] {
      CsvReader.readString(bundleCsv, to = "nonsense").toSeq
    }
  }

  test("short-row padding keeps typed cells intact (Excel Timestamp survives)") {
    // An Excel-sourced grid carries java.sql.Timestamp cells; padding a
    // short row must append "NaN" WITHOUT stringifying existing cells (a
    // stringified "…00:00:00.0" would be nulled by the datetime parser).
    val ts = java.sql.Timestamp.valueOf("2020-01-01 00:00:00")
    val grid: Seq[Seq[Any]] = Seq(
      Seq("**t"), Seq("all"),
      Seq("when", "x"), Seq("datetime", "-"),
      Seq(ts) // short row: missing x
    )
    val p = Blocks.parseTableGrid(grid, graft.origin.TableOrigin.empty, new ParseFixer())
    assert(p.columns(0) == Seq(ts))
    assert(p.columns(1) == Seq(null)) // "NaN" padding → missing
  }

  test("marker edge cases: **** is not a block marker; ** mid-cell is data") {
    // reference regex (blocks.py:386-399): `(?<!\*)(\*\*\*?)(?!\*)` — four
    // stars match nothing, and a ** not at cell start is plain data.
    val csv =
      """**t
        |all
        |a
        |text
        |****not_a_marker
        |x ** y
        |
        |****ignored
        |""".stripMargin
    val tables = CsvReader.readString(csv).collect {
      case (BlockType.Table, p: ParsedTable) => p
    }.toSeq
    assert(tables.map(_.name) == Seq("t"))
    assert(tables.head.columns.head == Seq("****not_a_marker", "x ** y"))
  }

  test("empty table (no unit row) raises") {
    val csv = "**bad\nall\ncol1;col2\n"
    assertThrows[graft.origin.InputError] {
      CsvReader.readString(csv).toSeq
    }
  }

  test("StarTable materializes from parsed block with units in schema") {
    val t = blocks.collect { case (BlockType.Table, b: ParsedTable) => b }.head
    val st = StarTable.fromParsed(spark, t)
    assert(st.df.count() == 4)
    assert(st.unit("distance") == "km")
    assert(st.df.schema("distance").metadata.getString(StarTable.UnitMetaKey) == "km")
    assert(st.df.schema("is_hot").dataType == org.apache.spark.sql.types.BooleanType)
  }

  test("TableBundle: unique raises on duplicate name, all returns both") {
    val bundle = CsvReader.readBundleFromString(spark, bundleCsv)
    assert(bundle.size == 3)
    assertThrows[TableNameNotUniqueInBundleError] { bundle.unique("places_to_go") }
    assert(bundle.all("places_to_go").size == 2)
    assert(bundle.unique("spelling_numbers").name == "spelling_numbers")
    assert(bundle(0).name == "places_to_go")
  }
}
