package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.io.{CsvReader, Xlsx}
import graft.load.Load
import graft.model.ColumnFormat

/** XLSX round-trip parity (functional analog of pdtable/test/io/test_excel.py
  * for the unstyled surface). */
class XlsxSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  val bundleCsv: String =
    """**places_to_go
      |all
      |place;distance;ETA;is_hot
      |text;km;datetime;onoff
      |home;0;2020-08-04 08:00;1
      |work;1;2020-08-04 09:00;0
      |beach;2;2020-08-04 17:00;TRUE
      |wonderland;-;-;FaLsE
      |
      |**spelling_numbers
      |all
      |number;spelling
      |-;text
      |1;one
      |6;six
      |42;forty-two
      |""".stripMargin

  test("tables are preserved when written to and read from xlsx") {
    val bundle = CsvReader.readBundleFromString(spark, bundleCsv)
    val p = Files.createTempDirectory("graft_xlsx").resolve("out.xlsx")
    Xlsx.write(bundle.tables, p)
    val back = Xlsx.readBundle(spark, p)
    assert(back.size == 2)
    assert(bundle.unique("places_to_go").equalsTable(back.unique("places_to_go")))
    assert(bundle.unique("spelling_numbers").equalsTable(back.unique("spelling_numbers")))
  }

  test("transposed table survives xlsx round trip") {
    val t = CsvReader.readBundleFromString(spark,
      "**tr*;\nall\ncol1;-;1;3\ncol2;-;2;4\n").unique("tr")
    val p = Files.createTempDirectory("graft_xlsx").resolve("tr.xlsx")
    Xlsx.write(Seq(t), p)
    val back = Xlsx.readBundle(spark, p).unique("tr")
    assert(back.meta.transposed)
    assert(t.equalsTable(back))
  }

  test("styled write round-trips and produces a valid styles.xml (test_excel.py styles=True)") {
    import graft.io.{XlsxCellStyle, XlsxFont, XlsxStyles}
    val bundle = CsvReader.readBundleFromString(spark, bundleCsv)
    val p = Files.createTempDirectory("graft_xlsx").resolve("styled.xlsx")
    Xlsx.write(bundle.tables, p, styles = Some(XlsxStyles.default))

    // Data survives styling untouched (test_read_write_excel__round_trip_with_styles)
    val back = Xlsx.readBundle(spark, p)
    assert(bundle.unique("places_to_go").equalsTable(back.unique("places_to_go")))
    assert(bundle.unique("spelling_numbers").equalsTable(back.unique("spelling_numbers")))

    // The container carries a schema-valid styles part wired into the rels.
    val zf = new java.util.zip.ZipFile(p.toFile)
    def partText(name: String): String = {
      val e = zf.getEntry(name)
      assert(e != null, s"missing zip part $name")
      new String(zf.getInputStream(e).readAllBytes(), "UTF-8")
    }
    try {
      val styles = partText("xl/styles.xml")
      // well-formed XML
      val doc = javax.xml.parsers.DocumentBuilderFactory.newInstance()
        .newDocumentBuilder()
        .parse(new java.io.ByteArrayInputStream(styles.getBytes("UTF-8")))
      assert(doc.getDocumentElement.getNodeName == "styleSheet")
      // reference default spec colors: dark-blue bold name on grey fill
      assert(styles.contains("FF1F4E78") && styles.contains("FFD9D9D9")
        && styles.contains("FFF2F2F2") && styles.contains("<b/>"))
      assert(partText("[Content_Types].xml").contains("/xl/styles.xml"))
      assert(partText("xl/_rels/workbook.xml.rels").contains("styles.xml"))
      // name/destination/header rows carry style references; a values row
      // in the default spec does not (values style is empty)
      val sheet = partText("xl/worksheets/sheet1.xml")
      assert(sheet.contains("""<c r="A1" s="""))
      assert(sheet.contains("""<c r="A2" s="""))
      assert(!sheet.contains("""<c r="A5" s="""))
    } finally zf.close()
  }

  test("transposed styled write centers units and values by default") {
    import graft.io.XlsxStyles
    val t = CsvReader.readBundleFromString(spark,
      "**tr*;\nall\ncol1;-;1;3\ncol2;-;2;4\n").unique("tr")
    val p = Files.createTempDirectory("graft_xlsx").resolve("trs.xlsx")
    Xlsx.write(Seq(t), p, styles = Some(XlsxStyles.default))
    assert(t.equalsTable(Xlsx.readBundle(spark, p).unique("tr")))
    val zf = new java.util.zip.ZipFile(p.toFile)
    try {
      val styles = new String(zf.getInputStream(zf.getEntry("xl/styles.xml"))
        .readAllBytes(), "UTF-8")
      assert(styles.contains("""<alignment horizontal="center"/>"""))
      // transposed value cells (C3 onward) reference a style (centering)
      val sheet = new String(zf.getInputStream(zf.getEntry("xl/worksheets/sheet1.xml"))
        .readAllBytes(), "UTF-8")
      assert(sheet.contains("""<c r="C3" s="""))
    } finally zf.close()
  }

  test("sep_lines=2 writes two blank rows between tables (test_write_excel__sep_lines)") {
    val bundle = CsvReader.readBundleFromString(spark, bundleCsv)
    val p = Files.createTempDirectory("graft_xlsx").resolve("sep2.xlsx")
    Xlsx.write(bundle.tables, p, sepLines = 2)
    val back = Xlsx.readBundle(spark, p)
    assert(back.size == 2)
    assert(bundle.unique("places_to_go").equalsTable(back.unique("places_to_go")))
    val zf = new java.util.zip.ZipFile(p.toFile)
    try {
      val sheet = new String(zf.getInputStream(zf.getEntry("xl/worksheets/sheet1.xml"))
        .readAllBytes(), "UTF-8")
      // rows 9 and 10 (after the 8-row first table) are the empty separators
      assert(sheet.contains("""<row r="9"></row><row r="10"></row>"""))
      assert(sheet.contains("""<row r="11"><c r="A11"""))
    } finally zf.close()
  }

  test("xml-special and multiline text cells escape correctly") {
    val t = CsvReader.readBundleFromString(spark,
      "**esc\nall\na\ntext\nx<y&z>\"q\"\n").unique("esc")
    val p = Files.createTempDirectory("graft_xlsx").resolve("esc.xlsx")
    Xlsx.write(Seq(t), p)
    val back = Xlsx.readBundle(spark, p).unique("esc")
    assert(back.df.head().getString(0) == "x<y&z>\"q\"")
  }

  test("xlsx files load through the standard load system") {
    val dir = Files.createTempDirectory("graft_xlsx_load")
    val bundle = CsvReader.readBundleFromString(spark, bundleCsv)
    Xlsx.write(bundle.tables, dir.resolve("book.xlsx"))
    val loaded = Load.loadBundle(spark, Seq("book.xlsx"), Some(dir))
    assert(loaded.size == 2)
    assert(loaded.unique("places_to_go").unit("distance") == "km")
  }

  test("foreign xlsx with sharedStrings parses (openpyxl-style output)") {
    // construct the shared-strings variant a typical external writer emits
    val dir = Files.createTempDirectory("graft_xlsx_ss")
    val p = dir.resolve("ss.xlsx")
    val sheet =
      """<?xml version="1.0"?><worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>
        |<row r="1"><c r="A1" t="s"><v>0</v></c></row>
        |<row r="2"><c r="A2" t="s"><v>1</v></c></row>
        |<row r="3"><c r="A3" t="s"><v>2</v></c><c r="B3" t="s"><v>3</v></c></row>
        |<row r="4"><c r="A4" t="s"><v>4</v></c><c r="B4" t="s"><v>5</v></c></row>
        |<row r="5"><c r="A5" t="s"><v>6</v></c><c r="B5"><v>1.5</v></c></row>
        |</sheetData></worksheet>""".stripMargin
    val shared =
      """<?xml version="1.0"?><sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="7" uniqueCount="7">
        |<si><t>**py_table</t></si><si><t>all</t></si><si><t>a</t></si><si><t>b</t></si>
        |<si><t>text</t></si><si><t>-</t></si><si><t>x</t></si></sst>""".stripMargin
    val zip = new java.util.zip.ZipOutputStream(Files.newOutputStream(p))
    def part(n: String, c: String): Unit = {
      zip.putNextEntry(new java.util.zip.ZipEntry(n))
      zip.write(c.getBytes("UTF-8")); zip.closeEntry()
    }
    part("xl/worksheets/sheet1.xml", sheet)
    part("xl/sharedStrings.xml", shared)
    zip.close()

    val bundle = Xlsx.readBundle(spark, p)
    val t = bundle.unique("py_table")
    assert(t.columnNames == Seq("a", "b"))
    assert(t.units == Seq("text", "-"))
    assert(t.df.head().toSeq == Seq("x", 1.5))
  }

  test("sheet name pattern filters sheets") {
    val bundle = CsvReader.readBundleFromString(spark, bundleCsv)
    val p = Files.createTempDirectory("graft_xlsx").resolve("f.xlsx")
    Xlsx.write(bundle.tables, p)
    assert(Xlsx.readBundle(spark, p, Some("nomatch".r)).size == 0)
    assert(Xlsx.readBundle(spark, p, Some("Sheet1".r)).size == 2)
  }

  test("multi-sheet workbook: named sheets write and filter (excel.py dict form)") {
    val bundle = CsvReader.readBundleFromString(spark, bundleCsv)
    val p = Files.createTempDirectory("graft_xlsx").resolve("multi.xlsx")
    Xlsx.writeSheets(Seq(
      "trips" -> Seq(bundle.unique("places_to_go")),
      "numbers" -> Seq(bundle.unique("spelling_numbers"))), p)
    val all = Xlsx.readBundle(spark, p)
    assert(all.size == 2)
    val onlyTrips = Xlsx.readBundle(spark, p, Some("trips".r))
    assert(onlyTrips.size == 1 && onlyTrips(0).name == "places_to_go")
    // per-sheet provenance carries the real sheet name
    assert(onlyTrips(0).meta.origin.inputLocation.get.sheet.sheetName.contains("trips"))
  }

  test("column display formats become numFmtId-backed styles (builtin + custom)") {
    val bundle = CsvReader.readBundleFromString(spark, bundleCsv)
    val t = bundle.unique("places_to_go")
      .withFormat("distance", ColumnFormat(2))        // ".2f" -> builtin "0.00" (id 2)
    val t2 = bundle.unique("spelling_numbers")
      .withFormat("number", ColumnFormat("14.3e"))    // custom "0.000E+00" (id >= 164)
    val p = Files.createTempDirectory("graft_xlsx").resolve("fmt.xlsx")
    Xlsx.write(Seq(t, t2), p, styles = Some(graft.io.XlsxStyles.default))
    val zf = new java.util.zip.ZipFile(p.toFile)
    try {
      def partText(n: String) = new String(
        zf.getInputStream(zf.getEntry(n)).readAllBytes(), "UTF-8")
      val styles = partText("xl/styles.xml")
      // custom format declared with a custom id
      assert(styles.contains("""formatCode="0.000E+00""""),
        s"custom numFmt missing: $styles")
      assert(styles.contains("""numFmtId="164""""))
      // some cellXf applies the builtin 0.00 id and one the custom id
      assert(styles.contains("""<xf numFmtId="2" """) &&
        styles.contains("""<xf numFmtId="164" """))
      assert(styles.contains("""applyNumberFormat="1""""))
      // value cells of the formatted columns carry a style id
      val sheet = partText("xl/worksheets/sheet1.xml")
      assert(sheet.contains(""" s="""), "no styled cells in sheet")
      // data survives (round trip unchanged by formats)
      val back = Xlsx.readBundle(spark, p)
      assert(t.equalsTable(back.unique("places_to_go")))
      assert(t2.equalsTable(back.unique("spelling_numbers")))
    } finally zf.close()
  }

  test("display formats emit a styles.xml even when no part styling is requested") {
    val bundle = CsvReader.readBundleFromString(spark, bundleCsv)
    val t = bundle.unique("places_to_go").withFormat("distance", ColumnFormat(1))
    val p = Files.createTempDirectory("graft_xlsx").resolve("fmtonly.xlsx")
    Xlsx.write(Seq(t), p) // styles = None
    val zf = new java.util.zip.ZipFile(p.toFile)
    try {
      assert(zf.getEntry("xl/styles.xml") != null, "styles.xml missing")
      val styles = new String(
        zf.getInputStream(zf.getEntry("xl/styles.xml")).readAllBytes(), "UTF-8")
      assert(styles.contains("""formatCode="0.0"""") ||
        styles.contains("""numFmtId="164""""), s"format lost: $styles")
      assert(new String(zf.getInputStream(
        zf.getEntry("[Content_Types].xml")).readAllBytes(), "UTF-8")
        .contains("/xl/styles.xml"))
    } finally zf.close()
  }

  test("ColumnFormat -> Excel format code mapping") {
    import graft.io.XlsxNumFmt
    def code(s: String) = XlsxNumFmt.fromColumnFormat(ColumnFormat(s))
    assert(code(".2f") == Some("0.00"))
    assert(code(".0f") == Some("0"))
    assert(code("d") == Some("0"))
    assert(code("14.3e") == Some("0.000E+00"))
    assert(code(".1%") == Some("0.0%"))
    assert(code("weird") == None)
  }

  test("container goes ZIP64 transparently past the classic entry-count limit") {
    // The reference needs use_zip64=True for >4 GB workbooks
    // (excel.py:194-196); java.util.zip switches to ZIP64 automatically. A
    // 4 GB entry is too slow for CI, but the 65 535-entry ceiling triggers
    // the same ZIP64 end-of-central-directory machinery — prove the records
    // are written and re-readable.
    val p = Files.createTempFile("graft_zip64", ".zip")
    val out = new java.util.zip.ZipOutputStream(Files.newOutputStream(p))
    val n = 65600
    var i = 0
    while (i < n) {
      out.putNextEntry(new java.util.zip.ZipEntry(s"e$i"))
      out.write('x'); out.closeEntry(); i += 1
    }
    out.close()
    // ZIP64 end-of-central-directory signature PK\x06\x06 must be present
    val bytes = Files.readAllBytes(p)
    def hasSig(sig: Array[Byte]): Boolean =
      bytes.sliding(4).exists(_.sameElements(sig))
    assert(hasSig(Array(0x50, 0x4b, 0x06, 0x06).map(_.toByte)),
      "no ZIP64 EOCD record")
    val zf = new java.util.zip.ZipFile(p.toFile)
    try assert(zf.size() == n, s"reread ${zf.size()} of $n entries")
    finally { zf.close(); Files.delete(p) }
  }
}
