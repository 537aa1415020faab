package graft

import java.nio.file.{Files, Path}
import java.util.zip.{ZipEntry, ZipOutputStream}

import org.scalatest.funsuite.AnyFunSuite

import graft.io.{CsvReader, Xlsx}

/** Foreign-workbook parity: workbooks built with EXCEL/OPENPYXL output
  * conventions — every string in sharedStrings (markers included), blank
  * rows ABSENT from sheetData, style-only empty cells, `t="b"` booleans,
  * formula cells carrying cached values, datetimes as day serials with a
  * date numFmt style — must parse to exactly the tables the CSV bundle
  * fixture produces (reference shapes:
  * /root/reference/pdtable/test/io/input/{bundle,foo,multipage}.xlsx,
  * test_excel.py:458-503, test_load.py:91-111). Our own writer uses none
  * of these conventions (inlineStr, dense rows), so this is the reader's
  * only exposure to the wild-Excel dialect.
  */
class XlsxForeignSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** The CSV truth — same fixture shape as XlsxSpec/the reference bundle. */
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

  private def zip(path: Path, parts: Seq[(String, String)]): Unit = {
    val z = new ZipOutputStream(Files.newOutputStream(path))
    try parts.foreach { case (n, c) =>
      z.putNextEntry(new ZipEntry(n))
      z.write(c.getBytes("UTF-8"))
      z.closeEntry()
    } finally z.close()
  }

  /** Excel day serial (1899-12-30 epoch unless date1904). */
  private def serial(ts: String, date1904: Boolean = false): String = {
    val t = java.time.LocalDateTime.parse(ts.replace(' ', 'T'))
    val epoch = if (date1904) java.time.LocalDateTime.of(1904, 1, 1, 0, 0)
                else java.time.LocalDateTime.of(1899, 12, 30, 0, 0)
    (java.time.Duration.between(epoch, t).toMillis / 86400000.0).toString
  }

  private val ns =
    """xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main""""

  /** Shared-string table + index lookup (the openpyxl/Excel convention:
    * ALL strings shared, markers included; leading spaces preserved). */
  private val strings: IndexedSeq[String] = IndexedSeq(
    "author:", "XYODA", "purpose:", "Save the galaxy",
    "***read_this_summer", "War and Peace", "Crime and Punishment",
    "**places_to_go", "all", "place", "distance", "ETA", "is_hot",
    "text", " km", "datetime", "onoff",
    "home", "work", "beach", "wonderland", "-", "FaLsE",
    "**spelling_numbers", "number", "spelling", "one", "forty-two",
    "**setup_table", "k", "v")
  private def S(s: String): Int = {
    val i = strings.indexOf(s); require(i >= 0, s"not shared: '$s'"); i
  }
  private val sstXml =
    s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
       |<sst $ns count="${strings.size}" uniqueCount="${strings.size}">""".stripMargin +
      strings.map(s =>
        if (s.startsWith(" ")) s"""<si><t xml:space="preserve">$s</t></si>"""
        else s"<si><t>$s</t></si>").mkString + "</sst>"

  /** styles.xml: xf 0 = General, xf 1 = General (style-only empties),
    * xf 2 = builtin date numFmt 22, xf 3 = CUSTOM date code. */
  private val stylesXml =
    s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
       |<styleSheet $ns>
       |<numFmts count="1"><numFmt numFmtId="164" formatCode="yyyy\\-mm\\-dd hh:mm:ss"/></numFmts>
       |<fonts count="1"><font><sz val="10"/><name val="Arial"/></font></fonts>
       |<fills count="1"><fill><patternFill patternType="none"/></fill></fills>
       |<borders count="1"><border/></borders>
       |<cellStyleXfs count="1"><xf numFmtId="0" fontId="0" fillId="0" borderId="0"/></cellStyleXfs>
       |<cellXfs count="4">
       |<xf numFmtId="0" fontId="0" fillId="0" borderId="0" xfId="0"/>
       |<xf numFmtId="0" fontId="0" fillId="0" borderId="0" xfId="0"/>
       |<xf numFmtId="22" fontId="0" fillId="0" borderId="0" xfId="0" applyNumberFormat="1"/>
       |<xf numFmtId="164" fontId="0" fillId="0" borderId="0" xfId="0" applyNumberFormat="1"/>
       |</cellXfs>
       |</styleSheet>""".stripMargin

  /** The main sheet, Excel-style: sparse rows (3, 7, 16 absent = blank),
    * shared-string cells, untyped numerics, a `t="b"` boolean, a style-only
    * empty cell, formula cells with cached numeric and `t="str"` values,
    * and ETA as date serials (xf 2 = builtin fmt, xf 3 = custom fmt). */
  private def mainSheetXml(date1904: Boolean): String = {
    def s(ref: String, v: String) = s"""<c r="$ref" t="s"><v>${S(v)}</v></c>"""
    def n(ref: String, v: String) = s"""<c r="$ref"><v>$v</v></c>"""
    def d(ref: String, ts: String, xf: Int) =
      s"""<c r="$ref" s="$xf"><v>${serial(ts, date1904)}</v></c>"""
    s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
       |<worksheet $ns><dimension ref="A1:D23"/><sheetData>
       |<row r="1">${s("A1", "author:")}${s("B1", "XYODA")}<c r="C1" s="1"/></row>
       |<row r="2">${s("A2", "purpose:")}${s("B2", "Save the galaxy")}</row>
       |<row r="4">${s("A4", "***read_this_summer")}</row>
       |<row r="5">${s("A5", "War and Peace")}</row>
       |<row r="6">${s("A6", "Crime and Punishment")}</row>
       |<row r="8">${s("A8", "**places_to_go")}</row>
       |<row r="9">${s("A9", "all")}</row>
       |<row r="10">${s("A10", "place")}${s("B10", "distance")}${s("C10", "ETA")}${s("D10", "is_hot")}</row>
       |<row r="11">${s("A11", "text")}${s("B11", " km")}${s("C11", "datetime")}${s("D11", "onoff")}</row>
       |<row r="12">${s("A12", "home")}${n("B12", "0")}${d("C12", "2020-08-04 08:00:00", 2)}${n("D12", "1")}</row>
       |<row r="13">${s("A13", "work")}${n("B13", "1")}${d("C13", "2020-08-04 09:00:00", 3)}${n("D13", "0")}</row>
       |<row r="14">${s("A14", "beach")}${n("B14", "2")}${d("C14", "2020-08-04 17:00:00", 2)}<c r="D14" t="b"><v>1</v></c></row>
       |<row r="15">${s("A15", "wonderland")}${s("B15", "-")}${s("C15", "-")}${s("D15", "FaLsE")}</row>
       |<row r="17">${s("A17", "**spelling_numbers")}</row>
       |<row r="18">${s("A18", "all")}</row>
       |<row r="19">${s("A19", "number")}${s("B19", "spelling")}</row>
       |<row r="20">${s("A20", "-")}${s("B20", "text")}</row>
       |<row r="21">${n("A21", "1")}${s("B21", "one")}</row>
       |<row r="22"><c r="A22"><f>2*3</f><v>6</v></c><c r="B22" t="str"><f>IF(1,"six","")</f><v>six</v></c></row>
       |<row r="23">${n("A23", "42")}${s("B23", "forty-two")}</row>
       |</sheetData></worksheet>""".stripMargin
  }

  private val setupSheetXml: String = {
    def s(ref: String, v: String) = s"""<c r="$ref" t="s"><v>${S(v)}</v></c>"""
    s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
       |<worksheet $ns><sheetData>
       |<row r="1">${s("A1", "**setup_table")}</row>
       |<row r="2">${s("A2", "all")}</row>
       |<row r="3">${s("A3", "k")}${s("B3", "v")}</row>
       |<row r="4">${s("A4", "text")}${s("B4", " km")}</row>
       |<row r="5">${s("A5", "home")}<c r="B5"><v>1</v></c></row>
       |</sheetData></worksheet>""".stripMargin
  }

  private def workbook(path: Path, sheetNames: Seq[String],
                       sheetXmls: Seq[String], date1904: Boolean): Unit = {
    val wbPr = if (date1904) """<workbookPr date1904="1"/>""" else ""
    val sheetsXml = sheetNames.zipWithIndex.map { case (n, i) =>
      s"""<sheet name="$n" sheetId="${i + 1}" r:id="rId${i + 1}"/>"""
    }.mkString
    val rels = sheetNames.indices.map(i =>
      s"""<Relationship Id="rId${i + 1}" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet${i + 1}.xml"/>""")
      .mkString
    zip(path,
      Seq(
        "xl/workbook.xml" ->
          s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
             |<workbook $ns xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">$wbPr<sheets>$sheetsXml</sheets></workbook>""".stripMargin,
        "xl/_rels/workbook.xml.rels" ->
          s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
             |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">$rels<Relationship Id="rId90" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/sharedStrings" Target="sharedStrings.xml"/><Relationship Id="rId91" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/styles" Target="styles.xml"/></Relationships>""".stripMargin,
        "xl/sharedStrings.xml" -> sstXml,
        "xl/styles.xml" -> stylesXml) ++
        sheetXmls.zipWithIndex.map { case (x, i) =>
          s"xl/worksheets/sheet${i + 1}.xml" -> x
        })
  }

  test("a workbook in Excel/openpyxl conventions parses to exactly the " +
    "CSV bundle fixture's tables (shared strings, sparse blank rows, " +
    "t=\"b\", cached formula values, date serials under two numFmts)") {
    val p = Files.createTempDirectory("graft_foreign").resolve("foreign.xlsx")
    workbook(p, Seq("input_main"), Seq(mainSheetXml(date1904 = false)),
      date1904 = false)
    val truth = CsvReader.readBundleFromString(spark, bundleCsv)
    val back = Xlsx.readBundle(spark, p)
    assert(back.size == 2, s"expected 2 tables, got ${back.size}")
    assert(truth.unique("places_to_go").equalsTable(back.unique("places_to_go")),
      "places_to_go diverged from the CSV fixture parse")
    assert(truth.unique("spelling_numbers")
      .equalsTable(back.unique("spelling_numbers")),
      "spelling_numbers diverged from the CSV fixture parse")
    // the leading-space shared-string unit trimmed like CSV cells
    assert(back.unique("places_to_go").unit("distance") == "km")
  }

  test("date1904 workbooks shift the serial epoch") {
    val p = Files.createTempDirectory("graft_foreign").resolve("mac.xlsx")
    workbook(p, Seq("input_main"), Seq(mainSheetXml(date1904 = true)),
      date1904 = true)
    val truth = CsvReader.readBundleFromString(spark, bundleCsv)
    val back = Xlsx.readBundle(spark, p)
    assert(truth.unique("places_to_go").equalsTable(back.unique("places_to_go")))
  }

  test("the date1904 token in an XML comment or single-quoted attribute " +
    "does not shift dates — detection reads the workbookPr attribute") {
    val p = Files.createTempDirectory("graft_foreign").resolve("trap.xlsx")
    // comments and single-quoted attributes may legally contain the raw
    // token date1904=\"1\" — a whole-file regex matched both and shifted
    // every date ~4 years; the StAX attribute read must not
    zip(p, Seq(
      "xl/workbook.xml" ->
        s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
           |<!-- migrated from a mac workbook; date1904="1" was dropped -->
           |<workbook $ns xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships" xmlns:g='x date1904="1" y'><sheets><sheet name="input_main" sheetId="1" r:id="rId1"/></sheets></workbook>""".stripMargin,
      "xl/_rels/workbook.xml.rels" ->
        s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
           |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships"><Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/><Relationship Id="rId90" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/sharedStrings" Target="sharedStrings.xml"/><Relationship Id="rId91" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/styles" Target="styles.xml"/></Relationships>""".stripMargin,
      "xl/sharedStrings.xml" -> sstXml,
      "xl/styles.xml" -> stylesXml,
      "xl/worksheets/sheet1.xml" -> mainSheetXml(date1904 = false)))
    val truth = CsvReader.readBundleFromString(spark, bundleCsv)
    val back = Xlsx.readBundle(spark, p)
    assert(truth.unique("places_to_go").equalsTable(back.unique("places_to_go")),
      "a date1904-looking comment/attribute shifted the 1900-epoch serials")
  }

  test("elapsed-duration formats ([h]:mm:ss) stay numeric; date codes " +
    "with quoted literals and colors classify correctly") {
    import graft.io.Xlsx
    assert(!Xlsx.isDateFormatCode("[h]:mm:ss"))
    assert(!Xlsx.isDateFormatCode("[mm]:ss"))
    assert(!Xlsx.isDateFormatCode("[ss].00"))
    assert(Xlsx.isDateFormatCode("yyyy-mm-dd"))
    assert(Xlsx.isDateFormatCode("[RED]yyyy-mm-dd"))
    assert(Xlsx.isDateFormatCode("hh:mm"))
    assert(!Xlsx.isDateFormatCode("0.00"))
    assert(!Xlsx.isDateFormatCode("#,##0"))
    assert(!Xlsx.isDateFormatCode("\"yd\"0.0")) // quoted literals ignored
    assert(Xlsx.isDateFormatCode("d-mmm-yy"))
  }

  test("sheet-name pattern filters foreign multi-sheet workbooks " +
    "(multipage shape)") {
    val p = Files.createTempDirectory("graft_foreign").resolve("multi.xlsx")
    workbook(p, Seq("input_main", "setup_params"),
      Seq(mainSheetXml(date1904 = false), setupSheetXml), date1904 = false)
    val inputOnly = Xlsx.read(p,
      sheetNamePattern = Some("^input.*".r)).collect {
      case (graft.parse.BlockType.Table, t: graft.parse.ParsedTable) => t.name
    }.toSet
    assert(inputOnly == Set("places_to_go", "spelling_numbers"))
    val all = Xlsx.read(p,
      sheetNamePattern = Some("^(input|setup).*".r)).collect {
      case (graft.parse.BlockType.Table, t: graft.parse.ParsedTable) => t.name
    }.toSet
    assert(all == Set("places_to_go", "spelling_numbers", "setup_table"))
  }
}
