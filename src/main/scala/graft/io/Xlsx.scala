package graft.io

import java.io.{InputStream, OutputStream}
import java.nio.file.{Files, Path}
import java.util.zip.{ZipEntry, ZipInputStream, ZipOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.SparkSession

import graft.model.{StarTable, TableBundle}
import graft.origin._
import graft.parse._

/** Cell-styling model for styled XLSX output — the Scala analog of the
  * reference's style-spec dicts (pdtable/io/_excel_write_helper.py:6-15,
  * applied in pdtable/io/_excel_openpyxl.py:111-210): per table part
  * (name / destinations / column names / units / values), an optional font
  * (color, bold, italic), solid fill color, and horizontal alignment.
  * Colors are RGB hex "RRGGBB"; a leading alpha pair is accepted. */
final case class XlsxFont(color: Option[String] = None, bold: Boolean = false,
                          italic: Boolean = false)
final case class XlsxCellStyle(font: Option[XlsxFont] = None,
                               fillColor: Option[String] = None,
                               horizontalAlignment: Option[String] = None,
                               numberFormat: Option[String] = None) {
  def isPlain: Boolean = font.isEmpty && fillColor.isEmpty &&
    horizontalAlignment.isEmpty && numberFormat.isEmpty
  /** Transposed-table default centering unless explicitly aligned
    * (reference: _excel_openpyxl.py:196-205). */
  def withDefaultAlignment(h: String): XlsxCellStyle =
    if (horizontalAlignment.isEmpty) copy(horizontalAlignment = Some(h)) else this
}

/** Excel number-format codes: builtin numFmtId registry (ECMA-376 §18.8.30)
  * plus the mapping from the column display-format mini-language
  * ([[graft.model.ColumnFormat]], e.g. ".2f", "d", "14.3e", ".1%") to a
  * format code — so a column's declared display format becomes a real
  * spreadsheet number format instead of being lost on Excel export. */
object XlsxNumFmt {
  /** ECMA-376 builtin ids; codes not listed get a custom id ≥ 164. */
  val builtinIds: Map[String, Int] = Map(
    "General" -> 0, "0" -> 1, "0.00" -> 2, "#,##0" -> 3, "#,##0.00" -> 4,
    "0%" -> 9, "0.00%" -> 10, "0.00E+00" -> 11, "@" -> 49)

  val customBase = 164

  /** Map a ColumnFormat specifier to an Excel format code (None = leave the
    * cell as General). Covers the fixed/int/exponent/percent forms the
    * display-format layer supports. */
  def fromColumnFormat(cf: graft.model.ColumnFormat): Option[String] = {
    val FixedRe = """(?:\d+)?\.(\d+)f""".r
    val ExpRe = """(?:\d+)?\.(\d+)e""".r
    val PctRe = """(?:\d+)?\.(\d+)%""".r
    cf.specifier match {
      case FixedRe(d) => Some(if (d.toInt == 0) "0" else "0." + "0" * d.toInt)
      case ExpRe(d)   => Some("0." + "0" * math.max(d.toInt, 1) + "E+00")
      case PctRe(d)   => Some(if (d.toInt == 0) "0%" else "0." + "0" * d.toInt + "%")
      case "d"        => Some("0")
      case "%"        => Some("0%")
      case _          => None
    }
  }
}
final case class XlsxStyles(
    tableName: XlsxCellStyle = XlsxCellStyle(),
    destinations: XlsxCellStyle = XlsxCellStyle(),
    columnNames: XlsxCellStyle = XlsxCellStyle(),
    units: XlsxCellStyle = XlsxCellStyle(),
    values: XlsxCellStyle = XlsxCellStyle())
object XlsxStyles {
  /** The reference's DEFAULT_STYLE_SPEC (neutral greys + dark blue,
    * _excel_write_helper.py:6-15) — what `styles=True` applies. */
  val default: XlsxStyles = XlsxStyles(
    tableName = XlsxCellStyle(Some(XlsxFont(Some("1F4E78"), bold = true)), Some("D9D9D9")),
    destinations = XlsxCellStyle(Some(XlsxFont(Some("808080"), bold = true)), Some("D9D9D9")),
    columnNames = XlsxCellStyle(Some(XlsxFont(bold = true)), Some("F2F2F2")),
    units = XlsxCellStyle(None, Some("F2F2F2")),
    values = XlsxCellStyle())
}

/** Minimal XLSX read/write with zero dependencies beyond the JDK
  * (java.util.zip + javax.xml.stream). The XLSX container is public
  * ECMA-376: a zip of XML parts. Functional analog of the reference's
  * read_excel/write_excel (pdtable/io/excel.py):
  *
  *  - write: all tables into one worksheet, blocks separated by `sepLines`
  *    blank rows; strings as inline strings, numbers/booleans as native
  *    cells, datetimes as ISO strings (the datetime column parser accepts
  *    them on read); optional per-table-part styling via [[XlsxStyles]]
  *    (a real styles.xml part with fonts/fills/cellXfs).
  *  - read: every worksheet's cell grid → the same block parser as CSV;
  *    `sheetNamePattern` filters sheets (reference: excel.py:28-108).
  *
  * Large workbooks: the container is written through java.util.zip, which
  * emits ZIP64 records automatically once entry sizes or counts exceed the
  * classic limits — >4 GB workbooks need no opt-in flag (unlike the
  * reference's xlsxwriter backend, excel.py:194-196 `use_zip64`); validated
  * by the ZIP64 round-trip in XlsxSpec.
  *
  * Not supported: number-format-driven date detection in foreign files.
  */
object Xlsx {

  // ------------------------------------------------------------------ write

  private def colRef(i: Int): String = {
    var n = i + 1; val sb = new StringBuilder
    while (n > 0) { val r = (n - 1) % 26; sb.insert(0, ('A' + r).toChar); n = (n - 1) / 26 }
    sb.toString
  }

  private def xmlEscape(s: String): String =
    s.flatMap {
      case '<' => "&lt;"; case '>' => "&gt;"; case '&' => "&amp;"
      case '"' => "&quot;"; case c => c.toString
    }

  /** Render tables to worksheet rows of (value, styleId), reusing the CSV
    * writer's value representation rules (na_rep, onoff → 0/1, sealing).
    * Style ids come from `part`: table part name → cellXfs index (0 = none).
    * Transposed layout styles per CELL (name/unit run down the first two
    * columns — reference: _excel_openpyxl.py:166-175). */
  private def tableGrid(t: StarTable, naRep: String,
                        part: String => Int,
                        valueFmt: String => Int): Seq[Seq[(Any, Int)]] = {
    val units = t.units
    val rows = t.df.collect()
    val sName = part("table_name"); val sDest = part("destinations")
    val sCol = part("column_names"); val sUnit = part("units")
    val sVal = part("values")
    // per-column value style: the column's declared display format becomes a
    // real number format on its value cells (reference honors num_format in
    // its Excel writers — _excel_xlsxwriter.py:91-94)
    val colStyle: Seq[Int] = t.columnNames.map { c =>
      t.colMeta(c).displayFormat.flatMap(XlsxNumFmt.fromColumnFormat) match {
        case Some(code) => valueFmt(code)
        case None       => sVal
      }
    }
    if (t.meta.transposed) {
      val header: Seq[Seq[(Any, Int)]] = Seq(
        Seq((s"**${t.name}*", sName)),
        Seq((t.destinations.mkString(" "), sDest)))
      val body = t.columnNames.zipWithIndex.map { case (c, ci) =>
        Seq((c: Any, sCol), (units(ci): Any, sUnit)) ++
          rows.map(r => (CsvWriter.represent(r.get(ci), units(ci), ci, naRep), colStyle(ci)))
      }
      header ++ body
    } else {
      val header: Seq[Seq[(Any, Int)]] = Seq(
        Seq((s"**${t.name}", sName)),
        Seq((t.destinations.mkString(" "), sDest)),
        t.columnNames.map(c => (c: Any, sCol)),
        units.map(u => (u: Any, sUnit)))
      val body = rows.toIndexedSeq.map { r =>
        t.columnNames.indices.map(ci =>
          (CsvWriter.represent(r.get(ci), units(ci), ci, naRep), colStyle(ci)))
      }
      header ++ body
    }
  }

  private def cellXml(ref: String, v: Any, styleId: Int): String = {
    val s = if (styleId > 0) s""" s="$styleId"""" else ""
    v match {
      case null => ""
      case b: Boolean =>
        s"""<c r="$ref"$s t="b"><v>${if (b) 1 else 0}</v></c>"""
      case n: Int    => s"""<c r="$ref"$s><v>$n</v></c>"""
      case n: Long   => s"""<c r="$ref"$s><v>$n</v></c>"""
      case n: Double => s"""<c r="$ref"$s><v>$n</v></c>"""
      case ts: java.sql.Timestamp =>
        s"""<c r="$ref"$s t="inlineStr"><is><t>${xmlEscape(CsvWriter.formatTimestamp(ts))}</t></is></c>"""
      case other =>
        s"""<c r="$ref"$s t="inlineStr"><is><t xml:space="preserve">${xmlEscape(other.toString)}</t></is></c>"""
    }
  }

  /** Normalize "RRGGBB" / "AARRGGBB" to the ARGB form styles.xml wants. */
  private def argb(c: String): String = if (c.length == 8) c else "FF" + c

  /** styles.xml plus the cellXfs resolvers: per table part (row-major and
    * transposed — the latter default-center units/values) and per value
    * number-format code (each declared column format gets a values-style
    * variant carrying its numFmtId). */
  private final case class StyleIndex(xml: String,
      rowPart: String => Int, transPart: String => Int,
      rowValueFmt: String => Int, transValueFmt: String => Int)

  private def buildStyles(spec: XlsxStyles, valueFmtCodes: Seq[String]): StyleIndex = {
    val partsRow: Seq[(String, XlsxCellStyle)] = Seq(
      "table_name" -> spec.tableName, "destinations" -> spec.destinations,
      "column_names" -> spec.columnNames, "units" -> spec.units,
      "values" -> spec.values)
    val partsTrans: Seq[(String, XlsxCellStyle)] = Seq(
      "table_name" -> spec.tableName, "destinations" -> spec.destinations,
      "column_names" -> spec.columnNames,
      "units" -> spec.units.withDefaultAlignment("center"),
      "values" -> spec.values.withDefaultAlignment("center"))
    val rowValue: Seq[(String, XlsxCellStyle)] =
      valueFmtCodes.map(c => c -> spec.values.copy(numberFormat = Some(c)))
    val transValue: Seq[(String, XlsxCellStyle)] =
      valueFmtCodes.map(c =>
        c -> spec.values.withDefaultAlignment("center").copy(numberFormat = Some(c)))

    val distinct = (partsRow ++ partsTrans ++ rowValue ++ transValue)
      .map(_._2).filterNot(_.isPlain).distinct
    val fonts = distinct.flatMap(_.font).distinct
    val fills = distinct.flatMap(_.fillColor).distinct
    // custom number formats (not in the ECMA builtin registry) get ids ≥ 164
    val customCodes = distinct.flatMap(_.numberFormat).distinct
      .filterNot(XlsxNumFmt.builtinIds.contains)

    def fontId(f: Option[XlsxFont]): Int = f.map(fonts.indexOf(_) + 1).getOrElse(0)
    def fillId(c: Option[String]): Int = c.map(fills.indexOf(_) + 2).getOrElse(0)
    def numFmtId(c: Option[String]): Int = c match {
      case None => 0
      case Some(code) => XlsxNumFmt.builtinIds.getOrElse(code,
        XlsxNumFmt.customBase + customCodes.indexOf(code))
    }
    def xfId(st: XlsxCellStyle): Int =
      if (st.isPlain) 0 else distinct.indexOf(st) + 1

    val numFmtsXml =
      if (customCodes.isEmpty) ""
      else s"""<numFmts count="${customCodes.size}">""" +
        customCodes.map(c =>
          s"""<numFmt numFmtId="${numFmtId(Some(c))}" formatCode="${xmlEscape(c)}"/>""").mkString +
        "</numFmts>"
    val fontXml = ("<font/>" +: fonts.map { f =>
      "<font>" + (if (f.bold) "<b/>" else "") + (if (f.italic) "<i/>" else "") +
        f.color.map(c => s"""<color rgb="${argb(c)}"/>""").getOrElse("") + "</font>"
    }).mkString
    val fillXml = (Seq(
      """<fill><patternFill patternType="none"/></fill>""",
      """<fill><patternFill patternType="gray125"/></fill>""") ++
      fills.map(c =>
        s"""<fill><patternFill patternType="solid"><fgColor rgb="${argb(c)}"/><bgColor indexed="64"/></patternFill></fill>""")).mkString
    val xfXml = ("""<xf numFmtId="0" fontId="0" fillId="0" borderId="0" xfId="0"/>""" +:
      distinct.map { st =>
        val align = st.horizontalAlignment
          .map(h => s"""<alignment horizontal="$h"/>""").getOrElse("")
        s"""<xf numFmtId="${numFmtId(st.numberFormat)}" fontId="${fontId(st.font)}" fillId="${fillId(st.fillColor)}" borderId="0" xfId="0"""" +
          (if (st.numberFormat.nonEmpty) """ applyNumberFormat="1"""" else "") +
          (if (st.font.nonEmpty) """ applyFont="1"""" else "") +
          (if (st.fillColor.nonEmpty) """ applyFill="1"""" else "") +
          (if (align.nonEmpty) s""" applyAlignment="1">$align</xf>""" else "/>")
      }).mkString

    val xml =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<styleSheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">""" +
        numFmtsXml +
        s"""<fonts count="${fonts.size + 1}">$fontXml</fonts>""" +
        s"""<fills count="${fills.size + 2}">$fillXml</fills>""" +
        """<borders count="1"><border><left/><right/><top/><bottom/><diagonal/></border></borders>""" +
        """<cellStyleXfs count="1"><xf numFmtId="0" fontId="0" fillId="0" borderId="0"/></cellStyleXfs>""" +
        s"""<cellXfs count="${distinct.size + 1}">$xfXml</cellXfs>""" +
        """</styleSheet>"""

    val rowMap = partsRow.map { case (n, st) => n -> xfId(st) }.toMap
    val transMap = partsTrans.map { case (n, st) => n -> xfId(st) }.toMap
    val rowValueMap = rowValue.map { case (c, st) => c -> xfId(st) }.toMap
    val transValueMap = transValue.map { case (c, st) => c -> xfId(st) }.toMap
    StyleIndex(xml, rowMap, transMap,
      c => rowValueMap.getOrElse(c, rowMap("values")),
      c => transValueMap.getOrElse(c, transMap("values")))
  }

  /** Write tables to an xlsx file (single sheet, `sepLines` blank rows
    * between blocks; reference default layout). `styles` applies per-part
    * styling (pass [[XlsxStyles.default]] for the reference's styles=True). */
  def write(tables: Seq[StarTable], path: Path, naRep: String = "-",
            sepLines: Int = 1, styles: Option[XlsxStyles] = None): Unit =
    writeSheets(Seq("Sheet1" -> tables), path, naRep, sepLines, styles)

  /** Write tables to named worksheets (reference: write_excel's
    * Dict[sheet_name, tables] form, excel.py:116-140). */
  def writeSheets(sheets: Seq[(String, Seq[StarTable])], path: Path,
                  naRep: String = "-", sepLines: Int = 1,
                  styles: Option[XlsxStyles] = None): Unit = {
    // Columns with a declared display format need number-format styles even
    // when no part styling was requested — a styles.xml with only numFmts.
    val fmtCodes = sheets.flatMap(_._2).flatMap(t =>
      t.columnNames.flatMap(c =>
        t.colMeta(c).displayFormat.flatMap(XlsxNumFmt.fromColumnFormat))).distinct
    val effStyles =
      if (styles.isEmpty && fmtCodes.nonEmpty) Some(XlsxStyles()) else styles
    val idx = effStyles match {
      case Some(spec) => buildStyles(spec, fmtCodes)
      case None =>
        val zero = (_: String) => 0
        StyleIndex("", zero, zero, zero, zero)
    }
    def sheetXml(tables: Seq[StarTable]): String = {
      val grids = tables.map(t =>
        if (t.meta.transposed) tableGrid(t, naRep, idx.transPart, idx.transValueFmt)
        else tableGrid(t, naRep, idx.rowPart, idx.rowValueFmt))
      val allRows: Seq[Seq[(Any, Int)]] = grids.zipWithIndex.flatMap { case (g, i) =>
        if (i == 0) g else Seq.fill(sepLines)(Seq.empty[(Any, Int)]) ++ g
      }
      val sb = new StringBuilder
      sb.append("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""")
      sb.append("""<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>""")
      allRows.zipWithIndex.foreach { case (row, r) =>
        sb.append(s"""<row r="${r + 1}">""")
        row.zipWithIndex.foreach { case ((v, sid), c) =>
          sb.append(cellXml(s"${colRef(c)}${r + 1}", v, sid))
        }
        sb.append("</row>")
      }
      sb.append("</sheetData></worksheet>")
      sb.toString
    }

    val n = sheets.size
    val withStyles = effStyles.nonEmpty
    val contentTypes =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
        |<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
        |<Default Extension="xml" ContentType="application/xml"/>
        |<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
        |""".stripMargin +
        (if (withStyles)
          """<Override PartName="/xl/styles.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.styles+xml"/>""" + "\n"
        else "") +
        (1 to n).map(i =>
          s"""<Override PartName="/xl/worksheets/sheet$i.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>""")
          .mkString("\n") +
        "\n</Types>"
    val rels =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
        |</Relationships>""".stripMargin
    val workbook =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
        |<sheets>""".stripMargin +
        sheets.zipWithIndex.map { case ((name, _), i) =>
          s"""<sheet name="${xmlEscape(name)}" sheetId="${i + 1}" r:id="rId${i + 1}"/>"""
        }.mkString +
        "</sheets></workbook>"
    val wbRels =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        |""".stripMargin +
        ((1 to n).map(i =>
          s"""<Relationship Id="rId$i" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet$i.xml"/>""") ++
          (if (withStyles)
            Seq(s"""<Relationship Id="rId${n + 1}" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/styles" Target="styles.xml"/>""")
          else Nil))
          .mkString("\n") +
        "\n</Relationships>"

    val out: OutputStream = Files.newOutputStream(path)
    val zip = new ZipOutputStream(out)
    def part(name: String, content: String): Unit = {
      zip.putNextEntry(new ZipEntry(name))
      zip.write(content.getBytes("UTF-8"))
      zip.closeEntry()
    }
    try {
      part("[Content_Types].xml", contentTypes)
      part("_rels/.rels", rels)
      part("xl/workbook.xml", workbook)
      part("xl/_rels/workbook.xml.rels", wbRels)
      if (withStyles) part("xl/styles.xml", idx.xml)
      sheets.zipWithIndex.foreach { case ((_, tables), i) =>
        part(s"xl/worksheets/sheet${i + 1}.xml", sheetXml(tables))
      }
    } finally zip.close()
  }

  // ------------------------------------------------------------------- read

  private def parseRef(ref: String): Int = { // column index from "BC12"
    var i = 0; var c = 0
    while (i < ref.length && ref(i).isLetter) { c = c * 26 + (ref(i) - 'A' + 1); i += 1 }
    c - 1
  }

  /** Parse one worksheet XML into a cell grid (typed values: Double for
    * numeric cells, Boolean for b-cells, Timestamp for date-styled
    * numerics, String otherwise; null gaps).
    *
    * Foreign-workbook fidelity (files written by Excel/openpyxl, not this
    * library): rows ABSENT from sheetData are blank rows — they are
    * synthesized from the `r` row indices, because a blank row is a block
    * terminator and dropping it would merge adjacent blocks; formula
    * cells contribute their CACHED `<v>` value (`<f>` text is ignored);
    * numeric cells whose style is a date number format are converted from
    * the Excel day serial (1899-12-30 epoch, or 1904-01-01 under
    * date1904) to a Timestamp, rounded to the millisecond — Excel's own
    * effective resolution, which also absorbs writer µs noise. */
  private def parseSheet(in: InputStream, shared: IndexedSeq[String],
                         dateStyle: Int => Boolean = _ => false,
                         date1904: Boolean = false): Seq[Seq[Any]] = {
    val f = javax.xml.stream.XMLInputFactory.newInstance()
    f.setProperty(javax.xml.stream.XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    f.setProperty(javax.xml.stream.XMLInputFactory.SUPPORT_DTD, false)
    val r = f.createXMLStreamReader(in)
    val rows = mutable.ArrayBuffer.empty[Seq[Any]]
    var row: mutable.ArrayBuffer[Any] = null
    var cellType = ""
    var cellStyle = -1
    var cellCol = 0
    var inV = false; var inT = false; var inF = false
    val text = new StringBuilder
    val serialEpoch =
      if (date1904) java.time.LocalDateTime.of(1904, 1, 1, 0, 0)
      else java.time.LocalDateTime.of(1899, 12, 30, 0, 0)
    while (r.hasNext) {
      r.next() match {
        case javax.xml.stream.XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "row" =>
              // synthesize skipped (blank) rows from the 1-based index
              Option(r.getAttributeValue(null, "r")).map(_.toInt).foreach { ri =>
                while (rows.size < ri - 1) rows += Seq.empty[Any]
              }
              row = mutable.ArrayBuffer.empty[Any]
            case "c" =>
              cellType = Option(r.getAttributeValue(null, "t")).getOrElse("")
              cellStyle = Option(r.getAttributeValue(null, "s"))
                .map(_.toInt).getOrElse(-1)
              cellCol = Option(r.getAttributeValue(null, "r")).map(parseRef)
                .getOrElse(row.size)
              text.clear()
            case "f" => inF = true
            case "v" => inV = true; text.clear()
            case "t" => inT = true; text.clear()
            case _ => ()
          }
        case javax.xml.stream.XMLStreamConstants.CHARACTERS =>
          if ((inV || inT) && !inF) text.append(r.getText)
        case javax.xml.stream.XMLStreamConstants.END_ELEMENT =>
          r.getLocalName match {
            case "f" => inF = false
            case "v" | "t" =>
              val raw = text.toString
              val value: Any = cellType match {
                case "b"         => raw.trim == "1"
                case "s"         => shared(raw.trim.toInt)
                case "inlineStr" => raw
                case "str"       => raw
                case _ =>
                  try {
                    val d = java.lang.Double.valueOf(raw.trim)
                    if (cellStyle >= 0 && dateStyle(cellStyle))
                      java.sql.Timestamp.valueOf(serialEpoch.plus(
                        Math.round(d * 86400000.0),
                        java.time.temporal.ChronoUnit.MILLIS))
                    else d
                  } catch { case _: NumberFormatException => raw }
              }
              if (r.getLocalName == "v" || cellType == "inlineStr") {
                while (row.size < cellCol) row += null
                if (row.size == cellCol) row += value else row(cellCol) = value
              }
              inV = false; inT = false
            case "row" => rows += row.toSeq; row = null
            case _ => ()
          }
        case _ => ()
      }
    }
    r.close()
    rows.toSeq
  }

  /** Builtin date/time numFmtIds (ECMA-376 §18.8.30). */
  private val builtinDateFmts: Set[Int] =
    ((14 to 22) ++ (27 to 36) ++ (45 to 47) ++ (50 to 58)).toSet

  /** A custom format code denotes a date/time when it contains y/m/d/h/s
    * tokens outside quoted literals and color/condition brackets. A
    * bracketed h/m/s token (`[h]`, `[mm]`, `[ss]`) is Excel's ELAPSED
    * DURATION marker — such cells are numbers of days, not dates, and
    * must NOT be converted to epoch timestamps. */
  private[graft] def isDateFormatCode(code: String): Boolean = {
    val sb = new StringBuilder
    val bracket = new StringBuilder
    var inQuote = false; var inBracket = false; var i = 0
    while (i < code.length) {
      val ch = code.charAt(i)
      if (ch == '"') inQuote = !inQuote
      else if (!inQuote && ch == '[') { inBracket = true; bracket.clear() }
      else if (!inQuote && ch == ']') {
        inBracket = false
        if (bracket.nonEmpty &&
            bracket.forall(c => "hmsHMS".indexOf(c) >= 0))
          return false // elapsed-duration format: numeric, not a date
      }
      else if (!inQuote && inBracket) bracket.append(ch)
      else if (!inQuote) {
        if (ch == '\\') i += 1 // escaped literal
        else sb.append(Character.toLowerCase(ch))
      }
      i += 1
    }
    val s = sb.toString
    s.exists(c => c == 'y' || c == 'd' || c == 'h') ||
      (s.contains('m') && !s.contains('#') && !s.contains('0')) ||
      s.contains("ss")
  }

  /** cellXf index → "is a date style", from styles.xml (numFmts custom
    * codes + cellXfs numFmtIds). Absent/unparsable styles → never a date. */
  private def parseDateStyles(bytes: Array[Byte]): Int => Boolean = {
    try {
      val f = javax.xml.stream.XMLInputFactory.newInstance()
      val r = f.createXMLStreamReader(new java.io.ByteArrayInputStream(bytes))
      val customDate = mutable.Set.empty[Int]
      val xfFmt = mutable.ArrayBuffer.empty[Int]
      var inCellXfs = false
      while (r.hasNext) {
        r.next() match {
          case javax.xml.stream.XMLStreamConstants.START_ELEMENT =>
            r.getLocalName match {
              case "numFmt" =>
                val id = Option(r.getAttributeValue(null, "numFmtId")).map(_.toInt)
                val code = Option(r.getAttributeValue(null, "formatCode"))
                for (i <- id; c <- code; if isDateFormatCode(c)) customDate += i
              case "cellXfs" => inCellXfs = true
              case "xf" if inCellXfs =>
                xfFmt += Option(r.getAttributeValue(null, "numFmtId"))
                  .map(_.toInt).getOrElse(0)
              case _ => ()
            }
          case javax.xml.stream.XMLStreamConstants.END_ELEMENT =>
            if (r.getLocalName == "cellXfs") inCellXfs = false
          case _ => ()
        }
      }
      r.close()
      val fmts = xfFmt.toIndexedSeq
      (s: Int) => s >= 0 && s < fmts.size &&
        (builtinDateFmts.contains(fmts(s)) || customDate.contains(fmts(s)))
    } catch { case _: Exception => _ => false }
  }

  /** Read an xlsx file as a block stream: each matching sheet's cell grid is
    * run through the standard block parser. */
  def read(
      path: Path,
      sheetNamePattern: Option[scala.util.matching.Regex] = None,
      fixer: ParseFixer = new ParseFixer(),
      issueTracker: InputIssueTracker = new NullInputIssueTracker(),
      loadItem: Option[LoadItem] = None,
      to: String = "pdtable"
  ): Iterator[(BlockType, Block)] = {
    // Pass 1: collect parts (sheets may precede sharedStrings in the zip)
    val sheets = mutable.LinkedHashMap.empty[String, Array[Byte]]
    var sharedRaw: Option[Array[Byte]] = None
    var workbookRaw: Option[Array[Byte]] = None
    var wbRelsRaw: Option[Array[Byte]] = None
    var stylesRaw: Option[Array[Byte]] = None
    val zin = new ZipInputStream(Files.newInputStream(path))
    try {
      var e = zin.getNextEntry
      while (e != null) {
        if (e.getName.startsWith("xl/worksheets/") && e.getName.endsWith(".xml"))
          sheets(e.getName) = zin.readAllBytes()
        else if (e.getName == "xl/sharedStrings.xml")
          sharedRaw = Some(zin.readAllBytes())
        else if (e.getName == "xl/workbook.xml")
          workbookRaw = Some(zin.readAllBytes())
        else if (e.getName == "xl/_rels/workbook.xml.rels")
          wbRelsRaw = Some(zin.readAllBytes())
        else if (e.getName == "xl/styles.xml")
          stylesRaw = Some(zin.readAllBytes())
        e = zin.getNextEntry
      }
    } finally zin.close()

    // Resolve real sheet names: workbook.xml gives (name, r:id); the rels
    // part maps r:id → worksheets/sheetN.xml.
    val sheetNameByPath: Map[String, String] = (for {
      wb <- workbookRaw.toSeq
      rels <- wbRelsRaw.toSeq
    } yield {
      def attrs(bytes: Array[Byte], elem: String, keys: Seq[String]): Seq[Map[String, String]] = {
        val f = javax.xml.stream.XMLInputFactory.newInstance()
        val r = f.createXMLStreamReader(new java.io.ByteArrayInputStream(bytes))
        val out = mutable.ArrayBuffer.empty[Map[String, String]]
        while (r.hasNext) {
          if (r.next() == javax.xml.stream.XMLStreamConstants.START_ELEMENT &&
              r.getLocalName == elem) {
            out += keys.flatMap { k =>
              (0 until r.getAttributeCount)
                .find(i => r.getAttributeLocalName(i) == k)
                .map(i => k -> r.getAttributeValue(i))
            }.toMap
          }
        }
        out.toSeq
      }
      val targetById = attrs(rels, "Relationship", Seq("Id", "Target")).flatMap { m =>
        for (id <- m.get("Id"); t <- m.get("Target"))
          yield id -> ("xl/" + t.stripPrefix("/xl/").stripPrefix("xl/"))
      }.toMap
      attrs(wb, "sheet", Seq("name", "id")).flatMap { m =>
        for (n <- m.get("name"); rid <- m.get("id"); tgt <- targetById.get(rid))
          yield tgt -> n
      }.toMap
    }).headOption.getOrElse(Map.empty)

    val shared: IndexedSeq[String] = sharedRaw.map { bytes =>
      val f = javax.xml.stream.XMLInputFactory.newInstance()
      val r = f.createXMLStreamReader(new java.io.ByteArrayInputStream(bytes))
      val out = mutable.ArrayBuffer.empty[String]
      val sb = new StringBuilder
      var inT = false; var depth = 0
      while (r.hasNext) {
        r.next() match {
          case javax.xml.stream.XMLStreamConstants.START_ELEMENT =>
            if (r.getLocalName == "si") { sb.clear(); depth += 1 }
            else if (r.getLocalName == "t") inT = true
          case javax.xml.stream.XMLStreamConstants.CHARACTERS =>
            if (inT) sb.append(r.getText)
          case javax.xml.stream.XMLStreamConstants.END_ELEMENT =>
            if (r.getLocalName == "t") inT = false
            else if (r.getLocalName == "si") out += sb.toString
          case _ => ()
        }
      }
      out.toIndexedSeq
    }.getOrElse(IndexedSeq.empty)

    val dateStyle: Int => Boolean =
      stylesRaw.map(parseDateStyles).getOrElse(_ => false)
    val date1904: Boolean = workbookRaw.exists { bytes =>
      // <workbookPr date1904="1"/> switches the serial epoch (Mac legacy).
      // Read the ATTRIBUTE off the workbookPr element via StAX — a regex
      // over the whole workbook.xml would false-positive on the token
      // appearing in any attribute or text (e.g. a sheet NAMED
      // 'date1904="1"') and silently shift every date cell ~4 years.
      val f = javax.xml.stream.XMLInputFactory.newInstance()
      f.setProperty(javax.xml.stream.XMLInputFactory.SUPPORT_DTD, false)
      val r = f.createXMLStreamReader(new java.io.ByteArrayInputStream(bytes))
      var found = false
      try {
        while (!found && r.hasNext) {
          if (r.next() == javax.xml.stream.XMLStreamConstants.START_ELEMENT &&
              r.getLocalName == "workbookPr") {
            val v = Option(r.getAttributeValue(null, "date1904"))
            found = v.contains("1") || v.contains("true")
          }
        }
      } finally r.close()
      found
    }

    val item = loadItem.getOrElse(LoadItem(path.toString, None))
    sheets.iterator.flatMap { case (name, bytes) =>
      val sheetName = sheetNameByPath.getOrElse(name,
        name.stripPrefix("xl/worksheets/").stripSuffix(".xml"))
      if (sheetNamePattern.exists(p => !p.matches(sheetName))) Iterator.empty
      else {
        val grid = parseSheet(new java.io.ByteArrayInputStream(bytes), shared,
          dateStyle, date1904)
        val sheet = LocationSheet(FilesystemLocationFile(path, item), Some(sheetName))
        Blocks.parseBlocks(grid.iterator, sheet, Blocks.handlersFor(to), None,
          fixer, issueTracker)
      }
    }
  }

  def readBundle(spark: SparkSession, path: Path,
                 sheetNamePattern: Option[scala.util.matching.Regex] = None): TableBundle =
    TableBundle.fromBlocks(spark, read(path, sheetNamePattern))
}
