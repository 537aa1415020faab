package graft.io

import java.io.{InputStream, OutputStream}
import java.nio.file.{Files, Path}
import java.util.zip.{ZipEntry, ZipInputStream, ZipOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.SparkSession

import graft.model.{StarTable, TableBundle}
import graft.origin._
import graft.parse._

/** Minimal XLSX read/write with zero dependencies beyond the JDK
  * (java.util.zip + javax.xml.stream). The XLSX container is public
  * ECMA-376: a zip of XML parts. Functional analog of the reference's
  * read_excel/write_excel (pdtable/io/excel.py) for unstyled data:
  *
  *  - write: all tables into one worksheet, blocks separated by a blank row
  *    (the reference's default single-sheet layout); strings as inline
  *    strings, numbers/booleans as native cells, datetimes as ISO strings
  *    (the datetime column parser accepts them on read).
  *  - read: every worksheet's cell grid → the same block parser as CSV;
  *    `sheetNamePattern` filters sheets (reference: excel.py:28-108).
  *
  * Not supported (styled-output surface of the reference): cell styles,
  * number-format-driven date detection in foreign files, zip64 (>4 GB).
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

  /** Render tables to worksheet rows (cell grids), reusing the CSV writer's
    * value representation rules (na_rep, onoff → 0/1, sealing). */
  private def tableGrid(t: StarTable, naRep: String): Seq[Seq[Any]] = {
    val units = t.units
    val rows = t.df.collect()
    val header: Seq[Seq[Any]] =
      if (t.meta.transposed)
        Seq(Seq(s"**${t.name}*"), Seq(t.destinations.mkString(" ")))
      else
        Seq(Seq(s"**${t.name}"), Seq(t.destinations.mkString(" ")),
          t.columnNames, units)
    val body: Seq[Seq[Any]] =
      if (t.meta.transposed)
        t.columnNames.zipWithIndex.map { case (c, ci) =>
          Seq(c, units(ci)) ++ rows.map(r => CsvWriter.represent(r.get(ci), units(ci), ci, naRep))
        }
      else
        rows.toIndexedSeq.map { r =>
          t.columnNames.indices.map(ci => CsvWriter.represent(r.get(ci), units(ci), ci, naRep))
        }
    header ++ body
  }

  private def cellXml(ref: String, v: Any): String = v match {
    case null => ""
    case b: Boolean =>
      s"""<c r="$ref" t="b"><v>${if (b) 1 else 0}</v></c>"""
    case n: Int    => s"""<c r="$ref"><v>$n</v></c>"""
    case n: Long   => s"""<c r="$ref"><v>$n</v></c>"""
    case n: Double => s"""<c r="$ref"><v>$n</v></c>"""
    case ts: java.sql.Timestamp =>
      s"""<c r="$ref" t="inlineStr"><is><t>${xmlEscape(CsvWriter.formatTimestamp(ts))}</t></is></c>"""
    case s =>
      s"""<c r="$ref" t="inlineStr"><is><t xml:space="preserve">${xmlEscape(s.toString)}</t></is></c>"""
  }

  /** Write tables to an xlsx file (single sheet, blank rows between
    * blocks; reference default layout). */
  def write(tables: Seq[StarTable], path: Path, naRep: String = "-",
            sepLines: Int = 1): Unit =
    writeSheets(Seq("Sheet1" -> tables), path, naRep, sepLines)

  /** Write tables to named worksheets (reference: write_excel's
    * Dict[sheet_name, tables] form, excel.py:116-140). */
  def writeSheets(sheets: Seq[(String, Seq[StarTable])], path: Path,
                  naRep: String = "-", sepLines: Int = 1): Unit = {
    def sheetXml(tables: Seq[StarTable]): String = {
      val grids = tables.map(tableGrid(_, naRep))
      val allRows: Seq[Seq[Any]] = grids.zipWithIndex.flatMap { case (g, i) =>
        if (i == 0) g else Seq.fill(sepLines)(Seq.empty[Any]) ++ g
      }
      val sb = new StringBuilder
      sb.append("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""")
      sb.append("""<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>""")
      allRows.zipWithIndex.foreach { case (row, r) =>
        sb.append(s"""<row r="${r + 1}">""")
        row.zipWithIndex.foreach { case (v, c) =>
          sb.append(cellXml(s"${colRef(c)}${r + 1}", v))
        }
        sb.append("</row>")
      }
      sb.append("</sheetData></worksheet>")
      sb.toString
    }

    val n = sheets.size
    val contentTypes =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
        |<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
        |<Default Extension="xml" ContentType="application/xml"/>
        |<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
        |""".stripMargin +
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
        (1 to n).map(i =>
          s"""<Relationship Id="rId$i" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet$i.xml"/>""")
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
    * numeric cells, Boolean for b-cells, String otherwise; null gaps). */
  private def parseSheet(in: InputStream, shared: IndexedSeq[String]): Seq[Seq[Any]] = {
    val f = javax.xml.stream.XMLInputFactory.newInstance()
    f.setProperty(javax.xml.stream.XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    f.setProperty(javax.xml.stream.XMLInputFactory.SUPPORT_DTD, false)
    val r = f.createXMLStreamReader(in)
    val rows = mutable.ArrayBuffer.empty[Seq[Any]]
    var row: mutable.ArrayBuffer[Any] = null
    var cellType = ""
    var cellCol = 0
    var inV = false; var inT = false
    val text = new StringBuilder
    while (r.hasNext) {
      r.next() match {
        case javax.xml.stream.XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "row" => row = mutable.ArrayBuffer.empty[Any]
            case "c" =>
              cellType = Option(r.getAttributeValue(null, "t")).getOrElse("")
              cellCol = Option(r.getAttributeValue(null, "r")).map(parseRef)
                .getOrElse(row.size)
              text.clear()
            case "v" => inV = true; text.clear()
            case "t" => inT = true; text.clear()
            case _ => ()
          }
        case javax.xml.stream.XMLStreamConstants.CHARACTERS =>
          if (inV || inT) text.append(r.getText)
        case javax.xml.stream.XMLStreamConstants.END_ELEMENT =>
          r.getLocalName match {
            case "v" | "t" =>
              val raw = text.toString
              val value: Any = cellType match {
                case "b"         => raw.trim == "1"
                case "s"         => shared(raw.trim.toInt)
                case "inlineStr" => raw
                case "str"       => raw
                case _ =>
                  try java.lang.Double.valueOf(raw.trim)
                  catch { case _: NumberFormatException => raw }
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

  /** Read an xlsx file as a block stream: each matching sheet's cell grid is
    * run through the standard block parser. */
  def read(
      path: Path,
      sheetNamePattern: Option[scala.util.matching.Regex] = None,
      fixer: ParseFixer = new ParseFixer(),
      issueTracker: InputIssueTracker = new NullInputIssueTracker(),
      loadItem: Option[LoadItem] = None
  ): Iterator[(BlockType, Block)] = {
    // Pass 1: collect parts (sheets may precede sharedStrings in the zip)
    val sheets = mutable.LinkedHashMap.empty[String, Array[Byte]]
    var sharedRaw: Option[Array[Byte]] = None
    var workbookRaw: Option[Array[Byte]] = None
    var wbRelsRaw: Option[Array[Byte]] = None
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

    val item = loadItem.getOrElse(LoadItem(path.toString, None))
    sheets.iterator.flatMap { case (name, bytes) =>
      val sheetName = sheetNameByPath.getOrElse(name,
        name.stripPrefix("xl/worksheets/").stripSuffix(".xml"))
      if (sheetNamePattern.exists(p => !p.matches(sheetName))) Iterator.empty
      else {
        val grid = parseSheet(new java.io.ByteArrayInputStream(bytes), shared)
        val sheet = LocationSheet(FilesystemLocationFile(path, item), Some(sheetName))
        Blocks.parseBlocks(grid.iterator, sheet, Blocks.defaultHandlers, None,
          fixer, issueTracker)
      }
    }
  }

  def readBundle(spark: SparkSession, path: Path,
                 sheetNamePattern: Option[scala.util.matching.Regex] = None): TableBundle =
    TableBundle.fromBlocks(spark, read(path, sheetNamePattern))
}
