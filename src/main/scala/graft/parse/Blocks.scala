package graft.parse

import scala.collection.immutable.ListMap
import scala.collection.mutable.ArrayBuffer

import graft.origin._

/** StarTable block kinds (reference: pdtable/store.py:29-45). */
sealed trait BlockType
object BlockType {
  case object Directive extends BlockType
  case object Table extends BlockType
  case object TemplateRow extends BlockType
  case object Metadata extends BlockType
  case object Blank extends BlockType
  val all: Seq[BlockType] = Seq(Directive, Table, TemplateRow, Metadata, Blank)
}

/** A parsed block. */
sealed trait Block

/** File-level key:value block (reference: pdtable/auxiliary.py:7-14). */
final case class MetadataBlock(values: ListMap[String, String], origin: Option[String] = None)
    extends Block

/** `***name` directive + lines (reference: pdtable/auxiliary.py:17-25). */
final case class Directive(name: String, lines: Seq[String], origin: Option[String] = None)
    extends Block

/** Raw unparsed cell grid (reference: blocks.py:269-270 make_raw_cells). */
final case class RawCells(grid: Seq[Seq[Any]]) extends Block

/** Table as a JSON-ready data structure — the `to="jsondata"` parse target
  * (reference: blocks.py:255-266 make_table_json_data): {name, destinations,
  * columns: {col: {unit, values}}} with NaN/NaT → null, datetime → str. */
final case class JsonDataBlock(json: graft.io.JsonValue.JsonObject) extends Block

/** A fully parsed table block in columnar form — the analog of the
  * reference's JsonDataPrecursor (reference: blocks.py:116-221). Column order
  * is the file order; `columns(i)` aligns with `units(i)`. Values are
  * Spark-ready: String / java.lang.Boolean / java.sql.Timestamp /
  * java.lang.Double, with null for missing.
  */
final case class ParsedTable(
    name: String,
    destinations: Set[String],
    columnNames: Seq[String],
    units: Seq[String],
    columns: Seq[Seq[Any]],
    transposed: Boolean,
    origin: TableOrigin,
    strictTypes: Boolean = true
) extends Block {
  def numRows: Int = if (columns.isEmpty) 0 else columns.head.size
  /** Row-major view (for writers / createDataFrame). Columns are copied to
    * arrays first so the per-row indexing is O(1) even if a caller built
    * this with linked-list columns — without the copy a 100k-row table
    * costs O(rows²) here. */
  def rows: Seq[Seq[Any]] =
    if (columns.isEmpty) Nil
    else {
      val arrs = columns.map(_.toArray)
      (0 until numRows).map(i => arrs.map(_(i)))
    }
}

object Blocks {
  type CellGrid = Seq[Seq[Any]]
  type BlockHandler = (CellGrid, TableOrigin, ParseFixer) => Option[Block]
  type BlockFilter = (BlockType, String) => Boolean

  /** Marker regex (reference: blocks.py:386-399): `**table` / `***directive`
    * but not `****`; `:`-prefixed template rows; `key:` metadata. */
  private val markerRe =
    """^((?<!\*)(\*\*\*?)(?!\*)|((?<!:):{1,3}(?!:))[^:]*\s*$|([^:]+:)\s*$)""".r

  def isCellBlank(cell: Any): Boolean = cell match {
    case null      => true
    case s: String => s.trim.isEmpty
    case _         => false
  }

  /** Column names stop at the first blank cell — comments allowed after
    * (reference: blocks.py:86-94). */
  def parseColumnNames(raw: Seq[Any]): Seq[String] =
    raw.takeWhile(c => !isCellBlank(c)).map(_.toString.trim)

  /** reference: blocks.py:520-535. */
  def fixDuplicateColumnNames(raw: Seq[String], fixer: ParseFixer): Seq[String] = {
    val out = ArrayBuffer.empty[String]
    val seen = scala.collection.mutable.Set.empty[String]
    raw.zipWithIndex.foreach { case (cname0, col) =>
      var cname = cname0
      if (seen.contains(cname) || cname.isEmpty) {
        fixer.columnName = col.toString
        if (seen.contains(cname))
          cname = fixer.fixDuplicateColumnName(cname, out.toSeq)
      }
      seen += cname
      out += cname
    }
    out.toSeq
  }

  /** Parse a table cell grid into a ParsedTable
    * (port of make_table_json_precursor, reference: blocks.py:116-221). */
  def parseTableGrid(cells: CellGrid, origin: TableOrigin, fixer: ParseFixer): ParsedTable = {
    var tableName = cells.head.head.toString.drop(2)
    val transposed = tableName.endsWith("*")
    if (transposed) tableName = tableName.dropRight(1)
    fixer.tableName = tableName

    val destinations: Seq[String] =
      cells(1).head.toString.trim.split(" ").toSeq

    val tableIsEmpty = cells.size < 3
    val columnNamesRaw: Seq[String] =
      if (tableIsEmpty) Nil
      else if (transposed) parseColumnNames(cells.drop(2).map(_.headOption.orNull))
      else if (cells.size == 3)
        throw new IllegalArgumentException(
          s"Invalid table $tableName: no unit specification found")
      else parseColumnNames(cells(2))
    val columnNames = fixDuplicateColumnNames(columnNamesRaw, fixer)
    val nCol = columnNames.size

    val units: Seq[String] =
      if (tableIsEmpty) Nil
      else if (transposed) cells.slice(2, 2 + nCol).map(l => l(1).toString.trim)
      else cells(3).take(nCol).map(_.toString.trim)

    var dataRows: Seq[Seq[Any]] =
      if (transposed && !tableIsEmpty) {
        val dataLines = cells.slice(2, 2 + nCol).map(_.drop(2))
        val lenLongest = if (dataLines.isEmpty) 0 else dataLines.map(_.size).max
        // Find last non-blank data row (blocks.py:160-172)
        var nRow = 0
        var i = 0
        var stop = false
        while (i < lenLongest && !stop) {
          val hasNonBlank = dataLines.exists(l => l.size >= i + 1 && !isCellBlank(l(i)))
          if (hasNonBlank) { nRow = i + 1; i += 1 } else stop = true
        }
        // arrays: each line is indexed nRow times below — linked-list rows
        // would make the transpose O(nRow²)
        val padded = dataLines.map { l =>
          val a = new Array[Any](nRow)
          l.iterator.take(nRow).copyToArray(a)
          a
        }
        if (padded.isEmpty) Nil else (0 until nRow).map(r => padded.map(_(r)))
      } else if (!tableIsEmpty) {
        cells.drop(4).map(_.take(nCol))
      } else Nil

    // Pad short rows (blocks.py:185-192) — original cell values pass through
    // unchanged; only the "NaN" padding is appended (fix_missing_rows_in_
    // column_data parity; stringifying would corrupt typed Excel cells).
    dataRows = dataRows.zipWithIndex.map { case (row, iRow) =>
      if (row.size < nCol) fixer.fixMissingRowsInColumnData(iRow, row, nCol)
      else row
    }

    // Column-wise coercion (blocks.py:195-204). Parsed columns are pinned
    // to immutable ArraySeq: downstream consumers (the DSv2 whole-file
    // reader, `ParsedTable.rows`) index cells by row number, which on the
    // List this pipeline otherwise yields is O(row) per access — a 75k-row
    // block then costs O(rows²), ~300 µs/row measured at sf0.1.
    val colsData: Seq[Seq[Any]] = columnNames.indices.map { ci =>
      val name = columnNames(ci)
      val unit = units(ci)
      val values = dataRows.map(r => r(ci))
      fixer.columnName = name
      try scala.collection.immutable.ArraySeq.untagged.from(
        ColumnParsers.parseColumn(unit, values, fixer))
      catch {
        case e: IllegalArgumentException =>
          throw new IllegalArgumentException(
            s"Unable to parse value in column '$name' of table '$tableName' as '$unit'", e)
      }
    }

    fixer.report()

    ParsedTable(
      name = tableName,
      destinations = destinations.toSet,
      columnNames = columnNames,
      units = units,
      columns = colsData,
      transposed = transposed,
      origin = origin,
      strictTypes = fixer.strictTypes
    )
  }

  /** reference: blocks.py:54-61. */
  def makeMetadataBlock(cells: CellGrid, origin: TableOrigin): MetadataBlock = {
    var m = ListMap.empty[String, String]
    cells.foreach { row =>
      if (row.size > 1 && row.head != null) {
        val keyField = row.head.toString.trim
        if (keyField.nonEmpty && keyField.last == ':')
          m = m.updated(keyField.dropRight(1), Option(row(1)).map(_.toString.trim).getOrElse(""))
      }
    }
    MetadataBlock(m, Some(origin.toString))
  }

  /** reference: blocks.py:64-67. */
  def makeDirective(cells: CellGrid, origin: TableOrigin): Directive =
    Directive(
      cells.head.head.toString.drop(3),
      cells.drop(1).map(_.headOption.map(_.toString).getOrElse("")),
      Some(origin.toString))

  val defaultHandlers: Map[BlockType, BlockHandler] = Map(
    BlockType.Metadata -> ((g, o, _) => Some(makeMetadataBlock(g, o))),
    BlockType.Directive -> ((g, o, _) => Some(makeDirective(g, o))),
    BlockType.Table -> ((g, o, f) => Some(parseTableGrid(g, o, f))),
    // Template rows are "not yet implemented" in the reference; parity with
    // its legacy behavior is to surface them as raw cells (blocks.py:338-341)
    BlockType.TemplateRow -> ((g, _, _) => Some(RawCells(g)))
  )

  /** ParsedTable → the reference's JsonData shape (blocks.py:255-266):
    * units fold into per-column objects, values coerce to JSON scalars
    * (NaN/NaT → null, datetime → str, onoff → bool). */
  def parsedToJsonData(p: ParsedTable): graft.io.JsonValue.JsonObject = {
    import graft.io.JsonValue
    import graft.io.JsonValue._
    val cols = p.columnNames.zipWithIndex.map { case (c, ci) =>
      val values = p.columns(ci).toVector.map[JsonValue] {
        case null                     => JsonNull
        case d: Double if d.isNaN     => JsonNull
        case d: Double                => JsonNumber(d)
        case n: java.lang.Number      => JsonNumber(n.doubleValue())
        case b: java.lang.Boolean     => JsonBool(b)
        case ts: java.sql.Timestamp   =>
          JsonString(graft.io.CsvWriter.formatTimestamp(ts))
        case s                        => JsonString(s.toString)
      }
      c -> (JsonObject(ListMap(
        "unit" -> JsonString(p.units(ci)),
        "values" -> JsonArray(values))): JsonValue)
    }
    JsonObject(ListMap(
      "name" -> JsonString(p.name),
      "destinations" -> JsonObject(
        ListMap(p.destinations.toSeq.map(d => d -> (JsonNull: JsonValue)): _*)),
      "columns" -> JsonObject(ListMap(cols: _*))))
  }

  /** The `to=` TABLE-handler dispatch (reference: blocks.py:346-360
    * TABLE_HANDLERS + parse_blocks handler setup): "pdtable" → full parse,
    * "jsondata" → [[JsonDataBlock]], "cellgrid" → [[RawCells]]. */
  val tableHandlers: Map[String, BlockHandler] = Map(
    "pdtable" -> ((g, o, f) => Some(parseTableGrid(g, o, f))),
    "jsondata" -> ((g, o, f) => Some(JsonDataBlock(parsedToJsonData(parseTableGrid(g, o, f))))),
    "cellgrid" -> ((g, _, _) => Some(RawCells(g)))
  )

  /** Default handlers with the TABLE handler swapped per `to`; unknown
    * targets raise like the reference (blocks.py:352-356). */
  def handlersFor(to: String): Map[BlockType, BlockHandler] =
    defaultHandlers.updated(BlockType.Table, tableHandlers.getOrElse(to,
      throw new IllegalArgumentException(
        s"Unknown parsing output type '$to'; expected one of ${tableHandlers.keys.mkString(", ")}")))

  /** Wrap handlers with the early block filter: non-matching TABLE blocks cost
    * only a top-left-cell peek (reference: blocks.py:303-312 _apply_filter;
    * the analog of partition pruning). */
  def applyFilter(handlers: Map[BlockType, BlockHandler], filter: BlockFilter): Map[BlockType, BlockHandler] =
    handlers.map { case (bt, h) =>
      val wrapped: BlockHandler = (grid, origin, fixer) => {
        val name =
          if (bt == BlockType.Table) grid.head.head.toString.drop(2) else ""
        if (filter(bt, name)) h(grid, origin, fixer) else None
      }
      bt -> wrapped
    }

  /** The block state machine (port of parse_blocks_stable,
    * reference: blocks.py:402-517). Lazy: pulls cell rows one at a time so
    * large files can be read with early abort.
    */
  def parseBlocks(
      cellRows: Iterator[Seq[Any]],
      locationSheet: LocationSheet = NullLocationFile().makeLocationSheet(),
      handlers0: Map[BlockType, BlockHandler] = defaultHandlers,
      filter: Option[BlockFilter] = None,
      fixer: ParseFixer = new ParseFixer(),
      issueTracker: InputIssueTracker = new NullInputIssueTracker()
  ): Iterator[(BlockType, Block)] = {
    val handlers = filter.map(applyFilter(handlers0, _)).getOrElse(handlers0)
    fixer.origin = Some(locationSheet.file.loadIdentifier)

    def blockOutput(state: BlockType, grid: Seq[Seq[Any]], firstRow: Int): Option[(BlockType, Block)] = {
      if (grid.isEmpty) return None
      handlers.get(state).flatMap { handler =>
        val origin = TableOrigin.leaf(locationSheet.makeLocationBlock(firstRow))
        fixer.resetFixes()
        try handler(grid, origin, fixer).map(b => (state, b))
        catch {
          case e: IllegalArgumentException =>
            issueTracker.addError(e.getMessage, Some(origin))
            None
        }
      }
    }

    new Iterator[(BlockType, Block)] {
      private val rows = cellRows.zipWithIndex
      private var state: BlockType = BlockType.Metadata
      private var grid = ArrayBuffer.empty[Seq[Any]]
      private var firstRow = 0
      private var done = false
      private var pending: Option[(BlockType, Block)] = None

      private def advance(): Unit = {
        while (pending.isEmpty && !done) {
          if (!rows.hasNext) {
            pending = blockOutput(state, grid.toSeq, firstRow)
            grid.clear()
            done = true
          } else {
            val (row, rowNum) = rows.next()
            var nextState: Option[BlockType] = None
            var continueLoop = false

            if (row == null || row.isEmpty || isCellBlank(row.head)) {
              if (state != BlockType.Blank) nextState = Some(BlockType.Blank)
              else continueLoop = true
            } else row.head match {
              case s: String =>
                markerRe.findPrefixMatchOf(s) match {
                  case None =>
                    grid += row; continueLoop = true
                  case Some(m) =>
                    if (m.group(2) == "**") nextState = Some(BlockType.Table)
                    else if (m.group(2) == "***") nextState = Some(BlockType.Directive)
                    else if (m.group(4) != null) {
                      if (state == BlockType.Metadata) { grid += row; continueLoop = true }
                      else nextState = Some(BlockType.Blank)
                    } else nextState = Some(BlockType.TemplateRow)
                }
              case _ =>
                grid += row; continueLoop = true
            }

            if (!continueLoop && nextState.isDefined) {
              pending = blockOutput(state, grid.toSeq, firstRow)
              grid.clear()
              state = nextState.get
              firstRow = rowNum
              if (state != BlockType.Blank) grid += row
              else if (row.nonEmpty && !(row.size == 1 && isCellBlank(row.head)))
                grid += row
            }
          }
        }
      }

      def hasNext: Boolean = { advance(); pending.nonEmpty }
      def next(): (BlockType, Block) = {
        advance()
        val r = pending.getOrElse(throw new NoSuchElementException)
        pending = None
        r
      }
    }
  }
}
