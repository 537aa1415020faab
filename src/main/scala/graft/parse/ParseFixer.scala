package graft.parse

import scala.collection.mutable.ListBuffer

/** Pluggable auto-repair of parse irregularities
  * (reference: pdtable/io/parsers/fixer.py:8-149). Three hooks:
  *   - duplicate column name → unique replacement (`name_fixed_00N`)
  *   - short row → padded to column count
  *   - illegal cell value → type default (false / null / NaN)
  * Counts fixes; `stopOnErrors` raises at report() time.
  */
class ParseFixer extends Serializable {
  var verbose: Boolean = false
  private var _stopOnErrors: Boolean = false
  def stopOnErrors: Boolean = _stopOnErrors
  def stopOnErrors_=(v: Boolean): Unit = { if (v) verbose = true; _stopOnErrors = v }

  protected var errors = 0
  protected var warnings = 0
  val messages: ListBuffer[String] = ListBuffer.empty

  // Context info, set by the parser as it goes
  var origin: Option[String] = None
  var tableName: String = ""
  var columnName: String = ""
  var tableRow: Int = -1
  var strictTypes: Boolean = true

  def fixes: Int = errors + warnings
  def resetFixes(): Unit = { errors = 0; warnings = 0 }

  /** reference: fixer.py:70-88. */
  def fixDuplicateColumnName(columnName: String, inputColumns: Seq[String]): String = {
    val msg = s"Duplicate column '$columnName' at position ${this.columnName} " +
      s"in table '$tableName'."
    messages += msg
    if (verbose) println(msg)
    errors += 1
    (0 until 1000).iterator
      .map(sq => f"${columnName}_fixed_$sq%03d")
      .find(c => !inputColumns.contains(c))
      .getOrElse(s"$columnName-fixed")
  }

  /** reference: fixer.py:90-104. Pads with the literal string "NaN" so the
    * downstream column parser sees a missing-value marker; existing cells
    * pass through UNCHANGED (stringifying e.g. an Excel Timestamp cell would
    * corrupt it into an unparseable "...00:00:00.0" form). */
  def fixMissingRowsInColumnData(row: Int, rowData: Seq[Any], numColumns: Int): Seq[Any] = {
    val msg = s"Missing data in row $row of table '$tableName'"
    messages += msg
    if (verbose) println(msg)
    errors += 1
    rowData ++ Seq.fill(numColumns - rowData.size)("NaN")
  }

  /** reference: fixer.py:106-125. Returns the unit-type default:
    * onoff→false, datetime→null (NaT), numeric→NaN. */
  def fixIllegalCellValue(vtype: String, value: Any): Any = {
    val msg = s"Illegal value '$value' for unit '$vtype ' in table '$tableName'."
    messages += msg
    if (verbose) println(msg)
    warnings += 1
    vtype match {
      case "onoff"    => false
      case "datetime" => null
      case _          => Double.NaN
    }
  }

  /** reference: fixer.py:127-149. */
  def report(): Unit = {
    if (fixes > 0 && stopOnErrors) {
      val txt = s"Stopped parsing after $fixes errors in table '$tableName' " +
        s"with messages:\n" + messages.mkString("\n")
      throw new IllegalArgumentException(txt)
    }
  }
}
