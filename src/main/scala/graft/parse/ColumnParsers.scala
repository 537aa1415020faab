package graft.parse

import java.sql.Timestamp
import java.time.LocalDateTime
import java.time.format.DateTimeFormatter

/** Unit-indicator-dispatched cell coercion
  * (reference: pdtable/io/parsers/columns.py:36-194):
  *   - 'text'     → String
  *   - 'onoff'    → Boolean (accepts 0/1/true/false any case)
  *   - 'datetime' → java.sql.Timestamp, null for '-'/'nan'
  *   - everything else → Double, null for '-'/'nan'
  *
  * Note on missing numerics: the reference represents them as numpy NaN; in
  * Spark we normalize to SQL null, which is what pandas' skipna semantics map
  * to in Spark aggregations (avg/sum skip null, whereas NaN would poison them).
  * The CSV/JSON writers render null back as the na_rep marker.
  */
object ColumnParsers {

  def normalizeIfStr(v: Any): Any = v match {
    case s: String => s.trim.toLowerCase
    case other     => other
  }

  /** reference: columns.py:31-33. */
  def isMissingDataMarker(v: Any): Boolean = normalizeIfStr(v) match {
    case "-" | "nan" => true
    case _           => false
  }

  private val onoffMap: Map[Any, Boolean] = Map(
    0 -> false, 1 -> true, 0L -> false, 1L -> true, 0.0 -> false, 1.0 -> true,
    false -> false, true -> true, "0" -> false, "1" -> true,
    "false" -> false, "true" -> true
  )

  /** Parse one onoff cell; throws on illegal value (columns.py:41-55). */
  def onoffToBool(v: Any): Boolean =
    onoffMap.getOrElse(normalizeIfStr(v),
      throw new IllegalArgumentException(s"Illegal value in onoff column: $v"))

  // Accepted datetime shapes; reference delegates to pd.to_datetime
  // (columns.py:115-118) — we support the ISO-ish formats StarTable files
  // use. Seconds formats take an OPTIONAL variable-width fraction (1-9
  // digits) so Python-str() output like ".1" or ".100000" re-parses.
  private def secondsWithOptFrac(base: String): DateTimeFormatter =
    new java.time.format.DateTimeFormatterBuilder()
      .appendPattern(base)
      .optionalStart()
      .appendFraction(java.time.temporal.ChronoField.NANO_OF_SECOND, 1, 9, true)
      .optionalEnd()
      .toFormatter()
  private val dtFormats: Seq[DateTimeFormatter] = Seq(
    secondsWithOptFrac("yyyy-MM-dd HH:mm:ss"),
    DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm"),
    secondsWithOptFrac("yyyy-MM-dd'T'HH:mm:ss"),
    DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm"),
    secondsWithOptFrac("yyyy/MM/dd HH:mm:ss"),
    DateTimeFormatter.ofPattern("yyyy/MM/dd HH:mm")
  )
  private val dateFormats: Seq[DateTimeFormatter] = Seq(
    DateTimeFormatter.ofPattern("yyyy-MM-dd"),
    DateTimeFormatter.ofPattern("yyyy/MM/dd")
  )

  /** Parse one datetime string; throws if unparseable. */
  def parseTimestamp(s: String): Timestamp = {
    val t = s.trim
    val attempts: Iterator[Option[Timestamp]] =
      dtFormats.iterator.map { f =>
        try Some(Timestamp.valueOf(LocalDateTime.parse(t, f)))
        catch { case _: java.time.format.DateTimeParseException => None }
      } ++ dateFormats.iterator.map { f =>
        try Some(Timestamp.valueOf(java.time.LocalDate.parse(t, f).atStartOfDay()))
        catch { case _: java.time.format.DateTimeParseException => None }
      }
    attempts.collectFirst { case Some(ts) => ts }.getOrElse(
      throw new IllegalArgumentException(s"Illegal value in datetime column: $s"))
  }

  private def fixOrThrow(fixer: ParseFixer, row: Int, vtype: String, v: Any, err: String): Any =
    if (fixer != null) { fixer.tableRow = row; fixer.fixIllegalCellValue(vtype, v) }
    else throw new IllegalArgumentException(err)

  /** Normalize a fixer default (NaN → null) for Spark row storage. */
  private def nanToNull(v: Any): Any = v match {
    case d: Double if d.isNaN => null
    case other                => other
  }

  def parseTextColumn(values: Seq[Any]): Seq[Any] =
    values.map(v => if (v == null) "" else v.toString)

  /** One onoff cell at `row` — the per-element kernel of parseOnOffColumn. */
  def onoffCell(v: Any, row: Int, fixer: ParseFixer): Any =
    onoffMap.get(normalizeIfStr(v)) match {
      case Some(b) => java.lang.Boolean.valueOf(b)
      case None =>
        nanToNull(fixOrThrow(fixer, row, "onoff", v, s"Illegal value in onoff column: $v"))
    }

  def parseOnOffColumn(values: Seq[Any], fixer: ParseFixer): Seq[Any] =
    values.zipWithIndex.map { case (v, row) => onoffCell(v, row, fixer) }

  /** One numeric cell at `row` — the per-element kernel of parseFloatColumn. */
  def floatCell(v: Any, row: Int, fixer: ParseFixer): Any =
    v match {
      case null                 => null
      case d: Double            => java.lang.Double.valueOf(d)
      case f: Float             => java.lang.Double.valueOf(f.toDouble)
      case n: java.lang.Number  => java.lang.Double.valueOf(n.doubleValue())
      case b: Boolean           =>
        nanToNull(fixOrThrow(fixer, row, "float", b, s"Illegal value in numerical column: $b"))
      case s: String =>
        val t = s.trim.toLowerCase
        if (t == "nan" || t == "-") null
        else
          try java.lang.Double.valueOf(t.toDouble)
          catch {
            case _: NumberFormatException =>
              nanToNull(fixOrThrow(fixer, row, "float", t, s"Illegal value in numerical column: $s"))
          }
      case other =>
        nanToNull(fixOrThrow(fixer, row, "float", other, s"Illegal value in numerical column: $other"))
    }

  def parseFloatColumn(values: Seq[Any], fixer: ParseFixer): Seq[Any] =
    values.zipWithIndex.map { case (v, row) => floatCell(v, row, fixer) }

  /** One datetime cell at `row` — the per-element kernel of parseDatetimeColumn. */
  def datetimeCell(v: Any, row: Int, fixer: ParseFixer): Any =
    v match {
      case t: Timestamp            => t
      case d: java.util.Date       => new Timestamp(d.getTime)
      case l: LocalDateTime        => Timestamp.valueOf(l)
      case null =>
        nanToNull(fixOrThrow(fixer, row, "datetime", null, "Illegal value in datetime column: null"))
      case s: String =>
        val t = s.trim
        if (t.nonEmpty && (t(0).isDigit || t == "-" || t.toLowerCase == "nan")) {
          if (t == "-" || t.toLowerCase == "nan") null
          else
            try parseTimestamp(t)
            catch {
              case _: IllegalArgumentException =>
                nanToNull(fixOrThrow(fixer, row, "datetime", t, s"Illegal value in datetime column: $t"))
            }
        } else
          nanToNull(fixOrThrow(fixer, row, "datetime", t, s"Illegal value in datetime column: $t"))
      case other =>
        throw new IllegalArgumentException(s"Illegal value in datetime column: $other")
    }

  def parseDatetimeColumn(values: Seq[Any], fixer: ParseFixer): Seq[Any] =
    values.zipWithIndex.map { case (v, row) => datetimeCell(v, row, fixer) }

  /** Single-cell parser for one unit indicator, dispatched ONCE per column
    * (split readers call the returned closure per cell — no per-cell Seq
    * allocation or unit-string match). Value-identical to
    * `parseColumn(unit, Seq(raw), fixer).head`, which indexes every cell
    * as row 0. */
  def cellParser(unitIndicator: String, fixer: ParseFixer): Any => Any =
    unitIndicator match {
      case "text"     => v => if (v == null) "" else v.toString
      case "onoff"    => v => onoffCell(v, 0, fixer)
      case "datetime" => v => datetimeCell(v, 0, fixer)
      case _          => v => floatCell(v, 0, fixer)
    }

  /** Dispatch on unit indicator (reference: columns.py:167-194). */
  def parseColumn(unitIndicator: String, values: Seq[Any], fixer: ParseFixer): Seq[Any] =
    unitIndicator match {
      case "text"     => parseTextColumn(values)
      case "onoff"    => parseOnOffColumn(values, fixer)
      case "datetime" => parseDatetimeColumn(values, fixer)
      case _          => parseFloatColumn(values, fixer)
    }
}
