package graft.io

import java.sql.Timestamp

import scala.collection.immutable.ListMap

import org.apache.spark.sql.SparkSession

import graft.model._
import graft.origin.TableOrigin
import graft.parse.{Blocks, ParseFixer, ParsedTable}

/** Minimal JSON value model + codec. Self-contained (offline build): the
  * JSON interchange shape is small and fixed, so a ~100-line codec beats a
  * library dependency. Object key order is preserved (the reference
  * guarantees column-order preservation, pdtable/test/io/test_json.py:193).
  */
sealed trait JsonValue
object JsonValue {
  case object JsonNull extends JsonValue
  final case class JsonBool(value: Boolean) extends JsonValue
  final case class JsonNumber(value: Double) extends JsonValue
  final case class JsonString(value: String) extends JsonValue
  final case class JsonArray(values: Vector[JsonValue]) extends JsonValue
  final case class JsonObject(fields: ListMap[String, JsonValue]) extends JsonValue

  def write(v: JsonValue): String = {
    val sb = new StringBuilder
    writeTo(v, sb)
    sb.toString
  }

  private def writeTo(v: JsonValue, sb: StringBuilder): Unit = v match {
    case JsonNull       => sb.append("null")
    case JsonBool(b)    => sb.append(b)
    case JsonNumber(d)  =>
      if (d == d.floor && !d.isInfinite && math.abs(d) < 1e15) sb.append(d.toLong)
      else sb.append(d)
    case JsonString(s)  => writeString(s, sb)
    case JsonArray(vs)  =>
      sb.append('[')
      var first = true
      vs.foreach { x => if (!first) sb.append(','); first = false; writeTo(x, sb) }
      sb.append(']')
    case JsonObject(fs) =>
      sb.append('{')
      var first = true
      fs.foreach { case (k, x) =>
        if (!first) sb.append(','); first = false
        writeString(k, sb); sb.append(':'); writeTo(x, sb)
      }
      sb.append('}')
  }

  private def writeString(s: String, sb: StringBuilder): Unit = {
    sb.append('"')
    s.foreach {
      case '"'           => sb.append("\\\"")
      case '\\'          => sb.append("\\\\")
      case '\n'          => sb.append("\\n")
      case '\r'          => sb.append("\\r")
      case '\t'          => sb.append("\\t")
      case c if c < ' '  => sb.append(f"\\u${c.toInt}%04x")
      case c             => sb.append(c)
    }
    sb.append('"')
  }

  def parse(s: String): JsonValue = {
    val p = new Parser(s)
    val v = p.parseValue()
    p.skipWs()
    require(p.atEnd, s"Trailing content in JSON at ${p.pos}")
    v
  }

  private final class Parser(s: String) {
    var pos = 0
    def atEnd: Boolean = pos >= s.length
    def skipWs(): Unit = while (!atEnd && s(pos).isWhitespace) pos += 1
    private def expect(c: Char): Unit = {
      skipWs()
      require(!atEnd && s(pos) == c, s"Expected '$c' at $pos")
      pos += 1
    }
    def parseValue(): JsonValue = {
      skipWs()
      require(!atEnd, "Unexpected end of JSON")
      s(pos) match {
        case '{' => parseObject()
        case '[' => parseArray()
        case '"' => JsonString(parseString())
        case 't' => literal("true"); JsonBool(true)
        case 'f' => literal("false"); JsonBool(false)
        case 'n' => literal("null"); JsonNull
        case _   => parseNumber()
      }
    }
    private def literal(lit: String): Unit = {
      require(s.startsWith(lit, pos), s"Bad literal at $pos")
      pos += lit.length
    }
    private def parseObject(): JsonObject = {
      expect('{'); skipWs()
      var fields = ListMap.empty[String, JsonValue]
      if (!atEnd && s(pos) == '}') { pos += 1; return JsonObject(fields) }
      var done = false
      while (!done) {
        skipWs()
        val k = parseString()
        expect(':')
        fields = fields.updated(k, parseValue())
        skipWs()
        if (!atEnd && s(pos) == ',') pos += 1
        else { expect('}'); done = true }
      }
      JsonObject(fields)
    }
    private def parseArray(): JsonArray = {
      expect('['); skipWs()
      val buf = Vector.newBuilder[JsonValue]
      if (!atEnd && s(pos) == ']') { pos += 1; return JsonArray(buf.result()) }
      var done = false
      while (!done) {
        buf += parseValue()
        skipWs()
        if (!atEnd && s(pos) == ',') pos += 1
        else { expect(']'); done = true }
      }
      JsonArray(buf.result())
    }
    private def parseString(): String = {
      expect('"')
      val sb = new StringBuilder
      while (!atEnd && s(pos) != '"') {
        val c = s(pos)
        if (c == '\\') {
          pos += 1
          s(pos) match {
            case '"'  => sb.append('"')
            case '\\' => sb.append('\\')
            case '/'  => sb.append('/')
            case 'n'  => sb.append('\n')
            case 'r'  => sb.append('\r')
            case 't'  => sb.append('\t')
            case 'b'  => sb.append('\b')
            case 'f'  => sb.append('\f')
            case 'u'  =>
              sb.append(Integer.parseInt(s.substring(pos + 1, pos + 5), 16).toChar)
              pos += 4
            case other => sb.append(other)
          }
          pos += 1
        } else { sb.append(c); pos += 1 }
      }
      pos += 1
      sb.toString
    }
    private def parseNumber(): JsonNumber = {
      val start = pos
      while (!atEnd && (s(pos).isDigit || "+-.eE".contains(s(pos)))) pos += 1
      JsonNumber(s.substring(start, pos).toDouble)
    }
  }
}

/** StarTable ↔ JSON interchange (reference: pdtable/io/json.py:6-40 +
  * pdtable/io/_json.py:36-75). Shape:
  * {"name":…, "destinations": {d: null}, "columns": {c: {"unit":…, "values":[…]}}}
  * with NaN→null, NaT→null, datetime→"YYYY-MM-DD HH:MM:SS".
  */
object JsonIo {
  import JsonValue._

  /** JSON data → StarTable, routed through the same cell-grid parser as CSV
    * so the fixer applies (reference: json.py:6-23 json_data_to_table). */
  def jsonDataToParsed(json: JsonObject, fixer: ParseFixer = new ParseFixer()): ParsedTable = {
    val name = json.fields("name").asInstanceOf[JsonString].value
    val destinations = json.fields("destinations") match {
      case JsonObject(fs) => fs.keys.mkString(" ")
      case JsonArray(vs)  => vs.map(_.asInstanceOf[JsonString].value).mkString(" ")
      case other          => throw new IllegalArgumentException(s"Bad destinations: $other")
    }
    val columns = json.fields("columns").asInstanceOf[JsonObject].fields
    val colNames = columns.keys.toSeq
    val colUnits = columns.values.map(c =>
      c.asInstanceOf[JsonObject].fields("unit").asInstanceOf[JsonString].value).toSeq
    val colValues: Seq[Vector[Any]] = columns.values.map { c =>
      c.asInstanceOf[JsonObject].fields("values").asInstanceOf[JsonArray].values.map {
        case JsonNull      => null
        case JsonBool(b)   => java.lang.Boolean.valueOf(b)
        case JsonNumber(d) => java.lang.Double.valueOf(d)
        case JsonString(s) => s
        case other         => throw new IllegalArgumentException(s"Bad cell: $other")
      }
    }.toSeq

    val grid: Seq[Seq[Any]] =
      Seq(Seq(s"**$name"), Seq(destinations), colNames, colUnits) ++
        (if (colValues.isEmpty || colValues.head.isEmpty) Nil
         else (0 until colValues.head.size).map(i => colValues.map(_(i))))
    Blocks.parseTableGrid(grid, TableOrigin.empty, fixer)
  }

  def jsonDataToTable(spark: SparkSession, json: String): StarTable =
    StarTable.fromParsed(spark,
      jsonDataToParsed(JsonValue.parse(json).asInstanceOf[JsonObject]))

  /** StarTable → JSON data (reference: json.py:26-40 table_to_json_data).
    * Collects — the JSON interchange shape is a driver-side document. */
  def tableToJsonData(t: StarTable): JsonObject = {
    val rows = t.df.collect()
    val cols = t.columnNames.zipWithIndex.map { case (c, ci) =>
      val unit = t.unit(c)
      val values = rows.toVector.map { r =>
        val v = r.get(ci)
        v match {
          case null                 => JsonNull
          case d: Double if d.isNaN => JsonNull
          case d: Double            => JsonNumber(d)
          case f: Float             => JsonNumber(f.toDouble)
          case n: java.lang.Number  => JsonNumber(n.doubleValue())
          case b: Boolean           => JsonBool(b)
          case ts: Timestamp        => JsonString(CsvWriter.formatTimestamp(ts))
          case s: String            => JsonString(s)
          case other                => JsonString(other.toString)
        }
      }
      c -> JsonObject(ListMap(
        "unit" -> JsonString(unit),
        "values" -> JsonArray(values)))
    }
    JsonObject(ListMap(
      "name" -> JsonString(t.name),
      "destinations" -> JsonObject(
        ListMap(t.destinations.toSeq.map(d => d -> (JsonNull: JsonValue)): _*)),
      "columns" -> JsonObject(ListMap(cols: _*))))
  }

  def tableToJsonString(t: StarTable): String = JsonValue.write(tableToJsonData(t))
}
