package graft.model

import org.apache.spark.sql.types._

import graft.origin.TableOrigin

class InvalidNamingError(msg: String) extends RuntimeException(msg)
class ColumnUnitException(msg: String) extends RuntimeException(msg)
class InvalidTableCombineError(msg: String) extends RuntimeException(msg)

/** Print-format specifier for a column (reference: pdtable/table_metadata.py:51-69).
  *
  * An int precision `n` means "n decimal places" (printf "%.nf"); otherwise a
  * format-mini-language string like "14.3e" is carried (we support the common
  * printf-compatible subset: [width][.precision][type]).
  */
final case class ColumnFormat(specifier: String) {
  /** Format one double value per the specifier. */
  def format(x: Any): String = ColumnFormat.applySpec(specifier, x)
  override def toString: String = specifier
}

object ColumnFormat {
  def apply(precision: Int): ColumnFormat = ColumnFormat(s".${precision}f")

  private val SpecRe = """^(\d*)\.?(\d*)([eEfFgGd]?)$""".r

  /** Apply a python-format-mini-language-ish spec using Java printf. */
  def applySpec(spec: String, x: Any): String = spec match {
    case SpecRe(width, prec, conv) =>
      val c = if (conv.isEmpty) "s" else conv
      val w = if (width.isEmpty) "" else width
      val p = if (prec.isEmpty) "" else s".$prec"
      val jspec = s"%$w$p$c"
      c match {
        case "d" => jspec.format(anyToLong(x))
        case "s" => jspec.format(x.toString)
        case _   => jspec.format(anyToDouble(x))
      }
    case _ => x.toString
  }

  private def anyToDouble(x: Any): Double = x match {
    case d: Double => d
    case f: Float  => f.toDouble
    case n: Number => n.doubleValue()
    case s: String => s.toDouble
    case other     => other.toString.toDouble
  }
  private def anyToLong(x: Any): Long = x match {
    case n: Number => n.longValue()
    case s: String => s.toLong
    case other     => other.toString.toLong
  }
}

/** Unit-indicator ↔ Spark type mapping (reference: pdtable/io/parsers/columns.py:1-15,
  * pdtable/table_metadata.py:72-93).
  */
object UnitIndicator {
  val Text = "text"
  val OnOff = "onoff"
  val Datetime = "datetime"
  val Default = "-"

  /** Units whose values are not plain numbers. */
  val special: Set[String] = Set(Text, OnOff)
  /** Units on which linear unit conversion is undefined
    * (reference: pdtable/proxy.py:16). */
  val inconvertible: Set[String] = Set(Text, Datetime, OnOff)

  def sparkType(unit: String): DataType = unit match {
    case Text     => StringType
    case OnOff    => BooleanType
    case Datetime => TimestampType
    case _        => DoubleType
  }

  /** Default unit for a Spark data type (analog of unit_from_dtype,
    * table_metadata.py:72-93: b→onoff, i/u/f/M→"-", O/S/U→text). */
  def unitFromType(dt: DataType): String = dt match {
    case BooleanType                                         => OnOff
    case StringType                                          => Text
    case _: NumericType | TimestampType | DateType           => Default
    case TimestampNTZType                                    => Default
    // Extension surface beyond the reference's scalar-only cells
    // (SURVEY §7.5): embeddings, multimodal payloads, nested data.
    case _: ArrayType                                        => "vector"
    case BinaryType                                          => "binary"
    case _: MapType | _: StructType                          => "struct"
    case _ =>
      throw new ColumnUnitException(
        s"The Spark data type $dt cannot be assigned a StarTable unit")
  }

  /** strict-types check: special units must match their type and vice versa
    * (reference: table_metadata.py:106-121 check_dtype). */
  def checkType(unit: String, dt: DataType, colName: String): Unit = {
    val baseUnit = unitFromType(dt)
    if (special.contains(baseUnit)) {
      if (baseUnit != unit)
        throw new ColumnUnitException(
          s"Column '$colName' unit $unit not equal to $baseUnit expected from data type $dt")
    } else if (special.contains(unit)) {
      throw new ColumnUnitException(
        s"Column '$colName' special unit $unit not applicable for data type $dt")
    }
  }
}

/** Per-column metadata (reference: pdtable/table_metadata.py:96-140). */
final case class ColumnMetadata(
    unit: String,
    displayUnit: Option[String] = None,
    displayFormat: Option[ColumnFormat] = None
) {
  /** Merge in another column's metadata, preferring existing display fields
    * (reference: table_metadata.py:130-135 update_from). */
  def updateFrom(b: ColumnMetadata): ColumnMetadata =
    ColumnMetadata(
      unit = b.unit,
      displayUnit = displayUnit.orElse(b.displayUnit),
      displayFormat = displayFormat.orElse(b.displayFormat)
    )
}

object ColumnMetadata {
  def fromType(dt: DataType): ColumnMetadata =
    ColumnMetadata(UnitIndicator.unitFromType(dt))
}

/** Table-level metadata (reference: pdtable/table_metadata.py:17-48). */
final case class TableMetadata(
    name: String,
    destinations: Set[String] = Set("all"),
    origin: TableOrigin = TableOrigin.empty,
    transposed: Boolean = false,
    strictTypes: Boolean = true
) {
  override def toString: String = {
    val dst =
      if (destinations.nonEmpty) s" for {${destinations.mkString(", ")}}" else ""
    s"""Table "$name"$dst."""
  }
}

object TableMetadata {
  /** Destinations given as a single space-separated string
    * (reference: table_metadata.py:40-44 __post_init__). */
  def withDestinationString(name: String, destinations: String): TableMetadata =
    TableMetadata(name, destinations.trim.split(" ").toSet)
}
