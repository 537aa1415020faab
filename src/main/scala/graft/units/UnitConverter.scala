package graft.units

class UnitConversionError(msg: String) extends RuntimeException(msg)

/** Affine transform y = scale * x + offset. All unit conversions on StarTable
  * numeric columns are affine, which makes the column conversion a single
  * vectorized Spark expression (no UDF) on the executor side.
  */
final case class Affine(scale: Double, offset: Double = 0.0) {
  def apply(x: Double): Double = scale * x + offset
  def andThen(b: Affine): Affine = Affine(b.scale * scale, b.scale * offset + b.offset)
  def inverse: Affine = Affine(1.0 / scale, -offset / scale)
}

object Affine { val identity: Affine = Affine(1.0, 0.0) }

/** Unit conversion contract (reference: pdtable/proxy.py:352-369 converter
  * spec + pdtable/units/pint.py:11-74). A converter maps (from, to) to an
  * affine value transform and resolves a unit's base unit. Implementations
  * must be driver-side pure objects; the resulting Affine is shipped into the
  * Catalyst plan as literals.
  */
trait UnitConverter extends Serializable {
  /** Canonical (alias-resolved) name for a unit. */
  def canonical(unit: String): String = unit
  /** Base unit of `unit`, if known. */
  def baseUnit(unit: String): Option[String]
  /** Affine transform converting values in `from` to values in `to`. */
  def transform(from: String, to: String): Affine

  /** Convert a single value; `to=None` means "to base unit"
    * (reference: pdtable/demo/unit_converter.py:36-64 signature). */
  def convert(value: Double, from: String, to: Option[String] = None): (Double, String) = {
    val target = to.getOrElse(
      baseUnit(from).getOrElse(
        throw new UnitConversionError(s"No base unit defined for unit '$from'")))
    (transform(from, target)(value), canonical(target))
  }
}

/** Built-in converter covering the reference demo converter's registry
  * (reference: pdtable/demo/unit_converter.py:36-64: mm↔m, C↔K, g↔kg +
  * meter aliases) plus a pragmatic engineering set. Pure Scala, offline.
  *
  * Conversions are defined as unit → (base unit, affine-to-base); any pair
  * sharing a base unit is convertible via to-base ∘ from-base⁻¹.
  */
class BuiltinUnitConverter(
    extra: Map[String, (String, Affine)] = Map.empty,
    aliases: Map[String, String] = Map.empty
) extends UnitConverter {

  private val defaultAliases: Map[String, String] =
    Map("meter" -> "m", "metre" -> "m", "mètre" -> "m")

  /** unit → (base unit, transform-to-base). Base units map to themselves. */
  private val toBase: Map[String, (String, Affine)] = {
    val core = Map(
      // length
      "mm" -> ("m", Affine(1e-3)),
      "cm" -> ("m", Affine(1e-2)),
      "km" -> ("m", Affine(1e3)),
      "m"  -> ("m", Affine.identity),
      // temperature
      "C" -> ("K", Affine(1.0, 273.15)),
      "K" -> ("K", Affine.identity),
      // mass
      "g"  -> ("kg", Affine(1e-3)),
      "mg" -> ("kg", Affine(1e-6)),
      "t"  -> ("kg", Affine(1e3)),
      "kg" -> ("kg", Affine.identity),
      // time
      "ms"  -> ("s", Affine(1e-3)),
      "min" -> ("s", Affine(60)),
      "h"   -> ("s", Affine(3600)),
      "s"   -> ("s", Affine.identity),
      // dimensionless
      "-" -> ("-", Affine.identity),
      "%" -> ("-", Affine(1e-2))
    )
    core ++ extra
  }

  private val allAliases = defaultAliases ++ aliases

  override def canonical(unit: String): String = allAliases.getOrElse(unit, unit)

  def baseUnit(unit: String): Option[String] =
    toBase.get(canonical(unit)).map(_._1)

  def transform(from: String, to: String): Affine = {
    val f = canonical(from); val t = canonical(to)
    if (f == t) return Affine.identity
    (toBase.get(f), toBase.get(t)) match {
      case (Some((bf, af)), Some((bt, at))) if bf == bt => af.andThen(at.inverse)
      case _ =>
        throw new UnitConversionError(
          s"Don't know how to convert from '$from' to '$to'")
    }
  }
}

object BuiltinUnitConverter {
  val default: BuiltinUnitConverter = new BuiltinUnitConverter()
}

object Units {
  /** Session-default converter (reference: pdtable/units/__init__.py:3
    * default_converter hook). Replaceable by clients. */
  @volatile var defaultConverter: UnitConverter = BuiltinUnitConverter.default
}
