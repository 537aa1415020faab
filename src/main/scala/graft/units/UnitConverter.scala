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

/** A unit conversion as a value map that is still a single vectorized Spark
  * expression (codegen'd pow/log builtins — no UDF). Affine covers every
  * linear/compound conversion; the Exp/Log forms cover LOGARITHMIC units
  * (dB, dBm, Np, pH, octave — pint's log-unit family), whose conversions
  * are exponential in one direction and logarithmic in the other. */
sealed trait ValueTransform extends Serializable {
  def apply(x: Double): Double
  def toColumn(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column
}

final case class AffineTransform(a: Affine) extends ValueTransform {
  def apply(x: Double): Double = a(x)
  def toColumn(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.lit
    c * lit(a.scale) + lit(a.offset)
  }
}

/** log unit → linear unit: y = post(ref · logBase^(x/k)). */
final case class ExpTransform(k: Double, logBase: Double, ref: Double,
                              post: Affine) extends ValueTransform {
  def apply(x: Double): Double = post(ref * math.pow(logBase, x / k))
  def toColumn(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{lit, pow}
    pow(lit(logBase), c / lit(k)) * lit(ref) * lit(post.scale) + lit(post.offset)
  }
}

/** linear unit → log unit: y = k · log_logBase(pre(x)/ref). */
final case class LogTransform(pre: Affine, k: Double, logBase: Double,
                              ref: Double) extends ValueTransform {
  def apply(x: Double): Double = k * (math.log(pre(x) / ref) / math.log(logBase))
  def toColumn(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{lit, log}
    log(logBase, (c * lit(pre.scale) + lit(pre.offset)) / lit(ref)) * lit(k)
  }
}

/** log unit → log unit (via the shared linear dimension):
  * y = k2 · log_b2(scale · ref1 · b1^(x/k1) / ref2). */
final case class LogLogTransform(k1: Double, b1: Double, ref1: Double,
                                 scale: Double,
                                 k2: Double, b2: Double, ref2: Double)
    extends ValueTransform {
  def apply(x: Double): Double =
    k2 * (math.log(scale * ref1 * math.pow(b1, x / k1) / ref2) / math.log(b2))
  def toColumn(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{lit, log, pow}
    log(b2, pow(lit(b1), c / lit(k1)) * lit(scale * ref1 / ref2)) * lit(k2)
  }
}

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
  /** Affine transform converting values in `from` to values in `to`.
    * Raises for pairs whose conversion is not affine (log units) — those
    * are reachable through [[valueTransform]]. */
  def transform(from: String, to: String): Affine

  /** General value transform for `from` → `to`. Defaults to the affine
    * contract, so existing custom converters keep working unchanged;
    * converters that support logarithmic units override this. */
  def valueTransform(from: String, to: String): ValueTransform =
    AffineTransform(transform(from, to))

  /** Convert a single value; `to=None` means "to base unit"
    * (reference: pdtable/demo/unit_converter.py:36-64 signature). */
  def convert(value: Double, from: String, to: Option[String] = None): (Double, String) = {
    val target = to.getOrElse(
      baseUnit(from).getOrElse(
        throw new UnitConversionError(s"No base unit defined for unit '$from'")))
    (valueTransform(from, target)(value), canonical(target))
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

  private val defaultAliases: Map[String, String] = Map(
    "meter" -> "m", "metre" -> "m", "mètre" -> "m",
    "millimeter" -> "mm", "millimetre" -> "mm", "centimeter" -> "cm",
    "centimetre" -> "cm", "kilometer" -> "km", "kilometre" -> "km",
    "degC" -> "C", "°C" -> "C", "celsius" -> "C", "degF" -> "F", "°F" -> "F",
    "fahrenheit" -> "F", "kelvin" -> "K",
    "gram" -> "g", "kilogram" -> "kg", "tonne" -> "t", "ton" -> "t",
    "sec" -> "s", "second" -> "s", "minute" -> "min", "hour" -> "h",
    "day" -> "d",
    "deg" -> "°", "degree" -> "°", "radian" -> "rad",
    "pascal" -> "Pa", "newton" -> "N", "joule" -> "J", "watt" -> "W",
    "liter" -> "L", "litre" -> "L", "percent" -> "%",
    "decibel" -> "dB", "neper" -> "Np")

  /** unit → (base unit, transform-to-base). Base units map to themselves.
    * SI base + the practical engineering set the reference's pint converter
    * (pdtable/units/pint.py:11-74) would resolve — all affine, so every
    * conversion stays a vectorized Spark expression. */
  private val toBase: Map[String, (String, Affine)] = {
    val core = Map(
      // length
      "mm" -> ("m", Affine(1e-3)),
      "cm" -> ("m", Affine(1e-2)),
      "km" -> ("m", Affine(1e3)),
      "in" -> ("m", Affine(0.0254)),
      "ft" -> ("m", Affine(0.3048)),
      "mi" -> ("m", Affine(1609.344)),
      "nmi" -> ("m", Affine(1852.0)),
      "m"  -> ("m", Affine.identity),
      // temperature (affine!)
      "C" -> ("K", Affine(1.0, 273.15)),
      "F" -> ("K", Affine(5.0 / 9.0, 255.3722222222222)),
      "K" -> ("K", Affine.identity),
      // mass
      "g"  -> ("kg", Affine(1e-3)),
      "mg" -> ("kg", Affine(1e-6)),
      "t"  -> ("kg", Affine(1e3)),
      "lb" -> ("kg", Affine(0.45359237)),
      "kg" -> ("kg", Affine.identity),
      // time
      "ms"  -> ("s", Affine(1e-3)),
      "us"  -> ("s", Affine(1e-6)),
      "min" -> ("s", Affine(60)),
      "h"   -> ("s", Affine(3600)),
      "d"   -> ("s", Affine(86400)),
      "s"   -> ("s", Affine.identity),
      // angle
      "°"    -> ("rad", Affine(math.Pi / 180.0)),
      "grad" -> ("rad", Affine(math.Pi / 200.0)),
      "rad"  -> ("rad", Affine.identity),
      // pressure
      "kPa"  -> ("Pa", Affine(1e3)),
      "MPa"  -> ("Pa", Affine(1e6)),
      "bar"  -> ("Pa", Affine(1e5)),
      "mbar" -> ("Pa", Affine(1e2)),
      "atm"  -> ("Pa", Affine(101325.0)),
      "psi"  -> ("Pa", Affine(6894.757293168361)),
      "Pa"   -> ("Pa", Affine.identity),
      // force
      "kN" -> ("N", Affine(1e3)),
      "MN" -> ("N", Affine(1e6)),
      "N"  -> ("N", Affine.identity),
      // energy
      "kJ"  -> ("J", Affine(1e3)),
      "MJ"  -> ("J", Affine(1e6)),
      "Wh"  -> ("J", Affine(3600.0)),
      "kWh" -> ("J", Affine(3.6e6)),
      "cal" -> ("J", Affine(4.184)),
      "J"   -> ("J", Affine.identity),
      // power
      "kW" -> ("W", Affine(1e3)),
      "MW" -> ("W", Affine(1e6)),
      "W"  -> ("W", Affine.identity),
      // volume
      "mL" -> ("L", Affine(1e-3)),
      "m3" -> ("L", Affine(1e3)),
      "L"  -> ("L", Affine.identity),
      // frequency
      "kHz" -> ("Hz", Affine(1e3)),
      "MHz" -> ("Hz", Affine(1e6)),
      "Hz"  -> ("Hz", Affine.identity),
      // speed
      "km/h" -> ("m/s", Affine(1.0 / 3.6)),
      "kt"   -> ("m/s", Affine(1852.0 / 3600.0)),
      "m/s"  -> ("m/s", Affine.identity),
      // amount concentration (pH's linear dimension)
      "mmol/L" -> ("mol/L", Affine(1e-3)),
      "mol/L"  -> ("mol/L", Affine.identity),
      // dimensionless
      "-" -> ("-", Affine.identity),
      "%" -> ("-", Affine(1e-2))
    )
    core ++ extra
  }

  /** Logarithmic units (the pint log-unit family the affine registry could
    * not express): unit → (linear base unit, k, log base, reference), with
    * linear = ref · logBase^(x/k). The linear value of the ratio units
    * (dB, Np, octave, decade) is the POWER ratio, so 1 Np = 20·log10(e) ≈
    * 8.686 dB (the field-quantity neper: amplitude e^x ⇒ power e^2x ⇒
    * k = 0.5). pH is −log10 of concentration in mol/L. */
  private val logUnits: Map[String, (String, Double, Double, Double)] = Map(
    "dB"     -> ("-", 10.0, 10.0, 1.0),
    "dBm"    -> ("W", 10.0, 10.0, 1e-3),
    "dBW"    -> ("W", 10.0, 10.0, 1.0),
    "Np"     -> ("-", 0.5, math.E, 1.0),
    "octave" -> ("-", 1.0, 2.0, 1.0),
    "decade" -> ("-", 1.0, 10.0, 1.0),
    "pH"     -> ("mol/L", -1.0, 10.0, 1.0))

  private val allAliases = defaultAliases ++ aliases

  override def canonical(unit: String): String = allAliases.getOrElse(unit, unit)

  def baseUnit(unit: String): Option[String] = {
    val c = canonical(unit)
    logUnits.get(c).map(_._1)
      .orElse(toBase.get(c).map(_._1))
      .orElse(
        try Some(CompoundUnits.render(parseCompound(unit)._1))
        catch { case _: UnitConversionError => None })
  }

  def transform(from: String, to: String): Affine = {
    val f = canonical(from); val t = canonical(to)
    if (f == t) return Affine.identity
    if (logUnits.contains(f) || logUnits.contains(t))
      throw new UnitConversionError(
        s"Conversion '$from' → '$to' involves a logarithmic unit and is not " +
          "affine; use valueTransform (column conversions route through it)")
    (toBase.get(f), toBase.get(t)) match {
      case (Some((bf, af)), Some((bt, at))) if bf == bt => af.andThen(at.inverse)
      case _ => compoundTransform(from, to)
    }
  }

  /** General transform: affine pairs fall through to [[transform]];
    * logarithmic units convert via their linear dimension — log→linear is
    * an Exp form, linear→log a Log form, log→log composes both (and is
    * itself affine only when the log bases agree, e.g. dBm→dBW = x−30,
    * which the composed expression evaluates to exactly). */
  override def valueTransform(from: String, to: String): ValueTransform = {
    val f = canonical(from); val t = canonical(to)
    if (f == t) return AffineTransform(Affine.identity)
    (logUnits.get(f), logUnits.get(t)) match {
      case (None, None) => AffineTransform(transform(f, t))
      case (Some((lin, k, b, r)), None) =>
        ExpTransform(k, b, r, transform(lin, t))
      case (None, Some((lin, k, b, r))) =>
        LogTransform(transform(f, lin), k, b, r)
      case (Some((lin1, k1, b1, r1)), Some((lin2, k2, b2, r2))) =>
        val aff = transform(lin1, lin2) // scale-only for all registered dims
        LogLogTransform(k1, b1, r1, aff.scale, k2, b2, r2)
    }
  }

  // ------------------------------------------------- compound-unit algebra

  /** Resolve one atomic token inside a compound expression to its primary
    * dimension vector and linear scale, raised to `exp`. Affine-offset units
    * (°C, °F) are ill-defined inside products/powers — raise, as pint does
    * without delta-units. */
  private def atomicDim(token: String, exp: Int): (Map[String, Int], Double) = {
    val c = canonical(token)
    val (base, aff) = toBase.getOrElse(c,
      throw new UnitConversionError(
        s"Don't know how to convert unit '$token' (unknown in compound expression)"))
    if (aff.offset != 0.0)
      throw new UnitConversionError(
        s"Offset unit '$token' cannot appear in a compound or exponentiated " +
          "expression (convert the column to its base unit first)")
    val (dims, pscale) = CompoundUnits.primary.getOrElse(base, (Map(base -> 1), 1.0))
    (dims.map { case (k, v) => k -> v * exp },
      math.pow(aff.scale * pscale, exp.toDouble))
  }

  /** Parse a compound unit expression ("m/s", "kg*m2/s2", "N*m", "kJ/kg")
    * into (primary dimension vector, scale to primary). Grammar: terms
    * joined by '*' or '/', each term a unit name with an optional integer
    * exponent ("m2", "s^-1"); '/' negates only its own term (kg*m2/s2/s =
    * kg·m²·s⁻³, pint semantics). */
  private def parseCompound(expr: String): (Map[String, Int], Double) = {
    val TokenRe = """([A-Za-z°µ%]+|-)\^?(-?\d+)?""".r
    val parts = expr.replaceAll("\\s+", "").split("(?=[*/])")
    if (parts.isEmpty || parts.forall(_.isEmpty))
      throw new UnitConversionError(s"Empty unit expression '$expr'")
    var dims = Map.empty[String, Int]
    var scale = 1.0
    parts.foreach { p0 =>
      val (sign, p) =
        if (p0.startsWith("/")) (-1, p0.tail)
        else if (p0.startsWith("*")) (1, p0.tail)
        else (1, p0)
      p match {
        case TokenRe(name, e) =>
          val exp = sign * Option(e).map(_.toInt).getOrElse(1)
          val (d, s) = atomicDim(name, exp)
          dims = d.foldLeft(dims) { case (acc, (k, v)) =>
            acc.updated(k, acc.getOrElse(k, 0) + v)
          }
          scale *= s
        case other =>
          throw new UnitConversionError(
            s"Don't know how to parse unit term '$other' in '$expr'")
      }
    }
    (dims.filter(_._2 != 0), scale)
  }

  /** Linear conversion between two compound expressions of equal dimension
    * (exponent-vector equality); the residual gap vs pint is non-affine
    * forms (log units), which the reference's converters also exclude. */
  private def compoundTransform(from: String, to: String): Affine = {
    val (df, sf) = parseCompound(from)
    val (dt, st) = parseCompound(to)
    if (df != dt)
      throw new UnitConversionError(
        s"Don't know how to convert from '$from' to '$to': incompatible " +
          s"dimensions ${CompoundUnits.render(df)} vs ${CompoundUnits.render(dt)}")
    Affine(sf / st)
  }
}

/** Primary-dimension decomposition of the registry's base units — the SI
  * skeleton that makes cross-family conversions (N*m → J, kJ/kg → m2/s2)
  * dimensionally sound. */
object CompoundUnits {
  /** base unit → (primary dimension vector, scale to primary). Unlisted
    * bases are their own primary dimension. */
  val primary: Map[String, (Map[String, Int], Double)] = Map(
    "m" -> (Map("m" -> 1), 1.0),
    "kg" -> (Map("kg" -> 1), 1.0),
    "s" -> (Map("s" -> 1), 1.0),
    "K" -> (Map("K" -> 1), 1.0),
    "rad" -> (Map("rad" -> 1), 1.0),
    "-" -> (Map.empty[String, Int], 1.0),
    "N" -> (Map("kg" -> 1, "m" -> 1, "s" -> -2), 1.0),
    "Pa" -> (Map("kg" -> 1, "m" -> -1, "s" -> -2), 1.0),
    "J" -> (Map("kg" -> 1, "m" -> 2, "s" -> -2), 1.0),
    "W" -> (Map("kg" -> 1, "m" -> 2, "s" -> -3), 1.0),
    "Hz" -> (Map("s" -> -1), 1.0),
    "L" -> (Map("m" -> 3), 1e-3),
    "m/s" -> (Map("m" -> 1, "s" -> -1), 1.0))

  /** Canonical rendering of a dimension vector: "kg*m2/s2" (alphabetical
    * within numerator and denominator; "-" for dimensionless). */
  def render(dims: Map[String, Int]): String = {
    val pos = dims.filter(_._2 > 0).toSeq.sortBy(_._1)
      .map { case (u, e) => if (e == 1) u else s"$u$e" }
    val neg = dims.filter(_._2 < 0).toSeq.sortBy(_._1)
      .map { case (u, e) => if (e == -1) u else s"$u${-e}" }
    if (pos.isEmpty && neg.isEmpty) "-"
    else (if (pos.isEmpty) "1" else pos.mkString("*")) +
      (if (neg.isEmpty) "" else neg.mkString("/", "/", ""))
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
