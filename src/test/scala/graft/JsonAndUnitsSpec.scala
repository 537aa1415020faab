package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.io.{CsvReader, JsonIo, JsonValue}
import graft.model._
import graft.units._

/** Ports of pdtable/test/io/test_json.py and pdtable/test/test_units.py. */
class JsonAndUnitsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  val placesJson: String =
    """{
      |  "name": "places_to_go",
      |  "destinations": {"all": null},
      |  "columns": {
      |    "place":    {"unit": "text",  "values": ["home", "work"]},
      |    "distance": {"unit": "km",    "values": [0.0, 1.0]},
      |    "is_hot":   {"unit": "onoff", "values": [true, false]}
      |  }
      |}""".stripMargin

  test("json_data -> table (test_json.py:27-125)") {
    val t = JsonIo.jsonDataToTable(spark, placesJson)
    assert(t.name == "places_to_go")
    assert(t.units == Seq("text", "km", "onoff"))
    assert(t.df.count() == 2)
  }

  test("table <-> json round trip preserves column order (test_json.py:193, 279)") {
    val t = JsonIo.jsonDataToTable(spark, placesJson)
    val js = JsonIo.tableToJsonString(t)
    val back = JsonIo.jsonDataToTable(spark, js)
    assert(t.equalsTable(back))
    assert(back.columnNames == Seq("place", "distance", "is_hot"))
  }

  test("NaN and NaT map to JSON null (test_json.py:168)") {
    val csv =
      """**t
        |all
        |x;dt
        |-;datetime
        |1;2020-01-01 00:00:00
        |-;-
        |""".stripMargin
    val t = CsvReader.readBundleFromString(spark, csv).unique("t")
    val js = JsonIo.tableToJsonString(t)
    assert(js.contains("[1,null]") || js.contains("[1, null]"))
    assert(js.contains(""""2020-01-01 00:00:00""""))
    val back = JsonIo.jsonDataToTable(spark, js)
    assert(t.equalsTable(back))
  }

  test("JSON codec handles escapes and nesting") {
    val v = JsonValue.parse("""{"a":[1,2.5,null,true],"b":"q\"\nA"}""")
    val s = JsonValue.write(v)
    assert(JsonValue.parse(s) == v)
  }

  // ---- units (reference: pdtable/test/test_units.py + demo/unit_converter.py)

  test("demo conversions: mm->m, C->K, g->kg (unit_converter.py:36-64)") {
    val c = BuiltinUnitConverter.default
    assert(c.convert(1000.0, "mm")._1 == 1.0)
    assert(c.convert(1000.0, "mm")._2 == "m")
    assert(c.convert(0.0, "C") == ((273.15, "K")))
    assert(c.convert(500.0, "g")._1 == 0.5)
    assert(c.transform("m", "mm")(1.0) == 1000.0)
    // alias support
    assert(c.transform("meter", "mm")(1.0) == 1000.0)
    assertThrows[UnitConversionError] { c.transform("kg", "m") }
  }

  test("engineering registry: pressure, energy, angle, imperial, speed, F<->C") {
    val c = BuiltinUnitConverter.default
    // pressure family converges on Pa
    assert(c.convert(1.0, "bar") == ((1e5, "Pa")))
    assert(math.abs(c.transform("psi", "kPa")(1.0) - 6.894757293168361) < 1e-12)
    assert(c.convert(1.0, "atm")._1 == 101325.0)
    // energy: kWh -> J and the cal alias path
    assert(c.convert(1.0, "kWh") == ((3.6e6, "J")))
    assert(c.transform("cal", "kJ")(1000.0) == 4.184)
    // angle: degrees (alias "deg"/"degree") -> rad
    assert(math.abs(c.transform("deg", "rad")(180.0) - math.Pi) < 1e-12)
    assert(math.abs(c.transform("degree", "grad")(90.0) - 100.0) < 1e-9)
    // imperial length/mass
    assert(c.transform("ft", "m")(1.0) == 0.3048)
    assert(c.transform("in", "cm")(1.0) == 2.54)
    assert(c.convert(1.0, "lb")._1 == 0.45359237)
    // affine temperature chain: F -> C round trip
    assert(math.abs(c.transform("F", "C")(212.0) - 100.0) < 1e-9)
    assert(math.abs(c.transform("C", "F")(37.0) - 98.6) < 1e-9)
    // speed
    assert(math.abs(c.transform("km/h", "m/s")(36.0) - 10.0) < 1e-12)
    // aliases resolve through canonical()
    assert(c.convert(1.0, "pascal")._2 == "Pa")
    assert(c.transform("hour", "minute")(1.0) == 60.0)
    // dimension mismatch still raises
    assertThrows[UnitConversionError] { c.transform("Pa", "J") }
  }

  def mmTable: StarTable = CsvReader.readBundleFromString(spark,
    """**lengths
      |all
      |name;len;temp;mass
      |text;mm;C;g
      |a;1000;0;500
      |b;2000;100;1500
      |""".stripMargin).unique("lengths")

  test("table convert_units to base: inconvertible columns skipped (proxy.py:318-425)") {
    val t = mmTable.convertUnits(UnitTargets.AllBase)
    assert(t.units == Seq("text", "m", "K", "kg"))
    val r = t.df.orderBy("name").collect()(0)
    assert(r.getDouble(1) == 1.0)
    assert(r.getDouble(2) == 273.15)
    assert(r.getDouble(3) == 0.5)
  }

  test("convert_units by name and by position") {
    val byName = mmTable.convertUnits(UnitTargets.ByName(Map("len" -> "m")))
    assert(byName.units == Seq("text", "m", "C", "g"))

    val byPos = mmTable.convertUnits(UnitTargets.ByPosition(
      Seq(None, Some("m"), None, Some("kg"))))
    assert(byPos.units == Seq("text", "m", "C", "kg"))

    assertThrows[IllegalArgumentException] {
      mmTable.convertUnits(UnitTargets.ByPosition(Seq(Some("m"))))
    }
  }

  test("convert on inconvertible indicator raises (proxy.py:16, 91-94)") {
    assertThrows[UnitConversionError] {
      mmTable.convertColumnUnits("name", Some("m"))
    }
  }

  test("custom converter trait is pluggable (test_units.py custom converter)") {
    val custom = new BuiltinUnitConverter(
      extra = Map("furlong" -> ("m", Affine(201.168))),
      aliases = Map("fur" -> "furlong"))
    val t = mmTable.convertColumnUnits("len", Some("furlong"), custom)
    assert(t.unit("len") == "furlong")
  }

  test("compound units: m/s family, kg*m2/s2 == J, N*m == J (dimensional algebra)") {
    val c = BuiltinUnitConverter.default
    // velocity expressions (atomic km/h registry entry vs parsed mi/h)
    assert(math.abs(c.transform("km/h", "m/s")(36.0) - 10.0) < 1e-12)
    assert(math.abs(c.transform("mi/h", "m/s")(1.0) - 0.44704) < 1e-12)
    // energy identities across families
    assert(math.abs(c.transform("kg*m2/s2", "J")(1.0) - 1.0) < 1e-12)
    assert(math.abs(c.transform("N*m", "J")(1.0) - 1.0) < 1e-12)
    assert(math.abs(c.transform("kN*mm", "J")(1.0) - 1.0) < 1e-12)
    // specific energy: kJ/kg == m2/s2 * 1000
    assert(math.abs(c.transform("kJ/kg", "m2/s2")(1.0) - 1000.0) < 1e-9)
    // pressure decomposes: bar == kN/m2 * 100
    assert(math.abs(c.transform("bar", "kN/m2")(1.0) - 100.0) < 1e-9)
    // exponent syntax variants and '/' chaining (left-assoc product)
    assert(math.abs(c.transform("kg*m^2/s^2", "J")(1.0) - 1.0) < 1e-12)
    assert(math.abs(c.transform("kg*m2/s/s", "J")(1.0) - 1.0) < 1e-12)
    // volume bridges to length-cubed through L's 1e-3 scale
    assert(math.abs(c.transform("L", "m3")(1000.0) - 1.0) < 1e-12)
    assert(math.abs(c.transform("mL", "cm3")(1.0) - 1.0) < 1e-12)
  }

  test("compound units: dimension mismatch and offset units raise") {
    val c = BuiltinUnitConverter.default
    val ex = intercept[UnitConversionError] { c.transform("kg*m/s2", "J") }
    assert(ex.getMessage.contains("incompatible dimensions"), ex.getMessage)
    // offset units are ill-defined inside compounds (no delta-units)
    assertThrows[UnitConversionError] { c.transform("C/s", "K/s") }
    assertThrows[UnitConversionError] { c.transform("C2", "K2") }
    // unknown token names the culprit
    val ex2 = intercept[UnitConversionError] { c.transform("furlong/s", "m/s") }
    assert(ex2.getMessage.contains("furlong"), ex2.getMessage)
  }

  test("compound units: baseUnit reports the canonical dimension rendering") {
    val c = BuiltinUnitConverter.default
    assert(c.baseUnit("kJ/kg") == Some("m2/s2"))
    assert(c.baseUnit("N*m") == Some("kg*m2/s2"))
    assert(c.baseUnit("1e-nonsense") == None)
    // dimensionless quotient
    assert(c.baseUnit("m/m") == Some("-"))
    // pure denominator renders with a leading 1
    assert(c.baseUnit("Hz") == Some("Hz")) // atomic registry wins for atomics
  }

  test("log units: dBm/dBW/dB/Np/octave/pH convert through the linear dimension") {
    val c = BuiltinUnitConverter.default
    def ~=(a: Double, b: Double): Boolean = math.abs(a - b) < 1e-9
    // log → linear: 0 dBm = 1 mW; 30 dBm = 1 W; base unit of dBm is W
    assert(~=(c.convert(0.0, "dBm", Some("W"))._1, 1e-3))
    assert(~=(c.convert(30.0, "dBm")._1, 1.0))
    assert(c.convert(30.0, "dBm")._2 == "W")
    assert(~=(c.convert(0.0, "dBm", Some("kW"))._1, 1e-6)) // post-affine leg
    // linear → log
    assert(~=(c.convert(1.0, "W", Some("dBm"))._1, 30.0))
    assert(~=(c.convert(100.0, "-", Some("dB"))._1, 20.0))
    // log → log with equal bases is exactly affine: dBm → dBW = x − 30
    assert(~=(c.convert(47.0, "dBm", Some("dBW"))._1, 17.0))
    // cross-base log → log: 1 Np = 20·log10(e) dB (power-ratio convention)
    assert(~=(c.convert(1.0, "Np", Some("dB"))._1, 20.0 * math.log10(math.E)))
    // octaves and decades are log counts of a ratio: 3 octaves = ×8
    assert(~=(c.convert(3.0, "octave", Some("-"))._1, 8.0))
    assert(~=(c.convert(8.0, "-", Some("octave"))._1, 3.0))
    // pH 7 is 1e-7 mol/L, and back
    assert(~=(c.convert(7.0, "pH", Some("mol/L"))._1, 1e-7))
    assert(~=(c.convert(1e-7, "mol/L", Some("pH"))._1, 7.0))
    // round trip through the log domain is identity
    assert(~=(c.convert(c.convert(13.0, "dBm", Some("W"))._1, "W", Some("dBm"))._1, 13.0))
    // the affine contract refuses log pairs loudly (valueTransform covers them)
    assertThrows[UnitConversionError] { c.transform("dBm", "W") }
    // dimensionally incompatible log conversions raise
    assertThrows[UnitConversionError] { c.convert(1.0, "dB", Some("pH")) }
    assertThrows[UnitConversionError] { c.convert(1.0, "dBm", Some("kg")) }
  }

  test("log-unit column conversion is a vectorized expression on the table") {
    val spark = TestSpark.spark
    import spark.implicits._
    val df = Seq((1L, 0.0), (2L, 30.0), (3L, 47.0)).toDF("id", "p")
    val t = StarTable(df, TableMetadata("signals"), Map.empty)
      .withUnit("p", "dBm")
    val w = t.convertColumnUnits("p", Some("W"))
    assert(w.unit("p") == "W")
    val got = w.df.orderBy("id").collect().map(_.getDouble(1))
    assert(got.zip(Seq(1e-3, 1.0, math.pow(10.0, 1.7))).forall {
      case (a, b) => math.abs(a - b) < 1e-9 })
    // no UDF: the plan is pure expression work
    assert(!w.df.queryExecution.executedPlan.toString.contains("BatchEval"))
    // "__base__" resolves a log unit to its linear dimension
    val base = t.convertColumnUnits("p", Some("__base__"))
    assert(base.unit("p") == "W")
  }
}
