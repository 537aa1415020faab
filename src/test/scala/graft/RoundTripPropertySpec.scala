package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.io.{CsvReader, CsvWriter, JsonIo}
import graft.model._
import graft.origin.TableOrigin
import graft.parse.ParsedTable

/** Property-based round-trip invariance the reference lacks (SURVEY §5 port
  * strategy item 4): random table → write → read → equalsTable, for both CSV
  * and JSON.
  */
class RoundTripPropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** Deterministic forAll over raw ScalaCheck (no scalatestplus bridge in
    * the offline dependency set): fixed seed sequence, n samples. */
  private def checkAll[A](gen: Gen[A], n: Int)(body: A => Unit): Unit =
    (0 until n).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(42L + i)).foreach(body)
    }

  private val nameGen = Gen.alphaLowerStr.suchThat(_.nonEmpty).map(_.take(8))
  // text cells: non-empty printable without the separator/newline; the
  // StarTable format cannot represent leading/trailing whitespace (strip on
  // parse) nor cells equal to missing markers.
  private val textCell = Gen.alphaNumStr.map(s => if (s.isEmpty) "x" else s.take(12))
  private val doubleCell: Gen[java.lang.Double] = Gen.frequency(
    8 -> Gen.chooseNum(-1e6, 1e6).map(d => java.lang.Double.valueOf(math.round(d * 100.0) / 100.0)),
    1 -> Gen.const(null.asInstanceOf[java.lang.Double]))
  private val boolCell: Gen[java.lang.Boolean] =
    Gen.oneOf(java.lang.Boolean.TRUE, java.lang.Boolean.FALSE)
  private val tsCell: Gen[AnyRef] = Gen.frequency(
    8 -> Gen.chooseNum(0L, 4102444800L).map(s =>
      java.sql.Timestamp.valueOf(
        java.time.LocalDateTime.ofEpochSecond(s, 0, java.time.ZoneOffset.UTC))),
    1 -> Gen.const(null))

  private val colGen: Gen[(String, Gen[Any])] = Gen.oneOf(
    ("text", textCell.asInstanceOf[Gen[Any]]),
    ("-", doubleCell.asInstanceOf[Gen[Any]]),
    ("kg", doubleCell.asInstanceOf[Gen[Any]]),
    ("onoff", boolCell.asInstanceOf[Gen[Any]]),
    ("datetime", tsCell.asInstanceOf[Gen[Any]]))

  private val tableGen: Gen[ParsedTable] = for {
    name <- nameGen
    nCols <- Gen.chooseNum(1, 5)
    nRows <- Gen.chooseNum(0, 12)
    unitsAndGens <- Gen.listOfN(nCols, colGen)
    columns <- Gen.sequence[Seq[Seq[Any]], Seq[Any]](
      unitsAndGens.map { case (_, g) => Gen.listOfN(nRows, g).map(_.toSeq) })
    transposed <- Gen.oneOf(true, false)
  } yield ParsedTable(
    name = name,
    destinations = Set("all"),
    columnNames = (1 to nCols).map(i => s"c$i"),
    units = unitsAndGens.map(_._1),
    columns = columns,
    transposed = transposed && nRows > 0, // transposed layout needs >=1 row
    origin = TableOrigin.empty)

  test("random table -> CSV -> parse -> equalsTable") {
    checkAll(tableGen, 25) { p =>
      val t = StarTable.fromParsed(spark, p)
      val written = CsvWriter.tableToCsvString(t)
      val back = CsvReader.readBundleFromString(spark, written).unique(p.name)
      assert(t.equalsTable(back), s"CSV round-trip failed for:\n$written")
    }
  }

  test("random table -> XLSX -> parse -> equalsTable (styled and plain)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_prop_xlsx")
    var i = 0
    checkAll(tableGen, 15) { p =>
      val t = StarTable.fromParsed(spark, p)
      val path = dir.resolve(s"t$i.xlsx"); i += 1
      val styles = if (i % 2 == 0) Some(graft.io.XlsxStyles.default) else None
      graft.io.Xlsx.write(Seq(t), path, styles = styles)
      val back = graft.io.Xlsx.readBundle(spark, path).unique(p.name)
      assert(t.equalsTable(back), s"XLSX round-trip failed (styles=$styles) for ${p.name}")
    }
  }

  test("random table -> JSON -> parse -> equalsTable") {
    checkAll(tableGen, 25) { p =>
      val t = StarTable.fromParsed(spark, p)
      val js = JsonIo.tableToJsonString(t)
      val back = JsonIo.jsonDataToTable(spark, js)
      assert(t.equalsTable(back.copy(meta = back.meta.copy(transposed = p.transposed))),
        s"JSON round-trip failed for:\n$js")
    }
  }
}
