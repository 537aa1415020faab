package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.io.CsvReader
import graft.model.StarTable
import graft.parse.{Block, BlockType, ParsedTable}

/** Verbatim ports of ALL 12 with_errors fixer fixtures, checked against the
  * reference's expected auto-fixed outputs
  * (reference: pdtable/test/io/input/with_errors CSV files + auto_fixed.py,
  * harness pdtable/test/io/test_read_csv_fixer.py): the parsed malformed
  * input must equal the parsed well-formed golden. The FAT test mirrors
  * test_read_csv_fixer.test_FAT over the all.csv concatenation.
  */
class FixerGoldenSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  // ------------------------------------------------------- fixture inputs
  // Verbatim from pdtable/test/io/input/with_errors/*.csv (incl. trailing
  // "# error/handle" comment lines, which must be tolerated outside blocks).

  val cols1 =
    """**farm_cols1;;;
      |your_farm my_farm farms_galore;;;
      |species;  num;  flt;          dt;    flt;     flt;
      |text;       -;   kg;    datetime;     kg;      kg;
      |chicken;    2;    3;  2020-07-01;   3.21;     1.0;
      |pig;        4;   39;  2020-07-02;   39.1;     2.1;
      |goat;       4;    -;           -;    1.1;     3.2;
      |zybra;      4;    -;           -;    2.1;     4.3;
      |cow;      NaN;  200;           -;  200.2;     5.4;
      |goose;      2;    9;           -;    9.1;     6.5;
      |1234;       -;    -;           -;   7.11;     7.6;
      |
      |# error/handle: multiple columns w. same name
      |""".stripMargin

  // ex0.csv: a full FILE — metadata block, directive, free comment line,
  // table, template rows; the ";;1234;…" row (blank first cell) ends the
  // table before it.
  val ex0 =
    """Author:;JEACO
      |;;;
      |***RevisionHistory;;;
      |Date;Revision;Author;Description
      |21-03-2017;A;JEACO;Illustrative example
      |;;;
      |This line is not in a block -- it's just a comment;;;
      |;;;
      |**farm_animals0;;;
      |your_farm my_farm farms_galore;;;
      |species;n_legs;avg_weight;
      |text;-;kg;
      |chicken;2;3;
      |pig;4;30;
      |goat;4;-;
      |zybra;4;-;
      |cow;NaN;200;
      |goose;2;9;
      |;;1234;-;-;
      |;;;
      |::farm_animals;Lists some properties of typical farm animals;;
      |:n_legs;Typical number of legs for this species;;
      |:avg_weight;Average weight of adult individuals of this species;;
      |;;;
      |;;;
      |""".stripMargin

  val ex1 =
    """**farm_animals1;;;
      |your_farm my_farm farms_galore;;;
      |species;n_legs;avg_weight;
      |text;-;kg;
      |chicken;2;3;
      |pig;4;39;
      |goat;4;-;
      |zybra;4-;
      |cow;NaN;200;
      |goose;2;9;
      |;;1234;-;-;
      |
      |# error/handle: illegal value (missing ';') in table.farm_animals.zybra.n_legs
      |""".stripMargin

  val ex2 =
    """**farm_animals2;;;
      |your_farm my_farm farms_galore;;;
      |species;n_legs;avg_weight;
      |text;-;kg;
      |chicken;2;;
      |pig;4;39;
      |goat;4;-;
      |zybra;4;-;
      |cow;NaN;200;
      |goose;2;9;
      |;;1234;-;-;
      |
      |# error/handle: empty cell in chicken:avg_weight
      |""".stripMargin

  val ex3 =
    """**farm_animals3;;;
      |your_farm my_farm farms_galore;;;
      |species;n_legs;avg_weight;
      |text;-;kg;
      |chicken;2;tung;
      |pig;4;39;
      |goat;4;-;
      |zybra;4-;
      |cow;NaN;200;
      |goose;2;9;
      |;;1234;-;-;
      |
      |# error/handle: illegal float value "tung" in chicken:avg_weight
      |""".stripMargin

  val json1 =
    """**farm_json1;;;
      |your_farm my_farm farms_galore;;;
      |species;           dt;  num;  flt;         dt2;   encode;
      |text;        datetime;    -;   kg;    datetime;    onoff;
      |"chicken"; 2020-jl-01;    2;     ;  2020-07-01;        1;
      |pig;       2020-07-02;    4;   39;  2020-07-02;        0;
      |goat;               -;    a;    -;           -;        0;
      |z'ybra;             -;    4;    -;           -;        1;
      |'cow';              -;  NaN;  200;           -;        1;
      |goose;               ;    2;    9;           -;        0;
      |
      |# error/handle: escape " quotes when encoding json
      |""".stripMargin

  val row1 =
    """**farm_row1;;;
      |your_farm my_farm farms_galore;;;
      |species;n_legs;avg_weight;
      |text;-;kg;
      |chicken;2;3;
      |pig;4;39;
      |goat;4;-;
      |zybra;
      |cow;NaN;200;
      |goose;2;9;
      |;;1234;-;-;
      |
      |# error/handle: zybra has less columns.
      |""".stripMargin

  val row2 =
    """**farm_row2;;;
      |your_farm my_farm farms_galore;;;
      |species;n_legs;avg_weight;
      |text;-;kg;
      |chicken;2;3;
      |pig;4;39;
      |goat;4;-;
      |zybra;4;3;2;1
      |cow;NaN;200;
      |goose;2;9;
      |;;1234;-;-;
      |
      |# error/handle: zybra has two extra columns
      |""".stripMargin

  val types1 =
    """**farm_types1;;;
      |your_farm my_farm farms_galore;;;
      |species;  num;  flt;    log;
      |text;       -;   kg;  onoff;
      |chicken;    2;    3;      1;
      |pig;        4;   39;      0;
      |goat;       4;    -;      1;
      |zybra;      4;    -;      a;
      |cow;      NaN;  200;      1;
      |goose;      2;    9;       ;
      |
      |# error/handle: illegal value in table.farm_types1.zybra.log
      |# error/handle: missing value in table.farm_types2.goose.dt
      |""".stripMargin

  val types2 =
    """**farm_types2;;;
      |your_farm my_farm farms_galore;;;
      |species;  num;  flt;          dt;
      |text;       -;   kg;    datetime;
      |chicken;    2;    3;  2020-07-01;
      |pig;        4;   39;  2020-07-02;
      |goat;       4;    -;           -;
      |zybra;      4;    -;           a;
      |cow;      NaN;  200;           -;
      |goose;      2;    9;            ;
      |
      |# error/handle: illegal value in table.farm_types2.zybra.dt
      |# error/handle: missing value in table.farm_types2.1234.dt
      |""".stripMargin

  val types3 =
    """**farm_types3;;;
      |your_farm my_farm farms_galore;;;
      |species;         dt;  num;  flt;    log;         dt2;  flt2;    log2;
      |text;      datetime;    -;   kg;  onoff;    datetime;    kg;  onoff;
      |chicken; 2020-jl-01;    2;     ;      a;  2020-07-01;      ;      x;
      |pig;     2020-07-02;    4;   39;      0;  2020-07-02;    39;      0;
      |goat;             -;    a;    -;      1;           -;     b;      1;
      |zybra;            a;    4;    -;      0;           a;     -;      3;
      |cow;              -;  NaN;  200;      1;           -;   200;      1;
      |goose;             ;    2;    9;       ;            ;     9;       ;
      |
      |# error/handle: missing/illegal values in multiple columns of different types
      |""".stripMargin

  val units1 =
    """**farm_units1;;;
      |your_farm my_farm farms_galore;;;
      |species;  num;  flt;
      |text;       -;   kg;   unit1; unit2; unit3;
      |chicken;    2;    3;
      |pig;        4;   39;
      |goat;       4;    -;
      |zybra;      4;    -;
      |cow;      NaN;  200;
      |goose;      2;    9;
      |1234;       -;    -;
      |
      |# error/handle: more unit_names than columns
      |""".stripMargin

  // cat *.csv order (alphabetical), as the reference builds all.csv
  val allFixtures: Seq[(String, String)] = Seq(
    "farm_cols1" -> cols1, "farm_animals0" -> ex0, "farm_animals1" -> ex1,
    "farm_animals2" -> ex2, "farm_animals3" -> ex3, "farm_json1" -> json1,
    "farm_row1" -> row1, "farm_row2" -> row2, "farm_types1" -> types1,
    "farm_types2" -> types2, "farm_types3" -> types3, "farm_units1" -> units1)

  // ------------------------------------------------------------- harness

  private def parsed(csv: String, name: String): StarTable =
    CsvReader.readBundleFromString(spark, csv).unique(name)

  private def check(name: String, input: String, expected: String): Unit =
    test(s"$name: fixed input equals auto_fixed golden") {
      val in = parsed(input, name)
      val gold = parsed(expected, name)
      assert(in.equalsTable(gold),
        s"mismatch:\ninput:\n${graft.io.CsvWriter.tableToCsvString(in)}" +
          s"\ngolden:\n${graft.io.CsvWriter.tableToCsvString(gold)}")
    }

  // ---------------------------------------------------- auto_fixed goldens

  check("farm_animals0", ex0,
    """**farm_animals0;
      |your_farm my_farm farms_galore
      |species;n_legs;avg_weight
      |text;-;kg
      |chicken;2.0;3.0
      |pig;4.0;30.0
      |goat;4.0;-
      |zybra;4.0;-
      |cow;-;200.0
      |goose;2.0;9.0
      |""".stripMargin)

  check("farm_animals1", ex1,
    // "zybra;4-" parses as a short row with illegal "4-" → NaN + NaN pad
    """**farm_animals1;
      |your_farm my_farm farms_galore
      |species;n_legs;avg_weight
      |text;-;kg
      |chicken;2.0;3.0
      |pig;4.0;39.0
      |goat;4.0;-
      |zybra;-;-
      |cow;-;200.0
      |goose;2.0;9.0
      |""".stripMargin)

  check("farm_animals2", ex2,
    """**farm_animals2;
      |your_farm my_farm farms_galore
      |species;n_legs;avg_weight
      |text;-;kg
      |chicken;2.0;-
      |pig;4.0;39.0
      |goat;4.0;-
      |zybra;4.0;-
      |cow;-;200.0
      |goose;2.0;9.0
      |""".stripMargin)

  check("farm_animals3", ex3,
    // illegal "tung" → NaN; short zybra row as in ex1
    """**farm_animals3;
      |your_farm my_farm farms_galore
      |species;n_legs;avg_weight
      |text;-;kg
      |chicken;2.0;-
      |pig;4.0;39.0
      |goat;4.0;-
      |zybra;-;-
      |cow;-;200.0
      |goose;2.0;9.0
      |""".stripMargin)

  check("farm_row1", row1,
    // zybra row is short → padded with missing (row1.csv)
    """**farm_row1;
      |your_farm my_farm farms_galore
      |species;n_legs;avg_weight
      |text;-;kg
      |chicken;2.0;3.0
      |pig;4.0;39.0
      |goat;4.0;-
      |zybra;-;-
      |cow;-;200.0
      |goose;2.0;9.0
      |""".stripMargin)

  check("farm_row2", row2,
    // zybra row has two extra columns → trimmed (row2.csv)
    """**farm_row2;
      |your_farm my_farm farms_galore
      |species;n_legs;avg_weight
      |text;-;kg
      |chicken;2.0;3.0
      |pig;4.0;39.0
      |goat;4.0;-
      |zybra;4.0;3.0
      |cow;-;200.0
      |goose;2.0;9.0
      |""".stripMargin)

  check("farm_types2", types2,
    // illegal datetime 'a' and empty datetime → NaT (types2.csv)
    """**farm_types2;
      |your_farm my_farm farms_galore
      |species;num;flt;dt
      |text;-;kg;datetime
      |chicken;2.0;3.0;2020-07-01 00:00:00
      |pig;4.0;39.0;2020-07-02 00:00:00
      |goat;4.0;-;-
      |zybra;4.0;-;-
      |cow;-;200.0;-
      |goose;2.0;9.0;-
      |""".stripMargin)

  check("farm_types3", types3,
    // missing/illegal values across datetime, float, onoff columns (types3.csv)
    """**farm_types3;
      |your_farm my_farm farms_galore
      |species;dt;num;flt;log;dt2;flt2;log2
      |text;datetime;-;kg;onoff;datetime;kg;onoff
      |chicken;-;2.0;-;0;2020-07-01 00:00:00;-;0
      |pig;2020-07-02 00:00:00;4.0;39.0;0;2020-07-02 00:00:00;39.0;0
      |goat;-;-;-;1;-;-;1
      |zybra;-;4.0;-;0;-;-;0
      |cow;-;-;200.0;1;-;200.0;1
      |goose;-;2.0;9.0;0;-;9.0;0
      |""".stripMargin)

  check("farm_units1", units1,
    // more unit names than columns → extras ignored (units1.csv)
    """**farm_units1;
      |your_farm my_farm farms_galore
      |species;num;flt
      |text;-;kg
      |chicken;2.0;3.0
      |pig;4.0;39.0
      |goat;4.0;-
      |zybra;4.0;-
      |cow;-;200.0
      |goose;2.0;9.0
      |1234;-;-
      |""".stripMargin)

  check("farm_json1", json1,
    // quote characters pass through verbatim (json1.csv)
    """**farm_json1;
      |your_farm my_farm farms_galore
      |species;dt;num;flt;dt2;encode
      |text;datetime;-;kg;datetime;onoff
      |"chicken";-;2.0;-;2020-07-01 00:00:00;1
      |pig;2020-07-02 00:00:00;4.0;39.0;2020-07-02 00:00:00;0
      |goat;-;-;-;-;0
      |z'ybra;-;4.0;-;-;1
      |'cow';-;-;200.0;-;1
      |goose;-;2.0;9.0;-;0
      |""".stripMargin)

  // ------------------------------------------------------------ FAT tests

  test("ex0 parses as a full file: metadata + directive + table + template rows") {
    val blocks = CsvReader.readString(ex0).toSeq
    val byType = blocks.groupBy(_._1)
    assert(byType(BlockType.Metadata).nonEmpty)
    val dirs = byType(BlockType.Directive).map(_._2)
      .collect { case d: graft.parse.Directive => d }
    assert(dirs.map(_.name) == Seq("RevisionHistory"))
    assert(byType(BlockType.Table).size == 1)
    assert(byType(BlockType.TemplateRow).nonEmpty)
  }

  test("FAT: all.csv concatenation parses every fixture table with the default fixer") {
    // reference test_FAT: read the concatenation of all 12 fixtures, count
    // exactly one TABLE block per fixture and verify each against its
    // golden via the per-fixture checks' expectations (equalsTable).
    val allCsv = allFixtures.map(_._2).mkString("\n")
    val tables: Seq[ParsedTable] = CsvReader.readString(allCsv).collect {
      case (BlockType.Table, p: ParsedTable) => p
    }.toSeq
    assert(tables.map(_.name) == allFixtures.map(_._1))
    // every fixture parsed from all.csv equals the same fixture parsed alone
    tables.foreach { p =>
      val alone = allFixtures.toMap.apply(p.name)
      val t1 = StarTable.fromParsed(spark, p)
      val t2 = parsed(alone, p.name)
      assert(t1.equalsTable(t2), s"table ${p.name} differs in all.csv context")
    }
  }

  test("farm_json1 JSON export escapes quotes (json1.csv error/handle note)") {
    val t = parsed(
      "**q\nall\na\ntext\n\"x\"\n", "q")
    val js = graft.io.JsonIo.tableToJsonString(t)
    assert(js.contains("\\\"x\\\""))
    assert(graft.io.JsonIo.jsonDataToTable(spark, js).equalsTable(t))
  }
}
