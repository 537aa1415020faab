package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.io.CsvReader
import graft.model.StarTable

/** Verbatim ports of the remaining with_errors fixer fixtures, checked
  * against the reference's expected auto-fixed outputs
  * (reference: pdtable/test/io/input/with_errors CSV files + auto_fixed.py):
  * the parsed malformed input must equal the parsed well-formed golden.
  */
class FixerGoldenSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

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

  check("farm_row1",
    // zybra row is short → padded with missing (row1.csv)
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
      |""".stripMargin,
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

  check("farm_row2",
    // zybra row has two extra columns → trimmed (row2.csv)
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
      |""".stripMargin,
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

  check("farm_types2",
    // illegal datetime 'a' and empty datetime → NaT (types2.csv)
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
      |""".stripMargin,
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

  check("farm_types3",
    // missing/illegal values across datetime, float, onoff columns (types3.csv)
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
      |""".stripMargin,
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

  check("farm_units1",
    // more unit names than columns → extras ignored (units1.csv)
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
      |""".stripMargin,
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

  check("farm_animals2",
    // empty cell in numeric column → missing (ex2.csv)
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
      |""".stripMargin,
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

  check("farm_json1",
    // quote characters pass through verbatim (json1.csv)
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
      |""".stripMargin,
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

  test("farm_json1 JSON export escapes quotes (json1.csv error/handle note)") {
    val t = parsed(
      "**q\nall\na\ntext\n\"x\"\n", "q")
    val js = graft.io.JsonIo.tableToJsonString(t)
    assert(js.contains("\\\"x\\\""))
    assert(graft.io.JsonIo.jsonDataToTable(spark, js).equalsTable(t))
  }
}
