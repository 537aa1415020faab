package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.io.CsvReader
import graft.parse._

/** Ports of the reference's fixer tests (reference:
  * pdtable/test/io/test_read_csv_fixer.py + with_errors/ fixtures and
  * expected outputs in with_errors/auto_fixed.py).
  */
class FixerSpec extends AnyFunSuite {

  def table(csv: String, fixer: ParseFixer = new ParseFixer()): ParsedTable =
    CsvReader.readString(csv, fixer = fixer).collectFirst {
      case (BlockType.Table, t: ParsedTable) => t
    }.get

  // Verbatim from with_errors/cols1.csv: three duplicate 'flt' columns
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
      |""".stripMargin

  test("duplicate column names renamed to name_fixed_00N (auto_fixed.py cols1)") {
    val t = table(cols1)
    assert(t.columnNames ==
      Seq("species", "num", "flt", "dt", "flt_fixed_000", "flt_fixed_001"))
    assert(t.destinations == Set("your_farm", "my_farm", "farms_galore"))
    assert(t.columns(4)(0) == java.lang.Double.valueOf(3.21))
    assert(t.columns(5)(6) == java.lang.Double.valueOf(7.6))
    // 'NaN' literal in '-' column parses to missing
    assert(t.columns(1)(4) == null)
    // numeric-looking text cell stays text
    assert(t.columns(0)(6) == "1234")
  }

  // From with_errors/types1.csv: illegal onoff values fixed to false
  val types1 =
    """**farm_types1;;;
      |your_farm my_farm farms_galore;;;
      |species;  num;  flt;    log
      |text;       -;   kg;  onoff
      |zybra;      4;    -;      a
      |goose;      2;    9;
      |""".stripMargin

  test("illegal onoff value and empty onoff cell fixed to false") {
    val t = table(types1)
    assert(t.columns(3) == Seq(false, false).map(java.lang.Boolean.valueOf))
  }

  test("short rows padded with missing values") {
    val csv =
      """**short_rows
        |all
        |a;b;c
        |text;-;-
        |x;1
        |y
        |""".stripMargin
    val t = table(csv)
    assert(t.numRows == 2)
    assert(t.columns(1) == Seq(java.lang.Double.valueOf(1.0), null))
    assert(t.columns(2) == Seq(null, null))
  }

  test("fix count is reported") {
    val fixer = new ParseFixer()
    table(types1, fixer)
    assert(fixer.fixes == 2)
  }

  test("stopOnErrors raises after fixes (parse-error escalation, ex0-ex3)") {
    val fixer = new ParseFixer()
    fixer.stopOnErrors = true
    assertThrows[graft.origin.InputError] { table(cols1, fixer) }
  }

  test("custom fixer subclass hook is honored") {
    class MyFixer extends ParseFixer {
      var seen = 0
      override def fixIllegalCellValue(vtype: String, value: Any): Any = {
        seen += 1
        super.fixIllegalCellValue(vtype, value)
      }
    }
    val fixer = new MyFixer()
    table(types1, fixer)
    assert(fixer.seen == 2)
  }
}
