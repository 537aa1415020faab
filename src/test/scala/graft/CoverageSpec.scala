package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.io.CsvReader
import graft.load.Load
import graft.model._
import graft.origin.LocationTree
import graft.parse._
import graft.units.{Affine, BuiltinUnitConverter}

/** Coverage for the remaining SURVEY §2 inventory rows: transpose,
  * location trees, template-row passthrough, normalized bundle read. */
class CoverageSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("transpose: new columns are all text (test_pdtable.py:400-407)") {
    val t = CsvReader.readBundleFromString(spark,
      "**t\nall\na;b\n-;text\n1;x\n2;y\n").unique("t")
    val tr = t.transpose()
    assert(tr.columnNames == Seq("column", "r0", "r1"))
    assert(tr.units.forall(_ == "text"))
    val rows = tr.df.collect().map(_.toSeq)
    assert(rows(0) == Seq("a", "1.0", "2.0"))
    assert(rows(1) == Seq("b", "x", "y"))
  }

  test("template rows surface as raw cells (legacy parity)") {
    val csv = "::template_thing;x\n:row;1\n\n**t\nall\nc\n-\n1\n"
    val blocks = CsvReader.readString(csv).toSeq
    val raw = blocks.collect { case (BlockType.TemplateRow, r: RawCells) => r }
    assert(raw.nonEmpty)
    assert(raw.head.grid.head.head == "::template_thing")
    assert(blocks.exists(_._1 == BlockType.Table))
  }

  test("make_location_trees inverts origins into a file forest (_tree.py:58-116)") {
    val dir = Files.createTempDirectory("graft_tree")
    Files.writeString(dir.resolve("outer.csv"),
      "***include\ninner.csv\n\n**t_outer\nall\nc\n-\n1\n")
    Files.writeString(dir.resolve("inner.csv"), "**t_inner\nall\nc\n-\n2\n")
    val bundle = Load.loadBundle(spark, Seq("outer.csv"), Some(dir))
    val trees = LocationTree.makeLocationTrees(bundle.tables)
    assert(trees.size == 1) // single root: outer.csv
    val rendered = trees.head.render()
    assert(rendered.contains("outer.csv"))
    assert(rendered.contains("inner.csv"))
    assert(rendered.contains("[table t_outer]"))
    assert(rendered.contains("[table t_inner]"))
  }

  test("read_bundle_from_csv with bulk unit normalization (utils.py:14-62)") {
    val dir = Files.createTempDirectory("graft_norm")
    val p = dir.resolve("units.csv")
    Files.writeString(p,
      "**lengths\nall\nname;len\ntext;mm\na;1000\n\n**other\nall\nx\nmm\n500\n")
    val km = new BuiltinUnitConverter()
    val bundle = CsvReader.readBundle(spark, p,
      convertUnitsTo = name =>
        if (name == "lengths") Some(UnitTargets.AllBase) else None,
      converter = km)
    assert(bundle.unique("lengths").unit("len") == "m")
    assert(bundle.unique("lengths").df.collect()(0).getDouble(1) == 1.0)
    // untouched table keeps its units
    assert(bundle.unique("other").unit("x") == "mm")
  }
}
