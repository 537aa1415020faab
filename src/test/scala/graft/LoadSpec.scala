package graft

import java.nio.file.{Files, Path}

import org.scalatest.funsuite.AnyFunSuite

import graft.load._
import graft.model.TableBundle
import graft.origin._
import graft.parse._

/** Ports of pdtable/test/io/test_load.py: include resolution (relative and
  * root-absolute), folder scan, loop detection.
  */
class LoadSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  def withTempDir[T](f: Path => T): T = {
    val dir = Files.createTempDirectory("graft_load")
    f(dir)
  }

  val barCsv = "**bar_table\nall\ncol_1;col_2\n-;-\n1;1\n"

  test("include: relative and root-absolute specs (with_include fixture)") {
    withTempDir { dir =>
      Files.writeString(dir.resolve("input_foo.csv"),
        "***include\nbar.csv\n/bar_abs.csv\n")
      Files.writeString(dir.resolve("bar.csv"), barCsv)
      Files.writeString(dir.resolve("bar_abs.csv"),
        "**abs_table\nall\ncol_1\n-\n7\n")
      val blocks = Load.loadFiles(Seq("input_foo.csv"), rootFolder = Some(dir))
      val names = blocks.collect { case (BlockType.Table, t: ParsedTable) => t.name }
      assert(names.toSet == Set("bar_table", "abs_table"))
    }
  }

  test("include loop detected (with_loop_include, test_load.py:115)") {
    withTempDir { dir =>
      Files.writeString(dir.resolve("load_include_loop.csv"),
        "***include\nload_include_loop.csv\n\n" + barCsv)
      val tracker = new AccumulatingInputIssueTracker()
      Load.loadFiles(Seq("load_include_loop.csv"), rootFolder = Some(dir),
        issueTracker = tracker)
      assert(tracker.issues.exists(i =>
        i.severity == "error" && i.message.contains("loop")))
    }
  }

  test("duplicate include via two paths loads once") {
    withTempDir { dir =>
      Files.writeString(dir.resolve("a.csv"), "***include\nshared.csv\n")
      Files.writeString(dir.resolve("b.csv"), "***include\nshared.csv\n")
      Files.writeString(dir.resolve("shared.csv"), barCsv)
      val blocks = Load.loadFiles(Seq("a.csv", "b.csv"), rootFolder = Some(dir))
      val names = blocks.collect { case (BlockType.Table, t: ParsedTable) => t.name }
      assert(names == Seq("bar_table"))
    }
  }

  test("folder scan picks up csv files, excludes excel temp names") {
    withTempDir { dir =>
      val sub = Files.createDirectory(dir.resolve("inputs"))
      Files.writeString(sub.resolve("one.csv"), barCsv)
      Files.writeString(sub.resolve("two.csv"), "**t2\nall\nc\n-\n3\n")
      Files.writeString(sub.resolve("~$junk.csv"), "garbage")
      Files.writeString(sub.resolve("readme.txt"), "not a table")
      val blocks = Load.loadFiles(Seq("inputs"), rootFolder = Some(dir))
      val names = blocks.collect { case (BlockType.Table, t: ParsedTable) => t.name }
      assert(names.toSet == Set("bar_table", "t2"))
    }
  }

  test("escape outside root folder rejected (_loaders.py:142-234)") {
    withTempDir { dir =>
      val sub = Files.createDirectory(dir.resolve("root"))
      Files.writeString(dir.resolve("outside.csv"), barCsv)
      Files.writeString(sub.resolve("main.csv"), "***include\n../outside.csv\n")
      val tracker = new AccumulatingInputIssueTracker()
      Load.loadFiles(Seq("main.csv"), rootFolder = Some(sub), issueTracker = tracker)
      assert(tracker.issues.exists(_.message.contains("escapes root")))
    }
  }

  test("origin records load provenance chain") {
    withTempDir { dir =>
      Files.writeString(dir.resolve("outer.csv"), "***include\ninner.csv\n")
      Files.writeString(dir.resolve("inner.csv"), barCsv)
      val blocks = Load.loadFiles(Seq("outer.csv"), rootFolder = Some(dir))
      val t = blocks.collectFirst { case (BlockType.Table, t: ParsedTable) => t }.get
      assert(t.origin.isLeaf)
      val loc = t.origin.inputLocation.get
      assert(loc.sheet.file.toString.contains("inner.csv"))
      // the load chain remembers it was included from outer.csv
      val chain = loc.sheet.file.loadItem.loadHistory
      assert(chain.exists(_.source.exists(_.loadIdentifier.contains("outer.csv"))))
    }
  }

  test("parallel load equals serial load, including include expansion") {
    withTempDir { dir =>
      // 24 files, one of which includes two others (the include chain must
      // still resolve and dedupe under the wave-parallel scheduler)
      (0 until 24).foreach { i =>
        Files.writeString(dir.resolve(f"t$i%02d.csv"),
          s"**table_$i\nall\na;b\n-;text\n$i;row$i\n")
      }
      Files.writeString(dir.resolve("main.csv"),
        "***include\nt01.csv\nt02.csv\n\n**main_table\nall\nx\n-\n9\n")
      def names(blocks: Seq[(BlockType, Block)]) = blocks.collect {
        case (BlockType.Table, p: ParsedTable) => p.name
      }
      val serial = Load.loadFiles(Seq("."), Some(dir))
      val parallel = Load.loadFiles(Seq("."), Some(dir), parallelism = 8)
      assert(names(parallel) == names(serial))
      assert(parallel.size == serial.size)
      // loop detection still fires under the parallel scheduler
      Files.writeString(dir.resolve("loop_a.csv"), "***include\nloop_b.csv\n")
      Files.writeString(dir.resolve("loop_b.csv"), "***include\nloop_a.csv\n")
      val tracker = new AccumulatingInputIssueTracker()
      Load.loadFiles(Seq("loop_a.csv"), Some(dir), issueTracker = tracker,
        parallelism = 4)
      assert(tracker.issues.exists(_.message.contains("loop")))
    }
  }

  test("loaded bundle materializes as StarTables") {
    withTempDir { dir =>
      Files.writeString(dir.resolve("main.csv"), barCsv)
      val bundle: TableBundle = Load.loadBundle(spark, Seq("main.csv"), Some(dir))
      assert(bundle.unique("bar_table").df.count() == 1)
      assert(bundle.unique("bar_table").columnNames == Seq("col_1", "col_2"))
    }
  }

  test("parallel wave order is deterministic with MANY include-bearing files") {
    withTempDir { dir =>
      // 12 include-bearing files, each pulling two children: with a shared
      // queue the next-wave order would be thread-scheduling-dependent; the
      // per-file enqueue buffers replay in wave order, so repeated parallel
      // runs and the serial run must agree on the FULL block order.
      (0 until 12).foreach { i =>
        Files.writeString(dir.resolve(f"inc$i%02d.csv"),
          f"***include\nchild${i}%02d_a.csv\nchild${i}%02d_b.csv\n\n**inc_table_$i%02d\nall\nx\n-\n$i\n")
        Files.writeString(dir.resolve(f"child$i%02d_a.csv"),
          f"**child_a_$i%02d\nall\ny\n-\n$i\n")
        Files.writeString(dir.resolve(f"child$i%02d_b.csv"),
          f"**child_b_$i%02d\nall\ny\n-\n$i\n")
      }
      def names(blocks: Seq[(BlockType, Block)]) = blocks.collect {
        case (BlockType.Table, p: ParsedTable) => p.name
      }
      val serial = names(Load.loadFiles(Seq("."), Some(dir)))
      (1 to 3).foreach { _ =>
        val par = names(Load.loadFiles(Seq("."), Some(dir), parallelism = 6))
        assert(par == serial, "parallel block order diverged from serial")
      }
    }
  }

  test("band_hashes refuses band ranges past the signature end") {
    val s = TestSpark.spark
    import s.implicits._
    import org.apache.spark.sql.functions.col
    val df = Seq(Tuple1(Seq(1L, 2L, 3L, 4L))).toDF("sig")
    // 3 bands x 2 rows = 6 > 4 slots: the third band would fold nothing and
    // bucket every row together — must refuse loudly
    val ex = intercept[Exception] {
      df.select(graft.functions.Dedup.lshBandKeys(col("sig"), 3, 2)).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => e.getMessage +: messages(e.getCause))
    assert(messages(ex).exists(m => m != null && m.contains("band_hashes")), ex.toString)
    // exact fit still works
    val ok = df.select(graft.functions.Dedup.lshBandKeys(col("sig"), 2, 2)).collect()
    assert(ok.head.getSeq[Long](0).size == 2)
    // and the operator-level guard rejects a non-divisible band count
    assertThrows[IllegalArgumentException] {
      graft.functions.Dedup.minhashCandidates(
        Seq((1L, "a b c")).toDF("doc_id", "text"), "doc_id", "text",
        numHashes = 32, bands = 5)
    }
  }
}
