package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.origin._

/** HTML provenance rendering — structure mirrors the reference renderer
  * (pdtable/table_origin.py:408-425): leaf = anchor.input-table-origin with
  * the interactive URI, branch = div.derived-table-origin with the
  * operation span and a list of parents. */
class OriginHtmlSpec extends AnyFunSuite {

  private def fileLeaf(path: String, sheet: Option[String], row: Int): TableOrigin = {
    val f = FilesystemLocationFile(java.nio.file.Paths.get(path),
      LoadItem(path, None))
    TableOrigin.leaf(f.makeLocationSheet(sheet).makeLocationBlock(row))
  }

  test("leaf renders as an anchor with interactive URI and identifier") {
    val html = fileLeaf("/data/in.csv", None, 4).renderHtml
    assert(html.startsWith("""<a href="file:///data/in.csv#'Sheet1'!A4""""))
    assert(html.contains("""class="input-table-origin""""))
    assert(html.contains(">Row 4 of '/data/in.csv'</a>"))
  }

  test("sheet-addressed leaf uses the Excel-style identifier and fragment") {
    val html = fileLeaf("/data/book.xlsx", Some("inputs"), 7).renderHtml
    assert(html.contains("#'inputs'!A7"))
    assert(html.contains(">'inputs'!A7 of '/data/book.xlsx'</a>"))
  }

  test("branch renders operation span with one li per parent, nested") {
    val tree = TableOrigin.branch("concat",
      Seq(fileLeaf("/a.csv", None, 1),
        TableOrigin.branch("filter", Seq(fileLeaf("/b.csv", None, 2)))))
    val html = tree.renderHtml
    assert(html.startsWith("""<div class="derived-table-origin"><span>concat</span><ul>"""))
    assert(html.endsWith("</ul></div>"))
    // two parents → two list items; nested branch keeps its own div
    assert(html.sliding(4).count(_ == "<li>") == 3) // 2 outer + 1 inner
    assert(html.contains("""<span>filter</span>"""))
  }

  test("operation text and identifiers are HTML-escaped") {
    val tree = TableOrigin.branch("join<on & \"key\">",
      Seq(fileLeaf("/x<y>.csv", None, 1)))
    val html = tree.renderHtml
    assert(html.contains("join&lt;on &amp; &quot;key&quot;&gt;"))
    assert(html.contains("x&lt;y&gt;.csv"))
    assert(!html.contains("join<on"))
  }

  test("stream input renders with empty href (no interactive URI)") {
    val f = NullLocationFile("<stream>")
    val html = TableOrigin.leaf(
      f.makeLocationSheet(None).makeLocationBlock(0)).renderHtml
    assert(html.startsWith("""<a href="" class="input-table-origin">"""))
    assert(html.contains("&lt;stream&gt;"))
  }

  test("text render of the same tree is unchanged (both renderers coexist)") {
    val tree = TableOrigin.branch("concat", Seq(fileLeaf("/a.csv", None, 1)))
    assert(tree.render() == "concat\n  Row 1 of '/a.csv'")
  }

  test("interactiveOpen launches the OS opener with the location's URI " +
    "(captured through the injectable launcher; per-platform argv)") {
    // per-platform command construction is a pure function
    assert(InteractiveOpen.openCommand("file:///x.csv", "Linux") ==
      Seq("xdg-open", "file:///x.csv"))
    assert(InteractiveOpen.openCommand("file:///x.csv", "Mac OS X") ==
      Seq("open", "file:///x.csv"))
    assert(InteractiveOpen.openCommand("file:///x.csv", "Windows 11") ==
      Seq("cmd", "/c", "start", "", "file:///x.csv"))
    // the block open resolves sheet+row into the Excel-style fragment and
    // hands it to the launcher — captured, not executed
    val captured = scala.collection.mutable.ArrayBuffer.empty[Seq[String]]
    val prev = InteractiveOpen.launcher
    InteractiveOpen.launcher = argv => captured += argv
    try {
      val p = java.nio.file.Files.createTempFile("graft_open", ".xlsx")
      val f = FilesystemLocationFile(p, LoadItem(p.toString, None))
      f.makeLocationSheet(Some("Sheet2")).makeLocationBlock(7).interactiveOpen()
      assert(captured.size == 1)
      val expected = f.interactiveUri(Some("Sheet2"), Some(7)).get
      assert(captured.head == InteractiveOpen.openCommand(expected),
        s"launched ${captured.head}, expected opener for $expected")
      assert(expected.endsWith("#'Sheet2'!A7"))
      // a stream input has no URI → loud refusal, nothing launched
      val e = intercept[UnsupportedOperationException] {
        NullLocationFile("<stream>").interactiveOpen()
      }
      assert(e.getMessage.contains("<stream>"))
      assert(captured.size == 1)
    } finally InteractiveOpen.launcher = prev
  }
}
