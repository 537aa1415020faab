package graft.origin

/** Provenance model for StarTable inputs.
  *
  * Mirrors the semantics of the reference implementation's provenance layer
  * (reference: pdtable/table_origin.py:122-405): a table's origin is either a
  * leaf (a concrete location in a loaded input) or a branch (an operation over
  * parent origins). Locations form a file → sheet → block hierarchy.
  */

/** A load specification: what was asked to be loaded, and from where.
  *
  * reference: pdtable/table_origin.py:36-64 (LoadItem / load_history chain).
  */
final case class LoadItem(spec: String, source: Option[LoadLocation]) {
  /** Chain of include specifications up to the root. */
  def loadHistory: List[LoadItem] =
    this :: source.map(_.loadItem.loadHistory).getOrElse(Nil)

  override def toString: String = {
    val src = source.map(s => s" included from ${s.loadIdentifier}").getOrElse("")
    s"$spec$src"
  }
}

/** Any location that a LoadItem can resolve to (file or folder). */
trait LoadLocation {
  def loadItem: LoadItem
  /** Unique identifier for loop detection / caching (e.g. abs-path@mtime). */
  def loadIdentifier: String
  def localFolderPath: Option[java.nio.file.Path]
}

/** Cross-platform interactive launch of a URI through the OS's opener
  * (reference: pdtable/table_origin.py:67-75 interactive_open_uri).
  * The platform argv is a pure function (testable headless) and the
  * process spawn goes through an INJECTABLE launcher: specs and headless
  * deployments capture the command instead of executing it, while the
  * default launcher hands the URI to the desktop environment. */
object InteractiveOpen {
  /** Platform opener argv: Windows `cmd /c start` (the os.startfile
    * analog), macOS `open`, elsewhere `xdg-open`. */
  def openCommand(uri: String,
                  osName: String = sys.props.getOrElse("os.name", ""))
      : Seq[String] = {
    val os = osName.toLowerCase(java.util.Locale.ROOT)
    if (os.contains("win")) Seq("cmd", "/c", "start", "", uri)
    else if (os.contains("mac")) Seq("open", uri)
    else Seq("xdg-open", uri)
  }

  /** The process launcher; replaceable for capture in specs/headless. */
  @volatile var launcher: Seq[String] => Unit =
    argv => { new ProcessBuilder(argv: _*).start(); () }

  def openUri(uri: String): Unit = launcher(openCommand(uri))
}

/** Shared interactive-identifier defaults for file-like locations —
  * reference: pdtable/table_origin.py:150-160. */
trait InteractiveLocation {
  def loadIdentifier: String

  /** Human-facing identifier for a (sheet, row) within this file; defaults
    * to the load identifier plus location, as the reference's base class. */
  def getInteractiveIdentifier(sheet: Option[String], row: Option[Int]): String = {
    val sLoc = sheet.map(s => s" Sheet '$s'").getOrElse("")
    val rLoc = row.map(r => s" Row $r").getOrElse("")
    s"$loadIdentifier$sLoc$rLoc"
  }

  /** URI that would open the location in an interactive tool; None for
    * non-addressable inputs (streams). */
  def interactiveUri(sheet: Option[String], row: Option[Int]): Option[String] = None

  /** Launch the location in the OS's associated tool (reference:
    * table_origin.py:146-148 interactive_open): resolve the URI, hand it
    * to [[InteractiveOpen]]. Non-addressable inputs refuse loudly. */
  def interactiveOpen(sheet: Option[String] = None,
                      row: Option[Int] = None): Unit =
    interactiveUri(sheet, row) match {
      case Some(uri) => InteractiveOpen.openUri(uri)
      case None => throw new UnsupportedOperationException(
        s"interactiveOpen: '$loadIdentifier' has no interactive URI " +
          "(stream / in-memory input)")
    }
}

/** A folder input location (reference: pdtable/io/load/_loaders.py:81-123). */
final case class LocationFolder(
    localPath: java.nio.file.Path,
    loadItem: LoadItem
) extends LoadLocation {
  def loadIdentifier: String = localPath.toString
  def localFolderPath: Option[java.nio.file.Path] = Some(localPath)
}

/** A file input location (reference: pdtable/table_origin.py:122-293). */
trait LocationFile extends LoadLocation with InteractiveLocation {
  def makeLocationSheet(sheetName: Option[String] = None): LocationSheet =
    LocationSheet(this, sheetName)
}

/** File on a local filesystem; identifier is absolute path (+mtime when
  * available), matching FilesystemLocationFile (table_origin.py:224-293). */
final case class FilesystemLocationFile(
    localPath: java.nio.file.Path,
    loadItem: LoadItem
) extends LocationFile {
  def loadIdentifier: String = {
    val mtime =
      try java.nio.file.Files.getLastModifiedTime(localPath).toMillis.toString
      catch { case _: Throwable => "?" }
    s"${localPath.toAbsolutePath}@$mtime"
  }
  def localFolderPath: Option[java.nio.file.Path] = Option(localPath.getParent)

  /** "Row 4 of 'file.csv'" / "'Sheet1'!A4 of 'file.csv'"
    * (table_origin.py:274-279). */
  override def getInteractiveIdentifier(sheet: Option[String], row: Option[Int]): String = {
    val loc = sheet match {
      case None    => s"Row ${row.getOrElse(0)}"
      case Some(s) => s"'$s'!A${row.getOrElse(0)}"
    }
    s"$loc of '$localPath'"
  }

  /** file:// URI with an Excel-style fragment (table_origin.py:281-293). */
  override def interactiveUri(sheet: Option[String], row: Option[Int]): Option[String] = {
    val fileUri = localPath.toAbsolutePath.toUri.toString
    if (sheet.isEmpty && row.isEmpty) Some(fileUri)
    else {
      val sh = sheet.getOrElse("Sheet1")
      val rowMark = row.map(r => s"!A$r").getOrElse("")
      Some(s"$fileUri#'$sh'$rowMark")
    }
  }
  override def toString: String = localPath.toString
}

/** Placeholder for stream / in-memory input (table_origin.py:193-221). */
final case class NullLocationFile(description: String = "<stream>")
    extends LocationFile {
  def loadItem: LoadItem = LoadItem(description, None)
  def loadIdentifier: String = description
  def localFolderPath: Option[java.nio.file.Path] = None
  override def toString: String = description
}

/** A sheet within a file (trivial for CSV) (table_origin.py:296-303). */
final case class LocationSheet(file: LocationFile, sheetName: Option[String]) {
  def makeLocationBlock(row: Int): LocationBlock = LocationBlock(this, row)
}

/** A block at a row within a sheet (table_origin.py:306-347). */
final case class LocationBlock(sheet: LocationSheet, row: Int) {
  def interactiveIdentifier: String =
    sheet.file.getInteractiveIdentifier(sheet.sheetName, Some(row))
  def interactiveUri: Option[String] =
    sheet.file.interactiveUri(sheet.sheetName, Some(row))
  def interactiveOpen(): Unit =
    sheet.file.interactiveOpen(sheet.sheetName, Some(row))
  override def toString: String = {
    val sh = sheet.sheetName.map(s => s" sheet '$s'").getOrElse("")
    s"Row $row$sh of '${sheet.file}'"
  }
}

/** Provenance tree: leaf = loaded input location; branch = operation over
  * parents (table_origin.py:350-405).
  */
final case class TableOrigin(
    inputLocation: Option[LocationBlock] = None,
    operation: Option[String] = None,
    parents: Seq[TableOrigin] = Nil
) {
  require(
    inputLocation.isEmpty || (operation.isEmpty && parents.isEmpty),
    "TableOrigin is either a leaf (inputLocation) or a branch (operation+parents)"
  )
  def isLeaf: Boolean = inputLocation.nonEmpty

  /** Render as an indented tree (table_origin.py:428-443,
    * table_origin_as_str). */
  def render(indent: Int = 0): String = {
    val pad = "  " * indent
    if (isLeaf) s"$pad${inputLocation.get}"
    else {
      val op = operation.getOrElse("<operation>")
      (s"$pad$op" +: parents.map(_.render(indent + 1))).mkString("\n")
    }
  }

  /** Render as HTML, mirroring the reference's structure exactly
    * (table_origin.py:408-425, table_origin_as_html): a leaf is an anchor
    * with class "input-table-origin" (href = the interactive URI when the
    * location has one), a branch is a div with class "derived-table-origin"
    * wrapping the operation and a list of parents. Notebook/report-facing
    * counterpart of [[render]]. */
  def renderHtml: String =
    if (isLeaf) {
      val loc = inputLocation.get
      val href = loc.interactiveUri.map(TableOrigin.escapeHtml).getOrElse("")
      val id = TableOrigin.escapeHtml(loc.interactiveIdentifier)
      s"""<a href="$href" class="input-table-origin">$id</a>"""
    } else {
      val op = TableOrigin.escapeHtml(operation.getOrElse("<operation>"))
      val items = parents.map(p => s"<li>${p.renderHtml}</li>").mkString("\n")
      s"""<div class="derived-table-origin"><span>$op</span><ul>""" +
        items + "</ul></div>"
    }

  override def toString: String =
    if (isLeaf) inputLocation.get.toString
    else operation.getOrElse("<unknown origin>")
}

object TableOrigin {
  private[origin] def escapeHtml(s: String): String =
    s.flatMap {
      case '&' => "&amp;"
      case '<' => "&lt;"
      case '>' => "&gt;"
      case '"' => "&quot;"
      case c   => c.toString
    }

  val empty: TableOrigin = TableOrigin()
  def leaf(loc: LocationBlock): TableOrigin = TableOrigin(inputLocation = Some(loc))
  def branch(operation: String, parents: Seq[TableOrigin]): TableOrigin =
    TableOrigin(operation = Some(operation), parents = parents)
}

/** An issue (error/warning) encountered while reading input.
  * reference: pdtable/table_origin.py:448-557.
  */
final case class InputIssue(
    message: String,
    severity: String, // "error" | "warning"
    loadItem: Option[LoadItem] = None,
    location: Option[AnyRef] = None
) {
  override def toString: String = s"[$severity] $message"
}

class InputError(msg: String) extends RuntimeException(msg)

/** Accumulate-or-raise strategy for input issues. */
trait InputIssueTracker {
  def addError(message: String, location: Option[AnyRef] = None): Unit
  def addWarning(message: String, location: Option[AnyRef] = None): Unit
  def issues: Seq[InputIssue]
  def isOk: Boolean = !issues.exists(_.severity == "error")
}

/** Default tracker: raises immediately on error (table_origin.py:528-545). */
final class NullInputIssueTracker extends InputIssueTracker {
  def addError(message: String, location: Option[AnyRef]): Unit =
    throw new InputError(message)
  def addWarning(message: String, location: Option[AnyRef]): Unit = ()
  def issues: Seq[InputIssue] = Nil
}

/** Collects issues for later inspection (table_origin.py:493-525).
  * Synchronized: the parallel load path reports from worker threads. */
final class AccumulatingInputIssueTracker extends InputIssueTracker {
  private val buf = scala.collection.mutable.ArrayBuffer.empty[InputIssue]
  def addError(message: String, location: Option[AnyRef]): Unit =
    synchronized { buf += InputIssue(message, "error", location = location) }
  def addWarning(message: String, location: Option[AnyRef]): Unit =
    synchronized { buf += InputIssue(message, "warning", location = location) }
  def issues: Seq[InputIssue] = synchronized { buf.toSeq }
}
