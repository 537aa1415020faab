package graft.load

import java.nio.file.{Files, Path, Paths}

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import graft.io.{CsvReader, Xlsx}
import graft.model.TableBundle
import graft.origin._
import graft.parse.{Block, BlockType, Blocks, Directive, ParseFixer}

/** Input-set loading: roots + folders + `***include` expansion with origin
  * tracking and loop detection (reference: pdtable/io/load/_orchestrators.py +
  * _loaders.py). The reference is explicitly single-threaded
  * (_orchestrators.py:24); here independent files are parsed in parallel on a
  * work-queue since each file's parse is independent.
  */

/** What a resolved load item can do: produce blocks, possibly enqueueing more
  * load items on the orchestrator (reference: _protocol.py:40-104). */
trait Reader {
  def read(location: LoadLocation, orchestrator: LoadOrchestrator): Iterator[(BlockType, Block)]
}

trait Loader {
  def resolve(item: LoadItem, orchestrator: LoadOrchestrator): Option[(LoadLocation, Reader)]
}

trait LoadOrchestrator {
  def enqueue(item: LoadItem): Unit
  def issueTracker: InputIssueTracker
}

/** Dispatch csv (and pluggably other extensions) by file suffix
  * (reference: _loaders.py:34-78 FileReader). Excel is not in the offline
  * dependency set; register an additional reader for `.xlsx` to plug one in
  * (SURVEY §7.4). */
class FileReader(
    csvSep: String = CsvReader.DefaultSep,
    fixerFactory: () => ParseFixer = () => new ParseFixer(),
    additionalReaders: Map[String, (Path, LoadLocation, LoadOrchestrator) => Iterator[(BlockType, Block)]] = Map.empty
) extends Reader {
  def read(location: LoadLocation, orch: LoadOrchestrator): Iterator[(BlockType, Block)] = {
    val file = location.asInstanceOf[FilesystemLocationFile]
    val p = file.localPath
    val name = p.getFileName.toString.toLowerCase
    val ext = name.substring(name.lastIndexOf('.') + 1)
    ext match {
      case "csv" =>
        CsvReader.read(p, csvSep, fixer = fixerFactory(), loadItem = Some(file.loadItem))
      case "xlsx" if !additionalReaders.contains("xlsx") =>
        Xlsx.read(p, fixer = fixerFactory(), loadItem = Some(file.loadItem))
      case other if additionalReaders.contains(other) =>
        additionalReaders(other)(p, location, orch)
      case other =>
        orch.issueTracker.addError(s"Unsupported file extension: $other ($p)")
        Iterator.empty
    }
  }
}

/** Directory scan; matching files enqueued (reference: _loaders.py:130-139
  * FolderReader). Default pattern excludes Excel owner temp-files `~$…`
  * (reference: _loaders.py:345-349). */
class FolderReader(fileNamePattern: scala.util.matching.Regex = FolderReader.defaultPattern)
    extends Reader {
  def read(location: LoadLocation, orch: LoadOrchestrator): Iterator[(BlockType, Block)] = {
    val folder = location.asInstanceOf[LocationFolder]
    Files.list(folder.localPath).iterator().asScala
      .filter(p => fileNamePattern.matches(p.getFileName.toString))
      .toSeq.sortBy(_.getFileName.toString)
      .foreach { p =>
        orch.enqueue(LoadItem(p.getFileName.toString, Some(folder)))
      }
    Iterator.empty
  }
}
object FolderReader {
  val defaultPattern: scala.util.matching.Regex = """^(?!~\$).*\.(csv|xlsx)$""".r
}

/** Path resolution: relative to the including file; a leading '/' means
  * root-folder-relative; escapes outside the root are rejected
  * (reference: _loaders.py:142-234 FileSystemLoader). */
class FileSystemLoader(
    fileReader: Reader = new FileReader(),
    folderReader: Reader = new FolderReader(),
    rootFolder: Option[Path] = None
) extends Loader {
  def resolve(item: LoadItem, orch: LoadOrchestrator): Option[(LoadLocation, Reader)] = {
    val spec = item.spec.trim
    val resolved: Path =
      if (spec.startsWith("/")) {
        val root = rootFolder.getOrElse {
          orch.issueTracker.addError(s"Absolute include '$spec' without a root folder")
          return None
        }
        root.resolve(spec.stripPrefix("/")).normalize()
      } else {
        // Relative to the including file's folder; root items (no source)
        // resolve against the root folder (reference: _loaders.py:160-178).
        val base = item.source.flatMap(_.localFolderPath)
          .orElse(rootFolder).getOrElse(Paths.get("."))
        base.resolve(spec).normalize()
      }
    rootFolder.foreach { root =>
      if (!resolved.toAbsolutePath.startsWith(root.toAbsolutePath)) {
        orch.issueTracker.addError(
          s"Load item '$spec' escapes root folder '$root'")
        return None
      }
    }
    if (Files.isDirectory(resolved))
      Some((LocationFolder(resolved, item), folderReader))
    else if (Files.exists(resolved))
      Some((FilesystemLocationFile(resolved, item), fileReader))
    else {
      orch.issueTracker.addError(s"File not found: $resolved (spec '$spec')")
      None
    }
  }
}

/** `proto:` prefix dispatch to pluggable loaders, default `file:`
  * (reference: _loaders.py:237-259 ProtocolLoader). */
class ProtocolLoader(
    protocols: Map[String, Loader],
    default: Loader
) extends Loader {
  private val protoRe = """^(\w+):(.*)$""".r
  def resolve(item: LoadItem, orch: LoadOrchestrator): Option[(LoadLocation, Reader)] =
    item.spec match {
      case protoRe(proto, rest) if protocols.contains(proto) =>
        protocols(proto).resolve(item.copy(spec = rest), orch)
      case _ => default.resolve(item, orch)
    }
}

/** Intercepts `***include` directives: one load item per line, directive
  * swallowed (reference: _loaders.py:262-291 IncludeLoader/IncludeReader). */
class IncludeLoader(inner: Loader) extends Loader {
  def resolve(item: LoadItem, orch: LoadOrchestrator): Option[(LoadLocation, Reader)] =
    inner.resolve(item, orch).map { case (loc, reader) =>
      (loc, new IncludeReader(reader))
    }
}

class IncludeReader(inner: Reader) extends Reader {
  def read(location: LoadLocation, orch: LoadOrchestrator): Iterator[(BlockType, Block)] =
    inner.read(location, orch).filter {
      case (BlockType.Directive, d: Directive) if d.name == "include" =>
        d.lines.filter(_.trim.nonEmpty).foreach { line =>
          orch.enqueue(LoadItem(line.trim, Some(location)))
        }
        false
      case _ => true
    }
}

object Load {

  /** FIFO work-queue load with dedup by load_identifier and include-loop
    * detection (reference: _orchestrators.py:19-52 queued_load). */
  def queuedLoad(
      roots: Seq[LoadItem],
      loader: Loader,
      issueTracker0: InputIssueTracker = new NullInputIssueTracker()
  ): Seq[(BlockType, Block)] = {
    val queue = mutable.Queue.empty[LoadItem]
    val visited = mutable.Set.empty[String]
    val out = mutable.ArrayBuffer.empty[(BlockType, Block)]

    val orch = new LoadOrchestrator {
      def enqueue(item: LoadItem): Unit = queue.enqueue(item)
      def issueTracker: InputIssueTracker = issueTracker0
    }
    roots.foreach(queue.enqueue)

    while (queue.nonEmpty) {
      val item = queue.dequeue()
      loader.resolve(item, orch).foreach { case (loc, reader) =>
        val id = loc.loadIdentifier
        // Include-loop / duplicate-load detection (_orchestrators.py:43-50):
        // loop iff this id already appears in its own include chain; a
        // duplicate load via two independent paths is loaded only once.
        def chainIds(src: Option[LoadLocation]): List[String] = src match {
          case None      => Nil
          case Some(l) => l.loadIdentifier :: chainIds(l.loadItem.source)
        }
        if (visited.contains(id)) {
          val isLoop = chainIds(item.source).contains(id)
          if (isLoop)
            issueTracker0.addError(s"Load loop detected: '$id' includes itself")
          // else: duplicate load of same file via two paths — load once.
        } else {
          visited += id
          out ++= reader.read(loc, orch)
        }
      }
    }
    out.toSeq
  }

  /** Wave-parallel variant of [[queuedLoad]]: each BFS wave's resolved
    * files parse concurrently on a fixed pool (the reference is explicitly
    * single-threaded, _orchestrators.py:24 — file parses are independent, so
    * a many-file input set loads at IO/parse parallelism). Output order is
    * IDENTICAL to the serial version: blocks ride Future.traverse order,
    * and includes/folder children enqueued DURING a parallel read are
    * captured in per-file buffers and replayed in wave order — never
    * interleaved into the shared queue at thread-completion time (which
    * would make the next wave, and thus duplicate-table-name resolution,
    * scheduling-dependent). Loop/duplicate detection stays in the serial
    * resolve phase; readers must create per-call fixers (FileReader's
    * fixerFactory default does). */
  def queuedLoadParallel(
      roots: Seq[LoadItem],
      loader: Loader,
      issueTracker0: InputIssueTracker = new NullInputIssueTracker(),
      parallelism: Int = 8
  ): Seq[(BlockType, Block)] = {
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    val pool = java.util.concurrent.Executors.newFixedThreadPool(parallelism)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val queue = mutable.Queue.empty[LoadItem]
    val visited = mutable.Set.empty[String]
    val out = mutable.ArrayBuffer.empty[(BlockType, Block)]
    val lock = new Object
    val orch = new LoadOrchestrator {
      def enqueue(item: LoadItem): Unit = lock.synchronized { queue.enqueue(item) }
      def issueTracker: InputIssueTracker = issueTracker0
    }
    roots.foreach(orch.enqueue)
    try {
      var wave = lock.synchronized { queue.dequeueAll(_ => true).toList }
      while (wave.nonEmpty) {
        // serial resolve + dedup/loop phase (cheap; may enqueue folders)
        val toRead = wave.flatMap { item =>
          loader.resolve(item, orch).flatMap { case (loc, reader) =>
            val id = loc.loadIdentifier
            def chainIds(src: Option[LoadLocation]): List[String] = src match {
              case None    => Nil
              case Some(l) => l.loadIdentifier :: chainIds(l.loadItem.source)
            }
            if (visited.contains(id)) {
              if (chainIds(item.source).contains(id))
                issueTracker0.addError(s"Load loop detected: '$id' includes itself")
              None
            } else {
              visited += id
              Some((loc, reader))
            }
          }
        }
        // Parallel parse; each worker fully materializes its file's blocks
        // AND collects its enqueues (includes, folder children) in a local
        // buffer. Replaying the buffers in Future.traverse order — not in
        // thread-completion order into a shared queue — keeps the next
        // wave's item order, and therefore the output block order (e.g.
        // duplicate-table-name resolution in TableBundle), bit-identical to
        // the serial queuedLoad on every run.
        val results = Await.result(
          Future.traverse(toRead) { case (loc, reader) =>
            Future {
              val localBuf = mutable.ArrayBuffer.empty[LoadItem]
              val localOrch = new LoadOrchestrator {
                def enqueue(item: LoadItem): Unit = localBuf += item
                def issueTracker: InputIssueTracker = issueTracker0
              }
              (reader.read(loc, localOrch).toVector, localBuf.toVector)
            }
          }, Duration.Inf)
        results.foreach { case (blocks, enqueued) =>
          out ++= blocks
          enqueued.foreach(orch.enqueue)
        }
        wave = lock.synchronized { queue.dequeueAll(_ => true).toList }
      }
      out.toSeq
    } finally pool.shutdown()
  }

  /** Build the default loader stack (reference: _loaders.py:294-377
    * make_loader): IncludeLoader(FileSystemLoader(FileReader, FolderReader)). */
  def makeLoader(
      rootFolder: Option[Path] = None,
      csvSep: String = CsvReader.DefaultSep,
      fileNamePattern: scala.util.matching.Regex = FolderReader.defaultPattern,
      additionalProtocolLoaders: Map[String, Loader] = Map.empty
  ): Loader = {
    val fs = new FileSystemLoader(
      new FileReader(csvSep), new FolderReader(fileNamePattern), rootFolder)
    val base =
      if (additionalProtocolLoaders.isEmpty) fs
      else new ProtocolLoader(additionalProtocolLoaders, fs)
    new IncludeLoader(base)
  }

  /** Load an input set (reference: _orchestrators.py:55-112 load_files).
    * `parallelism > 1` parses independent files concurrently with identical
    * output order. */
  def loadFiles(
      roots: Seq[String],
      rootFolder: Option[Path] = None,
      csvSep: String = CsvReader.DefaultSep,
      issueTracker: InputIssueTracker = new NullInputIssueTracker(),
      parallelism: Int = 1
  ): Seq[(BlockType, Block)] = {
    val items = roots.map(r => LoadItem(r, None))
    val loader = makeLoader(rootFolder, csvSep)
    if (parallelism > 1) queuedLoadParallel(items, loader, issueTracker, parallelism)
    else queuedLoad(items, loader, issueTracker)
  }

  def loadBundle(spark: org.apache.spark.sql.SparkSession, roots: Seq[String],
                 rootFolder: Option[Path] = None): TableBundle =
    TableBundle.fromBlocks(spark, loadFiles(roots, rootFolder).iterator)
}
