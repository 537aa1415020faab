package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.DateTimeUtils
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.model.{StarTable, UnitIndicator}
import graft.parse.{BlockType, Blocks, ParsedTable}

/** DataSource V2 connector for StarTable block-CSV files:
  *
  * {{{
  *   spark.read.format("startable")
  *     .option("table", "places_to_go")   // block name; default: first table
  *     .option("sep", ";")
  *     .load("/data/inputs")              // a file or a directory of .csv
  * }}}
  *
  * Spark-native integration points, mirroring what the built-in file
  * sources do:
  *  - schema inference parses ONE table header driver-side (early block
  *    filter: non-matching tables cost a top-left-cell peek), with units in
  *    `StructField.metadata` (key `startable.unit`);
  *  - one `InputPartition` per file — a directory of StarTable inputs
  *    parses fully in parallel across executors;
  *  - column pruning is pushed into the parse: unprojected columns skip
  *    their per-cell type coercion entirely (`SupportsPushDownRequiredColumns`).
  *
  * Paths are resolved through the Hadoop FileSystem API so the same code
  * reads local, HDFS, or object-store URIs on a cluster.
  */
class StarTableSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "startable"
  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val files = StarTableSource.resolveFiles(StarTableSource.paths(options))
    require(files.nonEmpty, "startable source: no input files found")
    val tableName = Option(options.get("table"))
    val sep = Option(options.get("sep")).getOrElse(";")
    StarTableSource.parseNamedTable(files.head, tableName, sep) match {
      case Some(p) =>
        StructType(p.columnNames.zip(p.units).map { case (n, u) =>
          StructField(n, UnitIndicator.sparkType(u), nullable = true,
            metadata = new MetadataBuilder()
              .putString(StarTable.UnitMetaKey, u).build())
        })
      case None =>
        throw new IllegalArgumentException(
          s"startable source: table ${tableName.getOrElse("<first>")} not found in ${files.head}")
    }
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new StarTableTable(schema, properties.asScala.toMap)
}

private[sources] class StarTableTable(schema: StructType, props: Map[String, String])
    extends Table with SupportsRead {
  override def name(): String = props.getOrElse("table", "<first>")
  override def schema(): StructType = schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new StarTableScanBuilder(schema, options)
}

private[sources] class StarTableScanBuilder(fullSchema: StructType,
                                            options: CaseInsensitiveStringMap)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = fullSchema

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new StarTableScan(
    StarTableSource.resolveFiles(StarTableSource.paths(options)),
    Option(options.get("table")),
    Option(options.get("sep")).getOrElse(";"),
    Option(options.get("failFast")).exists(_.toBoolean),
    fullSchema, required)
}

private[sources] class StarTableScan(files: Seq[String], tableName: Option[String],
                                     sep: String, failFast: Boolean,
                                     fullSchema: StructType, required: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    files.map(f => StarFilePartition(f): InputPartition).toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new StarTableReaderFactory(tableName, sep, failFast, fullSchema, required)
}

private[sources] case class StarFilePartition(path: String) extends InputPartition

private[sources] class StarTableReaderFactory(tableName: Option[String], sep: String,
                                              failFast: Boolean,
                                              fullSchema: StructType, required: StructType)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val path = partition.asInstanceOf[StarFilePartition].path
    new PartitionReader[InternalRow] {
      private val rows: Iterator[InternalRow] =
        StarTableSource.parseNamedTable(path, tableName, sep, failFast) match {
          case None => Iterator.empty
          case Some(p) =>
            // Per-file schema-drift validation against the inferred (or
            // user-supplied) schema: a drifted file is an ERROR under
            // failFast (task failure naming file and difference) and a
            // WARNING under permissive reads — where the by-name lookup
            // below null-pads missing columns and drops extras, the
            // documented permissive reshaping. Silent reshaping was the
            // round-2 behavior; drift is now always surfaced.
            StarTableSource.validateSchema(path, p, fullSchema, failFast)
            // column pruning pushed into the parse: look up only required
            // columns; everything else skipped entirely
            val idx = required.fields.map(f => p.columnNames.indexOf(f.name))
            (0 until p.numRows).iterator.map { r =>
              val out = new Array[Any](idx.length)
              var c = 0
              while (c < idx.length) {
                out(c) = if (idx(c) < 0) null
                else StarTableSource.toCatalyst(p.columns(idx(c))(r))
                c += 1
              }
              new GenericInternalRow(out)
            }
        }
      private var current: InternalRow = _
      override def next(): Boolean = {
        if (rows.hasNext) { current = rows.next(); true } else false
      }
      override def get(): InternalRow = current
      override def close(): Unit = ()
    }
  }
}

private[sources] object StarTableSource {

  def paths(options: CaseInsensitiveStringMap): Seq[String] = {
    val multi = Option(options.get("paths")).map { js =>
      // Spark encodes multiple load() paths as a JSON array string
      graft.io.JsonValue.parse(js).asInstanceOf[graft.io.JsonValue.JsonArray]
        .values.map(_.asInstanceOf[graft.io.JsonValue.JsonString].value)
    }.getOrElse(Nil)
    val single = Option(options.get("path")).toSeq
    (multi ++ single).distinct
  }

  /** Expand directories into their .csv members via the Hadoop FS API. */
  def resolveFiles(roots: Seq[String]): Seq[String] = {
    val conf = new org.apache.hadoop.conf.Configuration()
    roots.flatMap { r =>
      val p = new org.apache.hadoop.fs.Path(r)
      val fs = p.getFileSystem(conf)
      if (fs.getFileStatus(p).isDirectory)
        fs.listStatus(p).toSeq
          .filter(s => s.isFile && s.getPath.getName.toLowerCase.endsWith(".csv"))
          .map(_.getPath.toString)
          .sorted
      else Seq(r)
    }
  }

  /** Parse one file for the named table (or the first table); the early
    * block filter peeks only the top-left cell of non-matching blocks.
    * `failFast` arms the fixer's stop-on-errors so malformed cells raise on
    * the EXECUTOR (visible as a task failure) instead of being auto-fixed —
    * the permissive/failfast split of Spark's built-in file sources. */
  def parseNamedTable(path: String, tableName: Option[String], sep: String,
                      failFast: Boolean = false): Option[ParsedTable] = {
    val conf = new org.apache.hadoop.conf.Configuration()
    val hp = new org.apache.hadoop.fs.Path(path)
    val fs = hp.getFileSystem(conf)
    val in = fs.open(hp)
    val content =
      try new String(in.readAllBytes(), "UTF-8")
      finally in.close()
    val filter: Option[Blocks.BlockFilter] = tableName.map(n =>
      (bt: BlockType, name: String) => bt != BlockType.Table || name == n)
    val fixer = new graft.parse.ParseFixer()
    if (failFast) { fixer.stopOnErrors = true; fixer.verbose = false }
    val tracker: graft.origin.InputIssueTracker =
      if (failFast) new graft.origin.NullInputIssueTracker()
      else new graft.origin.AccumulatingInputIssueTracker()
    val it = graft.io.CsvReader.readString(content, sep, origin = path,
      filter = filter, fixer = fixer, issueTracker = tracker)
      .collectFirst { case (BlockType.Table, p: ParsedTable) => p }
    it
  }

  /** Compare a parsed file's declared block schema (column names + units)
    * with the scan schema. failFast → raise on the executor; permissive →
    * warn on stderr (executor log) and let the by-name null-padding read
    * proceed. */
  def validateSchema(path: String, p: ParsedTable,
                     expected: StructType, failFast: Boolean): Unit = {
    val fileCols = p.columnNames
    val expCols = expected.fields.map(_.name).toSeq
    val missing = expCols.filterNot(fileCols.contains)
    val extra = fileCols.filterNot(expCols.contains)
    val unitByName = fileCols.zip(p.units).toMap
    val unitDrift = expected.fields.toSeq.flatMap { f =>
      for {
        fileUnit <- unitByName.get(f.name)
        expUnit = if (f.metadata.contains(StarTable.UnitMetaKey))
          f.metadata.getString(StarTable.UnitMetaKey) else fileUnit
        if fileUnit != expUnit
      } yield s"${f.name}: '$fileUnit' != '$expUnit'"
    }
    if (missing.nonEmpty || extra.nonEmpty || unitDrift.nonEmpty) {
      val msg = s"startable source: schema drift in $path — " +
        Seq(
          if (missing.nonEmpty) Some(s"missing columns ${missing.mkString(", ")}") else None,
          if (extra.nonEmpty) Some(s"extra columns ${extra.mkString(", ")}") else None,
          if (unitDrift.nonEmpty) Some(s"unit mismatch [${unitDrift.mkString("; ")}]") else None
        ).flatten.mkString("; ")
      if (failFast) throw new IllegalStateException(msg)
      else System.err.println(s"[graft] WARN $msg (permissive read: " +
        "missing columns null-padded, extra columns dropped)")
    }
  }

  def toCatalyst(v: Any): Any = v match {
    case null                   => null
    case s: String              => UTF8String.fromString(s)
    case t: java.sql.Timestamp  => DateTimeUtils.fromJavaTimestamp(t)
    case d: Double if d.isNaN   => null
    case other                  => other
  }
}
