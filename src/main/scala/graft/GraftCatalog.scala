package graft

import java.util

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.{NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog.{CatalogPlugin, Identifier, ProcedureCatalog, Table, TableCatalog, TableChange, TableInfo}
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** SQL-callable dataset maintenance — the Spark 4 `ProcedureCatalog`
  * surface, so compact/cluster/vacuum/drop-partitions are not Scala-only:
  *
  * {{{
  *   spark.sql.catalog.graft = graft.GraftCatalog   // session config
  *   CALL graft.system.compact_dataset(path => '/data/ds')
  *   CALL graft.system.cluster_dataset(path => '/data/ds', sort_cols => 'x')
  *   CALL graft.system.vacuum_dataset(path => '/data/ds')
  *   CALL graft.system.drop_partitions(path => '/data/ds',
  *                                     column => 'day', values => '2026-01-01')
  * }}}
  *
  * Each procedure delegates verbatim to its
  * [[graft.operators.Maintenance]] entry point (same refusals, same crash
  * discipline, same reports) and returns the report as a one-row result.
  * Procedures are side-effecting, so `isDeterministic` is false and Spark
  * executes each CALL exactly once, eagerly. */
class GraftCatalog extends CatalogPlugin with ProcedureCatalog with TableCatalog
    with org.apache.spark.sql.connector.catalog.SupportsNamespaces {
  private var catalogName = "graft"
  private var warehouseDir: String = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    warehouseDir = Option(options.get("warehouse")).getOrElse(
      System.getProperty("java.io.tmpdir") + s"/graft_catalog_$name")
  }

  override def name(): String = catalogName

  // --- named StarTable datasets (TableCatalog) ---------------------------
  //
  // `CREATE TABLE graft.db.t USING startable LOCATION '/data/ds'`
  // registers NAME → LOCATION in a tiny JSON registry under the catalog's
  // warehouse dir; the dataset SIDECAR stays the single source of truth
  // for schema and units (loadTable re-infers on every resolution, so an
  // evolve/backfill is visible to the named table immediately). Tables
  // are EXTERNAL: drop unregisters the name, never touches data.

  private def registryPath: org.apache.hadoop.fs.Path =
    new org.apache.hadoop.fs.Path(warehouseDir, "_graft_tables.json")

  private def idKey(ident: Identifier): Vector[String] =
    (ident.namespace.toVector :+ ident.name).map(_.toLowerCase(java.util.Locale.ROOT))

  /** The registry: registered tables (name parts → dataset location) plus
    * explicitly-created namespaces. One JSON file; entries with a "table"
    * key are tables, entries with a "namespace" key are namespaces
    * (pre-r14 files contain only table entries and parse unchanged). */
  private case class Registry(tables: Map[Vector[String], TableEntry],
                              namespaces: Set[Vector[String]])
  private case class TableEntry(location: String,
                                options: Map[String, String])

  private def readRegistry(): Registry = {
    val conf = graft.sources.StarTableSource.activeHadoopConf()
    val p = registryPath
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) return Registry(Map.empty, Set.empty)
    val in = fs.open(p)
    val txt = try new String(in.readAllBytes(), "UTF-8") finally in.close()
    import graft.io.JsonValue._
    val entries = graft.io.JsonValue.parse(txt).asInstanceOf[JsonArray].values
    val tables = entries.collect {
      case o: JsonObject if o.fields.contains("table") =>
        val opts: Map[String, String] = o.fields.get("options") match {
          case Some(oo: JsonObject) => oo.fields.collect {
            case (k, JsonString(v)) => k -> v
          }.toMap
          case _ => Map.empty[String, String]
        }
        o.fields("table").asInstanceOf[JsonArray].values
          .map(_.asInstanceOf[JsonString].value).toVector ->
          TableEntry(o.fields("location").asInstanceOf[JsonString].value, opts)
    }.toMap
    val namespaces = entries.collect {
      case o: JsonObject if o.fields.contains("namespace") =>
        o.fields("namespace").asInstanceOf[JsonArray].values
          .map(_.asInstanceOf[JsonString].value).toVector
    }.toSet
    Registry(tables, namespaces)
  }

  private def writeRegistry(m: Registry): Unit = {
    import graft.io.JsonValue._
    val json = graft.io.JsonValue.write(JsonArray(
      m.tables.toVector.sortBy(_._1.mkString(".")).map { case (parts, e) =>
        JsonObject(scala.collection.immutable.ListMap(
          "table" -> JsonArray(parts.map(JsonString(_))),
          "location" -> JsonString(e.location)) ++
          (if (e.options.isEmpty) Nil
           else Seq("options" -> JsonObject(
             scala.collection.immutable.ListMap(e.options.toSeq.sortBy(_._1)
               .map { case (k, v) => k -> (JsonString(v): graft.io.JsonValue) }: _*))))
        ): graft.io.JsonValue
      } ++ m.namespaces.toVector.sortBy(_.mkString(".")).map { ns =>
        JsonObject(scala.collection.immutable.ListMap(
          "namespace" -> JsonArray(ns.map(JsonString(_))))): graft.io.JsonValue
      }))
    val conf = graft.sources.StarTableSource.activeHadoopConf()
    graft.io.CsvWriter.atomicInstallJson(
      registryPath.getFileSystem(conf), conf, registryPath, json)
  }

  /** CAS for registry mutations: every read-modify-write serializes
    * through a short mutex on the warehouse dir (the DatasetLock flip
    * primitive — atomic create, 60 s TTL against crashed mutators), so
    * two sessions' concurrent CREATE/DROP/RENAME can no longer silently
    * discard each other's registration via last-write-wins. `f` re-reads
    * the then-current registry INSIDE the mutex. */
  private def mutateRegistry[A](f: Registry => (Option[Registry], A)): A =
    graft.io.DatasetLock.withFlipLock(warehouseDir) { _ =>
      val (next, out) = f(readRegistry())
      next.foreach(writeRegistry)
      out
    }

  override def listTables(namespace: Array[String]): Array[Identifier] =
    readRegistry().tables.keys.toSeq
      .filter(_.init == namespace.toVector.map(_.toLowerCase(java.util.Locale.ROOT)))
      .sortBy(_.mkString("."))
      .map(parts => Identifier.of(parts.init.toArray, parts.last))
      .toArray

  override def loadTable(ident: Identifier): Table =
    readRegistry().tables.get(idKey(ident)) match {
      case Some(e) =>
        graft.sources.StarTableSource.tableFor(
          e.options + ("path" -> e.location))
      case None => throw new NoSuchTableException(ident)
    }

  override def createTable(ident: Identifier, info: TableInfo): Table = {
    val props = info.properties()
    val provider = Option(props.get(TableCatalog.PROP_PROVIDER))
    require(provider.forall(_.equalsIgnoreCase("startable")),
      s"graft catalog: only `USING startable` tables can be registered, " +
        s"got provider '${provider.getOrElse("")}'")
    val location = Option(props.get(TableCatalog.PROP_LOCATION))
      .orElse(Option(props.get(TableCatalog.OPTION_PREFIX + "path")))
      .getOrElse(throw new IllegalArgumentException(
        "graft catalog: a named StarTable dataset is EXTERNAL — give its " +
          "root with LOCATION '/path/to/dataset' (or OPTIONS (path ...)); " +
          "the sidecar there is the source of truth for schema and units"))
    // the location must already resolve (sidecar or parseable StarTable
    // file) — a typo'd path must refuse at CREATE, not at first SELECT;
    // this also checks any user-declared columns against the real schema
    import scala.jdk.CollectionConverters._
    val passOpts: Map[String, String] = props.asScala.collect {
      case (k, v) if k.startsWith(TableCatalog.OPTION_PREFIX) &&
          k.stripPrefix(TableCatalog.OPTION_PREFIX)
            .toLowerCase(java.util.Locale.ROOT) != "path" =>
        k.stripPrefix(TableCatalog.OPTION_PREFIX) -> v
    }.toMap
    val resolved = graft.sources.StarTableSource.tableFor(
      passOpts + ("path" -> location))
    val declared = info.columns()
    if (declared.nonEmpty) {
      val real = resolved.schema().fields.map(_.name).toSeq
      val given = declared.map(_.name).toSeq
      require(given == real,
        s"graft catalog: declared columns (${given.mkString(", ")}) do not " +
          s"match the dataset at $location (${real.mkString(", ")}); omit " +
          "the column list — the sidecar is the source of truth")
    }
    mutateRegistry { reg =>
      if (reg.tables.contains(idKey(ident)))
        throw new TableAlreadyExistsException(ident)
      (Some(reg.copy(tables =
        reg.tables + (idKey(ident) -> TableEntry(location, passOpts)))), ())
    }
    resolved
  }

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException(
      "graft catalog: ALTER TABLE is not supported — the dataset sidecar " +
        "is the source of truth; evolve columns with " +
        "CALL graft.system.evolve_dataset_schema (or the evolve backfill) " +
        "and maintain with the graft.system procedures")

  override def dropTable(ident: Identifier): Boolean = mutateRegistry { reg =>
    val k = idKey(ident)
    if (!reg.tables.contains(k)) (None, false)
    else
      // EXTERNAL semantics: unregister the name; the dataset stays
      (Some(reg.copy(tables = reg.tables - k)), true)
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    mutateRegistry { reg =>
      val ok = idKey(oldIdent)
      val nk = idKey(newIdent)
      if (!reg.tables.contains(ok)) throw new NoSuchTableException(oldIdent)
      if (reg.tables.contains(nk)) throw new TableAlreadyExistsException(newIdent)
      (Some(reg.copy(tables = reg.tables - ok + (nk -> reg.tables(ok)))), ())
    }

  // --- namespaces (SupportsNamespaces) -----------------------------------
  //
  // A namespace EXISTS when explicitly created (CREATE NAMESPACE) or
  // implied by a registered table's name — the permissive V2 shape: a
  // table may be registered under a namespace that was never declared,
  // and SHOW NAMESPACES reflects both kinds.

  private def nsKey(ns: Array[String]): Vector[String] =
    ns.toVector.map(_.toLowerCase(java.util.Locale.ROOT))

  private def allNamespaces(reg: Registry): Set[Vector[String]] =
    reg.namespaces ++ reg.tables.keys.map(_.init).filter(_.nonEmpty)

  override def listNamespaces(): Array[Array[String]] =
    allNamespaces(readRegistry()).map(_.take(1)).toSeq
      .sortBy(_.mkString(".")).map(_.toArray).toArray

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] = {
    val reg = readRegistry()
    val parent = nsKey(namespace)
    if (parent.nonEmpty && !allNamespaces(reg).exists(_.startsWith(parent)))
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchNamespaceException(
        namespace)
    allNamespaces(reg)
      .filter(ns => ns.size > parent.size && ns.startsWith(parent))
      .map(_.take(parent.size + 1)).toSeq
      .sortBy(_.mkString(".")).map(_.toArray).toArray
  }

  override def namespaceExists(namespace: Array[String]): Boolean = {
    val k = nsKey(namespace)
    k.isEmpty || allNamespaces(readRegistry()).exists(_.startsWith(k))
  }

  override def loadNamespaceMetadata(namespace: Array[String])
      : util.Map[String, String] = {
    if (!namespaceExists(namespace))
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchNamespaceException(
        namespace)
    java.util.Collections.emptyMap()
  }

  override def createNamespace(namespace: Array[String],
                               metadata: util.Map[String, String]): Unit = {
    require(metadata.isEmpty || metadata.keySet().stream()
        .allMatch(k => k == "owner" || k == "comment" || k == "location"),
      "graft catalog: namespaces carry no custom properties")
    mutateRegistry { reg =>
      val k = nsKey(namespace)
      if (allNamespaces(reg).contains(k))
        throw new org.apache.spark.sql.catalyst.analysis
          .NamespaceAlreadyExistsException(namespace)
      (Some(reg.copy(namespaces = reg.namespaces + k)), ())
    }
  }

  override def alterNamespace(namespace: Array[String],
      changes: org.apache.spark.sql.connector.catalog.NamespaceChange*): Unit =
    throw new UnsupportedOperationException(
      "graft catalog: namespaces carry no mutable metadata")

  override def dropNamespace(namespace: Array[String],
                             cascade: Boolean): Boolean = mutateRegistry { reg =>
    val k = nsKey(namespace)
    if (!allNamespaces(reg).exists(_.startsWith(k))) (None, false)
    else {
      val tablesUnder = reg.tables.keys.filter(_.init.startsWith(k)).toSeq
      if (tablesUnder.nonEmpty && !cascade)
        throw new IllegalStateException(
          s"graft catalog: namespace ${namespace.mkString(".")} holds " +
            s"${tablesUnder.size} table(s) — DROP ... CASCADE unregisters " +
            "the names (EXTERNAL semantics: the datasets stay)")
      (Some(Registry(
        reg.tables.filterNot(_._1.init.startsWith(k)),
        reg.namespaces.filterNot(_.startsWith(k)))), true)
    }
  }

  override def loadProcedure(ident: Identifier): UnboundProcedure = {
    val ok = ident.namespace.isEmpty || ident.namespace.sameElements(Array("system"))
    if (!ok)
      throw new IllegalArgumentException(
        s"graft catalog: unknown namespace ${ident.namespace.mkString(".")} " +
          "(procedures live in `system`)")
    GraftCatalog.procedures.getOrElse(ident.name.toLowerCase(java.util.Locale.ROOT),
      throw new IllegalArgumentException(
        s"graft catalog: unknown procedure '${ident.name}' — available: " +
          GraftCatalog.procedures.keys.toSeq.sorted.mkString(", ")))
  }

  override def listProcedures(namespace: Array[String]): Array[Identifier] =
    if (namespace.isEmpty || namespace.sameElements(Array("system")))
      GraftCatalog.procedures.keys.toSeq.sorted
        .map(n => Identifier.of(Array("system"), n)).toArray
    else Array.empty
}

object GraftCatalog {

  /** One maintenance procedure: fixed parameters, a one-row report. The
    * unbound and bound forms coincide (parameters are static — `bind` has
    * nothing to specialize; Spark casts arguments to the declared types). */
  private class MaintenanceProcedure(
      pname: String, desc: String,
      params: Seq[ProcedureParameter],
      resultSchema: StructType,
      run: (SparkSession, InternalRow) => Seq[Any])
      extends UnboundProcedure with BoundProcedure {
    override def name(): String = pname
    override def description(): String = desc
    override def bind(inputType: StructType): BoundProcedure = this
    override def parameters(): Array[ProcedureParameter] = params.toArray
    override def isDeterministic: Boolean = false
    override def call(input: InternalRow): util.Iterator[Scan] = {
      val values = run(SparkSession.active, input)
      val scan: Scan = new LocalScan {
        override def rows(): Array[InternalRow] =
          Array(InternalRow.fromSeq(values))
        override def readSchema(): StructType = resultSchema
      }
      util.Collections.singletonList(scan).iterator()
    }
  }

  private def in(n: String, t: DataType): ProcedureParameter =
    ProcedureParameter.in(n, t).build()
  private def inDefault(n: String, t: DataType, d: String): ProcedureParameter =
    ProcedureParameter.in(n, t).defaultValue(d).build()
  private def str(r: InternalRow, i: Int): String = {
    require(!r.isNullAt(i), s"procedure argument #${i + 1} must not be null")
    r.getUTF8String(i).toString
  }
  /** Comma-separated list argument (column names, partition values). */
  private def strs(r: InternalRow, i: Int): Seq[String] =
    str(r, i).split(',').toSeq.map(_.trim).filter(_.nonEmpty)

  /** Comma-separated slice tuples: `a,b` = two 1-column slices;
    * `a/x,b/y` = two 2-column slices. `null` names the default
    * partition; empty string = no scoping (full pass). */
  private def sliceTuples(r: InternalRow, i: Int): Set[Seq[String]] =
    strs(r, i).map(t => t.split('/').toSeq.map(_.trim)
      .map(v => if (v == "null") null else v): Seq[String]).toSet

  private[graft] val procedures: Map[String, UnboundProcedure] = Seq[UnboundProcedure](
    new MaintenanceProcedure(
      "compact_dataset",
      "Rewrite a StarTable dataset's slices as ~target_bytes files " +
        "(graft.operators.Maintenance.compactStarDataset). `slices` " +
        "(optional, comma-separated `v1/v2` partition-value tuples) " +
        "compacts ONLY those slices under a SHARED lease — coexists with " +
        "a live coexisting stream and disjoint backfills",
      Seq(in("path", StringType),
        inDefault("target_bytes", LongType, (128L * 1024 * 1024).toString),
        inDefault("slices", StringType, "''")),
      StructType(Seq(
        StructField("files_before", LongType, nullable = false),
        StructField("bytes_before", LongType, nullable = false),
        StructField("files_after", LongType, nullable = false),
        StructField("bytes_after", LongType, nullable = false))),
      (spark, r) => {
        val rep = graft.operators.Maintenance.compactStarDataset(
          spark, str(r, 0), r.getLong(1), onlySlices = sliceTuples(r, 2))
        Seq(rep.filesBefore, rep.bytesBefore, rep.filesAfter, rep.bytesAfter)
      }),

    new MaintenanceProcedure(
      "cluster_dataset",
      "Range-cluster each slice of a StarTable dataset by sort_cols " +
        "(comma-separated) and record per-file statistics " +
        "(graft.operators.Maintenance.clusterStarDataset). `slices` " +
        "(optional, comma-separated `v1/v2` tuples) clusters ONLY those " +
        "slices under a SHARED lease",
      Seq(in("path", StringType), in("sort_cols", StringType),
        inDefault("target_bytes", LongType, (128L * 1024 * 1024).toString),
        inDefault("slices", StringType, "''")),
      StructType(Seq(
        StructField("slices", LongType, nullable = false),
        StructField("files_before", LongType, nullable = false),
        StructField("files_after", LongType, nullable = false),
        StructField("bytes_before", LongType, nullable = false),
        StructField("bytes_after", LongType, nullable = false),
        StructField("file_stats_written", LongType, nullable = false))),
      (spark, r) => {
        val rep = graft.operators.Maintenance.clusterStarDataset(
          spark, str(r, 0), strs(r, 1), r.getLong(2),
          onlySlices = sliceTuples(r, 3))
        Seq(rep.slices, rep.filesBefore, rep.filesAfter,
          rep.bytesBefore, rep.bytesAfter, rep.fileStatsWritten)
      }),

    new MaintenanceProcedure(
      "vacuum_dataset",
      "Restore-then-remove the staging-and-swap protocols' crash leftovers " +
        "(graft.operators.Maintenance.vacuumStarDataset)",
      Seq(in("path", StringType),
        inDefault("tmp_min_age_ms", LongType, 3600000L.toString)),
      StructType(Seq(
        StructField("restored_leaves", LongType, nullable = false),
        StructField("removed_dirs", LongType, nullable = false),
        StructField("removed_bytes", LongType, nullable = false),
        StructField("removed_tmp_files", LongType, nullable = false))),
      (spark, r) => {
        val rep = graft.operators.Maintenance.vacuumStarDataset(
          spark, str(r, 0), r.getLong(1))
        Seq(rep.restoredLeaves, rep.removedDirs, rep.removedBytes,
          rep.removedTmpFiles)
      }),

    new MaintenanceProcedure(
      "shard_dataset_stats",
      "Migrate an inline-stats StarTable dataset to per-leaf stat shards " +
        "(graft.operators.Maintenance.shardDatasetStats)",
      Seq(in("path", StringType)),
      StructType(Seq(StructField("shards_written", LongType, nullable = false))),
      (spark, r) => Seq(graft.operators.Maintenance.shardDatasetStats(
        spark, str(r, 0)))),

    new MaintenanceProcedure(
      "show_dataset_locks",
      "List a dataset root's writer leases (exclusive, shared, flip) " +
        "with holder, age, heartbeat recency, and expiry judgment " +
        "(graft.io.DatasetLock.listLocks) — read-only",
      Seq(in("path", StringType)),
      StructType(Seq(
        StructField("kind", StringType, nullable = false),
        StructField("op", StringType, nullable = false),
        StructField("owner", StringType, nullable = false),
        StructField("acquired_s_ago", LongType, nullable = false),
        StructField("renewed_s_ago", LongType, nullable = false),
        StructField("ttl_s", LongType, nullable = false),
        StructField("expired", BooleanType, nullable = false),
        StructField("slices", StringType, nullable = true))),
      (spark, r) => {
        // multi-row result: LocalScan rows are built by the caller below,
        // so this procedure returns them through a dedicated run path
        throw new IllegalStateException("handled by callMultiRow")
      }) {
      override def call(input: InternalRow): util.Iterator[Scan] = {
        val path = input.getUTF8String(0).toString
        val now = System.currentTimeMillis()
        val lockRows: Array[InternalRow] =
          graft.io.DatasetLock.listLocks(path,
            SparkSession.active.sparkContext.hadoopConfiguration)
          .map { case (kind, i, expired) =>
            InternalRow.fromSeq(Seq(
              org.apache.spark.unsafe.types.UTF8String.fromString(kind),
              org.apache.spark.unsafe.types.UTF8String.fromString(i.op),
              org.apache.spark.unsafe.types.UTF8String.fromString(i.owner),
              (now - i.acquiredAtMs) / 1000L,
              (now - i.effectiveRenewedAt) / 1000L,
              i.ttlMs / 1000L,
              expired,
              if (i.slices.nonEmpty)
                org.apache.spark.unsafe.types.UTF8String.fromString(
                  i.slices.toSeq.map(_.map(v => if (v == null) "null" else v)
                    .mkString("/")).sorted.mkString(","))
              else i.digest.map(d =>
                org.apache.spark.unsafe.types.UTF8String.fromString(
                  s"~${d.count} slices (digest)")).orNull))
          }.toArray
        val schema = StructType(Seq(
          StructField("kind", StringType, nullable = false),
          StructField("op", StringType, nullable = false),
          StructField("owner", StringType, nullable = false),
          StructField("acquired_s_ago", LongType, nullable = false),
          StructField("renewed_s_ago", LongType, nullable = false),
          StructField("ttl_s", LongType, nullable = false),
          StructField("expired", BooleanType, nullable = false),
          StructField("slices", StringType, nullable = true)))
        val scan: Scan = new LocalScan {
          override def rows(): Array[InternalRow] = lockRows
          override def readSchema(): StructType = schema
        }
        util.Collections.singletonList(scan).iterator()
      }
    },

    new MaintenanceProcedure(
      "evolve_dataset_schema",
      "Append data columns to a StarTable dataset by rewriting the sidecar " +
        "alone — no data write; old slices read null-padded " +
        "(graft.io.CsvWriter.evolveDatasetSchema). `columns` is " +
        "comma-separated name:unit pairs (unit defaults to '-')",
      Seq(in("path", StringType), in("columns", StringType)),
      StructType(Seq(StructField("columns_added", LongType, nullable = false))),
      (spark, r) => {
        val cols = strs(r, 1).map { tok =>
          tok.split(':') match {
            case Array(n)    => n.trim -> "-"
            case Array(n, u) => n.trim -> u.trim
            case _ => throw new IllegalArgumentException(
              s"evolve_dataset_schema: malformed column spec '$tok' " +
                "(expected name or name:unit)")
          }
        }
        graft.io.CsvWriter.evolveDatasetSchema(spark, str(r, 0), cols)
        Seq(cols.size.toLong)
      }),

    new MaintenanceProcedure(
      "break_dataset_lock",
      "Forcibly clear a dataset's writer lease after a CRASHED writer " +
        "(graft.operators.Maintenance.breakDatasetLock) — never call " +
        "while the holder might still be alive",
      Seq(in("path", StringType)),
      StructType(Seq(StructField("removed", BooleanType, nullable = false))),
      (spark, r) => Seq(graft.operators.Maintenance.breakDatasetLock(
        spark, str(r, 0)))),

    new MaintenanceProcedure(
      "drop_partitions",
      "Drop whole partition slices by value (comma-separated) " +
        "(graft.operators.Maintenance.dropPartitions)",
      Seq(in("path", StringType), in("column", StringType),
        in("values", StringType)),
      StructType(Seq(StructField("dropped", LongType, nullable = false))),
      (spark, r) => Seq(graft.operators.Maintenance.dropPartitions(
        spark, str(r, 0), str(r, 1), strs(r, 2)))),
  ).map(p => p.name -> p).toMap
}
