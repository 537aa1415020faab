package graft.model

import scala.collection.immutable.ListMap

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.origin.TableOrigin
import graft.parse.ParsedTable
import graft.units.{UnitConverter, Units, UnitConversionError}

/** A StarTable: a Spark DataFrame plus table/column metadata.
  *
  * This is the Spark analog of the reference's Table facade over a
  * TableDataFrame (reference: pdtable/frame.py:150-207, pdtable/proxy.py:123-425).
  * The DataFrame carries the data and lets Catalyst optimize every relational
  * operation; the wrapper carries what a bare DataFrame cannot: table name,
  * destinations, provenance, and per-column units/formats. Every relational
  * method returns a new StarTable whose metadata is combined via
  * [[StarTable.combine]] — the engine's analog of pandas' __finalize__
  * whitelist (reference: pdtable/frame.py:70-147).
  *
  * Column order and row order: column order is `df.columns` order. Row order
  * is the plan's output order (file order for freshly parsed tables, sort
  * order after orderBy); at 100 TB row order is only meaningful after an
  * explicit sort, as in any distributed engine.
  */
final case class StarTable(
    df: DataFrame,
    meta: TableMetadata,
    columnMeta: Map[String, ColumnMetadata]
) {
  def name: String = meta.name
  def destinations: Set[String] = meta.destinations
  def columnNames: Seq[String] = df.columns.toSeq
  def units: Seq[String] = columnNames.map(c => unit(c))
  def unit(col: String): String =
    columnMeta.get(col).map(_.unit).getOrElse {
      UnitIndicator.unitFromType(df.schema(col).dataType)
    }
  def colMeta(col: String): ColumnMetadata =
    columnMeta.getOrElse(col, ColumnMetadata.fromType(df.schema(col).dataType))

  def apply(col: String): StarColumn = StarColumn(this, col)

  /** strict-types validation of every column (reference:
    * table_metadata.py:190-198 _check_dataframe). */
  def checkTypes(): StarTable = {
    if (meta.strictTypes)
      df.schema.fields.foreach { f =>
        columnMeta.get(f.name).foreach(cm => UnitIndicator.checkType(cm.unit, f.dataType, f.name))
      }
    this
  }

  // ---------------------------------------------------------------- helpers

  /** Rebuild wrapper after a single-input operation: keep this table's
    * identity, record an origin branch, refresh column registry against the
    * new schema (drop metadata of vanished columns; default new ones by type).
    * Mirrors _combine_tables single-source path (frame.py:83-93, 120-147). */
  private def finalized(newDf: DataFrame, operation: String): StarTable =
    StarTable.combine(newDf, operation, Seq(this))

  /** Rename-aware variant: carries column metadata across a rename map. */
  private def finalizedRenamed(newDf: DataFrame, operation: String, renames: Map[String, String]): StarTable = {
    val renamedMeta = columnMeta.map { case (k, v) => renames.getOrElse(k, k) -> v }
    StarTable.combineWithMeta(newDf, operation, meta, Seq(renamedMeta), Seq(meta.origin))
  }

  // ------------------------------------------------------- relational surface
  // Each maps 1:1 onto a pandas op the reference whitelists
  // (reference: pdtable/frame.py:83-93; tests pdtable/test/test_pdtable.py:384-525).

  /** Row filter — pandas boolean mask `tdf[tdf.a == 2]`. */
  def filter(cond: Column): StarTable = finalized(df.filter(cond), "filter")
  def filter(condExpr: String): StarTable = finalized(df.filter(condExpr), "filter")

  /** Projection — pandas column selection / reindex. */
  def select(cols: String*): StarTable = finalized(df.select(cols.map(col): _*), "select")
  def selectCols(cols: Seq[Column]): StarTable = finalized(df.select(cols: _*), "select")

  /** Drop columns — pandas `drop(columns=...)`. */
  def drop(cols: String*): StarTable = finalized(df.drop(cols: _*), "drop")

  /** Add/overwrite a column — reference add_column (pdtable/frame.py:294-314):
    * unit inferred from the result type when omitted. */
  def withColumn(name: String, c: Column, unit: Option[String] = None,
                 format: Option[ColumnFormat] = None): StarTable = {
    val newDf = df.withColumn(name, c)
    val inferred = unit.getOrElse(UnitIndicator.unitFromType(newDf.schema(name).dataType))
    val newCm = ColumnMetadata(inferred, displayFormat = format)
    val base = finalized(newDf, "withColumn")
    val merged = base.columnMeta.get(name) match {
      case Some(existing) => existing.updateFrom(newCm)
      case None           => newCm
    }
    base.copy(columnMeta = base.columnMeta.updated(name, merged)).checkTypes()
  }

  /** Rename — pandas `rename` (metadata carried to the new name). */
  def withColumnRenamed(from: String, to: String): StarTable =
    finalizedRenamed(df.withColumnRenamed(from, to), "rename", Map(from -> to))

  /** Sort — pandas `sort_index`/`sort_values`. */
  def orderBy(cols: Column*): StarTable = finalized(df.orderBy(cols: _*), "orderBy")
  def orderByNames(cols: String*): StarTable = finalized(df.orderBy(cols.map(col): _*), "orderBy")

  /** Slice — pandas positional slicing. */
  def limit(n: Int): StarTable = finalized(df.limit(n), "limit")

  /** Value replacement — pandas `replace`. Unit/type-guarded like the
    * reference (test_pdtable.py:384-391: replacing a bool with a string in
    * an onoff column raises): Spark's na.replace silently ignores
    * type-mismatched columns, so the guard is explicit here. */
  def replace[T](colName: String, replacement: Map[T, T]): StarTable = {
    val dt = df.schema(colName).dataType
    def compatible(v: Any): Boolean = (v, dt) match {
      case (null, _)                        => true
      case (_: String, StringType)          => true
      case (_: Boolean, BooleanType)        => true
      case (_: Double | _: Float | _: Int | _: Long, _: NumericType) => true
      case _                                => false
    }
    replacement.foreach { case (k, v) =>
      if (!compatible(k) || !compatible(v))
        throw new ColumnUnitException(
          s"replace on column '$colName' (${unit(colName)}, $dt) with " +
            s"incompatible value type: $k -> $v")
    }
    finalized(df.na.replace(colName, replacement), "replace")
  }

  /** Cast — pandas `astype`; raises ColumnUnitException when the new type
    * contradicts the column's unit under strict types
    * (reference: test_pdtable.py:409-424). */
  def castColumn(colName: String, to: DataType): StarTable = {
    val newDf = df.withColumn(colName, col(colName).cast(to))
    val out = finalized(newDf, "astype")
    if (meta.strictTypes)
      columnMeta.get(colName).foreach(cm => UnitIndicator.checkType(cm.unit, to, colName))
    out
  }

  /** Fill missing — pandas `fillna` (type-guarded: test_pdtable.py:440-457:
    * filling a numeric column with a string raises; Spark's na.fill would
    * silently skip the column instead). */
  def fillna(value: Any, cols: Seq[String] = Nil): StarTable = {
    val target = if (cols.isEmpty) df.columns.toSeq else cols
    if (cols.nonEmpty) {
      cols.foreach { c =>
        val dt = df.schema(c).dataType
        val ok = (value, dt) match {
          case (_: String, StringType)                                  => true
          case (_: Boolean, BooleanType)                                => true
          case (_: Double | _: Float | _: Int | _: Long, _: NumericType) => true
          case _                                                        => false
        }
        if (!ok)
          throw new ColumnUnitException(
            s"fillna on column '$c' (${unit(c)}, $dt) with incompatible " +
              s"fill value '$value'")
      }
    }
    val newDf = value match {
      case d: Double  => df.na.fill(d, target)
      case i: Int     => df.na.fill(i.toDouble, target)
      case l: Long    => df.na.fill(l, target)
      case s: String  => df.na.fill(s, target)
      case b: Boolean => df.na.fill(b, target)
      case other =>
        throw new IllegalArgumentException(s"Unsupported fill value: $other")
    }
    finalized(newDf, "fillna")
  }

  /** Append a row — pandas `append`/`loc[n]=`
    * (reference: test_pdtable.py:426-438). */
  def appendRow(values: Seq[Any]): StarTable = {
    val spark = df.sparkSession
    val row = Row.fromSeq(values)
    val newDf = df.union(
      spark.createDataFrame(java.util.List.of(row), df.schema))
    finalized(newDf, "append")
  }

  /** Vertical concat — pandas `pd.concat(axis=0)`; unit conflict on shared
    * columns raises (reference: frame.py:92-93, test_pdtable.py:174-188). */
  def concat(other: StarTable): StarTable = {
    val newDf = df.unionByName(other.df, allowMissingColumns = true)
    StarTable.combine(newDf, "concat", Seq(this, other))
  }

  /** Join — pandas `merge`; combines left+right metadata, raises on unit
    * conflict over shared columns (reference: frame.py:90-91, 128-145).
    * Catalyst picks the physical join (broadcast vs shuffle). */
  def join(other: StarTable, usingColumns: Seq[String], joinType: String = "inner"): StarTable = {
    val newDf = df.join(other.df, usingColumns, joinType)
    StarTable.combine(newDf, "merge", Seq(this, other))
  }
  def joinOn(other: StarTable, cond: Column, joinType: String = "inner"): StarTable = {
    val newDf = df.join(other.df, cond, joinType)
    StarTable.combine(newDf, "merge", Seq(this, other))
  }

  /** Group + aggregate — pandas `groupby().agg(...)`; group columns keep
    * their units, aggregate columns default by result type
    * (reference: test_pdtable.py:303-316). Map-side partial aggregation and
    * shuffle-on-keys come from Catalyst. */
  def groupByAgg(groupCols: Seq[String], aggs: Seq[Column]): StarTable = {
    val newDf = df.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
    StarTable.combine(newDf, "groupby", Seq(this))
  }

  /** Wide→long reshape — pandas `melt` (reference: frame.py:87). */
  def unpivot(ids: Seq[String], values: Seq[String],
              variableColumnName: String = "variable",
              valueColumnName: String = "value"): StarTable = {
    val newDf = df.unpivot(ids.map(col).toArray, values.map(col).toArray,
      variableColumnName, valueColumnName)
    StarTable.combine(newDf, "melt", Seq(this))
  }

  /** Long→wide reshape — pandas `unstack`
    * (reference: test_pdtable.py:471-505). */
  def pivot(groupCol: String, pivotCol: String, valueCol: String,
            agg: String => Column = c => first(col(c))): StarTable = {
    val newDf = df.groupBy(col(groupCol)).pivot(pivotCol).agg(agg(valueCol))
    StarTable.combine(newDf, "unstack", Seq(this))
  }

  /** Distinct rows — pandas `drop_duplicates`. */
  def distinct(): StarTable = finalized(df.distinct(), "distinct")
  def dropDuplicates(cols: Seq[String]): StarTable =
    finalized(if (cols.isEmpty) df.dropDuplicates() else df.dropDuplicates(cols), "dropDuplicates")

  /** Data transpose — pandas `transpose` (reference: frame.py:84 whitelist;
    * test_pdtable.py:400-407: all resulting columns are text, since rows of
    * mixed types become object columns). Inherently driver-side (matches the
    * reference's use for display/transposed-write of small tables): Spark
    * has no row index, so the original column names materialize as the first
    * column `column`, and row positions become columns `r0..rN`. */
  def transpose(): StarTable = {
    val rows = df.collect()
    val header = StructField("column", org.apache.spark.sql.types.StringType) +:
      rows.indices.map(i => StructField(s"r$i", org.apache.spark.sql.types.StringType))
    val schema = StructType(header.toIndexedSeq)
    val data = columnNames.zipWithIndex.map { case (c, ci) =>
      Row.fromSeq(c +: rows.toIndexedSeq.map { r =>
        val v = r.get(ci)
        if (v == null) null else v.toString
      })
    }
    val newDf = df.sparkSession.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters.SeqHasAsJava(data).asJava),
      schema)
    val cm = schema.fields.map(f => f.name -> ColumnMetadata(UnitIndicator.Text))
    StarTable(newDf,
      TableMetadata(meta.name, meta.destinations,
        TableOrigin.branch("Spark transpose", Seq(meta.origin)),
        meta.transposed, meta.strictTypes),
      ListMap(cm.toIndexedSeq: _*))
  }

  /** Positional row access (inherently driver-side; reference:
    * pdtable/proxy.py:236-238 get_row). */
  def getRow(index: Int): Seq[Any] = {
    val rows = df.limit(index + 1).collect()
    if (rows.length <= index)
      throw new IndexOutOfBoundsException(s"Row $index of table '${meta.name}'")
    rows(index).toSeq
  }

  // ----------------------------------------------------------------- equality

  /** Table equality with numeric type-insensitivity (10 == 10.0) and
    * missing==missing (reference: pdtable/proxy.py:288-316, 428-448).
    * Metadata (name, destinations, column names, units) must match; data is
    * compared as a multiset after normalizing numerics to double — row order
    * is NOT significant, the distributed-engine analog of the reference's
    * element-wise check. Origin is ignored.
    */
  def equalsTable(other: StarTable): Boolean = {
    val metaEq = meta.name == other.meta.name &&
      meta.destinations == other.meta.destinations &&
      columnNames == other.columnNames &&
      units == other.units
    if (!metaEq) return false

    def normalized(t: StarTable): DataFrame =
      t.df.select(t.df.schema.fields.map { f =>
        f.dataType match {
          case _: NumericType => col(f.name).cast(DoubleType).as(f.name)
          case _              => col(f.name)
        }
      }.toIndexedSeq: _*)

    val a = normalized(this); val b = normalized(other)
    a.count() == b.count() && a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty
  }

  // ------------------------------------------------------------------- units

  /** Set a column's unit without converting values (reference:
    * frame.py:317-321 set_units). */
  def withUnit(colName: String, unit: String): StarTable =
    copy(columnMeta = columnMeta.updated(colName, colMeta(colName).copy(unit = unit)))

  def withFormat(colName: String, format: ColumnFormat): StarTable =
    copy(columnMeta =
      columnMeta.updated(colName, colMeta(colName).copy(displayFormat = Some(format))))

  /** Convert one column's unit in place — a vectorized affine expression, no
    * UDF (reference: pdtable/proxy.py:68-105 Column.convert_units). `to`:
    * None = no-op; "__base__" = to base unit; other = explicit target. */
  def convertColumnUnits(colName: String, to: Option[String],
                         converter: UnitConverter = Units.defaultConverter): StarTable = {
    if (to.isEmpty) return this
    val from = unit(colName)
    if (to.contains(from)) return this
    if (UnitIndicator.inconvertible.contains(from))
      throw new UnitConversionError(
        s"Unit conversion is not defined for unit '$from' of column '$colName'")
    val target = to.get match {
      case "__origin__" => throw new NotImplementedError("convert to origin unit")
      case "__base__" =>
        converter.baseUnit(from).getOrElse(
          throw new UnitConversionError(s"No base unit defined for unit '$from'"))
      case u => u
    }
    val t = converter.valueTransform(from, target)
    val newDf =
      if (t == graft.units.AffineTransform(graft.units.Affine.identity)) df
      else df.withColumn(colName, t.toColumn(col(colName)))
    copy(df = newDf,
      columnMeta = columnMeta.updated(colName,
        colMeta(colName).copy(unit = converter.canonical(target))))
  }

  /** Table-level unit conversion dispatcher (reference: pdtable/proxy.py:318-425):
    * "base" (all columns to base, inconvertible skipped), list-by-position,
    * map-by-name, or callable. Returns a new table.
    */
  def convertUnits(to: UnitTargets, converter: UnitConverter = Units.defaultConverter): StarTable =
    to match {
      case UnitTargets.AllBase =>
        columnNames.foldLeft(this) { (t, c) =>
          if (UnitIndicator.inconvertible.contains(t.unit(c))) t
          else t.convertColumnUnits(c, Some("__base__"), converter)
        }
      case UnitTargets.ByPosition(targets) =>
        if (targets.size != columnNames.size)
          throw new IllegalArgumentException(
            s"Unequal number of columns (${columnNames.size}) and 'to' units (${targets.size})")
        columnNames.zip(targets).foldLeft(this) { case (t, (c, target)) =>
          t.convertColumnUnits(c, target, converter)
        }
      case UnitTargets.ByName(targets) =>
        columnNames.foldLeft(this) { (t, c) =>
          t.convertColumnUnits(c, targets.get(c), converter)
        }
      case UnitTargets.ByFunction(f) =>
        columnNames.foldLeft(this) { (t, c) =>
          t.convertColumnUnits(c, f(c), converter)
        }
    }

  override def toString: String = s"$meta Columns: " +
    columnNames.map(c => s"$c [${unit(c)}]").mkString(", ")
}

/** Column-unit-conversion dispatcher forms (reference: pdtable/proxy.py:318-358). */
sealed trait UnitTargets
object UnitTargets {
  case object AllBase extends UnitTargets
  final case class ByPosition(targets: Seq[Option[String]]) extends UnitTargets
  final case class ByName(targets: Map[String, String]) extends UnitTargets
  final case class ByFunction(f: String => Option[String]) extends UnitTargets
}

/** Read facade for a single column (reference: pdtable/proxy.py:27-114). */
final case class StarColumn(table: StarTable, name: String) {
  def unit: String = table.unit(name)
  def displayFormat: Option[ColumnFormat] = table.colMeta(name).displayFormat
  def values: Array[Any] = table.df.select(name).collect().map(_.get(0))
  def toColumn: Column = col(name)
  override def toString: String = s"Column(name='$name', unit='$unit')"
}

object StarTable {

  /** Metadata key used in StructField.metadata to carry the unit through
    * Catalyst projections. */
  val UnitMetaKey = "startable.unit"

  /** Build a StarTable from a parsed table block. The schema's
    * StructField.metadata carries the unit so that plain DataFrame
    * select/withColumn keep it visible even outside the wrapper. */
  def fromParsed(spark: SparkSession, p: ParsedTable): StarTable = {
    val fields = p.columnNames.zip(p.units).map { case (n, u) =>
      StructField(n, UnitIndicator.sparkType(u), nullable = true,
        metadata = new MetadataBuilder().putString(UnitMetaKey, u).build())
    }
    val schema = StructType(fields)
    val rows: java.util.List[Row] = {
      val l = new java.util.ArrayList[Row](p.numRows)
      p.rows.foreach(r => l.add(Row.fromSeq(r)))
      l
    }
    val df = spark.createDataFrame(rows, schema)
    val cm = ListMap(p.columnNames.zip(p.units.map(u => ColumnMetadata(u))): _*)
    StarTable(df,
      TableMetadata(p.name, p.destinations, p.origin, p.transposed, p.strictTypes),
      cm)
  }

  /** Write a StarTable as parquet with units embedded in the parquet schema
    * (StructField.metadata survives the parquet round trip), plus table
    * metadata as a sidecar JSON. The distributed-native persistence format:
    * N part files, predicate pushdown and column pruning on re-read. */
  def writeParquet(t: StarTable, path: String): Unit = {
    val withMeta = t.df.select(t.columnNames.map { c =>
      col(c).as(c, new MetadataBuilder()
        .putString(UnitMetaKey, t.unit(c)).build())
    }: _*)
    withMeta.write.mode("overwrite").parquet(path)
    val metaJson = graft.io.JsonValue.write(
      graft.io.JsonValue.JsonObject(scala.collection.immutable.ListMap(
        "name" -> graft.io.JsonValue.JsonString(t.name),
        "destinations" -> graft.io.JsonValue.JsonArray(
          t.destinations.toVector.sorted.map(graft.io.JsonValue.JsonString(_))),
        "transposed" -> graft.io.JsonValue.JsonBool(t.meta.transposed))))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(path, "_startable_meta.json"), metaJson)
  }

  /** Read a StarTable written by [[writeParquet]]: units from the parquet
    * schema metadata, table metadata from the sidecar. */
  def readParquet(spark: SparkSession, path: String): StarTable = {
    val df = spark.read.parquet(path)
    val sidecar = java.nio.file.Paths.get(path, "_startable_meta.json")
    val (name, dests, transposed) =
      if (java.nio.file.Files.exists(sidecar)) {
        val o = graft.io.JsonValue.parse(java.nio.file.Files.readString(sidecar))
          .asInstanceOf[graft.io.JsonValue.JsonObject]
        (o.fields("name").asInstanceOf[graft.io.JsonValue.JsonString].value,
          o.fields("destinations").asInstanceOf[graft.io.JsonValue.JsonArray]
            .values.map(_.asInstanceOf[graft.io.JsonValue.JsonString].value).toSet,
          o.fields("transposed").asInstanceOf[graft.io.JsonValue.JsonBool].value)
      } else (new java.io.File(path).getName, Set("all"), false)
    val cm = df.schema.fields.map { f =>
      val unit =
        if (f.metadata.contains(UnitMetaKey)) f.metadata.getString(UnitMetaKey)
        else UnitIndicator.unitFromType(f.dataType)
      f.name -> ColumnMetadata(unit)
    }
    StarTable(df, TableMetadata(name, dests, transposed = transposed),
      ListMap(cm.toIndexedSeq: _*))
  }

  /** ORC variant of [[writeParquet]]: same distributed-native properties
    * (N part files, predicate pushdown + column pruning on re-read via
    * Spark's native ORC reader), but ORC does not persist Catalyst field
    * metadata, so units travel in the sidecar JSON alongside the table
    * metadata instead of the file schema. */
  def writeOrc(t: StarTable, path: String): Unit = {
    t.df.write.mode("overwrite").orc(path)
    val metaJson = graft.io.JsonValue.write(
      graft.io.JsonValue.JsonObject(scala.collection.immutable.ListMap(
        "name" -> graft.io.JsonValue.JsonString(t.name),
        "destinations" -> graft.io.JsonValue.JsonArray(
          t.destinations.toVector.sorted.map(graft.io.JsonValue.JsonString(_))),
        "transposed" -> graft.io.JsonValue.JsonBool(t.meta.transposed),
        "units" -> graft.io.JsonValue.JsonObject(
          ListMap(t.columnNames.map(c =>
            c -> graft.io.JsonValue.JsonString(t.unit(c))): _*)))))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(path, "_startable_meta.json"), metaJson)
  }

  /** Read a StarTable written by [[writeOrc]]: units and table metadata
    * from the sidecar (falling back to type-inferred units without one). */
  def readOrc(spark: SparkSession, path: String): StarTable = {
    val df = spark.read.orc(path)
    val sidecar = java.nio.file.Paths.get(path, "_startable_meta.json")
    if (java.nio.file.Files.exists(sidecar)) {
      val o = graft.io.JsonValue.parse(java.nio.file.Files.readString(sidecar))
        .asInstanceOf[graft.io.JsonValue.JsonObject]
      val units = o.fields.get("units").map(_.asInstanceOf[graft.io.JsonValue.JsonObject]
        .fields.map { case (k, v) =>
          k -> v.asInstanceOf[graft.io.JsonValue.JsonString].value })
        .getOrElse(Map.empty[String, String])
      val cm = df.schema.fields.map { f =>
        f.name -> ColumnMetadata(units.getOrElse(f.name,
          UnitIndicator.unitFromType(f.dataType)))
      }
      StarTable(df,
        TableMetadata(
          o.fields("name").asInstanceOf[graft.io.JsonValue.JsonString].value,
          o.fields("destinations").asInstanceOf[graft.io.JsonValue.JsonArray]
            .values.map(_.asInstanceOf[graft.io.JsonValue.JsonString].value).toSet,
          transposed = o.fields("transposed")
            .asInstanceOf[graft.io.JsonValue.JsonBool].value),
        ListMap(cm.toIndexedSeq: _*))
    } else fromDataFrame(df, new java.io.File(path).getName)
  }

  /** Wrap an existing DataFrame (e.g. a parquet read) as a StarTable;
    * units inferred from Spark types unless given. */
  def fromDataFrame(df: DataFrame, name: String,
                    units: Map[String, String] = Map.empty,
                    destinations: Set[String] = Set("all")): StarTable = {
    val cm = df.schema.fields.map { f =>
      f.name -> ColumnMetadata(
        units.getOrElse(f.name, UnitIndicator.unitFromType(f.dataType)))
    }
    StarTable(df, TableMetadata(name, destinations), ListMap(cm.toIndexedSeq: _*))
  }

  /** The metadata-combine kernel — Spark analog of _combine_tables
    * (reference: pdtable/frame.py:70-147):
    *   - origin: new branch node (operation, parents)
    *   - name/destinations: from the first source
    *   - strictTypes: AND over sources (any non-strict source unstricts)
    *   - columns present in the result: metadata merged across sources;
    *     unit conflict raises InvalidTableCombineError; unseen columns
    *     default by data type.
    */
  def combine(resultDf: DataFrame, operation: String, sources: Seq[StarTable]): StarTable = {
    require(sources.nonEmpty, "combine needs at least one source table")
    combineWithMeta(resultDf, operation, sources.head.meta,
      sources.map(_.columnMeta), sources.map(_.meta.origin),
      strictTypes = sources.forall(_.meta.strictTypes))
  }

  private[model] def combineWithMeta(
      resultDf: DataFrame, operation: String, headMeta: TableMetadata,
      sourceCols: Seq[Map[String, ColumnMetadata]], parentOrigins: Seq[TableOrigin],
      strictTypes: Boolean = true): StarTable = {
    val origin = TableOrigin.branch(s"Spark $operation", parentOrigins)
    val outCols = resultDf.columns.toSet

    var columns = Map.empty[String, ColumnMetadata]
    sourceCols.foreach { sc =>
      sc.foreach { case (n, c) =>
        if (outCols.contains(n)) {
          columns.get(n) match {
            case None => columns += n -> c
            case Some(prev) =>
              if (prev.unit != c.unit)
                throw new InvalidTableCombineError(
                  s"""Column $n appears with incompatible units "${prev.unit}" and "${c.unit}".""")
              columns += n -> prev.updateFrom(c)
          }
        }
      }
    }
    // default metadata for brand-new columns
    resultDf.schema.fields.foreach { f =>
      if (!columns.contains(f.name))
        columns += f.name -> ColumnMetadata.fromType(f.dataType)
    }

    val newMeta = TableMetadata(headMeta.name, headMeta.destinations, origin,
      headMeta.transposed, strictTypes)
    StarTable(resultDf, newMeta, columns).checkTypes()
  }
}
