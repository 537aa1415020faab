package graft.model

import graft.parse.{Block, BlockType, ParsedTable}

class TableNameNotUniqueInBundleError(name: String)
    extends RuntimeException(s"More than one table named '$name' in bundle")

/** Ordered + by-name store of tables from a block stream; duplicate names
  * allowed (reference: pdtable/store.py:53-148). Built from a BlockIterator,
  * keeps only TABLE blocks ("no regard for destinations" — clients filter,
  * store.py:56).
  */
final class TableBundle(val tables: IndexedSeq[StarTable]) {
  private val byName: Map[String, IndexedSeq[StarTable]] = tables.groupBy(_.name)

  /** Exactly-one-by-name access (reference: store.py:133-143). */
  def unique(name: String): StarTable = byName.get(name) match {
    case None => throw new NoSuchElementException(s"No table named '$name' in bundle")
    case Some(ts) if ts.size > 1 => throw new TableNameNotUniqueInBundleError(name)
    case Some(ts) => ts.head
  }

  /** All tables with this name (reference: store.py:145-148). */
  def all(name: String): Seq[StarTable] = byName.getOrElse(name, IndexedSeq.empty)

  def apply(idx: Int): StarTable = tables(idx)
  def apply(name: String): StarTable = unique(name)
  def contains(name: String): Boolean = byName.contains(name)
  def iterator: Iterator[StarTable] = tables.iterator
  def size: Int = tables.size

  /** Filter by destination (reference: pdtable/table_metadata.py:24 +
    * store.py:56 — destination filtering is the client's job). */
  def forDestination(dst: String): Seq[StarTable] =
    tables.filter(_.destinations.contains(dst))

  /** Register every uniquely-named table as a temp view so `spark.sql`
    * can query the bundle (SURVEY §1.4). Duplicate names are skipped —
    * resolve them via all()/unique() first. */
  def createTempViews(): Unit =
    byName.foreach {
      case (name, ts) if ts.size == 1 =>
        ts.head.df.createOrReplaceTempView(name)
      case _ => ()
    }
}

object TableBundle {
  /** Consume a block stream, keeping StarTables built from TABLE blocks
    * (reference: store.py:64-102). */
  def fromBlocks(spark: org.apache.spark.sql.SparkSession,
                 blocks: Iterator[(BlockType, Block)]): TableBundle = {
    val tables = blocks.collect {
      case (BlockType.Table, p: ParsedTable) => StarTable.fromParsed(spark, p)
    }.toIndexedSeq
    new TableBundle(tables)
  }

  def fromTables(tables: Seq[StarTable]): TableBundle =
    new TableBundle(tables.toIndexedSeq)
}
