package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Table-maintenance operators. The small-file problem is the silent
  * killer of long-lived ingest pipelines: a streaming or per-batch writer
  * leaves thousands of KB-sized parquet files per partition, and every
  * downstream scan pays one open/footer-parse/seek per file — at 100 TB
  * that is millions of NameNode/S3 requests and task-scheduling overhead
  * dwarfing the actual I/O. Compaction bin-packs them back to
  * target-sized files.
  */
object Maintenance {

  /** Test-only fault injection for crash-consistency drills: called after
    * a leaf's staging write, before the directory swap; a drill installs a
    * throwing hook to simulate a process kill at that point. */
  private[graft] var faultHook: String => Unit = _ => ()

  /** (files, bytes) before → after. */
  final case class CompactionReport(filesBefore: Long, bytesBefore: Long,
                                    filesAfter: Long, bytesAfter: Long)

  /** Rewrite the parquet directory at `path` as ~`targetBytes`-sized
    * files: the file count becomes ceil(input bytes / targetBytes)
    * (parquet re-encoding changes exact sizes — the PLANNED sizes use the
    * observed input bytes, the standard OPTIMIZE heuristic). Pass
    * `sortCols` to restore (or establish) an intra-file sort while
    * rewriting — compaction is the natural moment to cluster, and a plain
    * coalesce would destroy an existing layout (see [[ZOrder]]).
    *
    * The rewrite stages into a sibling `<path>__compacting` directory and
    * swaps via two renames — crash-safe up to the final swap window (the
    * staging dir is abandoned on failure, the original untouched); this
    * is directory-level maintenance, not a transaction log. Readers
    * concurrent with the swap will fail-and-retry, as with any
    * non-transactional table format.
    *
    * Hive-partitioned directories (the [[writePartitioned]] layout) are
    * compacted leaf-by-leaf, preserving the partition structure;
    * `sortCols` must name columns stored IN the files (a partition
    * column lives in the directory name and fails loudly per leaf).
    *
    * Scale shape: one distributed read + one shuffle (range-partition
    * when sorting, round-robin otherwise) + one write — no driver-side
    * data movement; the file LISTING is the only driver work. */
  def compact(spark: SparkSession, path: String,
              targetBytes: Long = 128L * 1024 * 1024,
              sortCols: Seq[String] = Nil,
              format: String = "parquet"): CompactionReport = {
    require(targetBytes > 0, s"compact: targetBytes must be positive")
    require(format == "parquet" || format == "text",
      s"compact: unsupported format '$format' (parquet or text)")
    require(format == "parquet" || sortCols.isEmpty,
      "compact: sortCols requires the parquet format (text rows are opaque)")
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def visible(d: Path) = fs.listStatus(d).toSeq
      .filterNot(st => st.getPath.getName.startsWith("_")
        || st.getPath.getName.startsWith("."))
    def dataFiles(d: Path) = visible(d).filter(_.isFile)

    // Hive-partitioned layouts (the shape writePartitioned produces) keep
    // data in nested `col=value` directories: a non-recursive listing sees
    // zero files, and a root-level rewrite would FLATTEN the partition
    // structure while reporting 0 bytes before. Compact each LEAF
    // directory in place instead — the partition layout (and the fact
    // that partition values live in dir names, not in the files) is
    // preserved by construction, and each leaf keeps the same
    // staging-and-swap crash-safety as the flat case.
    def leaves(d: Path): Seq[Path] = {
      val dirs = visible(d).filter(_.isDirectory)
      if (dirs.isEmpty) Seq(d)
      else {
        // MIXED layouts (data files alongside partition dirs) must refuse
        // loudly: treating the dir as pure-hive would silently skip the
        // root-level files forever, and compacting it with the
        // directory-swap would destroy (or absorb — partition discovery
        // recurses) the nested partition dirs. Such a layout is a writer
        // bug; surface it instead of guessing.
        require(dataFiles(d).isEmpty,
          s"compact: $d holds data files AND subdirectories — a mixed " +
            "flat/partitioned layout. Repair the table (move the stray " +
            "files into a partition or remove the dirs) before compacting.")
        dirs.flatMap(st => leaves(st.getPath))
      }
    }

    def compactDir(p: Path): CompactionReport = {
      val before = dataFiles(p)
      val bytesBefore = before.map(_.getLen).sum
      if (before.isEmpty)
        return CompactionReport(0L, 0L, 0L, 0L)
      val nOut = math.max(1L, (bytesBefore + targetBytes - 1) / targetBytes).toInt

      // DOT-prefixed staging/trash: for a partition leaf these siblings
      // live INSIDE the table root, where a bare name would be parsed as
      // a partition value by Spark's discovery (day=a__compacting →
      // partition 'a__compacting' — silent row duplication after a crash
      // mid-swap). Hidden names are ignored by Spark/Hadoop listings AND
      // by this method's own visible() filter, so a crash leftover is
      // inert rather than data-corrupting.
      val staging = new Path(p.getParent, "." + p.getName + "__compacting")
      if (fs.exists(staging)) fs.delete(staging, true)
      val df = spark.read.format(format).load(p.toString)
      val shaped =
        if (sortCols.nonEmpty)
          df.repartitionByRange(nOut, sortCols.map(col): _*)
            .sortWithinPartitions(sortCols.map(col): _*)
        else df.repartition(nOut)
      shaped.write.format(format).save(staging.toString)
      faultHook(s"compact:staged")

      val trash = new Path(p.getParent, "." + p.getName + "__old")
      if (fs.exists(trash)) fs.delete(trash, true)
      if (!fs.rename(p, trash))
        throw new java.io.IOException(s"compact: could not move $p aside")
      if (!fs.rename(staging, p)) {
        fs.rename(trash, p) // restore
        throw new java.io.IOException(s"compact: could not install $staging")
      }
      fs.delete(trash, true)

      val after = dataFiles(p)
      CompactionReport(before.size.toLong, bytesBefore,
        after.size.toLong, after.map(_.getLen).sum)
    }

    leaves(root).map(compactDir).foldLeft(CompactionReport(0, 0, 0, 0)) {
      (a, b) => CompactionReport(a.filesBefore + b.filesBefore,
        a.bytesBefore + b.bytesBefore, a.filesAfter + b.filesAfter,
        a.bytesAfter + b.bytesAfter)
    }
  }

  /** Compact a hive-partitioned StarTable dataset (the
    * [[graft.io.CsvWriter.writePartitionedDataset]] layout) in place:
    * each `col=value` leaf's small text part files are rewritten as
    * ~`targetBytes`-sized files with the same staging-and-swap crash
    * safety as the parquet path. Rows are opaque rendered lines — no
    * parse, no re-render, bit-identical content — and the directory
    * sidecar (schema, partition columns) is untouched, so connector
    * reads before and after return the same table. Streaming appends and
    * per-slice incremental writes leave many small files; this is the
    * maintenance pass that keeps a long-lived dataset scan-efficient. */
  def compactStarDataset(spark: SparkSession, path: String,
                         targetBytes: Long = 128L * 1024 * 1024): CompactionReport = {
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(new Path(root, graft.io.CsvWriter.DatasetMetaFile)),
      s"compactStarDataset: $path has no ${graft.io.CsvWriter.DatasetMetaFile} " +
        "sidecar — not a StarTable dataset (for parquet tables use compact)")
    compact(spark, path, targetBytes, Nil, "text")
  }

  /** Write `df` hive-partitioned by `partitionCols` with DYNAMIC overwrite:
    * only the partitions present in `df` are replaced; all others survive
    * untouched. The incremental-backfill write shape — re-running one
    * day/source never clobbers its siblings (static overwrite mode, the
    * Spark default, would drop the whole table first). */
  def writePartitioned(df: DataFrame, path: String,
                       partitionCols: Seq[String]): Unit = {
    require(partitionCols.nonEmpty, "writePartitioned: no partition columns")
    val spark = df.sparkSession
    val prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    try {
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      df.write.partitionBy(partitionCols: _*).mode("overwrite").parquet(path)
    } finally spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
  }

  /** Drop whole partition directories by value — retention/TTL deletes
    * and right-to-be-forgotten sweeps at METADATA cost: no file is read
    * or rewritten, matching directories are removed. Returns the number
    * of partitions dropped. Values are rendered exactly as the writer
    * escapes them (Hive partition-path encoding). */
  def dropPartitions(spark: SparkSession, path: String, partitionCol: String,
                     values: Seq[String]): Long = {
    require(values.nonEmpty, "dropPartitions: no values")
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val escaped = values.map(v =>
      org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
        .escapePathName(v))
    var dropped = 0L
    escaped.foreach { v =>
      val dir = new Path(p, s"$partitionCol=$v")
      if (fs.exists(dir)) { fs.delete(dir, true); dropped += 1 }
    }
    dropped
  }
}
