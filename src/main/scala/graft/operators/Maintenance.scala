package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
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
    * Scale shape: one distributed read + one shuffle (range-partition
    * when sorting, round-robin otherwise) + one write — no driver-side
    * data movement; the file LISTING is the only driver work. */
  def compact(spark: SparkSession, path: String,
              targetBytes: Long = 128L * 1024 * 1024,
              sortCols: Seq[String] = Nil): CompactionReport = {
    require(targetBytes > 0, s"compact: targetBytes must be positive")
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def dataFiles(d: Path) = fs.listStatus(d).toSeq
      .filter(st => st.isFile && !st.getPath.getName.startsWith("_")
        && !st.getPath.getName.startsWith("."))
    val before = dataFiles(p)
    val bytesBefore = before.map(_.getLen).sum
    val nOut = math.max(1L, (bytesBefore + targetBytes - 1) / targetBytes).toInt

    val staging = new Path(p.getParent, p.getName + "__compacting")
    if (fs.exists(staging)) fs.delete(staging, true)
    val df = spark.read.parquet(path)
    val shaped =
      if (sortCols.nonEmpty)
        df.repartitionByRange(nOut, sortCols.map(col): _*)
          .sortWithinPartitions(sortCols.map(col): _*)
      else df.repartition(nOut)
    shaped.write.parquet(staging.toString)

    val trash = new Path(p.getParent, p.getName + "__old")
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
}
