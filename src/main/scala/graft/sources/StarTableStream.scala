package graft.sources

import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.StructType

/** Streaming READ of a hive-partitioned StarTable dataset — the source
  * leg completing [[graft.io.CsvWriter.streamPartitionedDataset]]'s sink
  * leg: `spark.readStream.format("startable").load(dir)` discovers files
  * as they appear (the streaming sink commits part files atomically) and
  * emits each exactly once across restarts.
  *
  * Progress is a monotone batch counter over a DURABLE per-batch file log
  * under the query checkpoint (`<ckpt>/graft-files/<batchId>`, staged and
  * renamed): `latestOffset` lists the dataset, diffs against every file
  * already logged, and logs the new ones as the next batch — the same
  * seen-files discipline as Spark's built-in file stream source, so a
  * restart replays exactly the logged batches and never re-reads a file.
  * Pushed partition filters prune fresh files BEFORE they are logged
  * (never opened, never owed); row-level pushed filters evaluate in the
  * split readers as in batch.
  *
  * Caveats (documented contract): files must be immutable once visible —
  * compaction REWRITES files and must not run while a continuous reader
  * is attached (its outputs would be discovered as new files = duplicate
  * rows); `maxFilesPerTrigger` caps a micro-batch's file count. */
private[sources] class StarTableMicroBatchStream(
    roots: Seq[String], meta: StarTableSource.DatasetMeta,
    checkpointLocation: String,
    sep: String, failFast: Boolean,
    fullSchema: StructType, required: StructType,
    pushed: Array[Filter], maxSplitBytes: Long,
    maxFilesPerTrigger: Option[Int],
    confS: org.apache.spark.util.SerializableConfiguration)
    extends MicroBatchStream {

  private case class BatchOffset(batch: Long) extends Offset {
    override def json(): String = batch.toString
  }

  private val logDir = new org.apache.hadoop.fs.Path(checkpointLocation, "graft-files")
  private def fs = logDir.getFileSystem(confS.value)

  // ------------------------------------------------------------- file log
  /** One logged file: path, length, raw partition values. */
  private type Entry = (String, Long, Seq[String])

  private def writeLog(batch: Long, entries: Seq[Entry]): Unit = {
    import graft.io.JsonValue._
    val arr = JsonArray(entries.toVector.map { case (p, len, raw) =>
      JsonObject(scala.collection.immutable.ListMap(
        "path" -> JsonString(p), "len" -> JsonNumber(len.toDouble),
        "part" -> JsonArray(raw.toVector.map(v =>
          if (v == null) JsonNull else JsonString(v)))))
    })
    fs.mkdirs(logDir)
    val tmp = new org.apache.hadoop.fs.Path(logDir, s".$batch.tmp")
    val os = fs.create(tmp, true)
    try os.write(graft.io.JsonValue.write(arr).getBytes("UTF-8"))
    finally os.close()
    val dst = new org.apache.hadoop.fs.Path(logDir, batch.toString)
    if (!fs.rename(tmp, dst) && !fs.exists(dst))
      throw new java.io.IOException(s"startable stream: could not commit $dst")
  }

  private def readLog(batch: Long): Seq[Entry] = {
    import graft.io.JsonValue._
    val p = new org.apache.hadoop.fs.Path(logDir, batch.toString)
    val in = fs.open(p)
    val txt = try new String(in.readAllBytes(), "UTF-8") finally in.close()
    graft.io.JsonValue.parse(txt).asInstanceOf[JsonArray].values.map { v =>
      val o = v.asInstanceOf[JsonObject]
      (o.fields("path").asInstanceOf[JsonString].value,
        o.fields("len").asInstanceOf[JsonNumber].value.toLong,
        o.fields("part").asInstanceOf[JsonArray].values.map {
          case JsonString(s) => s
          case _             => null
        })
    }
  }

  /** Recover (lastBatch, seen paths) from an existing log — restart path. */
  private def recover(): (Long, scala.collection.mutable.Set[String]) = {
    val seen = scala.collection.mutable.Set.empty[String]
    var last = 0L
    try {
      if (fs.exists(logDir)) {
        val ids = fs.listStatus(logDir).toSeq.map(_.getPath.getName)
          .filter(n => !n.startsWith(".") && n.forall(_.isDigit)).map(_.toLong)
        ids.sorted.foreach { b =>
          readLog(b).foreach(e => seen += e._1)
          last = math.max(last, b)
        }
      }
    } catch { case _: java.io.FileNotFoundException => () }
    (last, seen)
  }

  private var (lastBatch, seenPaths) = recover()

  // the pushed filters whose references are ALL partition columns prune
  // fresh files before they are ever logged
  private val partFilters = pushed.filter(_.references.forall(meta.partCols.contains))
  private val partParsers = meta.partCols.zip(meta.partUnits).map { case (_, u) =>
    graft.parse.ColumnParsers.cellParser(u, new graft.parse.ParseFixer())
  }
  private def slicePasses(raw: Seq[String]): Boolean =
    partFilters.isEmpty || {
      val vals: Map[String, Any] = meta.partCols.lazyZip(raw).lazyZip(partParsers)
        .map((c, r, p) => c -> (if (r == null) null else p(r))).toMap
      partFilters.forall(f =>
        StarTableSource.evalFilter(f, vals.getOrElse(_, null)))
    }

  // --------------------------------------------------------- offset calls
  override def initialOffset(): Offset = BatchOffset(0L)

  override def latestOffset(): Offset = {
    val current = StarTableSource.listPartitionedFiles(roots, meta.partCols,
      confS.value)
    val fresh0 = current.filter(f => !seenPaths.contains(f._1))
    val pruned = fresh0.filter(f => slicePasses(f._3))
    StarTableSource.filesPruned.add(fresh0.size - pruned.size)
    // pruned-away files are still SEEN (logged as consumed with no rows?
    // no — they are simply never logged; they can never match later, the
    // predicate is fixed for the query's lifetime, so remember them
    // in-memory to keep the diff cheap)
    fresh0.filterNot(f => slicePasses(f._3)).foreach(f => seenPaths += f._1)
    val fresh = maxFilesPerTrigger match {
      case Some(n) => pruned.take(n)
      case None    => pruned
    }
    if (fresh.nonEmpty) {
      lastBatch += 1
      writeLog(lastBatch, fresh)
      fresh.foreach(f => seenPaths += f._1)
    }
    BatchOffset(lastBatch)
  }

  override def deserializeOffset(json: String): Offset =
    BatchOffset(json.trim.toLong)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[BatchOffset].batch
    val e = end.asInstanceOf[BatchOffset].batch
    ((s + 1) to e).flatMap(readLog).flatMap { case (path, len, raw) =>
      val spec = meta.partCols.lazyZip(meta.partUnits).lazyZip(raw)
        .map((c, u, r) => (c, u, r))
      val eff = math.max(maxSplitBytes, math.ceil(len.toDouble / 10000).toLong)
      val n = math.max(1, math.ceil(len.toDouble / eff).toInt)
      (0 until n).map(k => StarFileSplitPartition(path,
        k * eff, math.min((k + 1L) * eff, len), 0L,
        meta.cols, meta.units, spec): InputPartition)
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new StarTableReaderFactory(None, sep, failFast, fullSchema, required,
      pushed, limit = None, confS = confS)

  override def commit(end: Offset): Unit = () // the log is the durable state
  override def stop(): Unit = ()
}
