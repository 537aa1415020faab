package graft.sources

import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.StructType

/** Streaming READ of a hive-partitioned StarTable dataset — the source
  * leg completing [[graft.io.CsvWriter.streamPartitionedDataset]]'s sink
  * leg: `spark.readStream.format("startable").load(dir)` discovers files
  * as they appear and emits each exactly once across restarts.
  *
  * Discovery: when the directory carries a `_spark_metadata` sink
  * manifest (it was written by Spark's streaming file sink), ONLY
  * manifest-committed files are discovered — the sink writes part files
  * IN PLACE at their final path, so a raw listing could freeze a
  * mid-write file at partial length (permanent silent row loss) or admit
  * an orphan from a failed task (duplicates). This is exactly the
  * contract of Spark's own FileStreamSource over sink output; files a
  * BATCH writer adds beside the manifest are invisible to streaming
  * readers, as with the built-in source. Without a manifest (the
  * batch-written layout, whose files become visible by atomic rename),
  * discovery is the recursive listing.
  *
  * Progress is a monotone batch counter over a DURABLE per-batch file log
  * under the query checkpoint (`<ckpt>/graft-files/<batchId>`, staged and
  * renamed): each trigger diffs discovery against every file already
  * logged and logs the new ones as the next batch, so a restart replays
  * exactly the logged batches and never re-reads a file. A missing or
  * unreadable log entry fails LOUDLY (re-emitting would be silent
  * duplication). Spark applies query filters post-scan (DSv2 streaming
  * has no operator pushdown). `maxFilesPerTrigger` caps a micro-batch;
  * `Trigger.AvailableNow` snapshots the available set at start and drains
  * it in capped batches. Compaction must not run while a continuous
  * reader is attached (rewritten files would rediscover as new rows). */
private[sources] class StarTableMicroBatchStream(
    roots: Seq[String], meta: StarTableSource.DatasetMeta,
    checkpointLocation: String,
    sep: String, failFast: Boolean,
    fullSchema: StructType, required: StructType,
    pushed: Array[Filter], maxSplitBytes: Long,
    maxFilesPerTrigger: Option[Int],
    confS: org.apache.spark.util.SerializableConfiguration)
    extends MicroBatchStream with SupportsAdmissionControl
    with SupportsTriggerAvailableNow {

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
    val txt = try {
      val in = fs.open(p)
      try new String(in.readAllBytes(), "UTF-8") finally in.close()
    } catch {
      case e: java.io.IOException =>
        // a gap in the log means the checkpoint is damaged: re-emitting
        // the files it covered would be SILENT duplication — refuse
        throw new IllegalStateException(
          s"startable stream: missing/unreadable file-log entry $p — " +
            "the checkpoint is damaged; restore it or start a fresh " +
            "checkpoint", e)
    }
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

  /** Recover (lastBatch, seen paths) from an existing log — restart path.
    * Every entry in [1, lastBatch] must be readable (gaps fail loudly in
    * [[readLog]]); only a wholly absent log dir means a fresh query. */
  private def recover(): (Long, scala.collection.mutable.Set[String]) = {
    val seen = scala.collection.mutable.Set.empty[String]
    var last = 0L
    val ids: Seq[Long] =
      try fs.listStatus(logDir).toSeq.map(_.getPath.getName)
        .filter(n => !n.startsWith(".") && n.forall(_.isDigit)).map(_.toLong)
      catch { case _: java.io.FileNotFoundException => Nil }
    if (ids.nonEmpty) {
      last = ids.max
      (1L to last).foreach(b => readLog(b).foreach(e => seen += e._1))
    }
    (last, seen)
  }

  private var (lastBatch, seenPaths) = recover()

  // ----------------------------------------------------------- discovery
  /** Current file inventory: manifest-committed files when the directory
    * is streaming-sink output, else the recursive listing. */
  private def discover(): Seq[Entry] =
    StarTableStreamUtil.sinkManifestFiles(roots.head, confS.value) match {
      case Some(files) =>
        files.map { case (p, len) =>
          (p, len, StarTableStreamUtil.partitionValuesFromPath(p, meta.partCols))
        }
      case None =>
        StarTableSource.listPartitionedFiles(roots, meta.partCols, confS.value)
    }

  /** Files discovered but not yet logged. */
  private def freshFiles(): Seq[Entry] =
    discover().filter(f => !seenPaths.contains(f._1))

  // Trigger.AvailableNow: the available set is SNAPSHOTTED at run start
  // and drained in capped batches; files appearing later wait for the
  // next run (the process-everything-then-stop contract).
  private var availableNowQueue: scala.collection.mutable.Queue[Entry] = null
  override def prepareForTriggerAvailableNow(): Unit = {
    availableNowQueue = scala.collection.mutable.Queue(freshFiles(): _*)
  }

  // --------------------------------------------------------- offset calls
  override def initialOffset(): Offset = BatchOffset(0L)

  override def getDefaultReadLimit: ReadLimit =
    maxFilesPerTrigger.map(n => ReadLimit.maxFiles(n))
      .getOrElse(ReadLimit.allAvailable())

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) should be called instead of this")

  override def reportLatestOffset(): Offset = BatchOffset(lastBatch)

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val cap: Int = limit match {
      case m: org.apache.spark.sql.connector.read.streaming.ReadMaxFiles =>
        m.maxFiles()
      case _ => Int.MaxValue
    }
    val fresh: Seq[Entry] =
      if (availableNowQueue != null) {
        val take = math.min(cap, availableNowQueue.size)
        (0 until take).map(_ => availableNowQueue.dequeue())
      } else freshFiles().take(cap)
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

private[sources] object StarTableStreamUtil {

  /** Committed (path, size) entries from a streaming file sink's
    * `_spark_metadata` manifest, or None when the directory carries no
    * manifest. Reads the latest `.compact` file plus every later delta —
    * the FileStreamSinkLog layout: a `v1` header line, then one JSON
    * `SinkFileStatus` per line; only `action = "add"` entries count. */
  def sinkManifestFiles(root: String,
                        conf: org.apache.hadoop.conf.Configuration)
      : Option[Seq[(String, Long)]] = {
    val dir = new org.apache.hadoop.fs.Path(root, "_spark_metadata")
    val fs = dir.getFileSystem(conf)
    val entries = try {
      fs.listStatus(dir).toSeq.map(_.getPath.getName)
        .filter(n => !n.startsWith(".") && !n.endsWith(".crc"))
    } catch { case _: java.io.FileNotFoundException => return None }
    if (entries.isEmpty) return Some(Nil)
    def batchOf(n: String): Long = n.stripSuffix(".compact").toLong
    val compacts = entries.filter(_.endsWith(".compact"))
    val base: Option[String] =
      if (compacts.isEmpty) None else Some(compacts.maxBy(batchOf))
    val baseBatch = base.map(batchOf).getOrElse(-1L)
    val toRead = base.toSeq ++
      entries.filterNot(_.endsWith(".compact"))
        .filter(n => n.forall(_.isDigit) && n.toLong > baseBatch)
        .sortBy(_.toLong)
    import graft.io.JsonValue._
    val files = scala.collection.mutable.LinkedHashMap.empty[String, Long]
    toRead.foreach { name =>
      val in = fs.open(new org.apache.hadoop.fs.Path(dir, name))
      val txt = try new String(in.readAllBytes(), "UTF-8") finally in.close()
      txt.split('\n').iterator.map(_.trim).filter(_.startsWith("{")).foreach { line =>
        val o = graft.io.JsonValue.parse(line).asInstanceOf[JsonObject]
        val p = o.fields("path").asInstanceOf[JsonString].value
        val size = o.fields.get("size")
          .collect { case JsonNumber(v) => v.toLong }.getOrElse(0L)
        val action = o.fields.get("action")
          .collect { case JsonString(s) => s }.getOrElse("add")
        if (action == "add") files(p) = size else files.remove(p)
      }
    }
    // manifest paths are absolute URIs (file:/...); normalize to plain
    // paths consistent with the listing convention
    Some(files.toSeq.map { case (p, s) =>
      (new org.apache.hadoop.fs.Path(new java.net.URI(p)).toString, s)
    })
  }

  /** Raw partition values for `partCols`, parsed from a file path's
    * `col=value` segments below `root` (unescaped; default-partition
    * marker → null). Missing columns fail loudly — a silently null-padded
    * slice would corrupt joins (same contract as the listing). */
  def partitionValuesFromPath(path: String,
                              partCols: Seq[String]): Seq[String] = {
    val rel = new org.apache.hadoop.fs.Path(path)
    var spec = Map.empty[String, String]
    var p = rel.getParent
    // partition segments are exactly the `col=value` dirs under the root;
    // the climb stops at the first '='-less ancestor (the root itself)
    while (p != null && p.getName.indexOf('=') > 0) {
      val n = p.getName
      val eq = n.indexOf('=')
      val k = StarTableSource.unescapePathName(n.substring(0, eq))
      val v0 = StarTableSource.unescapePathName(n.substring(eq + 1))
      spec += k -> (if (v0 == "__HIVE_DEFAULT_PARTITION__") null else v0)
      p = p.getParent
    }
    val missing = partCols.filterNot(spec.contains)
    require(missing.isEmpty,
      s"startable stream: file $path lacks partition value(s) for " +
        s"${missing.mkString(", ")} in its path")
    partCols.map(spec(_))
  }
}
