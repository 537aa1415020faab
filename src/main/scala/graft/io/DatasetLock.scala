package graft.io

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

/** A concurrent writer raced this one on the same dataset root — either a
  * held [[DatasetLock]] (detected up front) or a commit-counter mismatch at
  * the sidecar flip (detected at the commit point). Always a refusal, never
  * silent interleaving. */
final class ConcurrentWriteException(msg: String)
  extends IllegalStateException(msg)

/** Advisory writer lease on a StarTable dataset root.
  *
  * Why it exists: every multi-step write protocol on a dataset
  * (incremental backfill, compaction, clustering, stats migration,
  * vacuum, streaming ingest) is individually crash-safe through
  * stage-and-rename, but TWO writers interleaving on one root can lose
  * work silently — a compaction's leaf swap drops the rows a concurrent
  * ingest just committed into the old leaf, a vacuum deletes the staging
  * directory a live clustering is about to install, two backfills strip
  * and rewrite each other's sidecar stats. The reference never faces this
  * (it is explicitly single-process — load orchestration in
  * /root/reference/pdtable/io/load/_orchestrators.py:24); a production
  * pipeline runs ingest and maintenance concurrently on day one.
  *
  * Semantics: DETECT-AND-REFUSE, not wait-and-retry. Acquisition
  * atomically creates `_startable_lock.json` inside the root
  * (`fs.create(path, overwrite = false)` — the HDFS/local atomic-create
  * primitive) and verifies ownership by reading back its unique token, so
  * even on stores where create-no-overwrite is check-then-act the losing
  * racer of the tiny window sees the other's token and refuses. A held
  * lock fails fast with the holder's operation, owner, and age — the
  * caller decides whether to wait or, after a crash, clear it with
  * [[graft.operators.Maintenance.breakDatasetLock]]. The `_` prefix keeps
  * the file invisible to every data listing.
  *
  * This is the first coordination layer, not a transaction log: readers
  * never take locks (reads stay lock-free and scale-free), and a second
  * defense — the sidecar commit counter with compare-and-swap semantics
  * at the root flip ([[CsvWriter.writeDatasetSidecar]]) — catches writers
  * that bypassed the lease (legacy code, a broken lock). */
object DatasetLock {

  val LockFile = "_startable_lock.json"

  final case class LockInfo(op: String, owner: String, acquiredAtMs: Long,
                            token: String) {
    def describe(nowMs: Long): String =
      s"operation '$op' by $owner, acquired ${(nowMs - acquiredAtMs) / 1000} s ago"
  }

  /** A held lease; [[release]] is idempotent and only ever deletes the
    * lock if it still carries this handle's token (a lease lost to a
    * forced break or a directory overwrite is never someone else's lease
    * deleted). The token check is check-then-act — a [[breakLock]] fired
    * WHILE this holder was alive, followed by a new acquisition landing
    * exactly between this release's read and delete, could remove the new
    * holder's file; that ordering requires breaking a LIVE holder's lock,
    * which [[breakLock]]'s contract already forbids (break only crashed
    * holders). */
  final class Handle private[DatasetLock] (fs: FileSystem, path: Path,
                                           val info: LockInfo) {
    @volatile private var released = false
    def release(): Unit = synchronized {
      if (!released) {
        released = true
        try {
          if (read(fs, path).exists(_.token == info.token))
            fs.delete(path, false)
        } catch { case _: java.io.IOException => () }
      }
    }
  }

  private def lockPath(rootDir: String): Path =
    new Path(new Path(rootDir), LockFile)

  private def render(i: LockInfo): String = {
    import JsonValue._
    JsonValue.write(JsonObject(scala.collection.immutable.ListMap(
      "op" -> JsonString(i.op), "owner" -> JsonString(i.owner),
      "acquiredAtMs" -> JsonNumber(i.acquiredAtMs.toDouble),
      "token" -> JsonString(i.token))))
  }

  private def read(fs: FileSystem, path: Path): Option[LockInfo] =
    try {
      val in = fs.open(path)
      val txt = try new String(in.readAllBytes(), "UTF-8") finally in.close()
      import JsonValue._
      val o = JsonValue.parse(txt).asInstanceOf[JsonObject]
      def s(k: String) = o.fields(k).asInstanceOf[JsonString].value
      Some(LockInfo(s("op"), s("owner"),
        o.fields("acquiredAtMs").asInstanceOf[JsonNumber].value.toLong,
        s("token")))
    } catch {
      case _: java.io.FileNotFoundException => None
      case _: Exception =>
        // a truncated lock (crash mid-create) still MEANS "locked" — an
        // unreadable holder is reported as such, never silently ignored
        Some(LockInfo("<unreadable lock file>", "<unknown>", 0L, ""))
    }

  /** The current holder, if any. */
  def readLock(rootDir: String,
               conf: Configuration =
                 graft.sources.StarTableSource.activeHadoopConf())
      : Option[LockInfo] = {
    val p = lockPath(rootDir)
    read(p.getFileSystem(conf), p)
  }

  /** Session override for the detect-and-refuse default: a positive
    * `spark.graft.lock.awaitMs` makes every lease acquisition WAIT up to
    * that long (polling) for the holder to finish before refusing — the
    * serialized-writers mode for pipelines whose maintenance jobs are
    * allowed to queue behind a short ingest instead of failing the run. */
  def awaitMsFromConf(spark: org.apache.spark.sql.SparkSession): Long =
    spark.conf.getOption("spark.graft.lock.awaitMs").map(_.toLong).getOrElse(0L)

  /** Acquire the root's writer lease for `op`, refusing loudly
    * ([[ConcurrentWriteException]]) when another writer holds it —
    * after waiting up to `awaitMs` (polling every 500 ms) when positive. */
  def acquire(rootDir: String, op: String,
              conf: Configuration =
                graft.sources.StarTableSource.activeHadoopConf(),
              awaitMs: Long = 0L): Handle = {
    val p = lockPath(rootDir)
    val fs = p.getFileSystem(conf)
    val deadline = System.currentTimeMillis() + math.max(0L, awaitMs)
    def refuse(holder: LockInfo): Nothing =
      throw new ConcurrentWriteException(
        s"dataset at $rootDir is locked: ${holder.describe(System.currentTimeMillis())} " +
          s"— a concurrent writer is in flight; '$op' refuses rather than " +
          "interleave" +
          (if (awaitMs > 0) s" (waited ${awaitMs / 1000} s)" else "") +
          ". Wait for it to finish, or if it crashed, clear the " +
          "stale lease with Maintenance.breakDatasetLock " +
          "(CALL graft.system.break_dataset_lock).")
    var holder = read(fs, p)
    while (holder.isDefined && System.currentTimeMillis() < deadline) {
      Thread.sleep(500)
      holder = read(fs, p)
    }
    holder.foreach(refuse)
    val info = LockInfo(op,
      s"${java.lang.management.ManagementFactory.getRuntimeMXBean.getName}",
      System.currentTimeMillis(),
      java.util.UUID.randomUUID().toString)
    val os =
      try fs.create(p, false)
      catch {
        // another writer won the create race
        case _: java.io.IOException => read(fs, p).foreach(refuse)
          throw new ConcurrentWriteException(
            s"dataset at $rootDir: lock create raced and lost at $p")
      }
    try os.write(render(info).getBytes("UTF-8")) finally os.close()
    // read-back ownership check: on stores whose create-no-overwrite is
    // check-then-act, the losing racer sees the winner's token here
    read(fs, p) match {
      case Some(cur) if cur.token == info.token => new Handle(fs, p, info)
      case Some(other)                          => refuse(other)
      case None => throw new ConcurrentWriteException(
        s"dataset at $rootDir: lock vanished during acquisition at $p")
    }
  }

  /** Run `f` under the root's writer lease, releasing under `finally` —
    * a fault-drill kill (exception) unwinds to a released lock; only a
    * PROCESS crash leaves the lease behind, exactly the state
    * breakDatasetLock exists for. */
  def withLock[A](rootDir: String, op: String,
                  conf: Configuration =
                    graft.sources.StarTableSource.activeHadoopConf(),
                  awaitMs: Long = 0L)(f: => A): A = {
    val h = acquire(rootDir, op, conf, awaitMs)
    try f finally h.release()
  }

  /** Forcibly clear the root's lease (operator intervention after a
    * crashed writer). Returns true when a lock was removed. */
  def breakLock(rootDir: String,
                conf: Configuration =
                  graft.sources.StarTableSource.activeHadoopConf()): Boolean = {
    val p = lockPath(rootDir)
    val fs = p.getFileSystem(conf)
    fs.exists(p) && fs.delete(p, false)
  }
}
