package graft

import java.nio.file.{Files => NioFiles, Paths => NioPaths, StandardOpenOption}
import java.util.concurrent.{CountDownLatch, TimeUnit}

import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

import graft.io.{ConcurrentWriteException, DatasetLock}

/** Round-14 LockStore backends (VERDICT r13 item 3): the lease protocol's
  * safety case is explicit per store — a simulated CHECK-THEN-ACT store
  * (object-store semantics: plain put, no O_EXCL) demonstrates the
  * documented residual hazard when a racer's check-to-create gap exceeds
  * the grace window, and a simulated CONDITIONAL-PUT store (etag /
  * If-None-Match semantics) closes exactly that hazard with the same
  * protocol code. Plus the ADVICE-r13 absent-window drill: on a store
  * whose overwrite-install transiently removes the path, an acquirer
  * must never usurp a LIVE holder mid-heartbeat. */
class LockStoreSpec extends AnyFunSuite {

  private def freshRoot(tag: String): String =
    NioFiles.createTempDirectory(s"graft_lockstore_$tag").toString

  /** Object-store semantics: createNew is exists-check + plain put (a
    * loser TRUNCATES the winner); installOverwrite is delete + recreate
    * (the path is transiently absent). Hooks inject adversarial stalls. */
  private final class CheckThenActStore extends DatasetLock.LockStore {
    @volatile var beforeCreateWrite: () => Unit = () => ()
    @volatile var inOverwriteGap: () => Unit = () => ()
    override def atomicCreate: Boolean = false
    override def atomicOverwrite: Boolean = false
    private def local(p: Path) = NioPaths.get(p.toUri.getPath)
    override def createNew(p: Path, bytes: Array[Byte]): Boolean = {
      if (NioFiles.exists(local(p))) return false
      beforeCreateWrite()
      NioFiles.createDirectories(local(p).getParent)
      NioFiles.write(local(p), bytes, StandardOpenOption.CREATE,
        StandardOpenOption.TRUNCATE_EXISTING, StandardOpenOption.WRITE)
      true
    }
    override def readBytes(p: Path): Array[Byte] =
      try NioFiles.readAllBytes(local(p))
      catch { case e: java.nio.file.NoSuchFileException =>
        throw new java.io.FileNotFoundException(e.getMessage) }
    override def installOverwrite(p: Path, bytes: Array[Byte]): Unit = {
      NioFiles.deleteIfExists(local(p))
      inOverwriteGap()
      NioFiles.write(local(p), bytes, StandardOpenOption.CREATE,
        StandardOpenOption.WRITE)
    }
    override def delete(p: Path): Unit = { NioFiles.deleteIfExists(local(p)): Unit }
  }

  /** Conditional-put semantics: the exists-check and the put are one
    * atomic step (If-None-Match), and overwrites install atomically. A
    * JVM-global mutex is a faithful single-host emulation. */
  private final class CasStore extends DatasetLock.LockStore {
    @volatile var beforeCreateWrite: () => Unit = () => ()
    override def atomicCreate: Boolean = true
    override def atomicOverwrite: Boolean = true
    private def local(p: Path) = NioPaths.get(p.toUri.getPath)
    override def createNew(p: Path, bytes: Array[Byte]): Boolean = {
      beforeCreateWrite() // the stall sits BEFORE the atomic step
      CasStore.mutex.synchronized {
        if (NioFiles.exists(local(p))) false
        else {
          NioFiles.createDirectories(local(p).getParent)
          NioFiles.write(local(p), bytes, StandardOpenOption.CREATE_NEW,
            StandardOpenOption.WRITE)
          true
        }
      }
    }
    override def readBytes(p: Path): Array[Byte] =
      try NioFiles.readAllBytes(local(p))
      catch { case e: java.nio.file.NoSuchFileException =>
        throw new java.io.FileNotFoundException(e.getMessage) }
    override def installOverwrite(p: Path, bytes: Array[Byte]): Unit = {
      val target = local(p)
      val tmp = target.resolveSibling("." + target.getFileName + ".cas.tmp")
      NioFiles.write(tmp, bytes)
      CasStore.mutex.synchronized {
        NioFiles.move(tmp, target,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      }
    }
    override def delete(p: Path): Unit = { NioFiles.deleteIfExists(local(p)): Unit }
  }
  private object CasStore { val mutex = new Object }

  test("check-then-act store: a racer stalled past the grace window " +
    "DOES break mutual exclusion — the documented residual, demonstrated") {
    val store = new CheckThenActStore
    DatasetLock.withStoreFactory(_ => store) {
      val root = freshRoot("residual")
      val aInCreate = new CountDownLatch(1)
      val bDone = new CountDownLatch(1)
      val holders = new java.util.concurrent.atomic.AtomicInteger(0)
      val errs = new java.util.concurrent.atomic.AtomicReference[Throwable]()
      // A's exists-check passes, then A stalls until B fully acquired —
      // A's late plain put then TRUNCATES B's lock and A's read-backs all
      // see A's own token: both believe they hold the lease
      val a = new Thread(() => try {
        store.beforeCreateWrite = () => {
          if (Thread.currentThread().getName == "racer-a") {
            aInCreate.countDown()
            assert(bDone.await(30, TimeUnit.SECONDS))
          }
        }
        DatasetLock.acquire(root, "racer-a-op")
        holders.incrementAndGet()
      } catch { case t: Throwable => errs.compareAndSet(null, t) }, "racer-a")
      a.start()
      assert(aInCreate.await(30, TimeUnit.SECONDS))
      DatasetLock.acquire(root, "racer-b-op")
      holders.incrementAndGet()
      bDone.countDown()
      a.join(30000)
      val t = errs.get(); if (t != null) throw t
      assert(holders.get() == 2,
        "expected the residual double-hold on a plain-put store — if this " +
          "now refuses, the residual documentation should be updated")
      DatasetLock.breakLock(root)
    }
  }

  test("conditional-put store: the SAME adversarial stall cannot break " +
    "mutual exclusion (the atomic create refuses the late racer)") {
    val store = new CasStore
    DatasetLock.withStoreFactory(_ => store) {
      val root = freshRoot("cas")
      val aInCreate = new CountDownLatch(1)
      val bDone = new CountDownLatch(1)
      val aOutcome = new java.util.concurrent.atomic.AtomicReference[String]()
      val a = new Thread(() => try {
        store.beforeCreateWrite = () => {
          if (Thread.currentThread().getName == "cas-a") {
            aInCreate.countDown()
            assert(bDone.await(30, TimeUnit.SECONDS))
          }
        }
        DatasetLock.acquire(root, "cas-a-op")
        aOutcome.set("acquired")
      } catch {
        case _: ConcurrentWriteException => aOutcome.set("refused")
        case t: Throwable => aOutcome.set(s"error: $t")
      }, "cas-a")
      a.start()
      assert(aInCreate.await(30, TimeUnit.SECONDS))
      val b = DatasetLock.acquire(root, "cas-b-op")
      bDone.countDown()
      a.join(30000)
      // A's conditional put fails (B's object exists), A re-reads, sees
      // B's LIVE lease, and refuses — never a second holder
      assert(aOutcome.get() == "refused", s"A: ${aOutcome.get()}")
      b.release()
      // and after B releases, A's shape of acquire succeeds cleanly
      DatasetLock.withLock(root, "cas-after") { () }
    }
  }

  test("non-atomic overwrite: an acquirer never usurps a LIVE holder " +
    "whose heartbeat rewrite leaves the path transiently absent") {
    val store = new CheckThenActStore
    DatasetLock.withStoreFactory(_ => store) {
      val root = freshRoot("absent")
      // short TTL → heartbeat every ~100 ms; the rewrite gap is 40 ms, well
      // inside the 100 ms grace that absent-confirmation waits
      store.inOverwriteGap = () => Thread.sleep(40L)
      val holder = DatasetLock.acquire(root, "stream-ingest", ttlMs = 400L)
      try {
        // every attempt must refuse — an acquire that returns means a
        // live lease was usurped through the absent window. One acquire
        // call may itself span several heartbeat cycles (absent-confirm
        // re-reads), so the drill counts attempts, not wall time.
        (1 to 8).foreach { _ =>
          intercept[ConcurrentWriteException] {
            DatasetLock.acquire(root, "usurper")
          }
        }
        assert(!holder.lost, "the live holder must still hold its lease")
      } finally holder.release()
    }
  }
}
