package graft

import java.nio.file.Files
import java.util.concurrent.TimeUnit

import org.scalatest.funsuite.AnyFunSuite

import graft.io.{ConcurrentWriteException, DatasetLock}

/** Round-13 lease liveness (VERDICT r12 item 1): a kill -9'd holder must
  * not wedge a dataset's writers forever. Every lease carries a TTL and a
  * heartbeat; an acquirer finding a lease whose heartbeat stopped longer
  * than the TTL ago takes it over automatically, while a LIVE holder —
  * however slow its work — is never usurped because its heartbeat keeps
  * the lease fresh. Plus the round-13 shared (slice-scoped) lease
  * semantics: disjoint backfills coexist, overlapping ones refuse, and
  * exclusive/shared exclude each other. */
class LeaseLivenessSpec extends AnyFunSuite {
  // lock tests are pure-FS: no SparkSession needed, but the Hadoop conf
  // comes from the active session when one exists — reuse the shared one
  private lazy val spark = TestSpark.spark

  private def freshRoot(tag: String): String = {
    spark.version // force session init so activeHadoopConf resolves
    Files.createTempDirectory(s"graft_lease_$tag").toString + "/ds"
  }

  test("an abandoned lease (kill -9: heartbeat stopped, never released) is " +
    "taken over after its TTL by a waiting acquirer") {
    val root = freshRoot("takeover")
    val h1 = DatasetLock.acquire(root, "stream-ingest", ttlMs = 500L)
    h1.abandon() // simulate the process kill: file stays, heartbeat stops
    // detect-and-refuse sees the (not yet expired) lease immediately
    intercept[ConcurrentWriteException] {
      DatasetLock.acquire(root, "compact")
    }
    // a bounded-wait acquirer polls, sees the TTL elapse with no
    // heartbeat, and takes the lease over — no human break needed
    val t0 = System.currentTimeMillis()
    val h2 = DatasetLock.acquire(root, "compact", awaitMs = 30000L)
    try {
      val took = System.currentTimeMillis() - t0
      assert(took < 15000L, s"takeover should happen shortly after expiry, took ${took} ms")
      val cur = DatasetLock.readLock(root)
      assert(cur.exists(_.token == h2.info.token),
        s"the taker's token must own the lock, got $cur")
      assert(cur.exists(_.op == "compact"))
    } finally h2.release()
    assert(DatasetLock.readLock(root).isEmpty, "release must clear the lock")
  }

  test("a LIVE slow holder is never usurped: its heartbeat keeps the lease " +
    "fresh past many TTLs") {
    val root = freshRoot("liveholder")
    val h1 = DatasetLock.acquire(root, "cluster", ttlMs = 1200L)
    try {
      Thread.sleep(4000L) // > 3 TTLs of wall time; heartbeats every 300 ms
      val e = intercept[ConcurrentWriteException] {
        DatasetLock.acquire(root, "compact")
      }
      assert(e.getMessage.contains("cluster"),
        s"the live holder must still own the lease: ${e.getMessage}")
      assert(!h1.lost, "a renewing holder must not lose its own lease")
      val cur = DatasetLock.readLock(root).get
      assert(cur.token == h1.info.token)
      assert(System.currentTimeMillis() - cur.effectiveRenewedAt < 1200L,
        "the on-disk lease must carry a recent heartbeat")
    } finally h1.release()
    DatasetLock.withLock(root, "compact") { () } // lease free again
  }

  test("a zombie holder (lease forcibly broken and re-acquired while it " +
    "still runs) marks itself lost and never overwrites its successor") {
    val root = freshRoot("zombie")
    val h1 = DatasetLock.acquire(root, "backfill", ttlMs = 1200L)
    // operator error: break a LIVE holder's lock, then a new writer takes it
    assert(DatasetLock.breakLock(root))
    val h2 = DatasetLock.acquire(root, "compact", ttlMs = 1200L)
    try {
      // h1's next heartbeat sees a foreign token and self-invalidates
      val deadline = System.currentTimeMillis() + 5000L
      while (!h1.lost && System.currentTimeMillis() < deadline)
        Thread.sleep(100L)
      assert(h1.lost, "the usurped holder must mark itself lost")
      // and across further heartbeats the successor's token is untouched
      Thread.sleep(800L)
      assert(DatasetLock.readLock(root).exists(_.token == h2.info.token),
        "the zombie must never rewrite the successor's lease")
      // the zombie's release must not delete the successor's lock either
      h1.release()
      assert(DatasetLock.readLock(root).exists(_.token == h2.info.token))
    } finally h2.release()
  }

  test("a legacy no-TTL lease never expires: waiters refuse and only " +
    "breakDatasetLock clears it") {
    val root = freshRoot("legacy")
    val h = DatasetLock.acquire(root, "backfill", ttlMs = 0L)
    h.abandon()
    val e = intercept[ConcurrentWriteException] {
      DatasetLock.acquire(root, "compact", awaitMs = 1500L)
    }
    assert(e.getMessage.contains("break manually") ||
      e.getMessage.contains("break_dataset_lock"), e.getMessage)
    assert(DatasetLock.breakLock(root))
    DatasetLock.withLock(root, "compact") { () }
  }

  test("shared leases: disjoint slice sets coexist, overlapping ones " +
    "refuse, and exclusive excludes (and is excluded by) shared") {
    val root = freshRoot("shared")
    val a = DatasetLock.acquireShared(root, "backfill", Set(Seq("day=a")))
    val b = DatasetLock.acquireShared(root, "backfill", Set(Seq("day=b")))
    try {
      // overlapping shared sibling refuses, naming the holder
      val e1 = intercept[ConcurrentWriteException] {
        DatasetLock.acquireShared(root, "backfill", Set(Seq("day=a"), Seq("day=c")))
      }
      assert(e1.getMessage.contains("backfill"), e1.getMessage)
      // exclusive refuses while any shared lease is live
      val e2 = intercept[ConcurrentWriteException] {
        DatasetLock.acquire(root, "compact")
      }
      assert(e2.getMessage.contains("backfill"), e2.getMessage)
    } finally { a.release(); b.release() }
    // all shared released: exclusive proceeds, and then shared refuses
    val ex = DatasetLock.acquire(root, "compact")
    try {
      intercept[ConcurrentWriteException] {
        DatasetLock.acquireShared(root, "backfill", Set(Seq("day=a")))
      }
    } finally ex.release()
    // an ABANDONED shared lease expires and is evicted by the next writer
    val c = DatasetLock.acquireShared(root, "backfill", Set(Seq("day=c")),
      ttlMs = 400L)
    c.abandon()
    val ex2 = DatasetLock.acquire(root, "compact", awaitMs = 30000L)
    ex2.release()
  }

  test("breakLock clears exclusive, shared, and flip locks together") {
    val root = freshRoot("breakall")
    DatasetLock.acquireShared(root, "backfill", Set(Seq("x=1"))).abandon()
    DatasetLock.acquireShared(root, "backfill", Set(Seq("x=2"))).abandon()
    assert(DatasetLock.breakLock(root))
    // everything clear: exclusive acquires instantly
    DatasetLock.withLock(root, "compact") { () }
    assert(!DatasetLock.breakLock(root), "nothing left to break")
  }

  test("the flip lock serializes sidecar mutations among shared holders") {
    val root = freshRoot("flip")
    val inside = new java.util.concurrent.atomic.AtomicInteger(0)
    val maxInside = new java.util.concurrent.atomic.AtomicInteger(0)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    val futs = (1 to 4).map { _ =>
      pool.submit(new Runnable {
        def run(): Unit = (1 to 5).foreach { _ =>
          DatasetLock.withFlipLock(root) { token =>
            assert(token.nonEmpty)
            val now = inside.incrementAndGet()
            maxInside.accumulateAndGet(now, math.max)
            Thread.sleep(10L)
            inside.decrementAndGet()
          }
        }
      })
    }
    futs.foreach(_.get(120, TimeUnit.SECONDS))
    pool.shutdown()
    assert(maxInside.get() == 1,
      s"flip lock must admit exactly one holder, saw ${maxInside.get()}")
  }
}
