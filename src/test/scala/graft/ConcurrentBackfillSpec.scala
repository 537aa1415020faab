package graft

import java.nio.file.Files
import java.util.concurrent.{CountDownLatch, CyclicBarrier, TimeUnit}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.io.{ConcurrentWriteException, CsvWriter, DatasetLock}
import graft.model.StarTable
import graft.operators.Maintenance

/** Round-13 disjoint-slice concurrent backfills (VERDICT r12 item 4): two
  * writers appending DIFFERENT partitions — the daily parallel-ingest
  * shape — must both commit, with no lost rows and no lost stat entries,
  * while OVERLAPPING backfills still refuse each other. Mechanics under
  * test: the shared slice-scoped lease, per-write dynamic-overwrite
  * isolation, and the flip-lock read-merge-install of the root sidecar.
  * Plus the round-13 plain-parquet lease (VERDICT item 2): maintenance on
  * non-StarTable trees now refuses a concurrent sibling too. */
class ConcurrentBackfillSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def freshDataset(tag: String, sharded: Boolean = false): String = {
    val out = Files.createTempDirectory(s"graft_cb_$tag").toString + "/ds"
    val df = spark.range(300).select(
      (when(col("id") % 3 === 0, "a")
        .when(col("id") % 3 === 1, "b").otherwise("c")).as("grp"),
      col("id").cast("double").as("v"))
    CsvWriter.writePartitionedDataset(
      StarTable.fromDataFrame(df, s"cb_$tag"), out,
      partitionBy = Seq("grp"), numFiles = 3,
      shardStats = if (sharded) Some(true) else None)
    out
  }

  private def slice(out: String, grp: String): org.apache.spark.sql.DataFrame =
    spark.read.format("startable").load(out).filter(col("grp") === grp)

  /** Run two backfills on two threads, each parked at the pre-sidecar
    * fault point until BOTH have landed their data — proving the shared
    * leases, the concurrent dynamic overwrites, and the serialized flips
    * all interleave correctly (not merely that the threads happened to
    * run one after the other). */
  private def runConcurrentBackfills(out: String, name: String,
                                     grpA: String, grpB: String): Unit = {
    val barrier = new CyclicBarrier(2)
    val prev = CsvWriter.faultHook
    CsvWriter.faultHook = p =>
      if (p == "backfill:pre-sidecar") barrier.await(120, TimeUnit.SECONDS)
    val errs = new java.util.concurrent.atomic.AtomicReference[Throwable]()
    def backfill(grp: String, base: Double): Thread = new Thread(() =>
      try {
        val upd = spark.range(40).select(lit(grp).as("grp"),
          (col("id").cast("double") + base).as("v"))
        CsvWriter.writePartitionedDataset(
          StarTable.fromDataFrame(upd, name), out,
          partitionBy = Seq("grp"), overwriteSlices = true)
      } catch { case t: Throwable => errs.compareAndSet(null, t) })
    val ta = backfill(grpA, 10000.0)
    val tb = backfill(grpB, 20000.0)
    try {
      ta.start(); tb.start()
      ta.join(180000); tb.join(180000)
    } finally CsvWriter.faultHook = prev
    val t = errs.get()
    if (t != null) throw t
  }

  test("two concurrent backfills to DISJOINT slices both commit: no lost " +
    "rows, no lost stat entries, linear commit chain") {
    val out = freshDataset("disjoint")
    val before = graft.sources.StarTableSource.readDatasetMeta(Seq(out)).get
    runConcurrentBackfills(out, "cb_disjoint", "a", "b")
    // rows: slices a and b replaced (100 → 40 each), c untouched
    assert(slice(out, "a").count() === 40)
    assert(slice(out, "b").count() === 40)
    assert(slice(out, "c").count() === 100)
    val va = slice(out, "a").agg(min(col("v"))).collect().head.getDouble(0)
    val vb = slice(out, "b").agg(min(col("v"))).collect().head.getDouble(0)
    assert(va >= 10000.0 && vb >= 20000.0, s"fresh rows must land: $va / $vb")
    // sidecar: BOTH writers' fresh slice entries present (the flip merge
    // preserved the sibling's install), c's original entry untouched
    graft.sources.StarTableSource.invalidateMetaCache(out)
    val after = graft.sources.StarTableSource.readDatasetMeta(Seq(out)).get
    assert(after.sliceStats.map(_.partition).toSet ===
      Set(Seq("a"), Seq("b"), Seq("c")))
    val rowsBySlice = after.sliceStats.map(s => s.partition.head -> s.rows).toMap
    assert(rowsBySlice === Map("a" -> 40L, "b" -> 40L, "c" -> 100L))
    // commit chain: linear and monotone. With BATCHED flips (round 14)
    // one drain may apply BOTH writers' staged merges, so the advance is
    // 2..4 (2 strips + 2 installs, each pair batchable into one flip) —
    // the r13 exactly-4 pin was the per-holder-serialized cost the
    // batching exists to remove
    assert(after.commit > before.commit && after.commit <= before.commit + 4,
      s"commit chain not linear: ${before.commit} -> ${after.commit}")
    // and no lease leaked
    assert(DatasetLock.readLock(out).isEmpty)
    assert(Maintenance.vacuumStarDataset(spark, out).restoredLeaves === 0)
  }

  test("disjoint concurrent backfills on the SHARDED-stats layout: both " +
    "commit, per-leaf shards fresh, root schema sidecar intact") {
    val out = freshDataset("sharded", sharded = true)
    runConcurrentBackfills(out, "cb_sharded", "a", "c")
    assert(slice(out, "a").count() === 40)
    assert(slice(out, "b").count() === 100)
    assert(slice(out, "c").count() === 40)
    graft.sources.StarTableSource.invalidateMetaCache(out)
    val after = graft.sources.StarTableSource.readDatasetMeta(Seq(out)).get
    assert(after.statsSharded, "the sharded layout must survive")
    // metadata-only aggregate still engages (shards fresh for a and c)
    val total = spark.read.format("startable").load(out).count()
    assert(total === 180)
  }

  test("two concurrent backfills to the SAME slice refuse each other") {
    val out = freshDataset("overlap")
    val staged = new CountDownLatch(1)
    val release = new CountDownLatch(1)
    val prev = CsvWriter.faultHook
    CsvWriter.faultHook = p =>
      if (p == "backfill:pre-data") { staged.countDown(); release.await() }
    val errs = new java.util.concurrent.atomic.AtomicReference[Throwable]()
    val first = new Thread(() =>
      try {
        val upd = spark.range(10).select(lit("a").as("grp"),
          (col("id").cast("double") + 10000.0).as("v"))
        CsvWriter.writePartitionedDataset(
          StarTable.fromDataFrame(upd, "cb_overlap"), out,
          partitionBy = Seq("grp"), overwriteSlices = true)
      } catch { case t: Throwable => errs.set(t) })
    first.start()
    try {
      assert(staged.await(120, TimeUnit.SECONDS))
      // second writer targets slice a too (plus c): overlap → refusal
      val e = intercept[ConcurrentWriteException] {
        val upd2 = spark.range(10).select(
          (when(col("id") % 2 === 0, "a").otherwise("c")).as("grp"),
          (col("id").cast("double") + 30000.0).as("v"))
        CsvWriter.writePartitionedDataset(
          StarTable.fromDataFrame(upd2, "cb_overlap"), out,
          partitionBy = Seq("grp"), overwriteSlices = true)
      }
      assert(e.getMessage.contains("locked") &&
        e.getMessage.contains("backfill"), e.getMessage)
    } finally {
      release.countDown()
      first.join(120000)
      CsvWriter.faultHook = prev
    }
    val t = errs.get(); if (t != null) throw t
    assert(slice(out, "a").count() === 10, "the parked backfill must commit")
  }

  test("a backfill holding a SHARED lease refuses maintenance (and vice " +
    "versa): compaction cannot interleave with a live slice write") {
    val out = freshDataset("maint")
    val staged = new CountDownLatch(1)
    val release = new CountDownLatch(1)
    val prev = CsvWriter.faultHook
    CsvWriter.faultHook = p =>
      if (p == "backfill:pre-data") { staged.countDown(); release.await() }
    val errs = new java.util.concurrent.atomic.AtomicReference[Throwable]()
    val bf = new Thread(() =>
      try {
        val upd = spark.range(10).select(lit("b").as("grp"),
          (col("id").cast("double") + 40000.0).as("v"))
        CsvWriter.writePartitionedDataset(
          StarTable.fromDataFrame(upd, "cb_maint"), out,
          partitionBy = Seq("grp"), overwriteSlices = true)
      } catch { case t: Throwable => errs.set(t) })
    bf.start()
    try {
      assert(staged.await(120, TimeUnit.SECONDS))
      val e = intercept[ConcurrentWriteException] {
        Maintenance.compactStarDataset(spark, out, 64 * 1024)
      }
      assert(e.getMessage.contains("backfill"), e.getMessage)
      intercept[ConcurrentWriteException] {
        Maintenance.vacuumStarDataset(spark, out)
      }
    } finally {
      release.countDown()
      bf.join(120000)
      CsvWriter.faultHook = prev
    }
    val t = errs.get(); if (t != null) throw t
  }

  test("a maintenance pass whose lease is LOST mid-run (forced break + " +
    "takeover) fences: it refuses before its next leaf swap") {
    val out = freshDataset("fence")
    spark.conf.set("spark.graft.lock.ttlMs", "1200") // heartbeat every 300 ms
    val staged = new CountDownLatch(1)
    val release = new CountDownLatch(1)
    Maintenance.faultHook = p =>
      if (p == "compact:staged") { staged.countDown(); release.await() }
    val errs = new java.util.concurrent.atomic.AtomicReference[Throwable]()
    val compactor = new Thread(() =>
      try { Maintenance.compactStarDataset(spark, out, 64 * 1024): Unit }
      catch { case t: Throwable => errs.set(t) })
    try {
      compactor.start()
      assert(staged.await(120, TimeUnit.SECONDS))
      // operator error: break the LIVE lease; a successor takes and
      // releases it — the parked compactor's heartbeat must notice
      assert(graft.io.DatasetLock.breakLock(out))
      val successor = graft.io.DatasetLock.acquire(out, "backfill")
      Thread.sleep(1500) // > 2 heartbeat intervals: the loss is observed
      successor.release()
    } finally {
      release.countDown()
      compactor.join(120000)
      Maintenance.faultHook = _ => ()
      spark.conf.unset("spark.graft.lock.ttlMs")
    }
    val t = errs.get()
    assert(t != null && t.isInstanceOf[ConcurrentWriteException] &&
      t.getMessage.contains("LOST"),
      s"the fenced compaction must refuse before swapping, got: $t")
    // the dataset is untouched and maintainable after cleanup
    assert(spark.read.format("startable").load(out).count() === 300)
    assert(Maintenance.vacuumStarDataset(spark, out).removedDirs >= 1)
    Maintenance.compactStarDataset(spark, out, 64 * 1024)
    assert(spark.read.format("startable").load(out).count() === 300)
  }

  test("plain-parquet trees get the lease too: a second compaction racing " +
    "a parked one refuses instead of interleaving leaf swaps") {
    val base = Files.createTempDirectory("graft_cb_parquet").toString + "/t"
    val df = spark.range(200).select(
      (col("id") % 4).cast("string").as("p"), col("id").as("v"))
    Maintenance.writePartitioned(df, base, Seq("p"))
    val staged = new CountDownLatch(1)
    val release = new CountDownLatch(1)
    Maintenance.faultHook = p =>
      if (p == "compact:staged") { staged.countDown(); release.await() }
    val errs = new java.util.concurrent.atomic.AtomicReference[Throwable]()
    val compactor = new Thread(() =>
      try { Maintenance.compact(spark, base, 64 * 1024): Unit }
      catch { case t: Throwable => errs.set(t) })
    compactor.start()
    try {
      assert(staged.await(120, TimeUnit.SECONDS))
      val e = intercept[ConcurrentWriteException] {
        Maintenance.compact(spark, base, 64 * 1024)
      }
      assert(e.getMessage.contains("compact"), e.getMessage)
      intercept[ConcurrentWriteException] {
        Maintenance.dropPartitions(spark, base, "p", Seq("1"))
      }
    } finally {
      release.countDown()
      compactor.join(120000)
      Maintenance.faultHook = _ => ()
    }
    val t = errs.get(); if (t != null) throw t
    // after release both maintenance ops work and no rows were lost
    assert(Maintenance.dropPartitions(spark, base, "p", Seq("1")) === 1L)
    assert(spark.read.parquet(base).count() === 150)
  }
}
