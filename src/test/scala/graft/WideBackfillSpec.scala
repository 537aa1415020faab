package graft

import java.util.concurrent.{CountDownLatch, TimeUnit}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.io.{ConcurrentWriteException, CsvWriter, DatasetLock}
import graft.model.StarTable

/** Round-14 stretch (VERDICT r13 item 7): a backfill touching more
  * slices than a lease can record explicitly no longer falls back to the
  * exclusive root lease — its shared lease carries a Bloom DIGEST of the
  * touched set with refuse-on-maybe semantics, so disjoint siblings keep
  * coexisting with wide backfills. Digest-vs-digest is conservatively
  * exclusive (two Bloom filters cannot prove disjointness). */
class WideBackfillSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("lock level: a 5000-slice digest lease admits a disjoint explicit " +
    "sibling, refuses overlapping ones, and digest-vs-digest serializes") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_wide_lock").toString
    val wide = (0 until 5000).map(i => Seq(s"g$i"): Seq[String]).toSet
    val digest = DatasetLock.SliceDigest.build(wide)
    // membership sanity: every member tests positive; a disjoint probe
    // set has (at ~1% fp) no more than a few false positives
    assert(wide.forall(digest.mightContain))
    val probes = (0 until 1000).map(i => Seq(s"other$i"): Seq[String])
    val fp = probes.count(digest.mightContain)
    assert(fp < 50, s"implausible false-positive rate: $fp/1000")

    val h = DatasetLock.acquireShared(root, "backfill", Set.empty,
      digest = Some(digest))
    try {
      // disjoint explicit sibling coexists (pick a probe that tested
      // negative, so refuse-on-maybe cannot spuriously refuse the drill)
      val free = probes.find(p => !digest.mightContain(p)).get
      val sib = DatasetLock.acquireShared(root, "backfill", Set(free))
      sib.release()
      // overlapping explicit sibling refuses
      intercept[ConcurrentWriteException] {
        DatasetLock.acquireShared(root, "backfill", Set(Seq("g42")))
      }
      // a second digest lease refuses (conservative)
      intercept[ConcurrentWriteException] {
        DatasetLock.acquireShared(root, "backfill", Set.empty,
          digest = Some(DatasetLock.SliceDigest.build(
            Set(Seq("elsewhere"): Seq[String]))))
      }
      // exclusive refuses while the digest lease lives
      intercept[ConcurrentWriteException] {
        DatasetLock.acquire(root, "compact")
      }
    } finally h.release()
    DatasetLock.withLock(root, "compact") { () }
  }

  test("end to end: a 1200-slice backfill holds a DIGEST lease and " +
    "coexists with a live disjoint 1-slice backfill") {
    val out = java.nio.file.Files
      .createTempDirectory("graft_wide_e2e").toString + "/ds"
    val slices = 1200
    val base = spark.range(slices + 1).select(
      (when(col("id") === slices, "extra")
        .otherwise(concat(lit("g"), col("id").cast("string")))).as("grp"),
      col("id").cast("double").as("v"))
    CsvWriter.writePartitionedDataset(
      StarTable.fromDataFrame(base, "wide"), out, partitionBy = Seq("grp"))

    val staged = new CountDownLatch(1)
    val release = new CountDownLatch(1)
    val prev = CsvWriter.faultHook
    // park ONLY the wide writer: the disjoint sibling below runs the same
    // protocol and must sail through its own pre-sidecar point
    CsvWriter.faultHook = p =>
      if (p == "backfill:pre-sidecar" &&
          Thread.currentThread().getName == "wide-writer") {
        staged.countDown(); release.await()
      }
    val errs = new java.util.concurrent.atomic.AtomicReference[Throwable]()
    val wideWriter = new Thread(() => try {
      val upd = spark.range(slices).select(
        concat(lit("g"), col("id").cast("string")).as("grp"),
        (col("id").cast("double") + 1e6).as("v"))
      CsvWriter.writePartitionedDataset(
        StarTable.fromDataFrame(upd, "wide"), out,
        partitionBy = Seq("grp"), overwriteSlices = true)
    } catch { case t: Throwable => errs.compareAndSet(null, t) }, "wide-writer")
    wideWriter.start()
    try {
      assert(staged.await(300, TimeUnit.SECONDS))
      // the wide writer's lease is a digest, not an explicit set
      val locks = DatasetLock.listLocks(out)
      val shared = locks.filter(_._1 == "shared").map(_._2)
      assert(shared.exists(i => i.slices.isEmpty &&
        i.digest.exists(_.count == slices)),
        s"expected a digest lease among $locks")
      // a DISJOINT 1-slice backfill commits while the wide one is parked
      val patch = spark.range(3).select(lit("extra").as("grp"),
        (col("id").cast("double") + 5e6).as("v"))
      CsvWriter.writePartitionedDataset(
        StarTable.fromDataFrame(patch, "wide"), out,
        partitionBy = Seq("grp"), overwriteSlices = true)
      // an OVERLAPPING backfill refuses against the digest
      intercept[ConcurrentWriteException] {
        val clash = spark.range(2).select(lit("g7").as("grp"),
          col("id").cast("double").as("v"))
        CsvWriter.writePartitionedDataset(
          StarTable.fromDataFrame(clash, "wide"), out,
          partitionBy = Seq("grp"), overwriteSlices = true)
      }
    } finally {
      release.countDown()
      wideWriter.join(300000)
      CsvWriter.faultHook = prev
    }
    val t = errs.get(); if (t != null) throw t
    val back = spark.read.format("startable").load(out)
    assert(back.count() === slices + 3)
    assert(back.filter(col("grp") === "extra").count() === 3)
    assert(back.filter(col("v") >= 1e6 && col("v") < 5e6).count() === slices)
    assert(DatasetLock.listLocks(out).isEmpty)
  }
}
