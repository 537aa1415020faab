package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.io.{ConcurrentWriteException, CsvWriter, DatasetLock}
import graft.model.StarTable
import graft.operators.Maintenance

/** Round-14 stream-compatible leases (VERDICT r13 item 1): a COEXISTING
  * ingest stream (`coexist = true`) holds a shared slice-scoped lease
  * grown per batch instead of the exclusive root lease, so the
  * steady-state 100 TB shape — one forever-stream + daily disjoint
  * backfills + slice-scoped maintenance of old slices — runs with the
  * stream LIVE. Overlapping writers still refuse; restart keeps
  * exactly-once through the deterministic-name replay protocol; a
  * crashed stream's uncommitted batch files are fenced out of
  * compaction (the in-doubt guard). */
class StreamCoexistSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val schema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("day",
      org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("score",
      org.apache.spark.sql.types.DoubleType)))

  private def fixture(tag: String): (java.nio.file.Path, String, String, String) = {
    val base = Files.createTempDirectory(s"graft_coex_$tag")
    val srcDir = base.resolve("src"); Files.createDirectory(srcDir)
    (base, srcDir.toString, base.resolve("out").toString,
      base.resolve("ckpt").toString)
  }

  private def writeSourceBatch(srcDir: String, name: String,
                               rows: Seq[(String, Double)]): Unit = {
    import spark.implicits._
    rows.toDF("day", "score").coalesce(1)
      .write.mode("overwrite").parquet(s"$srcDir/$name")
  }

  private def startCoexist(srcDir: String, out: String, ckpt: String) =
    CsvWriter.streamPartitionedDataset(
      StarTable.fromDataFrame(
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
          .parquet(srcDir + "/*"),
        "sdocs", units = Map("day" -> "text")),
      out, Seq("day"), ckpt, coexist = true)

  private def seedDataset(out: String): Unit = {
    // pre-stream history: two slices with inline statistics
    val df = spark.range(60).select(
      when(col("id") % 2 === 0, "old1").otherwise("old2").as("day"),
      col("id").cast("double").as("score"))
    CsvWriter.writePartitionedDataset(
      StarTable.fromDataFrame(df, "sdocs", units = Map("day" -> "text")),
      out, partitionBy = Seq("day"), numFiles = 2)
  }

  private def readBack(out: String): Set[(String, Double)] =
    spark.read.format("startable").load(out).select("day", "score")
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSet

  test("a LIVE coexisting stream admits disjoint backfills and " +
    "slice-scoped compaction, refuses overlapping and full-root writers") {
    val (_, src, out, ckpt) = fixture("live")
    seedDataset(out)
    val seeded = readBack(out)
    writeSourceBatch(src, "b1", Seq(("s1", 1.0), ("s1", 2.0)))
    val q = startCoexist(src, out, ckpt)
    try {
      q.processAllAvailable()
      // the lease grew by the batch's touched slice
      val locks = DatasetLock.listLocks(out)
      val stream = locks.find(_._2.op == "stream-ingest")
        .getOrElse(fail(s"no stream lease among $locks"))
      assert(stream._1 == "shared", stream.toString)
      assert(stream._2.slices.contains(Seq("s1")), stream._2.slices.toString)
      assert(stream._2.slices.exists(
        _.head.startsWith(DatasetLock.StreamIntentPrefix)))

      // DISJOINT backfill commits while the stream is live
      val patch = spark.range(5).select(lit("old1").as("day"),
        (col("id").cast("double") + 1000.0).as("score"))
      CsvWriter.writePartitionedDataset(
        StarTable.fromDataFrame(patch, "sdocs", units = Map("day" -> "text")),
        out, partitionBy = Seq("day"), overwriteSlices = true)

      // slice-scoped compaction of a pre-stream slice commits too
      val rep = Maintenance.compactStarDataset(spark, out,
        onlySlices = Set(Seq("old2")))
      assert(rep.filesBefore >= 1 && rep.filesAfter == 1, rep.toString)

      // an OVERLAPPING backfill refuses, naming the stream
      val clash = spark.range(3).select(lit("s1").as("day"),
        col("id").cast("double").as("score"))
      val e1 = intercept[ConcurrentWriteException] {
        CsvWriter.writePartitionedDataset(
          StarTable.fromDataFrame(clash, "sdocs", units = Map("day" -> "text")),
          out, partitionBy = Seq("day"), overwriteSlices = true)
      }
      assert(e1.getMessage.contains("stream-ingest"), e1.getMessage)

      // overlapping slice-scoped compaction refuses
      val e2 = intercept[ConcurrentWriteException] {
        Maintenance.compactStarDataset(spark, out, onlySlices = Set(Seq("s1")))
      }
      assert(e2.getMessage.contains("stream-ingest"), e2.getMessage)

      // full-root maintenance refuses while the stream lives
      val e3 = intercept[ConcurrentWriteException] {
        Maintenance.compactStarDataset(spark, out)
      }
      assert(e3.getMessage.contains("stream-ingest"), e3.getMessage)

      // a second batch lands in a NEW slice while everything above ran
      writeSourceBatch(src, "b2", Seq(("s2", 3.0)))
      q.processAllAvailable()
    } finally q.stop()

    val expected = seeded.filterNot(_._1 == "old1") ++
      (0 until 5).map(i => ("old1", 1000.0 + i)) ++
      Set(("s1", 1.0), ("s1", 2.0), ("s2", 3.0))
    assert(readBack(out) == expected)
    // stream stopped: its lease is gone, full-root maintenance proceeds
    assert(DatasetLock.listLocks(out).isEmpty)
    Maintenance.compactStarDataset(spark, out)
    assert(readBack(out) == expected)
  }

  test("first touch strips a slice's statistics; untouched slices keep " +
    "theirs (pruning survives the stream)") {
    val (_, src, out, ckpt) = fixture("stats")
    seedDataset(out)
    val before = graft.sources.StarTableSource.readDatasetMeta(Seq(out)).get
    assert(before.sliceStats.map(_.partition).toSet ==
      Set(Seq("old1"), Seq("old2")))
    // the stream appends INTO old1 (overlap with history) and a new slice
    writeSourceBatch(src, "b1", Seq(("old1", -5.0), ("s1", 7.0)))
    val q = startCoexist(src, out, ckpt)
    try { q.processAllAvailable() } finally q.stop()
    graft.sources.StarTableSource.invalidateMetaCache(out)
    val after = graft.sources.StarTableSource.readDatasetMeta(Seq(out)).get
    // old1 was touched: its (now-stale) stats are stripped; old2 keeps its
    // entry — the whole-history nuke of the exclusive mode is gone
    assert(after.sliceStats.map(_.partition).toSet == Set(Seq("old2")),
      after.sliceStats.map(_.partition).toString)
    // and the appended row is visible (no stale range pruned it away)
    val got = spark.read.format("startable").load(out)
      .filter(col("score") < 0).collect()
    assert(got.length == 1 && got.head.getAs[String]("day") == "old1")
  }

  test("restart replay is exactly-once: a crash between data install and " +
    "commit record re-installs byte-identical content") {
    val (_, src, out, ckpt) = fixture("replay")
    writeSourceBatch(src, "b1", Seq(("d1", 1.0), ("d2", 2.0)))
    // crash the first attempt AFTER files move into the leaves but BEFORE
    // the high-water record lands
    CsvWriter.faultHook = {
      case "stream:pre-commit" => throw new RuntimeException("kill -9")
      case _ => ()
    }
    try {
      val q1 = startCoexist(src, out, ckpt)
      intercept[Exception] { q1.processAllAvailable() }
      q1.stop()
    } finally CsvWriter.faultHook = _ => ()
    // uncommitted batch files are on disk (visible-until-replay residual)
    assert(readBack(out) == Set(("d1", 1.0), ("d2", 2.0)))
    // the in-doubt guard: full compaction skips the leaves rather than
    // absorbing files a replay will delete-and-reinstall
    val rep = Maintenance.compactStarDataset(spark, out)
    assert(rep.filesAfter == 0, s"compaction absorbed in-doubt files: $rep")
    // restart with the same checkpoint: the batch replays idempotently
    val q2 = startCoexist(src, out, ckpt)
    try {
      q2.processAllAvailable()
      writeSourceBatch(src, "b2", Seq(("d1", 3.0)))
      q2.processAllAvailable()
    } finally q2.stop()
    assert(readBack(out) == Set(("d1", 1.0), ("d2", 2.0), ("d1", 3.0)))
    // committed now: compaction may proceed and nothing duplicates
    val rep2 = Maintenance.compactStarDataset(spark, out)
    assert(rep2.filesBefore >= 2, rep2.toString)
    assert(readBack(out) == Set(("d1", 1.0), ("d2", 2.0), ("d1", 3.0)))
  }

  test("two coexisting streams on one dataset write disjoint slices " +
    "concurrently; their commit files are independent") {
    val (_, srcA, out, ckptA) = fixture("two")
    val baseB = Files.createTempDirectory("graft_coex_twoB")
    val srcB = baseB.resolve("src"); Files.createDirectory(srcB)
    val ckptB = baseB.resolve("ckpt").toString
    writeSourceBatch(srcA, "b1", Seq(("a1", 1.0)))
    writeSourceBatch(srcB.toString, "b1", Seq(("b1", 2.0)))
    val qA = startCoexist(srcA, out, ckptA)
    try {
      qA.processAllAvailable()
      val qB = startCoexist(srcB.toString, out, ckptB)
      try {
        qB.processAllAvailable()
        writeSourceBatch(srcA, "b2", Seq(("a2", 3.0)))
        qA.processAllAvailable()
      } finally qB.stop()
    } finally qA.stop()
    assert(readBack(out) == Set(("a1", 1.0), ("b1", 2.0), ("a2", 3.0)))
  }
}
