package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Within-slice clustering + per-FILE statistics — the third (finest)
  * skipping tier after partition directories and slice statistics. */
class ClusterStarDatasetSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** 2 slices × 3000 shuffled rows each, written as several files. */
  private def mkDataset(): String = {
    val rows = scala.util.Random.shuffle(
      (0 until 6000).map(i => (s"g${i % 2}", i.toDouble, s"tag$i")).toList)
    val t = graft.model.StarTable.fromDataFrame(
      rows.toDF("grp", "x", "tag"), "clustered",
      units = Map("grp" -> "text", "tag" -> "text"))
    val out = Files.createTempDirectory("graft_cluster").toString
    graft.io.CsvWriter.writePartitionedDataset(t, out, Seq("grp"),
      numFiles = 4)
    out
  }

  private def allLines(out: String): Seq[String] = {
    val paths = graft.sources.StarTableSource.listPartitionedFiles(
      Seq(out), Seq("grp")).map(_._1)
    spark.read.text(paths: _*).collect().map(_.getString(0)).sorted.toSeq
  }

  test("clusterStarDataset: lines survive byte-identically, files are " +
    "range-clustered, per-file stats skip within the matching slice") {
    val out = mkDataset()
    val before = allLines(out)
    val rep = graft.operators.Maintenance.clusterStarDataset(
      spark, out, Seq("x"), targetBytes = 20000)
    assert(rep.slices == 2 && rep.filesAfter > rep.slices,
      s"expected multiple clustered files per slice: $rep")
    assert(rep.fileStatsWritten == rep.filesAfter, rep.toString)
    assert(rep.bytesBefore == rep.bytesAfter, rep.toString)
    // every line byte-identical (sorting moved lines between files only)
    assert(allLines(out) == before, "clustering altered line bytes")
    val meta = graft.sources.StarTableSource.readDatasetMeta(Seq(out)).get
    assert(meta.fileStats.nonEmpty && meta.sliceStats.nonEmpty)
    // a narrow range on the clustered column: the partition filter keeps
    // both slices (x spans both), but per-FILE stats open only the files
    // whose sorted range intersects — most files skip unopened
    val back = spark.read.format("startable").load(out)
    graft.sources.StarTableSource.resetPushdownCounters()
    val got = back.filter(col("x") >= 100.0 && col("x") < 120.0)
      .select("tag").collect().map(_.getString(0)).toSet
    assert(got == (100 until 120).map(i => s"tag$i").toSet)
    assert(graft.sources.StarTableSource.filesSkippedByStats.sum() > 0,
      "per-file stats skipped nothing inside the matching slices")
    assert(graft.sources.StarTableSource.linesParsed.sum() < 6000 / 2,
      s"clustered range scan parsed " +
        s"${graft.sources.StarTableSource.linesParsed.sum()} of 6000 lines")
    // equality inside a kept file's range still returns its row
    assert(back.filter(col("x") === 117.0).count() == 1)
  }

  test("write-time per-file stats: an UN-clustered multi-file slice skips " +
    "files on a range predicate when the ingest order correlates with x") {
    // time-ordered ingest shape: upstream range-partitioned by x, written
    // UNSHUFFLED (numFiles = 0) — each task writes its own file per slice,
    // so a slice's files carry disjoint x ranges straight from the writer
    val rows = (0 until 6000).map(i => (s"g${i % 2}", i.toDouble, s"tag$i"))
    val df = rows.toDF("grp", "x", "tag").repartitionByRange(6, col("x"))
    val t = graft.model.StarTable.fromDataFrame(df, "clustered",
      units = Map("grp" -> "text", "tag" -> "text"))
    val out = Files.createTempDirectory("graft_wstats").toString
    // the unshuffled write's read-back is near-total, so file stats there
    // are OPT-IN (collectFileStats = Some(true)); the default skips them
    graft.io.CsvWriter.writePartitionedDataset(t, out, Seq("grp"),
      collectFileStats = Some(true))
    val meta = graft.sources.StarTableSource.readDatasetMeta(Seq(out)).get
    assert(meta.fileStats.size > 2,
      s"write-time file stats missing for multi-file slices: ${meta.fileStats.size}")
    // the DEFAULT unshuffled write pays no read-back: no file stats
    val deflt = Files.createTempDirectory("graft_wstats0").toString
    graft.io.CsvWriter.writePartitionedDataset(t, deflt, Seq("grp"))
    assert(graft.sources.StarTableSource.readDatasetMeta(Seq(deflt))
      .get.fileStats.isEmpty,
      "default unshuffled write must not pay the near-total file-stats " +
        "read-back (collectFileStats defaults off when numFiles <= 0)")
    // NO clusterStarDataset ran — skipping must come from the write itself
    val back = spark.read.format("startable").load(out)
    graft.sources.StarTableSource.resetPushdownCounters()
    val got = back.filter(col("x") >= 100.0 && col("x") < 120.0)
      .select("tag").collect().map(_.getString(0)).toSet
    assert(got == (100 until 120).map(i => s"tag$i").toSet)
    assert(graft.sources.StarTableSource.filesSkippedByStats.sum() > 0,
      "write-time per-file stats skipped nothing")
    assert(graft.sources.StarTableSource.linesParsed.sum() < 6000 / 2,
      s"range scan parsed ${graft.sources.StarTableSource.linesParsed.sum()} " +
        "of 6000 lines despite write-time file stats")
    // single-file slices (the default shuffled write) stay stat-free at
    // file tier: nothing beyond their slice entry to record
    val single = Files.createTempDirectory("graft_wstats1").toString
    graft.io.CsvWriter.writePartitionedDataset(
      graft.model.StarTable.fromDataFrame(rows.toDF("grp", "x", "tag"),
        "clustered", units = Map("grp" -> "text", "tag" -> "text")),
      single, Seq("grp"), numFiles = 4)
    val metaS = graft.sources.StarTableSource.readDatasetMeta(Seq(single)).get
    assert(metaS.fileStats.isEmpty,
      "single-file slices must not pay a read-back for file stats")
  }

  test("a crash after staging, before the slice swap, leaves reads and " +
    "stats exactly as before; a rerun completes") {
    val out = mkDataset()
    val before = allLines(out)
    final class Kill extends RuntimeException("cluster kill")
    graft.operators.Maintenance.faultHook =
      p => if (p == "cluster:staged") throw new Kill
    try {
      intercept[Kill] {
        graft.operators.Maintenance.clusterStarDataset(spark, out, Seq("x"))
      }
    } finally graft.operators.Maintenance.faultHook = _ => ()
    assert(allLines(out) == before, "mid-cluster crash altered reads")
    val meta = graft.sources.StarTableSource.readDatasetMeta(Seq(out)).get
    assert(meta.fileStats.isEmpty, "crash window leaked file stats")
    // slice stats remain valid and skipping still works
    graft.sources.StarTableSource.resetPushdownCounters()
    assert(spark.read.format("startable").load(out)
      .filter(col("x") > 1e7).count() == 0)
    assert(graft.sources.StarTableSource.linesParsed.sum() == 0)
    // rerun completes and installs file stats
    val rep = graft.operators.Maintenance.clusterStarDataset(spark, out, Seq("x"))
    assert(rep.fileStatsWritten > 0)
    assert(allLines(out) == before)
  }

  test("one leaf failing under PARALLEL maintenance never corrupts its " +
    "siblings: all leaves drain (no interrupts mid-swap), data intact, rerun " +
    "completes") {
    val out = mkDataset()
    val before = allLines(out)
    final class Kill extends RuntimeException("one-leaf kill")
    val fired = new java.util.concurrent.atomic.AtomicBoolean(false)
    // exactly ONE leaf dies after staging, before its swap; siblings must
    // complete their swaps uninterrupted (a shutdownNow() here could abort
    // a sibling between its two renames — silent slice loss)
    graft.operators.Maintenance.faultHook =
      p => if (p == "cluster:staged" && fired.compareAndSet(false, true))
        throw new Kill
    spark.conf.set("spark.graft.maintenance.parallelism", "4")
    try {
      intercept[Kill] {
        graft.operators.Maintenance.clusterStarDataset(spark, out, Seq("x"))
      }
    } finally {
      graft.operators.Maintenance.faultHook = _ => ()
      spark.conf.unset("spark.graft.maintenance.parallelism")
    }
    assert(allLines(out) == before,
      "a sibling leaf lost rows when one parallel leaf failed")
    // rerun completes and installs file stats everywhere
    val rep = graft.operators.Maintenance.clusterStarDataset(spark, out, Seq("x"))
    assert(rep.fileStatsWritten > 0)
    assert(allLines(out) == before)
  }

  test("backfill after clustering strips only the rewritten slice's file " +
    "stats; the untouched slice keeps skipping at file granularity") {
    val out = mkDataset()
    graft.operators.Maintenance.clusterStarDataset(spark, out, Seq("x"),
      targetBytes = 20000)
    val patch = graft.model.StarTable.fromDataFrame(
      Seq(("g1", 9.9, "fresh")).toDF("grp", "x", "tag"), "clustered",
      units = Map("grp" -> "text", "tag" -> "text"))
    graft.io.CsvWriter.writePartitionedDataset(patch, out, Seq("grp"),
      overwriteSlices = true)
    val meta = graft.sources.StarTableSource.readDatasetMeta(Seq(out)).get
    assert(!meta.fileStats.exists(_.partition == Seq("g1")),
      "rewritten slice kept stale file stats")
    assert(meta.fileStats.exists(_.partition == Seq("g0")),
      "untouched slice lost its file stats")
    val back = spark.read.format("startable").load(out)
    assert(back.filter(col("tag") === "fresh").count() == 1)
    // g0 rows all survive; file skipping still fires for a g0-range query
    graft.sources.StarTableSource.resetPushdownCounters()
    assert(back.filter(col("grp") === "g0" && col("x") < 50.0).count() == 25)
    assert(graft.sources.StarTableSource.filesSkippedByStats.sum() > 0)
  }

  test("stats mirror READER null semantics at both tiers: onoff naRep " +
    "parses FALSE (never null) and Infinity parses null — neither may " +
    "skip matching rows") {
    // slice s1: onoff all null (cells '-') → reader yields FALSE;
    // x holds an Infinity → reader yields null
    val df = Seq(
      ("s1", null.asInstanceOf[java.lang.Boolean], Double.PositiveInfinity),
      ("s1", null.asInstanceOf[java.lang.Boolean], 5.0),
      ("s2", java.lang.Boolean.TRUE, 7.0))
      .toDF("grp", "flag", "x")
    val t = graft.model.StarTable.fromDataFrame(df, "sem",
      units = Map("grp" -> "text"))
    val out = Files.createTempDirectory("graft_cl_sem").toString
    graft.io.CsvWriter.writePartitionedDataset(t, out, Seq("grp"))
    graft.operators.Maintenance.clusterStarDataset(spark, out, Seq("x"))
    val back = spark.read.format("startable").load(out)
    // both tiers now carry stats; the reader's values are the truth:
    // flag: s1 rows are FALSE (fixer), not null
    assert(back.filter(col("flag") === false).count() == 2,
      "onoff naRep rows (reader FALSE) were skipped by stats")
    assert(back.filter(col("flag").isNotNull).count() == 3,
      "IsNotNull skipped a slice whose onoff rows all parse FALSE")
    // x: the Infinity cell parses null for the reader
    assert(back.filter(col("x").isNull).count() == 1,
      "IsNull skipped the file holding a reader-null Infinity cell")
    assert(back.filter(col("x") > 6.0).select("grp")
      .collect().map(_.getString(0)).toSeq == Seq("s2"))
  }

  test("refusals: non-dataset path, unknown sort column, partition column") {
    val e1 = intercept[IllegalArgumentException] {
      graft.operators.Maintenance.clusterStarDataset(spark,
        Files.createTempDirectory("graft_cl_no").toString, Seq("x"))
    }
    assert(e1.getMessage.contains("sidecar"))
    val out = mkDataset()
    val e2 = intercept[IllegalArgumentException] {
      graft.operators.Maintenance.clusterStarDataset(spark, out, Seq("nope"))
    }
    assert(e2.getMessage.contains("nope"))
    val e3 = intercept[IllegalArgumentException] {
      graft.operators.Maintenance.clusterStarDataset(spark, out, Seq("grp"))
    }
    assert(e3.getMessage.contains("grp"))
  }

  test("slice-scoped clustering (round 14): a SHARED lease clusters one " +
    "slice's file tier while slice stats and sibling slices stay intact") {
    val out = mkDataset()
    val before = allLines(out)
    val metaBefore = graft.sources.StarTableSource.readDatasetMeta(Seq(out)).get
    val g0Before = graft.sources.StarTableSource.listPartitionedFiles(
      Seq(out), Seq("grp")).filter(_._3 == Seq("g0")).map(_._1).sorted
    val rep = graft.operators.Maintenance.clusterStarDataset(
      spark, out, Seq("x"), targetBytes = 20000,
      onlySlices = Set(Seq("g1")))
    assert(rep.slices == 1 && rep.filesAfter > 1, rep.toString)
    assert(allLines(out) == before, "scoped clustering altered line bytes")
    graft.sources.StarTableSource.invalidateMetaCache(out)
    val meta = graft.sources.StarTableSource.readDatasetMeta(Seq(out)).get
    // slice entries reorder-invariant: carried verbatim, commit advanced
    assert(meta.sliceStats.map(s => s.partition -> s.rows).toMap ==
      metaBefore.sliceStats.map(s => s.partition -> s.rows).toMap)
    assert(meta.commit > metaBefore.commit)
    // file entries exist ONLY for the clustered slice (g0 was written
    // unshuffled by numFiles and carried no entries; g1 gains fresh ones)
    assert(meta.fileStats.nonEmpty &&
      meta.fileStats.forall(_.partition == Seq("g1")),
      meta.fileStats.map(f => (f.partition, f.file)).toString)
    // g0's data files untouched (same paths as before the pass)
    val g0After = graft.sources.StarTableSource.listPartitionedFiles(
      Seq(out), Seq("grp")).filter(_._3 == Seq("g0")).map(_._1).sorted
    assert(g0After == g0Before, s"g0 files changed: $g0After vs $g0Before")
    // no lease or staged intent left behind
    assert(graft.io.DatasetLock.listLocks(out).isEmpty)
    // a scoped range query over g1 skips files via the fresh entries
    val back = spark.read.format("startable").load(out)
    graft.sources.StarTableSource.resetPushdownCounters()
    back.filter(col("grp") === "g1" && col("x") >= 101.0 && col("x") < 121.0)
      .select("tag").collect()
    assert(graft.sources.StarTableSource.filesSkippedByStats.sum() > 0,
      "scoped clustering produced no usable file statistics")
  }
}
