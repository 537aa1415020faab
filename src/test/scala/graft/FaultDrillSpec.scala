package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Crash-consistency fault drills for the StarTable dataset lifecycle:
  * a process kill is simulated by a throwing fault hook between protocol
  * steps, and the connector must keep reading EXACTLY the pre-operation
  * rows (or, once the data step has committed, the post-operation rows
  * with only CONSERVATIVE metadata) — never a mixture, never a skip from
  * stale statistics.
  */
class FaultDrillSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def mkDataset(): (String, Set[(String, Double)]) = {
    val df = Seq(("a", 1.0), ("a", 2.0), ("b", 30.0), ("c", 500.0))
      .toDF("grp", "x")
    val t = graft.model.StarTable.fromDataFrame(df, "drill",
      units = Map("grp" -> "text"))
    val out = Files.createTempDirectory("graft_drill").toString
    graft.io.CsvWriter.writePartitionedDataset(t, out, Seq("grp"))
    (out, readRows(out))
  }

  private def readRows(out: String): Set[(String, Double)] =
    spark.read.format("startable").load(out)
      .select("grp", "x").collect()
      .map(r => (r.getString(0), r.getDouble(1))).toSet

  private final class Kill(msg: String) extends RuntimeException(msg)

  test("kill mid-compaction (after staging, before the swap): reads are " +
    "byte-identical to the pre-operation state; a rerun recovers") {
    val (out, before) = mkDataset()
    graft.operators.Maintenance.faultHook =
      p => if (p == "compact:staged") throw new Kill(p)
    try {
      intercept[Kill] {
        graft.operators.Maintenance.compactStarDataset(spark, out)
      }
    } finally graft.operators.Maintenance.faultHook = _ => ()
    // the crash leftover is a hidden staging sibling; data reads unchanged
    assert(readRows(out) == before,
      "reads diverged after a mid-compaction crash")
    // stats-based skipping still works off the untouched sidecar
    graft.sources.StarTableSource.resetPushdownCounters()
    assert(spark.read.format("startable").load(out)
      .filter(col("x") > 100.0).count() == 1)
    assert(graft.sources.StarTableSource.filesSkippedByStats.sum() > 0)
    // rerun completes: stale staging is deleted, reads still identical
    val rep = graft.operators.Maintenance.compactStarDataset(spark, out)
    assert(rep.bytesBefore == rep.bytesAfter, rep.toString)
    assert(readRows(out) == before)
  }

  test("kill mid-backfill BEFORE the data overwrite: old rows read back " +
    "exactly; the rewritten slice's stats are stripped (conservative), " +
    "never stale") {
    val (out, before) = mkDataset()
    val patch = graft.model.StarTable.fromDataFrame(
      Seq(("c", 9000.0)).toDF("grp", "x"), "drill",
      units = Map("grp" -> "text"))
    graft.io.CsvWriter.faultHook =
      p => if (p == "backfill:pre-data") throw new Kill(p)
    try {
      intercept[Kill] {
        graft.io.CsvWriter.writePartitionedDataset(patch, out, Seq("grp"),
          overwriteSlices = true)
      }
    } finally graft.io.CsvWriter.faultHook = _ => ()
    assert(readRows(out) == before,
      "reads diverged after a pre-data backfill crash")
    // slice c lost its stats entry (stripped first) → a filter that the
    // OLD range would have answered must now READ the slice, not skip it
    graft.sources.StarTableSource.resetPushdownCounters()
    assert(spark.read.format("startable").load(out)
      .filter(col("x") > 100.0).count() == 1)
    val meta = graft.sources.StarTableSource.readDatasetMeta(Seq(out)).get
    assert(!meta.sliceStats.exists(_.partition == Seq("c")),
      "rewritten slice kept a stats entry through the crash window")
    assert(meta.sliceStats.exists(_.partition == Seq("a")),
      "untouched slices must keep their stats")
  }

  test("kill mid-backfill AFTER the data commit, before the sidecar: new " +
    "rows are visible and stale stats cannot skip them; a rerun restores " +
    "full skipping") {
    val (out, _) = mkDataset()
    val patch = graft.model.StarTable.fromDataFrame(
      Seq(("c", 9000.0)).toDF("grp", "x"), "drill",
      units = Map("grp" -> "text"))
    graft.io.CsvWriter.faultHook =
      p => if (p == "backfill:pre-sidecar") throw new Kill(p)
    try {
      intercept[Kill] {
        graft.io.CsvWriter.writePartitionedDataset(patch, out, Seq("grp"),
          overwriteSlices = true)
      }
    } finally graft.io.CsvWriter.faultHook = _ => ()
    // data committed: slice c now holds 9000.0 — and the sidecar, stripped
    // before the write, must not let the OLD range [500,500] skip it
    assert(readRows(out) ==
      Set(("a", 1.0), ("a", 2.0), ("b", 30.0), ("c", 9000.0)))
    assert(spark.read.format("startable").load(out)
      .filter(col("x") > 1000.0).select("x").collect()
      .map(_.getDouble(0)).toSeq == Seq(9000.0),
      "stale stats skipped a slice holding new matching rows")
    // rerun the same backfill cleanly: stats for c return, skipping resumes
    graft.io.CsvWriter.writePartitionedDataset(patch, out, Seq("grp"),
      overwriteSlices = true)
    val meta = graft.sources.StarTableSource.readDatasetMeta(Seq(out)).get
    assert(meta.sliceStats.exists(_.partition == Seq("c")))
    graft.sources.StarTableSource.resetPushdownCounters()
    assert(spark.read.format("startable").load(out)
      .filter(col("x") > 100000.0).count() == 0)
    assert(graft.sources.StarTableSource.linesParsed.sum() == 0,
      "restored stats did not skip a contradicted scan")
  }

  test("backfill and streaming refuse a separator drift against the " +
    "existing dataset") {
    val (out, _) = mkDataset()
    val patch = graft.model.StarTable.fromDataFrame(
      Seq(("c", 1.0)).toDF("grp", "x"), "drill",
      units = Map("grp" -> "text"))
    val e = intercept[IllegalArgumentException] {
      graft.io.CsvWriter.writePartitionedDataset(patch, out, Seq("grp"),
        sep = "|", overwriteSlices = true)
    }
    assert(e.getMessage.contains("separator drift"))
  }
}
