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

  test("slice stats cover READER-PARSED values, not raw ones: a display " +
    "format that rounds cells cannot cause stat-based skips of matching " +
    "rows") {
    import org.apache.spark.sql.functions.col
    // raw max 8.6, but "%.0f" writes "9" → the reader parses 9.0; a stats
    // bound of 8.6 would wrongly skip the slice for x >= 8.8
    val df = Seq(("a", 8.6), ("b", 1.2)).toDF("grp", "x")
    val t = graft.model.StarTable.fromDataFrame(df, "fmt",
      units = Map("grp" -> "text"))
      .withFormat("x", graft.model.ColumnFormat(0))
    val out = Files.createTempDirectory("graft_drill_fmt").toString
    graft.io.CsvWriter.writePartitionedDataset(t, out, Seq("grp"))
    val back = spark.read.format("startable").load(out)
    assert(back.filter(col("x") >= 8.8).select("x")
      .collect().map(_.getDouble(0)).toSeq == Seq(9.0),
      "display-format rounding broke stat bounds (silent row loss)")
  }

  test("datetime slice stats honor the SESSION timezone rendering: a " +
    "non-UTC session cannot shift bounds against reader-parsed cells") {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types.TimestampType
    val prev = spark.conf.get("spark.sql.session.timeZone")
    try {
      // JVM zone is UTC; a -5h session zone makes typed driver-side
      // rendering diverge from the cells' date_format rendering
      spark.conf.set("spark.sql.session.timeZone", "America/New_York")
      val df = Seq(("a", "2020-08-04 10:00:00"), ("b", "2020-08-04 01:00:00"))
        .toDF("grp", "ts")
        .select(col("grp"), col("ts").cast(TimestampType).as("ts"))
      val t = graft.model.StarTable.fromDataFrame(df, "tz",
        units = Map("grp" -> "text", "ts" -> "datetime"))
      val out = Files.createTempDirectory("graft_drill_tz").toString
      graft.io.CsvWriter.writePartitionedDataset(t, out, Seq("grp"))
      val back = spark.read.format("startable").load(out)
      // every row the plain read returns must also survive each ts filter
      val all = back.select("ts").collect().map(_.getTimestamp(0)).sorted
      assert(all.length == 2)
      val hits = back.filter(col("ts") >= all(1)).count()
      assert(hits == 1,
        s"session-TZ stats shifted datetime bounds (got $hits rows)")
      assert(back.filter(col("ts") >= all(0)).count() == 2)
      // the <= direction is where a +4h-shifted stats MIN would skip the
      // slice holding the matching row
      val lo = back.filter(col("ts") <= all(0)).count()
      assert(lo == 1,
        s"session-TZ stats min skipped a matching slice (got $lo rows)")
    } finally spark.conf.set("spark.sql.session.timeZone", prev)
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
