package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.Maintenance

/** Small-file compaction (operators.Maintenance). */
class MaintenanceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("compact").toString + "/t"

  test("compact bin-packs many small files to the planned count, content " +
    "unchanged") {
    val path = freshDir()
    val rows = (0L until 5000L).map(i => (i, s"v$i", i % 17))
    rows.toDF("id", "v", "k").repartition(64).write.parquet(path)
    val bytes = new java.io.File(path).listFiles
      .filter(f => f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith("."))
    assert(bytes.length == 64)
    val total = bytes.map(_.length).sum
    // target ~ quarter of the data → 4 planned files
    val rep = Maintenance.compact(spark, path, targetBytes = (total + 3) / 4)
    assert(rep.filesBefore == 64L)
    assert(rep.filesAfter == 4L)
    val back = spark.read.parquet(path).as[(Long, String, Long)]
      .collect().sorted.toSeq
    assert(back == rows.sorted)
  }

  test("compact with sortCols re-establishes an intra-file sort") {
    val path = freshDir()
    (0L until 2000L).map(i => (i * 7919 % 2000, i)).toDF("key", "payload")
      .repartition(16).write.parquet(path)
    Maintenance.compact(spark, path, targetBytes = Long.MaxValue,
      sortCols = Seq("key"))
    // one output file, globally sorted by key
    val back = spark.read.parquet(path).select("key")
      .collect().map(_.getLong(0)).toSeq
    assert(back == back.sorted)
    assert(back.toSet == (0L until 2000L).toSet)
  }

  test("KeyedStore lookup prunes to the probed buckets (PartitionFilters)") {
    import graft.operators.KeyedStore
    val path = freshDir()
    val rows = (0L until 4000L).map(i => (i, s"v$i"))
    KeyedStore.write(rows.toDF("k", "v"), path, "k", buckets = 32)
    val keys = Seq(7L, 1234L, 3999L)
    val got = KeyedStore.lookup(spark, path, "k", keys, buckets = 32)
    val plan = got.queryExecution.executedPlan.toString
    val pf = plan.linesIterator.filter(_.contains("PartitionFilters")).mkString
    assert(pf.contains("__bucket"), s"no bucket partition pruning:\n$pf")
    assert(got.collect().map(r => (r.getLong(0), r.getString(1))).toSet ==
      keys.map(k => (k, s"v$k")).toSet)
    // a miss returns empty, not an error
    assert(KeyedStore.lookup(spark, path, "k", Seq(999999L), 32).count() == 0)
  }

  test("writePartitioned overwrites only the partitions present in the " +
    "batch") {
    import graft.operators.Maintenance
    val path = freshDir()
    val day1 = Seq((1L, "a", "d1"), (2L, "b", "d1"), (3L, "c", "d2"))
      .toDF("id", "v", "day")
    Maintenance.writePartitioned(day1, path, Seq("day"))
    // backfill re-writes ONLY d1; d2 must survive untouched
    val redo = Seq((10L, "a2", "d1")).toDF("id", "v", "day")
    Maintenance.writePartitioned(redo, path, Seq("day"))
    val back = spark.read.parquet(path)
      .select("id", "v", "day").as[(Long, String, String)].collect().toSet
    assert(back == Set((10L, "a2", "d1"), (3L, "c", "d2")))
  }

  test("dropPartitions removes directories at metadata cost, incl. escaped " +
    "values") {
    import graft.operators.Maintenance
    val path = freshDir()
    val df = Seq((1L, "keep"), (2L, "dead"), (3L, "odd:val"))
      .toDF("id", "src")
    Maintenance.writePartitioned(df, path, Seq("src"))
    val n = Maintenance.dropPartitions(spark, path, "src",
      Seq("dead", "odd:val", "never-existed"))
    assert(n == 2L)
    val back = spark.read.parquet(path).select("src")
      .collect().map(_.getString(0)).toSet
    assert(back == Set("keep"))
  }

  test("compact preserves a hive-partitioned layout, compacting each " +
    "leaf in place") {
    val path = freshDir()
    val rows = (0L until 3000L).map(i => (i, s"v$i", if (i % 2 == 0) "a" else "b"))
    rows.toDF("id", "v", "day").repartition(16)
      .write.partitionBy("day").parquet(path)
    val before = spark.read.parquet(path)
    assert(before.count() == 3000)
    val rep = Maintenance.compact(spark, path, targetBytes = Long.MaxValue)
    // partition dirs survive; each leaf compacted to one file
    val dirs = new java.io.File(path).listFiles.filter(_.isDirectory)
      .map(_.getName).toSet
    assert(dirs == Set("day=a", "day=b"), s"partition layout lost: $dirs")
    assert(rep.filesBefore == 32L && rep.filesAfter == 2L)
    assert(rep.bytesBefore > 0L, "partitioned listing saw 0 bytes")
    val back = spark.read.parquet(path).select("id", "v", "day")
      .as[(Long, String, String)].collect().sorted.toSeq
    assert(back == rows.sorted)
  }

  test("compact REFUSES a mixed layout (root data files alongside " +
    "partition dirs) instead of silently skipping the root files") {
    val path = freshDir()
    (0L until 500L).map(i => (i, s"v$i")).toDF("id", "v").repartition(8)
      .write.parquet(path)
    (500L until 1000L).map(i => (i, s"v$i")).toDF("id", "v").repartition(8)
      .write.parquet(s"$path/day=a")
    val e = intercept[IllegalArgumentException] {
      Maintenance.compact(spark, path, targetBytes = Long.MaxValue)
    }
    assert(e.getMessage.contains("mixed"), e.getMessage)
    // nothing was touched: both layers keep all their files and rows
    def files(d: java.io.File) = d.listFiles.filter(f =>
      f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith("."))
    assert(files(new java.io.File(path)).length == 8)
    assert(files(new java.io.File(s"$path/day=a")).length == 8)
  }

  test("KeyedStore canonicalizes the key hash: int32 key columns land in " +
    "the buckets Seq[Long] lookups probe") {
    import graft.operators.KeyedStore
    val path = freshDir()
    // IntegerType key column — pre-fix, xxhash64(int) != xxhash64(long)
    // made every lookup silently empty
    val rows = (0 until 2000).map(i => (i, s"v$i"))
    KeyedStore.write(rows.toDF("k", "v"), path, "k", buckets = 16)
    val got = KeyedStore.lookup(spark, path, "k", Seq(7L, 1999L), buckets = 16)
    assert(got.collect().map(r => (r.getInt(0), r.getString(1))).toSet ==
      Set((7, "v7"), (1999, "v1999")))
    // non-integral key types refuse loudly instead of returning empties
    intercept[IllegalArgumentException] {
      KeyedStore.write(Seq(("a", 1L)).toDF("k", "v"), freshDir(), "k")
    }
  }

  test("a crash-leftover staging dir inside a partitioned table is " +
    "invisible to readers and inert for the next compact") {
    val path = freshDir()
    Seq((1L, "a"), (2L, "b")).toDF("id", "day")
      .write.partitionBy("day").parquet(path)
    // simulate a crash mid-swap: a stale hidden staging dir with data
    val leftover = new java.io.File(path, ".day=a__compacting")
    Seq((99L, "junk")).toDF("id", "txt")
      .write.parquet(leftover.toString)
    // partition discovery must NOT parse it as a partition value
    val seen = spark.read.parquet(path).select("id", "day")
      .as[(Long, String)].collect().toSet
    assert(seen == Set((1L, "a"), (2L, "b")), seen.toString)
    // and compact treats it as hidden: no flattening, content unchanged
    Maintenance.compact(spark, path, targetBytes = Long.MaxValue)
    val after = spark.read.parquet(path).select("id", "day")
      .as[(Long, String)].collect().toSet
    assert(after == Set((1L, "a"), (2L, "b")), after.toString)
  }

  test("compact leaves no staging or trash directories behind") {
    val path = freshDir()
    (0L until 100L).toDF("id").repartition(8).write.parquet(path)
    Maintenance.compact(spark, path, targetBytes = Long.MaxValue)
    val parent = new java.io.File(path).getParentFile
    val leftovers = parent.listFiles.map(_.getName)
      .filter(n => n.contains("__compacting") || n.contains("__old"))
    assert(leftovers.isEmpty, leftovers.mkString(","))
  }

  test("compactStarDataset merges each slice's small text files " +
    "bit-identically; connector reads the same table before and after") {
    val path = freshDir()
    val df = (0 until 100).map(i => (s"g${i % 2}", i.toDouble))
      .toDF("g", "x").repartition(16)
    val t = graft.model.StarTable.fromDataFrame(df, "cds",
      units = Map("g" -> "text"))
    graft.io.CsvWriter.writePartitionedDataset(t, path, Seq("g"))
    def readBack() = spark.read.format("startable").load(path)
      .select("g", "x").collect()
      .map(r => (r.getString(0), r.getDouble(1))).toSet
    val before = readBack()
    val rep = Maintenance.compactStarDataset(spark, path,
      targetBytes = Long.MaxValue)
    assert(rep.filesBefore > 2 && rep.filesAfter == 2,
      s"expected one file per slice, got $rep")
    // text rows are opaque lines — the rewrite is bit-identical in total
    assert(rep.bytesBefore == rep.bytesAfter, rep.toString)
    assert(readBack() == before)
    // partition pruning still works on the compacted layout
    assert(spark.read.format("startable").load(path)
      .filter(col("g") === "g1").count() == 50)
    // refuses a directory that is not a StarTable dataset
    val plain = freshDir()
    (0L until 10L).toDF("id").write.parquet(plain)
    val e = intercept[IllegalArgumentException] {
      Maintenance.compactStarDataset(spark, plain)
    }
    assert(e.getMessage.contains("_startable_dataset.json"))
  }

  test("vacuumStarDataset deletes inert crash leftovers but RESTORES a " +
    "leaf whose only copy sits in the trash sibling") {
    val path = freshDir()
    val df = (0 until 100).map(i => (s"g${i % 3}", i.toDouble))
      .toDF("g", "x").repartition(8)
    graft.io.CsvWriter.writePartitionedDataset(
      graft.model.StarTable.fromDataFrame(df, "vds", units = Map("g" -> "text")),
      path, Seq("g"))
    def readBack() = spark.read.format("startable").load(path)
      .select("g", "x").collect()
      .map(r => (r.getString(0), r.getDouble(1))).toSet
    val before = readBack()
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    import org.apache.hadoop.fs.Path

    // crash state 1 (inert): staging + trash beside a LIVE leaf, stale tmp
    fs.mkdirs(new Path(path, ".g=g0__compacting"))
    val os = fs.create(new Path(path, ".g=g0__compacting/part-junk.txt"), true)
    os.write("junk\n".getBytes("UTF-8")); os.close()
    fs.mkdirs(new Path(path, ".g=g0__old"))
    val os2 = fs.create(new Path(path, "._startable_dataset.json.tmp"), true)
    os2.write("{".getBytes("UTF-8")); os2.close()
    // crash state 2 (between swapLeaf's renames): live leaf GONE, trash
    // holds the only copy, plus an incomplete staging sibling
    assert(fs.rename(new Path(path, "g=g1"), new Path(path, ".g=g1__old")))
    fs.mkdirs(new Path(path, ".g=g1__clustering"))

    // the damaged state hides g1 from readers — vacuum must bring it back
    assert(readBack() == before.filterNot(_._1 == "g1"))
    // a YOUNG .tmp (a possible in-flight concurrent writer) must survive
    val repAged = Maintenance.vacuumStarDataset(spark, path)
    assert(repAged.removedTmpFiles == 0,
      "vacuum deleted a young .tmp a concurrent writer could be committing")
    assert(repAged.restoredLeaves == 1, repAged.toString)
    assert(repAged.removedDirs == 3, repAged.toString) // g0 staging+trash, g1 staging
    assert(readBack() == before, "vacuum lost or failed to restore rows")
    // with the age gate off, the stale tmp goes too; then idempotent
    val rep = Maintenance.vacuumStarDataset(spark, path, tmpMinAgeMs = 0L)
    assert(rep.removedTmpFiles == 1, rep.toString)
    val rep2 = Maintenance.vacuumStarDataset(spark, path, tmpMinAgeMs = 0L)
    assert(rep2 == Maintenance.VacuumReport(0, 0, 0, 0), rep2.toString)
  }

  test("vacuum repairs the FLAT layout's root-level swap crash: an orphaned " +
    "root restores from its trash sibling; root-side staging is cleaned") {
    val parent = java.nio.file.Files.createTempDirectory("graft_vflat")
    val path = parent.resolve("table").toString
    val df = (0 until 50).map(i => (s"g${i % 2}", i.toDouble)).toDF("g", "x")
    graft.io.CsvWriter.writeDataset(
      graft.model.StarTable.fromDataFrame(df, "flat", units = Map("g" -> "text")),
      path, numFiles = 4)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    import org.apache.hadoop.fs.Path
    // simulate compact's between-two-renames crash on the ROOT itself
    assert(fs.rename(new Path(path), new Path(parent.toString, ".table__old")))
    fs.mkdirs(new Path(parent.toString, ".table__compacting"))
    assert(!fs.exists(new Path(path)))
    val rep = Maintenance.vacuumStarDataset(spark, path)
    assert(rep.restoredLeaves == 1 && rep.removedDirs == 1, rep.toString)
    assert(spark.read.format("startable").load(path).count() == 50)
    // a truly-missing path (no trash either) still refuses loudly
    val e = intercept[IllegalArgumentException] {
      Maintenance.vacuumStarDataset(spark, parent.resolve("nope").toString)
    }
    assert(e.getMessage.contains("does not exist"))
  }
}
