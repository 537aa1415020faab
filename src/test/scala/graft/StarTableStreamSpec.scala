package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming READ of a partitioned StarTable dataset: incremental file
  * discovery, exactly-once across restarts, partition pruning of fresh
  * files, micro-batch admission control. */
class StarTableStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def writeSlice(out: String, rows: Seq[(String, Double)],
                         overwrite: Boolean): Unit =
    graft.io.CsvWriter.writePartitionedDataset(
      graft.model.StarTable.fromDataFrame(rows.toDF("grp", "x"), "sread",
        units = Map("grp" -> "text")),
      out, Seq("grp"), overwriteSlices = overwrite)

  private def got(name: String): Set[(String, Double)] =
    spark.table(name).select("grp", "x").collect()
      .map(r => (r.getString(0), r.getDouble(1))).toSet

  test("readStream over a partitioned dataset: incremental discovery, " +
    "exactly-once across a restart, no re-read of consumed files") {
    val base = Files.createTempDirectory("graft_sread")
    val out = base.resolve("ds").toString
    val ckpt = base.resolve("ckpt").toString
    val sink = base.resolve("sink").toString
    writeSlice(out, Seq(("a", 1.0), ("b", 2.0)), overwrite = false)

    // a RECOVERABLE sink (the memory sink refuses checkpoint recovery):
    // results land in parquet, exactly-once via the file sink commit log
    def start() =
      spark.readStream.format("startable").load(out)
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt).start()
    def sunk(): Set[(String, Double)] =
      spark.read.parquet(sink).select("grp", "x").collect()
        .map(r => (r.getString(0), r.getDouble(1))).toSet

    val q1 = start()
    try {
      q1.processAllAvailable()
      assert(sunk() == Set(("a", 1.0), ("b", 2.0)))
      // a NEW slice appears (backfill of a slice that did not exist —
      // adds files, removes none); the running query picks it up
      writeSlice(out, Seq(("c", 3.0)), overwrite = true)
      q1.processAllAvailable()
      assert(sunk() == Set(("a", 1.0), ("b", 2.0), ("c", 3.0)),
        "running query missed a newly appeared slice")
    } finally q1.stop()

    // restart from the same checkpoint: consumed files are never re-read;
    // only the post-restart slice is appended (no duplicates of a/b/c)
    writeSlice(out, Seq(("d", 4.0)), overwrite = true)
    val q2 = start()
    try {
      q2.processAllAvailable()
      assert(sunk() == Set(("a", 1.0), ("b", 2.0), ("c", 3.0), ("d", 4.0)),
        s"restart diverged: ${sunk()}")
      assert(spark.read.parquet(sink).count() == 4,
        "restart re-read consumed files (duplicate rows)")
    } finally q2.stop()
  }

  test("filters over a streamed dataset stay correct (Spark applies them " +
    "post-scan: DSv2 streaming has no operator pushdown)") {
    val base = Files.createTempDirectory("graft_sread_f")
    val out = base.resolve("ds").toString
    val ckpt = base.resolve("ckpt").toString
    writeSlice(out, Seq(("keep", 1.0), ("keep", 9.0), ("drop", 2.0)),
      overwrite = false)
    val q = spark.readStream.format("startable").load(out)
      .filter(col("grp") === "keep" && col("x") < 5.0)
      .writeStream.format("memory").queryName("sread_f")
      .option("checkpointLocation", ckpt).start()
    try {
      q.processAllAvailable()
      assert(got("sread_f") == Set(("keep", 1.0)))
    } finally q.stop()
  }

  test("sink-manifest discovery: streaming over streamPartitionedDataset " +
    "output reads ONLY manifest-committed files (an orphan from a failed " +
    "task is never emitted)") {
    import org.apache.spark.sql.types._
    val base = Files.createTempDirectory("graft_sread_manifest")
    val srcDir = base.resolve("src"); Files.createDirectory(srcDir)
    val out = base.resolve("ds").toString
    val sinkCkpt = base.resolve("sink_ckpt").toString
    Seq(("en", 1.0), ("de", 2.0)).toDF("lang", "score").coalesce(1)
      .write.mode("overwrite").parquet(srcDir.resolve("b1").toString)
    val q = graft.io.CsvWriter.streamPartitionedDataset(
      graft.model.StarTable.fromDataFrame(
        spark.readStream.schema(StructType(Seq(
          StructField("lang", StringType), StructField("score", DoubleType))))
          .parquet(srcDir.toString + "/*"),
        "mdocs", units = Map("lang" -> "text")),
      out, Seq("lang"), sinkCkpt)
    try q.processAllAvailable() finally q.stop()
    assert(Files.exists(java.nio.file.Paths.get(out, "_spark_metadata")))
    // an orphan part file a failed/zombie sink task left behind: present
    // in the listing, absent from the manifest
    val orphanDir = java.nio.file.Paths.get(out, "lang=zz")
    Files.createDirectories(orphanDir)
    Files.writeString(orphanDir.resolve("part-99999-orphan.txt"), "666.0\n")
    val ckpt = base.resolve("read_ckpt").toString
    val r = spark.readStream.format("startable").load(out)
      .writeStream.format("memory").queryName("sread_manifest")
      .option("checkpointLocation", ckpt).start()
    try {
      r.processAllAvailable()
      val rows = spark.table("sread_manifest").select("lang", "score")
        .collect().map(x => (x.getString(0), x.getDouble(1))).toSet
      assert(rows == Set(("en", 1.0), ("de", 2.0)),
        s"orphan/non-manifest file leaked into the stream: $rows")
    } finally r.stop()
  }

  test("log compaction: 100+ micro-batches leave O(interval) log files, " +
    "restart recovers from the newest compact + tail with no duplicates") {
    val base = Files.createTempDirectory("graft_sread_c")
    val out = base.resolve("ds").toString
    val ckpt = base.resolve("ckpt").toString
    val sink = base.resolve("sink").toString
    writeSlice(out, (0 until 120).map(i => (s"g$i", i.toDouble)),
      overwrite = false)

    def start() =
      spark.readStream.format("startable")
        .option("maxFilesPerTrigger", "1") // 1 file per micro-batch → 120 batches
        .option("logCompactInterval", "10")
        .load(out)
        .writeStream.format("parquet").option("path", sink)
        .option("checkpointLocation", ckpt).start()
    val q = start()
    try q.processAllAvailable() finally q.stop()

    // DSv2 hands each source <ckpt>/sources/<i> as its checkpoint root
    val logDir = java.nio.file.Paths.get(ckpt, "sources", "0", "graft-files")
    import scala.jdk.CollectionConverters._
    val fileNames = Files.list(logDir).iterator().asScala
      .map(_.getFileName.toString)
      .filterNot(n => n.startsWith(".") || n.endsWith(".crc")).toSeq
    val compacts = fileNames.filter(_.endsWith(".compact"))
    val deltas = fileNames.filterNot(_.endsWith(".compact"))
    assert(compacts.size == 1,
      s"expected exactly the newest compact to survive, got $compacts")
    assert(deltas.size < 10,
      s"deltas beyond the compact interval survived compaction: $deltas")
    assert(fileNames.size < 12,
      s"log did not stay O(interval) after 120 batches: ${fileNames.size} files")

    // restart: recovery reads compact + tail; a fresh slice appends exactly once
    writeSlice(out, Seq(("extra", 777.0)), overwrite = true)
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    val rows = spark.read.parquet(sink).select("grp", "x").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    assert(rows.length == 121, s"expected 121 rows exactly once, got ${rows.length}")
    assert(rows.toSet.contains(("extra", 777.0)))
    assert(rows.distinct.length == rows.length, "restart duplicated rows")
  }

  test("a dataset rooted under an '='-named directory does not leak a bogus " +
    "partition value (manifest-discovery path-parse stops at the root)") {
    val vals = graft.sources.StarTableStreamUtil.partitionValuesFromPath(
      "/runs/run=5/grp=a/part-0.csv", Seq("grp"), root = "/runs/run=5")
    assert(vals == Seq("a"))
    // the bogus ancestor pair must not shadow a REAL partition column
    val e = intercept[IllegalArgumentException] {
      graft.sources.StarTableStreamUtil.partitionValuesFromPath(
        "/runs/run=5/grp=a/part-0.csv", Seq("run"), root = "/runs/run=5")
    }
    assert(e.getMessage.contains("run"))
    // scheme-insensitive: qualified manifest URI vs bare root path
    assert(graft.sources.StarTableStreamUtil.partitionValuesFromPath(
      "file:/runs/run=5/grp=b/part-0.csv", Seq("grp"), root = "/runs/run=5")
      == Seq("b"))
    // RELATIVE root spelling still stops the climb (component-suffix match)
    assert(graft.sources.StarTableStreamUtil.partitionValuesFromPath(
      "file:/work/runs/run=5/grp=c/part-0.csv", Seq("grp"),
      root = "runs/run=5") == Seq("c"))
  }

  test("maxFilesPerTrigger bounds a micro-batch; a plain (non-dataset) " +
    "path refuses streaming loudly") {
    val base = Files.createTempDirectory("graft_sread_m")
    val out = base.resolve("ds").toString
    val ckpt = base.resolve("ckpt").toString
    graft.io.CsvWriter.writePartitionedDataset(
      graft.model.StarTable.fromDataFrame(
        (0 until 40).map(i => (s"g${i % 4}", i.toDouble)).toDF("grp", "x"),
        "sread", units = Map("grp" -> "text")),
      out, Seq("grp"))
    val q = spark.readStream.format("startable")
      .option("maxFilesPerTrigger", "1").load(out)
      .writeStream.format("memory").queryName("sread_m")
      .option("checkpointLocation", ckpt).start()
    try {
      q.processAllAvailable()
      assert(spark.table("sread_m").count() == 40)
      val dataBatches = q.recentProgress.count(_.numInputRows > 0)
      assert(dataBatches >= 4,
        s"maxFilesPerTrigger=1 over >=4 files should take >=4 batches, " +
          s"got $dataBatches")
    } finally q.stop()

    // plain StarTable file: no incremental-discovery contract → loud refusal
    val dir = Files.createTempDirectory("graft_sread_plain")
    Files.writeString(dir.resolve("t.csv"),
      "**t;\nall\na;b\ntext;-\nx;1\n")
    val e = intercept[Exception] {
      val bad = spark.readStream.format("startable").load(dir.toString)
        .writeStream.format("memory").queryName("sread_bad")
        .option("checkpointLocation",
          Files.createTempDirectory("graft_sread_bad_ck").toString)
        .start()
      try bad.processAllAvailable() finally bad.stop()
    }
    def chain(t: Throwable): Seq[String] =
      if (t == null) Nil else t.getMessage +: chain(t.getCause)
    assert(chain(e).exists(m => m != null && m.contains("partitioned dataset")),
      s"expected a loud refusal, got: $e")
  }
}
