package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StringType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

/** Round-12 live-interleaving drill (VERDICT r11 item 5): a streaming
  * READER is mid-life over a sink-written dataset while compaction swaps
  * its leaves, and a writer stream appends afterwards. Exactly-once must
  * hold end to end: manifest-committed discovery makes the compacted
  * replacement files invisible (they are not sink commits), already-read
  * originals are never re-emitted, and post-compaction appends arrive
  * exactly once. The WRITE side of the same race is refused outright by
  * the dataset lock (ConcurrentWriteSpec) — this spec drills the read
  * side, which holds no lock by design. */
class StreamMaintenanceInterleaveSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark

  test("a reader stream survives a mid-life compaction exactly-once: " +
    "already-read rows never re-emit, replacement files stay invisible, " +
    "post-compaction appends arrive once") {
    val base = Files.createTempDirectory("graft_interleave")
    val staging = base.resolve("staging").toString
    val out = base.resolve("ds").toString
    val sinkCkpt = base.resolve("ckpt_sink").toString
    val schema = StructType(Seq(
      StructField("grp", StringType), StructField("v", DoubleType),
      StructField("id", LongType)))

    def stageRows(from: Int, until: Int, parts: Int): Unit =
      spark.range(from, until).select(
        when(col("id") % 2 === 0, "a").otherwise("b").as("grp"),
        col("id").cast(DoubleType).as("v"), col("id"))
        .repartition(parts)
        .write.mode("append").parquet(staging)

    def runSink(): Unit = {
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(staging)
      val q = graft.io.CsvWriter.streamPartitionedDataset(
        graft.model.StarTable.fromDataFrame(
          stream.select(col("grp"), col("v"), col("id")), "ilv",
          units = Map("grp" -> "text")),
        out, Seq("grp"), sinkCkpt)
      try q.processAllAvailable() finally q.stop()
    }

    // 1. sink-write the first 60 rows (3 source files → ≥3 micro-batches,
    //    many small part files per slice — the compactable shape)
    stageRows(0, 60, 3)
    runSink()

    // 2. reader stream starts and drains everything currently committed
    val reader = spark.readStream.format("startable").load(out)
      .writeStream.format("memory").queryName("ilv_read").start()
    try {
      reader.processAllAvailable()
      val afterFirst = spark.table("ilv_read").count()
      assert(afterFirst === 60L, s"first drain read $afterFirst of 60")

      // 3. compaction swaps every leaf MID-READER-LIFE (the reader holds
      //    no lock by design; its already-logged files just vanished and
      //    were replaced by files outside the sink manifest)
      val rep = graft.operators.Maintenance.compactStarDataset(
        spark, out, targetBytes = 64 * 1024 * 1024)
      assert(rep.filesAfter < rep.filesBefore,
        s"compaction must actually merge files: $rep")

      // 4. the reader sees NOTHING new: replacement files are not
      //    manifest commits, old paths are already seen
      reader.processAllAvailable()
      assert(spark.table("ilv_read").count() === 60L,
        "compacted replacement files leaked into the stream as new rows")

      // 5. the sink appends 40 more rows (same checkpoint: exactly-once
      //    resume) — the reader must pick up exactly those
      stageRows(60, 100, 2)
      runSink()
      reader.processAllAvailable()
      val rows = spark.table("ilv_read")
        .agg(count(lit(1)), sum(col("v")), countDistinct(col("id")))
        .collect().head
      assert(rows.getLong(0) === 100L,
        s"expected 100 exactly-once rows, got ${rows.getLong(0)}")
      assert(rows.getLong(2) === 100L, "duplicate ids: a row was re-emitted")
      assert(rows.get(1).toString.toDouble === (0 until 100).sum.toDouble)
    } finally reader.stop()
  }
}
