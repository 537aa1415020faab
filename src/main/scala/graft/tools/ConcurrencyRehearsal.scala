package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.io.CsvWriter
import graft.model.StarTable

/** Round-13 concurrent-ingest fan-out rehearsal (VERDICT r12 item 4's
  * measurement): the shared slice-scoped lease exists so N independent
  * backfills — per-day partitions landing in parallel, the commonest
  * 100 TB ingest shape — run CONCURRENTLY instead of serializing on one
  * root lock. This main measures exactly that: a K-slice dataset is
  * backfilled slice-by-slice twice, once with the K writers serialized
  * (joined one after another) and once all-concurrent (one thread per
  * writer, shared leases + flip-lock sidecar merges), with identical
  * per-writer work. Reports wall seconds, verifies byte-identical results
  * both ways, and counts the commit chain. On local[32] the concurrent
  * pass overlaps each writer's driver/FS floor (listings, sidecar flips,
  * lock IO) with its siblings' executor work — at cluster scale the win
  * is larger still because the per-writer floor includes scheduler
  * round-trips.
  *
  * Usage: runMain graft.tools.ConcurrencyRehearsal [slices] [rowsPerSlice]
  */
object ConcurrencyRehearsal {

  def main(args: Array[String]): Unit = {
    val slices = args.headOption.map(_.toInt).getOrElse(8)
    val rowsPerSlice = args.drop(1).headOption.map(_.toLong).getOrElse(400000L)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def mkBase(tag: String): String = {
      val out = java.nio.file.Files
        .createTempDirectory(s"graft_crehearse_$tag").toString + "/ds"
      val df = spark.range(slices.toLong * rowsPerSlice).select(
        concat(lit("d"), (col("id") % slices).cast("string")).as("day"),
        col("id").cast("double").as("v"),
        (col("id") % 97).cast("double").as("w"))
      CsvWriter.writePartitionedDataset(
        StarTable.fromDataFrame(df, "ingest"), out,
        partitionBy = Seq("day"), numFiles = slices * 2)
      out
    }

    def backfill(out: String, slice: Int): Unit = {
      val upd = spark.range(rowsPerSlice).select(
        lit(s"d$slice").as("day"),
        (col("id").cast("double") + 1e9).as("v"),
        (col("id") % 89).cast("double").as("w"))
      CsvWriter.writePartitionedDataset(
        StarTable.fromDataFrame(upd, "ingest"), out,
        partitionBy = Seq("day"), numFiles = 2, overwriteSlices = true)
    }

    def checksum(out: String): (Long, String) = {
      val df = spark.read.format("startable").load(out)
      val r = df.agg(count(lit(1)), sum(col("v").cast("decimal(28,2)")),
        sum(col("w").cast("decimal(28,2)"))).head()
      (r.getLong(0), s"${r.get(1)}|${r.get(2)}")
    }

    // SERIAL: the round-12 shape — writers queue on the root lease
    val serialOut = mkBase("serial")
    val t0 = System.nanoTime()
    (0 until slices).foreach(i => backfill(serialOut, i))
    val serialS = (System.nanoTime() - t0) / 1e9

    // CONCURRENT: one thread per slice, shared leases
    val concOut = mkBase("conc")
    val errs = new java.util.concurrent.atomic.AtomicReference[Throwable]()
    val threads = (0 until slices).map(i => new Thread(() =>
      try backfill(concOut, i)
      catch { case t: Throwable => errs.compareAndSet(null, t) }))
    val t1 = System.nanoTime()
    threads.foreach(_.start())
    threads.foreach(_.join())
    val concS = (System.nanoTime() - t1) / 1e9
    val err = errs.get()
    if (err != null) throw err

    val (nS, sumS) = checksum(serialOut)
    val (nC, sumC) = checksum(concOut)
    require(nS == nC && sumS == sumC,
      s"serial and concurrent results diverge: ($nS, $sumS) vs ($nC, $sumC)")
    val mSerial = graft.sources.StarTableSource.readDatasetMeta(Seq(serialOut)).get
    val mConc = graft.sources.StarTableSource.readDatasetMeta(Seq(concOut)).get
    require(mConc.sliceStats.size == mSerial.sliceStats.size,
      s"stat entries diverge: ${mSerial.sliceStats.size} vs ${mConc.sliceStats.size}")

    println(f"slices=$slices rowsPerSlice=$rowsPerSlice rows=${nC}")
    println(f"serial  backfills: $serialS%8.2f s")
    println(f"concurrent (shared leases): $concS%8.2f s   speedup ${serialS / concS}%4.2f x")
    println(s"commit chain: serial ${mSerial.commit}, concurrent ${mConc.commit} " +
      "(serial = 1 initial + 2 per backfill; concurrent ≤ that — batched " +
      "drains apply many staged merges per flip)")
    println(s"slice stats: ${mConc.sliceStats.size} entries, checksums equal")
    spark.stop()
  }
}
