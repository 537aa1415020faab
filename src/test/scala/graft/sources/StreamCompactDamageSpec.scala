package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.connector.read.streaming.ReadLimit
import org.scalatest.funsuite.AnyFunSuite

/** White-box drills of the streaming file log's compact fallback: a
  * post-restart replay of a batch folded into the compact snapshot must
  * serve that batch's entries from the compact — and a batch ABSENT from
  * the compact is unambiguous corruption (every logged batch holds >= 1
  * entry), which must refuse loudly instead of silently emitting zero
  * rows (data loss on replay). */
class StreamCompactDamageSpec extends AnyFunSuite {
  lazy val spark = graft.TestSpark.spark
  import spark.implicits._

  /** A 4-slice dataset + a stream instance over it with compaction every
    * 2 batches, driven 4 batches (1 file each) so batches 1-4 are all
    * folded into `4.compact`. Returns (ckpt, a fresh-stream factory). */
  private def drivenStream(): (String, () => StarTableMicroBatchStream) = {
    val base = Files.createTempDirectory("graft_cdmg")
    val out = base.resolve("ds").toString
    val ckpt = base.resolve("ckpt").toString
    graft.io.CsvWriter.writePartitionedDataset(
      graft.model.StarTable.fromDataFrame(
        (0 until 4).map(i => (s"g$i", i.toDouble)).toDF("grp", "x"),
        "cdmg", units = Map("grp" -> "text")),
      out, Seq("grp"))
    val meta = StarTableSource.readDatasetMeta(Seq(out)).get
    val confS = new org.apache.spark.util.SerializableConfiguration(
      spark.sessionState.newHadoopConf())
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("grp",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("x",
        org.apache.spark.sql.types.DoubleType)))
    def mk() = new StarTableMicroBatchStream(Seq(out), meta, ckpt,
      sep = ";", failFast = false, fullSchema = schema, required = schema,
      pushed = Array.empty, maxSplitBytes = 128L * 1024 * 1024,
      maxFilesPerTrigger = Some(1), confS = confS, logCompactInterval = 2)
    val s = mk()
    var off = s.initialOffset()
    (1 to 4).foreach { _ =>
      off = s.latestOffset(off, ReadLimit.maxFiles(1))
    }
    assert(off.json() == "4", s"expected 4 driven batches, got ${off.json()}")
    (ckpt, mk _)
  }

  test("a folded batch replays from the compact snapshot after restart") {
    val (_, mk) = drivenStream()
    val restarted = mk() // fresh recover(): batches 1-4 live in 4.compact
    val parts = restarted.planInputPartitions(
      restarted.deserializeOffset("0"), restarted.deserializeOffset("2"))
    assert(parts.length == 2,
      s"batches 1-2 should replay one file each from the compact, " +
        s"got ${parts.length} partitions")
  }

  test("a batch MISSING from the compact refuses loudly (damaged " +
    "checkpoint), never silently replays zero rows") {
    val (ckpt, mk) = drivenStream()
    // tamper: drop batch 1's entries from the compact — the truncated-
    // compact corruption the fallback must not paper over
    val compact = java.nio.file.Paths.get(ckpt, "graft-files", "4.compact")
    val txt = new String(Files.readAllBytes(compact), "UTF-8")
    import graft.io.JsonValue._
    val arr = graft.io.JsonValue.parse(txt).asInstanceOf[JsonArray]
    val kept = arr.values.filterNot { v =>
      v.asInstanceOf[JsonObject].fields("batch")
        .asInstanceOf[JsonNumber].value.toLong == 1L
    }
    assert(kept.size < arr.values.size, "tamper removed nothing")
    Files.write(compact, graft.io.JsonValue.write(JsonArray(kept))
      .getBytes("UTF-8"))
    // drop the local FS's checksum sidecar so the tampered bytes read back
    Files.deleteIfExists(compact.resolveSibling(".4.compact.crc"))
    val restarted = mk()
    val e = intercept[IllegalStateException] {
      restarted.planInputPartitions(
        restarted.deserializeOffset("0"), restarted.deserializeOffset("1"))
    }
    assert(e.getMessage.contains("damaged"),
      s"expected a damaged-checkpoint refusal, got: ${e.getMessage}")
    // batches still present in the compact replay fine
    assert(restarted.planInputPartitions(
      restarted.deserializeOffset("1"), restarted.deserializeOffset("2"))
      .length == 1)
  }
}
