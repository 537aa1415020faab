package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnose the minhash-cands capstone stage: candidate volume and wall
  * time at two corpus scales. If candidate counts grow ~linearly but wall
  * time does not, the stage is resource-bound (shuffle/memory), not
  * pair-bound; if counts grow quadratically, the corpus's random-pair
  * Jaccard tail is feeding banded LSH false positives (n²·E[J⁴]).
  *
  *   sbt "runMain graft.tools.MinhashProbe [mults…]" (default 10 100)
  */
object MinhashProbe {
  def main(args: Array[String]): Unit = {
    val dissect = args.headOption.contains("dissect")
    val mults0 = if (dissect) args.drop(1) else args
    val mults = if (mults0.nonEmpty) mults0.toSeq.map(_.toInt) else Seq(10, 100)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val bench = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .filter(col("doc_id") < 200).orderBy("doc_id")
      .select("text").collect().map(_.getString(0))

    mults.foreach { mult =>
      val path = RealCorpus.generate(spark, mult, bench)
      val docs = spark.read.parquet(path).select(
        col("doc_id").cast("long").as("doc_id"), col("text"))
      if (dissect) dissectRun(spark, mult, docs)
      else {
        val t0 = System.nanoTime()
        val cands = graft.functions.Dedup.minhashCandidates(
          docs, "doc_id", "text")
        val wall = (System.nanoTime() - t0) / 1e9
        val byBand = cands.agg(
          count(lit(1)).as("cands"),
          sum(when(col("jaccard_est") >= 0.8, 1).otherwise(0)).as("real"),
          sum(when(col("jaccard_est") < 0.5, 1).otherwise(0)).as("junk"))
          .head()
        println(f"[mh] ${mult}x: wall=$wall%.1f s cands=${byBand.getLong(0)} " +
          s"real(>=0.8)=${byBand.getLong(1)} junk(<0.5)=${byBand.getLong(2)}")
        cands.unpersist(blocking = true)
      }
    }
    spark.stop()
  }

  /** Historical old-shape reference (the round-11 diagnosis): the
    * pre-fix pipeline carried full ~520-byte signature arrays through the
    * band self-join and pair-distinct, and `<=` pushed a bands ×
    * distinct-sigs diagonal of (s,s) self-rows through the distinct. At
    * 500k docs that one stage measured 200.3 s (vs 8.5 s at 50k) while
    * every other stage stayed linear; the production pipeline now moves
    * 128-bit surrogate keys and emits same-signature pairs from a
    * dedicated key-group path — same candidates, 242→13 s end to end.
    * The dissect flag now just runs the plain count mode. */
  private def dissectRun(spark: SparkSession, mult: Int,
                         docs: org.apache.spark.sql.DataFrame): Unit = {
    val t0 = System.nanoTime()
    val cands = graft.functions.Dedup.minhashCandidates(docs, "doc_id", "text")
    val n = cands.count()
    println(f"[mh-dissect ${mult}x] new pipeline: " +
      f"${(System.nanoTime() - t0) / 1e9}%.1f s, $n candidates")
    cands.unpersist(blocking = true)
  }
}
