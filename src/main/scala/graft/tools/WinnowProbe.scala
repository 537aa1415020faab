package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Characterization probe for winnowMatchedSpans at rehearsal mults:
  * measures the join-input/-output cardinalities that explain the wall
  * time. Round-8 result (documented in the operator's scaladoc and
  * SURVEY.md): time tracks the output span count — 16.5k/1.46M/41.3M
  * spans in 3.6/4.1/33.9 s at 1×/10×/100× — so the steep rehearsal
  * point is quadratic OUTPUT demanded by the replica construction, not
  * a shuffle pathology. */
object WinnowProbe {
  def main(args: Array[String]): Unit = {
    val mults = if (args.nonEmpty) args.toSeq.map(_.toInt) else Seq(1, 10, 100)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    mults.foreach { mult =>
      val docPath = s"/tmp/graft_scale_v3_$mult/documents.parquet"
      if (!java.nio.file.Files.exists(java.nio.file.Paths.get(docPath))) {
        println(s"[probe] mult=$mult: no rehearsal data at $docPath, skipping")
      } else {
        val docs = spark.read.parquet(docPath)
        val fps = graft.functions.Dedup.winnowFingerprintsPositional(
          docs, "doc_id", "text").persist()
        val nFps = fps.count()
        val byFp = fps.groupBy("fp").agg(count(lit(1)).as("c"),
          countDistinct(col("id")).as("df")).persist()
        val stats = byFp.agg(count(lit(1)).as("distinct_fps"),
          sum(col("c") * col("c")).as("join_rows"),
          max(col("df")).as("max_df"),
          sum(when(col("df") > 1000, 1L).otherwise(0L)).as("capped")).head()
        val t0 = System.nanoTime()
        val spans = graft.functions.Dedup.winnowMatchedSpans(docs, "doc_id", "text")
        spans.write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        val nSpans = spans.count()
        spans.unpersist(blocking = true)
        println(f"[probe] mult=$mult%4d fps=$nFps%12d distinct=${stats.getLong(0)}%10d " +
          f"joinRows=${stats.getLong(1)}%14d maxDf=${stats.getLong(2)}%6d " +
          f"capped=${stats.getLong(3)}%6d spans=$nSpans%12d time=$dt%8.2f s")
        byFp.unpersist(blocking = true); fps.unpersist(blocking = true)
        spark.sharedState.cacheManager.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
        System.gc()
      }
    }
    spark.stop()
  }
}
