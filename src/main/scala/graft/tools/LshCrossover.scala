package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.Similarity

/** Crossover experiment at the tuned config (8 planes, 2 tables, nprobe 24,
  * 4 MB row groups): where does the pruned index probe overtake brute force? */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    def t[A](label: String)(f: => A): Double = {
      val t0 = System.nanoTime(); f
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[probe] $label%-34s $dt%.3f s"); dt
    }
    val q = emb.filter(col("vec_id") === 0).select("embedding").head().getSeq[Float](0)
    for (mult <- Seq(1, 100, 1000)) {
      val n = 2000 * mult
      val big = s"/tmp/graft_xover_corpus_$mult"
      if (!java.nio.file.Files.exists(java.nio.file.Paths.get(big, "_SUCCESS"))) {
        emb.crossJoin(spark.range(mult).toDF("rep"))
          .select((col("vec_id") + col("rep") * 1000000L).as("vec_id"), col("embedding"))
          .filter(col("vec_id") =!= 0)
          .repartition(32).write.mode("overwrite").parquet(big)
      }
      val corpus = spark.read.parquet(big)
      val idx = s"/tmp/graft_xover_idx2_$mult"
      if (!java.nio.file.Files.exists(java.nio.file.Paths.get(idx, "_SUCCESS")))
        t(s"n=$n index build") {
          Similarity.writeLshIndex(corpus, "embedding", "vec_id", idx,
            dim = 64, numPlanes = 8, tables = 2)
        }
      Similarity.bruteForceTopK(corpus, "embedding", "vec_id", q, 10).collect()
      Similarity.probeLshIndex(spark, idx, q, 10, dim = 64,
        numPlanes = 8, tables = 2, nprobe = 24).collect()
      val b = (1 to 3).map(_ => t(s"n=$n brute") {
        Similarity.bruteForceTopK(corpus, "embedding", "vec_id", q, 10)
          .write.format("noop").mode("overwrite").save()
      }).min
      val p = (1 to 3).map(_ => t(s"n=$n probe") {
        Similarity.probeLshIndex(spark, idx, q, 10, dim = 64,
          numPlanes = 8, tables = 2, nprobe = 24)
          .write.format("noop").mode("overwrite").save()
      }).min
      println(f"[probe] n=$n%-8d brute=$b%.3f probe=$p%.3f speedup=${b / p}%.2fx")
    }
    spark.stop()
  }
}
