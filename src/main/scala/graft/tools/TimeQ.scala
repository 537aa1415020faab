package graft.tools

import org.apache.spark.sql.SparkSession

/** Serialized single-query timer at an SF dir: warm once, time N reps.
  * (The calibration companion to Bench for local iteration.) */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args.drop(1).toSeq
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      // match Bench's session exactly — without the 64k AQE floor a
      // compute-dense stage above a small shuffle coalesces to one task
      // here but not in the bench, making TimeQ numbers incomparable
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        sys.env.getOrElse("SPARK_GRAFT_AQE_MIN_PARTITION_SIZE", "64k"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.maxPlanStringLength", "1048576")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def sweep(): Unit = {
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      System.gc()
    }
    names.foreach { n =>
      val fn = graft.SparkEntry.queries(n)
      try fn(spark, "/root/testdata/sf0.001").write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => println(s"[timeq] $n warm FAILED: ${e.getMessage}") }
      sweep()
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        sweep(); dt
      }
      println(f"[timeq] $n%-28s ${times.sorted.apply(1)}%6.2f s  (all: ${times.map(t => f"$t%.2f").mkString(", ")})")
    }
    spark.stop()
  }
}
