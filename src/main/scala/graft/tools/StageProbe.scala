package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

import scala.collection.mutable

/** Per-stage task-metrics capture for one or more named queries: runs the
  * query (warm at sf0.001, then timed at the target SF), records every
  * completed stage's task time / shuffle read+write bytes / spill, and
  * prints the top stages by executor run time plus the formatted physical
  * plan. This is the mechanical adjudication tool the round-9 verdict asked
  * for: when a bench number drifts, a StageProbe dump from the drifted
  * window diffed against a pinned clean dump distinguishes "the plan
  * changed" (different stage structure / shuffle volumes) from "the same
  * work ran slower" (same stages, same bytes, elevated wall time).
  *
  * Usage: runMain graft.tools.StageProbe <sfDir> <query...>
  */
object StageProbe {
  final case class StageRec(id: Int, name: String, tasks: Int,
                            runMs: Long, cpuMs: Long,
                            shufReadMB: Double, shufWriteMB: Double,
                            spillMB: Double, inputMB: Double)

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args.drop(1).toSeq
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.maxPlanStringLength", "1048576")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val stages = mutable.ArrayBuffer[StageRec]()
    val listener = new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val i = sc.stageInfo
        val m = i.taskMetrics
        stages += StageRec(i.stageId, i.name.takeWhile(_ != '\n'), i.numTasks,
          m.executorRunTime, m.executorCpuTime / 1000000L,
          m.shuffleReadMetrics.totalBytesRead / 1e6,
          m.shuffleWriteMetrics.bytesWritten / 1e6,
          (m.memoryBytesSpilled + m.diskBytesSpilled) / 1e6,
          m.inputMetrics.bytesRead / 1e6)
      }
    }

    def sweep(): Unit = {
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      System.gc()
    }

    names.foreach { n =>
      val fn = graft.SparkEntry.queries(n)
      try fn(spark, "/root/testdata/sf0.001").write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => println(s"[probe] $n warm FAILED: ${e.getMessage}") }
      sweep()
      stages.clear()
      spark.sparkContext.addSparkListener(listener)
      val df = fn(spark, sfDir)
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500) // let the async listener bus drain stage-completed events
      spark.sparkContext.removeSparkListener(listener)
      val snap = stages.toVector
      println(f"\n=== $n  wall=$wall%.2f s  stages=${snap.size}  " +
        f"taskTime=${snap.map(_.runMs).sum / 1000.0}%.1f s  " +
        f"shufRead=${snap.map(_.shufReadMB).sum}%.0f MB  " +
        f"shufWrite=${snap.map(_.shufWriteMB).sum}%.0f MB  " +
        f"spill=${snap.map(_.spillMB).sum}%.0f MB ===")
      snap.sortBy(-_.runMs).take(12).foreach { s =>
        println(f"  stage ${s.id}%4d run=${s.runMs / 1000.0}%7.2fs cpu=${s.cpuMs / 1000.0}%7.2fs " +
          f"tasks=${s.tasks}%3d sr=${s.shufReadMB}%8.1fMB sw=${s.shufWriteMB}%8.1fMB " +
          f"spill=${s.spillMB}%6.0fMB in=${s.inputMB}%7.1fMB  ${s.name.take(90)}")
      }
      println(s"--- plan ($n) ---")
      println(df.queryExecution.executedPlan.toString.linesIterator
        .filter(l => l.contains("Join") || l.contains("Exchange") ||
          l.contains("Scan") || l.contains("Aggregate") || l.contains("Sort"))
        .map(_.take(160)).mkString("\n"))
      sweep()
    }
    spark.stop()
  }
}
