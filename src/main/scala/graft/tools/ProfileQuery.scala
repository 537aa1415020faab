package graft.tools

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Per-job/per-stage decomposition of a declared query's wall time —
  * distinguishes executor work from driver gaps (planning, persist
  * bookkeeping, barriers) so optimization targets the real cost.
  *
  * Usage: sbt "runMain graft.tools.ProfileQuery <q1,q2,...>"
  */
object ProfileQuery {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").map(_.trim).filter(_.nonEmpty)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        sys.env.getOrElse("SPARK_GRAFT_AQE_MIN_PARTITION_SIZE", "64k"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.maxPlanStringLength", "1048576")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    case class Job(id: Int, var start: Long = 0L, var end: Long = 0L,
                   var stages: Int = 0, var tasks: Int = 0,
                   var taskTimeMs: Long = 0L)
    val jobs = mutable.LinkedHashMap[Int, Job]()
    val stageToJob = mutable.HashMap[Int, Int]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = jobs.synchronized {
        val j = Job(e.jobId, start = e.time)
        j.stages = e.stageIds.size
        e.stageIds.foreach(sid => stageToJob(sid) = e.jobId)
        jobs(e.jobId) = j
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = jobs.synchronized {
        jobs.get(e.jobId).foreach(_.end = e.time)
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = jobs.synchronized {
        val si = e.stageInfo
        stageToJob.get(si.stageId).foreach { jid =>
          jobs.get(jid).foreach { j =>
            j.tasks += si.numTasks
            j.taskTimeMs += (for {
              s <- si.submissionTime; c <- si.completionTime
            } yield c - s).getOrElse(0L)
          }
        }
      }
    })

    def run(n: String, dir: String): Unit =
      graft.SparkEntry.queries(n)(spark, dir)
        .write.format("noop").mode("overwrite").save()
    def sweep(): Unit = {
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      org.apache.spark.sql.graft.StreamingHygiene.stopStateStores()
      System.gc()
    }

    names.foreach { n =>
      try run(n, "/root/testdata/sf0.001") catch { case _: Throwable => () }
      sweep()
      jobs.synchronized { jobs.clear(); stageToJob.clear() }
      val t0 = System.nanoTime()
      run(n, sfDir)
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(200) // let trailing listener events drain
      jobs.synchronized {
        val js = jobs.values.toSeq.sortBy(_.start)
        val jobWall = js.map(j => math.max(0L, j.end - j.start)).sum / 1e3
        // driver gap: time not covered by any job (sequential approximation)
        var covered = 0L
        var cursor = 0L
        js.foreach { j =>
          val s = j.start; val e = math.max(j.end, j.start)
          if (cursor == 0L) cursor = s
          covered += math.max(0L, e - math.max(s, cursor))
          cursor = math.max(cursor, e)
        }
        val span = if (js.nonEmpty) (js.last.end - js.head.start) / 1e3 else 0.0
        println(f"== $n%s wall=$wall%.2fs jobs=${js.size}%d jobWallSum=$jobWall%.2fs jobSpan=$span%.2fs uncovered=${span - covered / 1e3}%.2fs")
        js.foreach { j =>
          println(f"   job ${j.id}%4d ${(j.end - j.start) / 1e3}%6.2fs stages=${j.stages}%3d tasks=${j.tasks}%5d stageTime=${j.taskTimeMs / 1e3}%6.2fs")
        }
      }
      sweep()
    }
    spark.stop()
  }
}
