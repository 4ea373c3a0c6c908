package graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession
import scala.collection.mutable

/** Dev tool (r15): per-JOB attribution of one SparkEntry key's
  * execution — job wall, stage count, summed task time, peak shuffle
  * read/write — so a key whose end-to-end wall exceeds the sum of its
  * staged parts can be traced to the specific jobs (broadcast builds,
  * pin materializations, AQE stage re-runs) that pay the difference.
  * Usage: Test/runMain graft.JobProbe <key> [runs] [sfDir]. */
object JobProbe {
  def main(args: Array[String]): Unit = {
    val key = args(0)
    val runs = if (args.length > 1) args(1).toInt else 2
    val sfDir = if (args.length > 2) args(2) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Tables.AllTables.foreach { n =>
      try Tables.t(spark, sfDir, n).count()
      catch { case _: Throwable => () }
    }
    case class J(start: Long, var end: Long = 0L, var stages: Int = 0,
      var taskMs: Long = 0L, var shufR: Long = 0L, var shufW: Long = 0L,
      var tasks: Int = 0)
    val jobs = mutable.LinkedHashMap[Int, J]()
    val stageToJob = mutable.HashMap[Int, Int]()
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        jobs.synchronized {
          jobs(e.jobId) = J(e.time)
          e.stageIds.foreach(sid => stageToJob(sid) = e.jobId)
          jobs(e.jobId).stages += e.stageIds.size
        }
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        jobs.synchronized { jobs.get(e.jobId).foreach(_.end = e.time) }
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
        jobs.synchronized {
          stageToJob.get(e.stageId).flatMap(jobs.get).foreach { j =>
            j.tasks += 1
            if (e.taskMetrics != null) {
              j.taskMs += e.taskMetrics.executorRunTime
              j.shufR += e.taskMetrics.shuffleReadMetrics.totalBytesRead
              j.shufW += e.taskMetrics.shuffleWriteMetrics.bytesWritten
            }
          }
        }
    }
    val fn = SparkEntry.queries(key)
    for (i <- 1 to runs) {
      val pinsBefore = spark.sparkContext.getPersistentRDDs.keySet
      jobs.synchronized { jobs.clear(); stageToJob.clear() }
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).queryExecution.toRdd.count()
      val dt = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500) // let the listener bus drain
      spark.sparkContext.removeSparkListener(listener)
      println(f"[jobprobe] $key run$i total $dt%6.2fs rows=$n " +
        s"jobs=${jobs.size}")
      jobs.synchronized {
        jobs.toSeq.sortBy(-_._2.taskMs).take(25).foreach { case (id, j) =>
          val wall = if (j.end > 0) (j.end - j.start) / 1e3 else -1.0
          println(f"[jobprobe]   job$id%-4d wall=$wall%7.2fs " +
            f"stages=${j.stages}%2d tasks=${j.tasks}%4d " +
            f"taskTime=${j.taskMs / 1e3}%8.2fs " +
            f"shufR=${j.shufR / 1048576.0}%8.1fM " +
            f"shufW=${j.shufW / 1048576.0}%8.1fM")
        }
        val tot = jobs.values.map(_.taskMs).sum / 1e3
        println(f"[jobprobe]   sum taskTime=$tot%8.2fs")
      }
      spark.sparkContext.getPersistentRDDs.foreach { case (id, rdd) =>
        if (!pinsBefore.contains(id))
          try rdd.unpersist(blocking = true)
          catch { case _: Throwable => }
      }
      System.gc()
    }
    spark.stop()
  }
}
