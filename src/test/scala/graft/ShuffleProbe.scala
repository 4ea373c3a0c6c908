package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Dev tool (r10): per-key SHUFFLE VOLUME — the number a 100 TB
  * capacity plan actually needs (wall time on local[4] hides what the
  * network pays at scale). A SparkListener accumulates task-level
  * shuffle read/write bytes and spill around each key's action.
  * Usage: Test/runMain graft.ShuffleProbe [sfDir] [key1,key2,…]. */
object ShuffleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val keys =
      if (args.length > 1) args(1).split(",").toSeq
      else Seq("agg_groupby", "join_multiway", "win_rank",
        "sim_jaccard_pairs", "sim_containment_pairs", "dedup_cluster_cc",
        "dedup_minhash", "graph_bfs_hops", "graph_pagerank",
        "graph_triangle_count", "knn_graph", "pipe_curation_e2e",
        "text_tfidf_top", "udtf_shingle_gen", "etl_reference_shape",
        "pipe_delta_dedup")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    @volatile var read = 0L; @volatile var write = 0L
    @volatile var spillMem = 0L; @volatile var spillDisk = 0L
    val listener = new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) {
          read += m.shuffleReadMetrics.totalBytesRead
          write += m.shuffleWriteMetrics.bytesWritten
          spillMem += m.memoryBytesSpilled
          spillDisk += m.diskBytesSpilled
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    Tables.AllTables.foreach(n =>
      try Tables.t(spark, sfDir, n).count() catch { case _: Throwable => })
    keys.foreach { k =>
      read = 0; write = 0; spillMem = 0; spillDisk = 0
      val t0 = System.nanoTime()
      // NOT .count(): under a count aggregate Catalyst prunes unused
      // window/sort/projection tails (win_rank's whole WindowExec
      // vanishes — measured: 0 shuffle bytes), so volumes would reflect
      // a different plan than the one a consumer of the full result
      // runs. toRdd executes the key's OWN plan with its full output.
      val n = SparkEntry.queries(k)(spark, sfDir)
        .queryExecution.toRdd.count()
      // listener bus is async; give task-end events a moment to drain
      Thread.sleep(400)
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[shuffle] $k%-24s rows=$n%9d t=$dt%6.2fs " +
        f"write=${write / 1048576.0}%9.1fMiB read=${read / 1048576.0}%9.1fMiB " +
        f"spill=${(spillMem + spillDisk) / 1048576.0}%7.1fMiB")
    }
    spark.stop()
  }
}
