package graft
import org.apache.spark.sql.SparkSession

/** Dev tool: steady-state timing of one key — runs it N times in one
  * session and prints each iteration, separating plan/codegen warmup
  * from per-run cost (the in-suite Bench numbers carry neighbor GC and
  * first-run compilation; DESIGN §5). Usage:
  * TimeKey <key> [runs=3] [sfDir=/root/testdata/sf0.1]. */
object TimeKey {
  def main(args: Array[String]): Unit = {
    val key = args(0)
    val runs = if (args.length > 1) args(1).toInt else 3
    val sfDir = if (args.length > 2) args(2) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.AllTables.foreach { n =>
      try Tables.t(spark, sfDir, n).count()
      catch { case e: Throwable =>
        System.err.println(s"[timekey] warmup failed for $n: ${e.getMessage}")
      }
    }
    val fn = SparkEntry.queries(key)
    for (i <- 1 to runs) {
      // targeted pin sweep per run, matching Bench's end-of-key sweep
      // (r15): without it each run accrues the previous runs' dead
      // localCheckpoint pins and the "steady" reading drifts upward
      // with run count (agg_mad read 4.3 s here vs 2.3 s staged with
      // swept pins at the same HEAD)
      val pinsBefore = spark.sparkContext.getPersistentRDDs.keySet
      val t0 = System.nanoTime()
      // full-plan execution, matching Bench (a bare count() lets
      // Catalyst prune unused window/sort tails — DESIGN §13)
      val n = fn(spark, sfDir).queryExecution.toRdd.count()
      println(f"[timekey] $key run$i ${(System.nanoTime() - t0) / 1e9}%.2fs rows=$n")
      spark.sparkContext.getPersistentRDDs.foreach { case (id, rdd) =>
        // try/catch like Bench's sweep: one failed block release must
        // not abort the remaining timed runs (r15 review)
        if (!pinsBefore.contains(id))
          try rdd.unpersist(blocking = true)
          catch { case _: Throwable => }
      }
      System.gc()
    }
    spark.stop()
  }
}
