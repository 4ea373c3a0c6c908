package graft

import org.apache.spark.sql.SparkSession

/** Dev tool (VERDICT r9 item 9 "log candidate count"): counts the
  * containment candidate rows with and without the 64-bucket bitmap
  * prune, so the prune's cut is a measured number, not a claim.
  * Usage: Test/runMain graft.CandCount [sfDir] [tauPct]. */
object CandCount {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val tau = if (args.length > 1) args(1).toInt else 95
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    val (without, tw) = time(
      operators.TextSimOps.containmentCandidates(
        spark, sfDir, tau, bitmapPrune = false).count())
    val (withP, tp) = time(
      operators.TextSimOps.containmentCandidates(
        spark, sfDir, tau, bitmapPrune = true).count())
    println(f"[candcount] sf=$sfDir tau=$tau%d " +
      f"without=$without%d (${tw}%.1fs) with=$withP%d (${tp}%.1fs) " +
      f"cut=${100.0 * (without - withP) / math.max(without, 1)}%.1f%%")
    spark.stop()
  }
}
