package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool (r15, VERDICT r14 #1): per-stage timing of agg_mad's fused
  * two-pass percentile plan, to locate the cold-draw cost (BENCH_r14
  * read 7.88 s driver-route vs 5.18 s canonical; TimeKey reads ~9.5 s
  * run1 vs ~4.3 s steady). Stages timed separately per rep:
  *   A  row-scaled collapse to (flag, xc, cnt) tie blocks + pin
  *   B  median pass (countPercentiles over the pinned blocks) + pin
  *   C  deviation pass + finish (the shipped key's tail)
  * Usage: MadStageProbe [reps=3] [sfDir=/root/testdata/sf0.1] */
object MadStageProbe {
  def main(args: Array[String]): Unit = {
    val reps = if (args.nonEmpty) args(0).toInt else 3
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.t(spark, sfDir, "lineitem").count()
    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    for (i <- 1 to reps) {
      val pinsBefore = spark.sparkContext.getPersistentRDDs.keySet
      val xc = (Tables.dec2(col("l_extendedprice")) * 100).cast("long")
      val base = Tables.t(spark, sfDir, "lineitem")
        .select(col("l_returnflag"), xc.as("xc"))
      val blocks = Tables.pin(base
        .groupBy(col("l_returnflag"), col("xc"))
        .agg(count(lit(1)).as("cnt")))
      val (nb, ta) = time(blocks.count())
      val med = Tables.pin(operators.AggOps.countPercentiles(
        blocks.select(col("l_returnflag"), col("xc").as("v"), col("cnt")),
        "l_returnflag", Seq(("med", 0.5)),
        preCounted = true, collapsed = true))
      val (nm, tb) = time(med.count())
      val dev2 = blocks
        .join(broadcast(med.select(col("l_returnflag"), col("med"))),
          "l_returnflag")
        .select(col("l_returnflag"),
          abs(col("xc") * 2 - (col("med") * 2).cast("long")).as("v"),
          col("cnt"))
      val fin = operators.AggOps.countPercentiles(dev2,
          "l_returnflag", Seq(("mad", 0.5)), scale = 2,
          preCounted = true)
        .select(col("l_returnflag"), col("n"),
          (col("vmax") / lit(2.0)).as("maxdev"), col("mad"))
        .join(broadcast(med.select(col("l_returnflag"), col("med"))),
          "l_returnflag")
        .select(col("l_returnflag"), col("n"),
          Tables.round6(col("med") / 100.0).as("median"),
          Tables.round6(col("mad") / 100.0).as("mad"),
          Tables.round6(expr(operators.AggOps.madRobustZSql))
            .as("max_robust_z"))
        .orderBy("l_returnflag")
      val (nf, tc) = time(fin.queryExecution.toRdd.count())
      println(f"[madstage] rep$i blocks=$nb%7d A=$ta%5.2fs " +
        f"med_rows=$nm%2d B=$tb%5.2fs out=$nf%2d C=$tc%5.2fs " +
        f"total=${ta + tb + tc}%5.2fs")
      spark.sparkContext.getPersistentRDDs.foreach { case (id, rdd) =>
        if (!pinsBefore.contains(id)) rdd.unpersist(blocking = true)
      }
      System.gc()
    }
    spark.stop()
  }
}
