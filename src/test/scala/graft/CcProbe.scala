package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool (r10): sizes the CC quotient graph after one min-label
  * round — the contraction design's load-bearing claim is that the
  * contracted edge set is inter-cluster-sized, i.e. tiny next to the
  * pair list. Usage: Test/runMain graft.CcProbe [sfDir]. */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    val (np, tp) = time(
      operators.TextSimOps.exactWordPairs(spark, sfDir, 90).count())
    println(f"[ccprobe] pairs=$np%d (${tp}%.1fs)")
    val pairs = operators.TextSimOps.exactWordPairs(spark, sfDir, 90)
      .select(col("da"), col("db"))
    val a1 = pairs.select(explode(array(
        struct(col("da").as("v"), col("db").as("u")),
        struct(col("db").as("v"), col("da").as("u")))).as("e"))
      .select(col("e.v").as("v"), col("e.u").as("u"))
      .groupBy("v").agg(min(col("u")).as("l")).cache()
    println(s"[ccprobe] touched-vertices=${a1.count()}")
    val ec = pairs
      .join(a1.select(col("v").as("x"), col("l").as("lv")),
        col("da") === col("x"))
      .join(a1.select(col("v").as("y"), col("l").as("lu")),
        col("db") === col("y"))
      .where(col("lv") =!= col("lu"))
      .select(col("lv"), col("lu")).distinct()
    val (ne, te) = time(ec.count())
    println(f"[ccprobe] quotient-edges=$ne%d (${te}%.1fs) " +
      s"labels=${a1.select(col("l")).distinct().count()}")
    val (nc, tc) = time(SparkEntry.queries("dedup_cluster_cc")(
      spark, sfDir).count())
    println(f"[ccprobe] cc rows=$nc%d (${tc}%.1fs steady)")
    spark.stop()
  }
}
