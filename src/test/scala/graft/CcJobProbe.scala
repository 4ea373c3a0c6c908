package graft
import org.apache.spark.sql.SparkSession
object CcJobProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    def time[A](f: => A): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }
    for (k <- Seq("dedup_cluster_cc", "dedup_keep_best", "pipe_curation_e2e")) {
      SparkEntry.queries(k)(spark, d).queryExecution.toRdd.count() // warm
      val ts = (1 to 3).map(_ =>
        time(SparkEntry.queries(k)(spark, d).queryExecution.toRdd.count()))
      println(f"[cck] $k%-20s ${ts.map(t => f"$t%.2f").mkString(",")} median=${ts.sorted.apply(1)}%.2f")
    }
    spark.stop()
  }
}
