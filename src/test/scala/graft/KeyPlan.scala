package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: print the formatted physical plan of one SparkEntry key.
  * Usage: Test/runMain graft.KeyPlan <key> [sfDir]. */
object KeyPlan {
  def main(args: Array[String]): Unit = {
    val key = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.queries(key)(spark, sfDir).explain("formatted")
    spark.stop()
  }
}
