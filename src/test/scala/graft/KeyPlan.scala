package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: print the formatted physical plan of one SparkEntry key,
  * followed by the pre-pin plan of every frame the key's construction
  * passed to Tables.pin (VERDICT r15 #4/#8: pins make the key-level
  * dump opaque — the executed plan shows Scan ExistingRDD where the
  * audited joins happen inside the pin's materialization; the pre-pin
  * sections keep those shapes auditable).
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
    val pins =
      scala.collection.mutable.Buffer[org.apache.spark.sql.DataFrame]()
    Tables.pinRecorder.set(pins)
    val df = try SparkEntry.queries(key)(spark, sfDir)
    finally Tables.pinRecorder.remove()
    df.explain("formatted")
    pins.zipWithIndex.foreach { case (f, i) =>
      println(s"\n=== pre-pin frame ${i + 1} of ${pins.size} " +
        s"(in pin-call order; later frames may scan earlier pins " +
        "as ExistingRDD) ===")
      f.explain("formatted")
    }
    spark.stop()
  }
}
