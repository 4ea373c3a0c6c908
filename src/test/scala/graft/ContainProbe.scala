package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: A/B the containment verify pipeline at sf0.1 —
  * (a) shipped shape: candidates → attach arrays → merge-scan verify →
  *     distinct;
  * (b) dedup-first: candidates → distinct → attach → verify.
  * r5 measured (a) faster on the sparse old corpus; the regenerated
  * corpus is ~400× denser in near-dups, so re-measure. */
object ContainProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.t(spark, sfDir, "documents").count()
    val tau = 95
    def inter(a: Column, b: Column): Column = {
      import org.apache.spark.sql.GraftBridge
      GraftBridge.column(graft.functions.SortedIntersectCount(
        GraftBridge.expression(a), GraftBridge.expression(b)))
    }
    val dt = operators.TextSimOps.docTokens(spark, sfDir)
    def verify(cand: DataFrame): DataFrame = cand
      .join(dt.select(col("doc_id").as("da"), col("wh").as("wa"),
        col("c").as("ca")), "da")
      .join(dt.select(col("doc_id").as("db"), col("wh").as("wb")), "db")
      .withColumn("inter", inter(col("wa"), col("wb")))
      .where(lit(100) * col("inter") >= lit(tau) * col("ca"))
      .select(col("da"), col("db"), col("inter"), col("ca"))
    def time(name: String)(f: => Long): Unit = {
      System.gc()
      val t0 = System.nanoTime()
      val n = f
      println(f"[cprobe] $name%-24s ${(System.nanoTime() - t0) / 1e9}%6.2fs rows=$n")
    }
    for (i <- 1 to 2) {
      time(s"shipped_r$i") {
        verify(operators.TextSimOps.containmentCandidates(spark, sfDir, tau))
          .distinct().count()
      }
      time(s"dedup_first_r$i") {
        verify(operators.TextSimOps.containmentCandidates(spark, sfDir, tau)
          .distinct()).count()
      }
    }
    spark.stop()
  }
}
