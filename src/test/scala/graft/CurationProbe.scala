package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: decompose pipe_curation_e2e's cost at sf0.1 — times the
  * bare CC, the keep_best shape, and the full curation key in one
  * session to find which stage re-executes. */
object CurationProbe {
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
    def time(name: String)(f: => DataFrame): Unit = {
      System.gc()
      val t0 = System.nanoTime()
      val n = f.count()
      println(f"[probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%6.2fs rows=$n")
    }
    time("cc_unchecked") { operators.TextSimOps.clusterCC(spark, sfDir, 6) }
    time("cc_checked") {
      operators.TextSimOps.clusterCC(spark, sfDir, 6, checked = true)
    }
    time("keep_best") {
      SparkEntry.queries("dedup_keep_best")(spark, sfDir)
    }
    time("curation_full") {
      SparkEntry.queries("pipe_curation_e2e")(spark, sfDir)
    }
    // curation minus the second docs join: is the tail the cost?
    time("curation_keep_only") {
      val clusters = operators.TextSimOps.clusterCC(spark, sfDir, 6,
        checked = true)
      val docs = Tables.t(spark, sfDir, "documents")
        .select(col("doc_id"), length(col("text")).as("quality"))
      clusters.join(docs, "doc_id")
        .groupBy(col("cluster"))
        .agg(max(struct(col("quality"), (-col("doc_id")).as("nid"))).as("b"))
        .select((-col("b.nid")).as("doc_id"))
    }
    spark.stop()
  }
}
