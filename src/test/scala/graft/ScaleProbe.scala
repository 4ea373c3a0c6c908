package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool (r10): measured scaling evidence for the pair/CC family.
  * Builds synthetic corpora at k× sf0.1 (k = 2, 4, 8) by unioning k
  * deterministically PERTURBED copies (copy j > 0 drops one word at a
  * doc-and-copy-dependent position and offsets doc_id by j·10⁷ — so
  * near-dup structure grows with the corpus instead of collapsing into
  * exact-dup cliques the mask quotient would absorb for free), then
  * times pair generation and clustered CC at each size. Output feeds
  * DESIGN §12's scaling table. Usage:
  * Test/runMain graft.ScaleProbe [baseSfDir] [outRoot] [k1,k2,…]. */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val base = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val outRoot = if (args.length > 1) args(1) else "/tmp/graft_scale"
    val ks = if (args.length > 2) args(2).split(",").toSeq.map(_.toInt)
      else Seq(1, 2, 4, 8)
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
    val docs = Tables.t(spark, base, "documents")
    for (k <- ks) {
      val dir = s"$outRoot/x$k"
      val copies = (0 until k).map { j =>
        if (j == 0) docs
        else docs
          .withColumn("toks", split(col("text"), " "))
          .withColumn("p",
            pmod(col("doc_id") + lit(j), size(col("toks"))))
          .select((col("doc_id") + lit(j * 10000000L)).as("doc_id"),
            concat_ws(" ", expr(
              "filter(toks, (t, i) -> i != p)")).as("text"),
            col("lang"), col("source"), col("n_chars"))
      }
      copies.reduce(_ union _).coalesce(4)
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      // steady-state-ish: one warm pass, then timed
      val (np, tp) = time(
        operators.TextSimOps.exactWordPairs(spark, dir, 90).count())
      val (nc, tc) = time(
        operators.TextSimOps.clusterCC(spark, dir, 6, checked = true)
          .count())
      println(f"[scale] k=$k%d docs=${5000 * k}%6d pairs=$np%9d " +
        f"pairs_s=$tp%6.2f cc_rows=$nc%6d cc_s=$tc%6.2f")
    }
    spark.stop()
  }
}
