package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev tool (r10): per-stage wall times of the dedup_cluster_cc plan —
  * replicates the private bitset/quotient stages of TextSimOps so the
  * 4-second end-to-end cost can be attributed (substrate vs pair join
  * vs CC rounds vs convergence guard). Usage:
  * Test/runMain graft.CcStageProbe [sfDir]. */
object CcStageProbe {
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
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[ccstage] $label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2fs")
      r
    }
    // warm the table footers so stage 1 isn't charged file-open cost
    Tables.t(spark, sfDir, "documents").count()

    val tok = Tables.t(spark, sfDir, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .distinct()
    time("tok distinct count")(tok.count())
    val dfreq = tok.groupBy(col("w")).agg(count(lit(1)).as("df"))
    time("vocab gate")(dfreq.limit(63).count())
    val dict = dfreq.select(col("w"),
      (row_number().over(Window.orderBy("df", "w")) - 1).as("grank"))
    val bd = tok.join(dict, "w")
      .groupBy(col("doc_id"))
      .agg(expr("bit_or(shiftleft(1L, grank))").as("m"))
      .withColumn("c", expr("bit_count(m)"))
      .localCheckpoint(false)
    time("bitset substrate (pin)")(bd.count())
    val uniq = bd.where(col("m") =!= 0)
      .groupBy(col("m"))
      .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n"))
      .withColumn("c", expr("bit_count(m)"))
      .localCheckpoint(false)
    val nUniq = time("mask quotient (pin)")(uniq.count())
    val tau = 90
    def bits(docs: DataFrame, lim: String) =
      docs.select(col("doc_id"), col("m"), col("c"),
        explode(expr("filter(sequence(0, 61), g -> " +
          "(m & shiftleft(1L, g)) != 0 AND " +
          s"bit_count(m & (shiftleft(1L, g) - 1)) < $lim)")).as("g"))
    val pfx = bits(uniq, s"c - ($tau * c + 99) div 100 + 1")
    val x = pfx.select(col("doc_id").as("da"), col("m").as("ma"),
      col("c").as("ca"), col("g"))
    val y = pfx.select(col("doc_id").as("db"), col("m").as("mb"),
      col("c").as("cb"), col("g").as("gy"))
    val repPairs = x.join(y, col("g") === col("gy") &&
      col("da") < col("db") &&
      lit(100) * col("ca") >= lit(tau) * col("cb") &&
      lit(100) * col("cb") >= lit(tau) * col("ca") &&
      expr("shiftleft(1L, g) = ((ma & mb) & -(ma & mb))") &&
      expr(s"(100 + $tau) * bit_count(ma & mb) >= $tau * (ca + cb)"))
    val nPairs = time("rep pair join")(repPairs.count())
    println(s"[ccstage] uniq=$nUniq repPairs=$nPairs")
    val ccU = time("clusterCC unchecked e2e")(
      operators.TextSimOps.clusterCC(spark, sfDir, 6).count())
    val ccC = time("clusterCC checked e2e")(
      operators.TextSimOps.clusterCC(spark, sfDir, 6, checked = true)
        .count())
    println(s"[ccstage] cc rows unchecked=$ccU checked=$ccC")
    spark.stop()
  }
}
