package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool (r15, VERDICT r14 #4): scaling ladder for the similarity
  * shelf's two biggest keys — `sim_containment_pairs` (3.0-3.7 s at
  * sf0.1) and `sim_ngram_jaccard` (3.5-4.4 s) — in the §12.1 regime:
  * k× documents corpora with per-copy token SUFFIXING (w → w_cJ), so
  * copies share no vocabulary and every cross-copy pair dies at both
  * keys' τ=95 gates in BOTH directions (containment is asymmetric —
  * the first cut of this probe appended tokens instead, which leaves
  * base→superset containment at 100% and the output superlinear).
  * Within-copy pairs replicate the base corpus exactly (suffixing is
  * a vocabulary bijection), so qualifying pairs grow exactly k× while
  * the pair space grows k²× — the regime that separates a
  * candidate-bound plan (linear) from a pair-space-bound one
  * (quadratic). `spark.graft.sim.forceGeneral=true` for EVERY rung
  * (k=1 included): the suffixed vocabulary leaves the ≤62-token
  * bitset dictionary by k=3 anyway, and one dispatch arm per curve is
  * the point — the closed/bitset arm's ladder is DESIGN §12.
  * Shuffle-write bytes (task-metrics listener, §12.1) are the scale
  * signal; wall at these sizes is latency-dominated.
  * Usage: SimScaleProbe [baseSfDir] [outRoot]. */
object SimScaleProbe {
  def main(args: Array[String]): Unit = {
    val base = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val outRoot = if (args.length > 1) args(1) else "/tmp/graft_sim_scale"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.graft.sim.forceGeneral", "true")
    @volatile var write = 0L
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) write += m.shuffleWriteMetrics.bytesWritten
      }
    })
    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val r = f
      val dt = (System.nanoTime() - t0) / 1e9
      // listener bus is async — drain before snapshotting byte counters
      Thread.sleep(500)
      (r, dt)
    }
    val docs = Tables.t(spark, base, "documents")
    val baseCols = docs.columns
    val baseN = docs.count()
    ProbeScratch.runWith(outRoot) {
      for (k <- Seq(1, 2, 4, 8)) {
        val dir = s"$outRoot/x$k"
        (0 until k).map { j =>
          if (j == 0) docs
          else docs
            .withColumn("doc_id", col("doc_id") + lit(j * 10000000L))
            .withColumn("text", array_join(
              transform(split(col("text"), " "),
                w => concat(w, lit(s"_c$j"))), " "))
            .select(baseCols.map(col): _*)
        }.reduce(_ union _).coalesce(4)
          .write.mode("overwrite").parquet(s"$dir/documents.parquet")
        val pinsBefore = spark.sparkContext.getPersistentRDDs.keySet
        for (key <- Seq("sim_containment_pairs", "sim_ngram_jaccard")) {
          // fresh frame per timed draw (shuffle reuse on a shared
          // DataFrame object would fake a repeat)
          Thread.sleep(500); write = 0L
          val (n, t) = time(
            SparkEntry.queries(key)(spark, dir)
              .queryExecution.toRdd.count())
          println(f"[simscale] k=$k%d docs=${baseN * k}%6d $key%-24s " +
            f"rows=$n%9d wall=$t%7.2fs shuffle=${write / 1048576.0}%8.1f MiB")
        }
        // targeted rung sweep (Bench/KnnScaleProbe pattern): release
        // only this rung's pins, never a hoisted shared one
        spark.sparkContext.getPersistentRDDs.foreach { case (id, rdd) =>
          if (!pinsBefore.contains(id)) rdd.unpersist(blocking = true)
        }
        System.gc()
      }
    }
    spark.stop()
  }
}
