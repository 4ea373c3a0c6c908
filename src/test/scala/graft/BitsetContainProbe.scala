package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: stage-by-stage steady-state timing of the bitset
  * sim_containment_pairs plan at sf0.1 (VERDICT r11 #2 — the key
  * drifted from r10's 2.83 s to ~4–5 s steady with no change to its
  * own body, so the cost moved inside the shared substrate/tail).
  * Stages, each timed over `reps` runs after a warmup:
  *   substrate  — tokenize+distinct → masks (bd), quotient (uniq, grp)
  *   reppairs   — bitsetContainmentPairs over the quotient
  *   expand     — member expansion, NO final sort
  *   full       — the shipped shape (expansion → orderBy)
  *   pinsort    — expansion pinned, THEN orderBy (sort sampling reads
  *                blocks instead of re-running the tail)
  */
object BitsetContainProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 3
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
    import Tables.PinSyntax
    def tok: DataFrame = Tables.t(spark, sfDir, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .distinct()
    def time(name: String)(f: => Long): Unit = (1 to reps).foreach { i =>
      System.gc()
      val t0 = System.nanoTime()
      val n = f
      println(f"[bcprobe] $name%-12s r$i ${(System.nanoTime() - t0) / 1e9}%6.2fs rows=$n")
    }
    time("substrate") {
      val bd = operators.TextSimOps.bitsetDocs(tok).get.pinned
      val uniq = operators.TextSimOps.maskUniq(bd).pinned
      operators.TextSimOps.maskMembers(bd, uniq)
        .queryExecution.toRdd.count()
    }
    def parts(): (DataFrame, DataFrame) = {
      val bd = operators.TextSimOps.bitsetDocs(tok).get.pinned
      val uniq = operators.TextSimOps.maskUniq(bd).pinned
      (uniq, operators.TextSimOps.maskMembers(bd, uniq))
    }
    time("reppairs") {
      val (uniq, _) = parts()
      operators.TextSimOps.bitsetContainmentPairs(uniq, tau)
        .queryExecution.toRdd.count()
    }
    time("expand") {
      val (uniq, grp) = parts()
      operators.TextSimOps.expandContainment(
          operators.TextSimOps.bitsetContainmentPairs(uniq, tau), grp)
        .queryExecution.toRdd.count()
    }
    time("full") {
      val (uniq, grp) = parts()
      operators.TextSimOps.expandContainment(
          operators.TextSimOps.bitsetContainmentPairs(uniq, tau), grp)
        .orderBy("da", "db")
        .queryExecution.toRdd.count()
    }
    time("pinsort") {
      val (uniq, grp) = parts()
      operators.TextSimOps.expandContainment(
          operators.TextSimOps.bitsetContainmentPairs(uniq, tau), grp)
        .pinned
        .orderBy("da", "db")
        .queryExecution.toRdd.count()
    }
    // intermediate sizes for the pre-expansion-exchange variant
    locally {
      val (uniq, grp) = parts()
      val rp = operators.TextSimOps.bitsetContainmentPairs(uniq, tau)
      val daX = rp.join(grp.select(col("rep").as("da"),
        col("doc_id").as("xa")), "da")
      println(s"[bcprobe] sizes rp=${rp.count()} daX=${daX.count()} " +
        s"grp=${grp.count()}")
    }
    // variant: exchange BEFORE the db-side blowup; broadcast expansion
    // preserves the range partitioning; sortWithinPartitions finishes
    // the total (da, db) order with no 4.6M-row exchange
    time("preexch") {
      val (uniq, grp) = parts()
      val rp = operators.TextSimOps.bitsetContainmentPairs(uniq, tau)
        .pinned
      val daX = rp
        .join(grp.select(col("rep").as("da"), col("doc_id").as("xa")), "da")
        .select(col("xa").as("da"), col("db").as("rb"),
          lit(null).cast("long").as("dbc"), col("inter"), col("ca"))
      val intra = grp.select(col("rep"), col("doc_id").as("xa"), col("c"))
        .join(grp.select(col("rep"), col("doc_id").as("xb")), "rep")
        .where(col("xa") =!= col("xb"))
        .select(col("xa").as("da"), lit(null).cast("long").as("rb"),
          col("xb").as("dbc"), col("c").as("inter"), col("c").as("ca"))
      daX.union(intra)
        .repartitionByRange(col("da"))
        .join(grp.select(col("rep").as("rb2"), col("doc_id").as("xb")),
          col("rb") === col("rb2"), "left")
        .select(col("da"), coalesce(col("dbc"), col("xb")).as("db"),
          col("inter"), col("ca"))
        .sortWithinPartitions("da", "db")
        .queryExecution.toRdd.count()
    }
    // variant: attach member ARRAYS before the exchange — every join is
    // upstream of repartitionByRange, so order holds regardless of join
    // strategy; explode + sortWithinPartitions are narrow
    time("arrexch") {
      val (uniq, grp) = parts()
      val mem = grp.groupBy(col("rep"))
        .agg(sort_array(collect_list(col("doc_id"))).as("ms"))
      val rp = operators.TextSimOps.bitsetContainmentPairs(uniq, tau)
      val cross = rp
        .join(grp.select(col("rep").as("da"), col("doc_id").as("xa")), "da")
        .join(mem.select(col("rep").as("db"), col("ms")), "db")
        .select(col("xa").as("da"), col("ms"), col("inter"), col("ca"))
      val intra = grp
        .join(mem, "rep")
        .select(col("doc_id").as("da"),
          array_remove(col("ms"), col("doc_id")).as("ms"),
          col("c").as("inter"), col("c").as("ca"))
      cross.union(intra)
        .repartitionByRange(col("da"))
        .select(col("da"), explode(col("ms")).as("db"),
          col("inter"), col("ca"))
        .sortWithinPartitions("da", "db")
        .queryExecution.toRdd.count()
    }
    // order equality: shipped orderBy form vs pre-exchange form, row by row
    locally {
      val (uniq, grp) = parts()
      val a = operators.TextSimOps.expandContainment(
          operators.TextSimOps.bitsetContainmentPairs(uniq, tau), grp)
        .orderBy("da", "db")
        .select(col("da"), col("db"), col("inter"), col("ca"))
      val rp = operators.TextSimOps.bitsetContainmentPairs(uniq, tau)
        .pinned
      val daX = rp
        .join(grp.select(col("rep").as("da"), col("doc_id").as("xa")), "da")
        .select(col("xa").as("da"), col("db").as("rb"),
          lit(null).cast("long").as("dbc"), col("inter"), col("ca"))
      val intra = grp.select(col("rep"), col("doc_id").as("xa"), col("c"))
        .join(grp.select(col("rep"), col("doc_id").as("xb")), "rep")
        .where(col("xa") =!= col("xb"))
        .select(col("xa").as("da"), lit(null).cast("long").as("rb"),
          col("xb").as("dbc"), col("c").as("inter"), col("c").as("ca"))
      val b = daX.union(intra)
        .repartitionByRange(col("da"))
        .join(grp.select(col("rep").as("rb2"), col("doc_id").as("xb")),
          col("rb") === col("rb2"), "left")
        .select(col("da"), coalesce(col("dbc"), col("xb")).as("db"),
          col("inter"), col("ca"))
        .sortWithinPartitions("da", "db")
      val ra = a.rdd.zipWithIndex().map(_.swap)
      val rb2 = b.rdd.zipWithIndex().map(_.swap)
      val diff = ra.fullOuterJoin(rb2)
        .filter { case (_, (x, y)) => x != y }.count()
      println(s"[bcprobe] order-diff rows=$diff (0 = byte-identical order)")
    }
    spark.stop()
  }
}
