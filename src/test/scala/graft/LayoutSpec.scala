package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** The z-order layout EFFECT (the part SQL can't see — file boundaries):
  * writing `repartitionByRange(zval).sortWithinPartitions(zval)` must
  * bound every file's min/max extent in BOTH interleaved dimensions,
  * while a linear single-column sort leaves the other dimension's
  * per-file stats at full range. Extents are exactly what parquet
  * min/max stats expose to stats-based skipping, so "extent misses the
  * predicate range ⇒ file (and its row groups) never read" — the 100 TB
  * payoff this measures.
  *
  * Runs on a complete 256×256 synthetic grid (one row per (ub, tb)
  * cell) so the expected extents are deterministic arithmetic, not a
  * property of one corpus's value distribution: 16 range partitions fix
  * the top 4 z-bits = the top 2 bits of EACH dimension, so every file
  * spans ≤ 64 of the 256 values per dim.
  */
class LayoutSpec extends SparkTestBase {
  private val N = 16 // files

  private def extents(dir: String, c: String): Seq[(Int, Int)] =
    spark.read.parquet(dir)
      .groupBy(input_file_name())
      .agg(min(col(c)).as("lo"), max(col(c)).as("hi"))
      .collect().map(r => (r.getInt(1), r.getInt(2))).toSeq

  private def overlapping(ext: Seq[(Int, Int)], lo: Int, hi: Int): Int =
    ext.count { case (l, h) => l <= hi && h >= lo }

  test("z-order write bounds per-file extents in both dims; linear sort does not") {
    val grid = spark.range(256L * 256L).select(
      (col("id") % 256).cast("int").as("ub"),
      (col("id") / 256).cast("int").as("tb"))
    val z = grid.withColumn("zv",
      graft.operators.LayoutOps.zval(col("ub"), col("tb")).cast("int"))

    val zDir = Files.createTempDirectory("graft_zorder_").toString + "/t"
    z.repartitionByRange(N, col("zv")).sortWithinPartitions("zv")
      .write.parquet(zDir)
    val linDir = Files.createTempDirectory("graft_linear_").toString + "/t"
    z.repartitionByRange(N, col("tb")).sortWithinPartitions("tb")
      .write.parquet(linDir)

    val zUb = extents(zDir, "ub")
    val zTb = extents(zDir, "tb")
    assert(zUb.size == N && zTb.size == N)
    // range-partition boundaries come from reservoir sampling, so the
    // exact 4-of-16 arithmetic can smear across a boundary file or two;
    // the property under test is "a slice query skips at least half the
    // files on EITHER dimension", which no sampling jitter can break
    assert(overlapping(zUb, 0, 63) <= N / 2,
      s"z layout: ub-slice query should skip at least half the files, " +
        s"overlapped ${overlapping(zUb, 0, 63)}/$N")
    assert(overlapping(zTb, 0, 63) <= N / 2,
      s"z layout: tb-slice query should skip at least half the files, " +
        s"overlapped ${overlapping(zTb, 0, 63)}/$N")

    val lUb = extents(linDir, "ub")
    val lTb = extents(linDir, "tb")
    // the linear layout is perfect on its sort column...
    assert(overlapping(lTb, 0, 63) <= N / 2)
    // ...and useless on the other dimension: every file spans all of ub
    assert(overlapping(lUb, 0, 63) == lUb.size,
      "linear tb-sort unexpectedly bounded ub extents")

    // and the z-value itself never collides two grid cells (bijective
    // on Bits-bit inputs), so the layout loses no ordering information
    assert(z.select(countDistinct(col("zv"))).head.getLong(0) == 256L * 256L)
  }
}
