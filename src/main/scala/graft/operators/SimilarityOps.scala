package graft.operators

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Embedding-similarity operators beyond brute-force kNN (driver north
  * star): cosine near-dup pairs and a random-hyperplane LSH-bucketed ANN —
  * the scale path where brute force stops being an option.
  *
  * Scale notes: `dedup_embed` is an O(N²) codegen'd pass — acceptable to
  * ~10⁵ vectors per group; beyond that `knn_ann_srp`'s bucketing bounds
  * candidates (each table splits the corpus 2⁴ ways; probing 8 tables
  * touches ~N/2 candidates here, and the bits/tables knobs trade recall
  * for cost — at 100 TB the bucket id becomes the shuffle/bucketing key
  * so each query touches a handful of partitions, an IVF-style layout).
  */
object SimilarityOps {
  private def dot(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.column(graft.functions.DotProductF32(
      GraftBridge.expression(a), GraftBridge.expression(b)))
  }

  /** Deterministic random hyperplanes: 8 tables × 4 bits, seeded. */
  private lazy val planes: IndexedSeq[IndexedSeq[Array[Float]]] = {
    val rnd = new scala.util.Random(42L)
    IndexedSeq.fill(8)(IndexedSeq.fill(4)(
      Array.fill(64)((rnd.nextDouble() * 2 - 1).toFloat)))
  }

  private def bucket(v: Column, table: Int): Column =
    (0 until 4).map { j =>
      when(dot(v, typedLit(planes(table)(j))) > 0, lit(1 << j)).otherwise(lit(0))
    }.reduce(_ + _)

  /** IVF coarse quantizer: nlist seeded unit-norm centroid directions.
    * Data-independent so cell assignment is a pure map-side expression
    * (no training pass, no collect, no shuffle) and bit-deterministic
    * across runs and partitionings. */
  private val IvfNlist = 16
  private val IvfNprobe = 6
  private lazy val ivfCentroids: IndexedSeq[Array[Float]] = {
    val rnd = new scala.util.Random(7L)
    IndexedSeq.fill(IvfNlist) {
      val v = Array.fill(64)(rnd.nextDouble() * 2 - 1)
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(x => (x / n).toFloat)
    }
  }

  /** Per-row array of the vector's dot with every centroid. */
  private def centroidDots(v: Column): Column =
    array(ivfCentroids.map(c => dot(v, typedLit(c))): _*)

  val queries: Map[String, QFn] = Map(
    "dedup_embed" -> ((s: SparkSession, d: String) => {
      val emb = t(s, d, "embeddings")
      val e1 = emb.select(col("vec_id").as("a"), col("embedding").as("ea"))
      val e2 = emb.select(col("vec_id").as("b"), col("embedding").as("eb"))
      e1.join(e2, col("a") < col("b"))
        .select(col("a"), col("b"), round6(dot(col("ea"), col("eb"))).as("cos"))
        .where(col("cos") >= 0.3)
        .orderBy("a", "b")
    }),

    // ⊘ approximate ANN, IVF layout — no oracle; recall vs knn_cosine in
    // ExtOpsSpec. Each vector is assigned to its nearest of nlist=16
    // centroids (argmax of dot, first index on ties — deterministic); the
    // query probes its nprobe=6 best cells and brute-forces only those.
    // 100 TB path: `cell` is the write-time partition/bucket key, so a
    // probe is partition pruning — the scan touches nprobe/nlist of the
    // corpus; assignment itself is embarrassingly parallel map-side work
    // against literal (broadcast) centroids with zero shuffle.
    "knn_ivf" -> ((s: SparkSession, d: String) => {
      val emb = t(s, d, "embeddings")
      val cells = emb
        .withColumn("cds", centroidDots(col("embedding")))
        .withColumn("cell", expr("array_position(cds, array_max(cds))"))
      val q = cells.where(col("vec_id") === 0)
        .select(col("embedding").as("qe"), col("cds").as("qds"))
      // candidate iff the query ranks this vector's cell within its top
      // nprobe centroids: fewer than nprobe of the query's centroid dots
      // strictly beat the dot to this cell's centroid
      cells.where(col("vec_id") =!= 0)
        .crossJoin(broadcast(q))
        .where(size(filter(col("qds"),
          x => x > element_at(col("qds"), col("cell").cast("int"))))
          < IvfNprobe)
        .select(col("vec_id"),
          round6(dot(col("embedding"), col("qe"))).as("cos"))
        .orderBy(col("cos").desc, col("vec_id")).limit(10)
    }),

    // ⊘ approximate ANN — no oracle; recall vs knn_cosine in ExtOpsSpec.
    "knn_ann_srp" -> ((s: SparkSession, d: String) => {
      val emb = t(s, d, "embeddings")
      val bucketed = (0 until 8).foldLeft(emb) { (df, ti) =>
        df.withColumn(s"b$ti", bucket(col("embedding"), ti))
      }
      val q = bucketed.where(col("vec_id") === 0)
        .select(col("embedding").as("qe") +:
          (0 until 8).map(ti => col(s"b$ti").as(s"qb$ti")): _*)
      val sameBucket = (0 until 8)
        .map(ti => col(s"b$ti") === col(s"qb$ti"))
        .reduce(_ || _)
      bucketed.where(col("vec_id") =!= 0)
        .crossJoin(broadcast(q))
        .where(sameBucket)
        .select(col("vec_id"),
          round6(dot(col("embedding"), col("qe"))).as("cos"))
        .orderBy(col("cos").desc, col("vec_id")).limit(10)
    }))

  private def oDot(a: String, b: String): String =
    s"list_sum(list_transform(range(1, len($a) + 1), " +
      s"i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)))"

  val oracle: Map[String, String] = Map(
    "dedup_embed" ->
      ("SELECT a.vec_id AS a, b.vec_id AS b, " +
        oRound6(oDot("a.embedding", "b.embedding")) + " AS cos " +
        "FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id " +
        "WHERE " + oRound6(oDot("a.embedding", "b.embedding")) + " >= 0.3 " +
        "ORDER BY a, b"))
}
