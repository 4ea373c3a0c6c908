package graft.operators

import org.apache.spark.sql.{Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables._

/** Multimodal-column plumbing (driver north star): opaque `binary` blobs +
  * a typed metadata struct, processed by a per-partition decode stage.
  *
  * The real decode/feature-extract/resize/frame-sample kernels for
  * image/audio/video need native libraries that are NOT in this container
  * (SURVEY §0 env table), so the kernel here is a deterministic stand-in
  * (leading-byte checksum) — but every piece of Spark plumbing around it
  * is real and oracle-verified: the binary encode, the metadata struct,
  * the `mapPartitions` batch iteration with an explicit output row
  * encoder (the Scala analog of mapInPandas: schema declared up front,
  * batches streamed per partition, no driver collection), and the
  * downstream ordering. Swapping the checksum for a JNI image decoder
  * changes one function body, not the pipeline.
  *
  * Scale notes: mapPartitions preserves partitioning (no shuffle); at
  * 100 TB the blobs column stays off the shuffle path entirely — only
  * the extracted features (a few scalars per row) flow onward.
  */
object MultimodalOps {
  private val outSchema = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("head_sum", LongType, nullable = false),
    StructField("lang", StringType, nullable = false)))

  private val FrameBytes = 16
  private val SampleEvery = 4
  private val frameSchema = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("frame_idx", LongType, nullable = false),
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("checksum", LongType, nullable = false)))

  val queries: Map[String, QFn] = Map(
    "mm_binary_stats" -> ((s: SparkSession, d: String) => {
      val bin = t(s, d, "documents").select(
        col("doc_id"),
        encode(col("text"), "UTF-8").as("blob"),
        struct(col("lang"), col("source"), col("n_chars")).as("meta"))
      val decoded = bin.mapPartitions { it =>
        it.map { r =>
          val blob = r.getAs[Array[Byte]](1)
          val meta = r.getStruct(2)
          // --- decode kernel stub: real image/audio decode goes here ---
          var sum = 0L
          var i = 0
          val n = math.min(8, blob.length)
          while (i < n) { sum += blob(i) & 0xff; i += 1 }
          // -------------------------------------------------------------
          Row(r.getLong(0), blob.length, sum, meta.getString(0))
        }
      }(Encoders.row(outSchema))
      decoded.orderBy("doc_id")
    }),

    // Frame sampling: the 1→N batch shape (vs mm_binary_stats' 1→1) —
    // treat the blob as a fixed-frame-size stream, keep every 4th frame,
    // emit one feature row per sampled frame. A real video pipeline swaps
    // the checksum for a frame decoder; the iterator discipline (flatMap
    // per partition, no materialized per-doc collection, blob never on
    // the shuffle path) is what carries to 100 TB.
    "mm_frame_sample" -> ((s: SparkSession, d: String) => {
      val bin = t(s, d, "documents").select(
        col("doc_id"), encode(col("text"), "UTF-8").as("blob"))
      val sampled = bin.mapPartitions { it =>
        it.flatMap { r =>
          val docId = r.getLong(0)
          val blob = r.getAs[Array[Byte]](1)
          val nFrames = (blob.length + FrameBytes - 1) / FrameBytes
          (0 until nFrames).iterator
            .filter(_ % SampleEvery == 0)
            .map { fi =>
              val start = fi * FrameBytes
              val end = math.min(start + FrameBytes, blob.length)
              // --- frame kernel stub: real decode/resize goes here ---
              var sum = 0L
              var i = start
              while (i < end) { sum += blob(i) & 0xff; i += 1 }
              // -------------------------------------------------------
              Row(docId, fi.toLong, end - start, sum)
            }
        }
      }(Encoders.row(frameSchema))
      sampled.orderBy("doc_id", "frame_idx")
    }),

    // Frame-level content dedup across the whole corpus — the video/image
    // analog of exact text dedup: fingerprint every fixed-size frame,
    // keep the FIRST occurrence (global (doc_id, frame_idx) order) of
    // each distinct frame, report per-document how many of its frames
    // were duplicates of an earlier one. Frames here are character
    // slices (the decode kernel is the documented stand-in); the dedup
    // plumbing is the real thing: fingerprints — never frame payloads —
    // cross the one shuffle (window keyed by the frame hash), and the
    // per-doc rollup is a second, doc-keyed agg. At 100 TB the md5
    // becomes a perceptual hash and nothing else changes.
    "mm_frame_dedup" -> ((s: SparkSession, d: String) => {
      import org.apache.spark.sql.expressions.Window
      val docs = t(s, d, "documents")
      val frames = docs.select(col("doc_id"), col("text"),
        explode(expr(
          s"CASE WHEN length(text) >= 1 THEN sequence(0, " +
            s"cast(ceil(length(text) / ${FrameBytes}.0) as int) - 1) " +
            "ELSE CAST(array() AS array<int>) END")).as("fi"))
        .select(col("doc_id"), col("fi").cast("long").as("fi"),
          md5(expr(s"substring(text, fi * $FrameBytes + 1, $FrameBytes)"))
            .as("h"))
      val rn = row_number().over(
        Window.partitionBy("h").orderBy("doc_id", "fi"))
      val per = frames.withColumn("rn", rn)
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_frames"),
          sum(when(col("rn") > 1, 1L).otherwise(0L)).cast("long")
            .as("dup_frames"))
      docs.select(col("doc_id"))
        .join(per, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_frames"), lit(0L)).as("n_frames"),
          coalesce(col("dup_frames"), lit(0L)).as("dup_frames"),
          round6(when(coalesce(col("n_frames"), lit(0L)) > 0,
            col("dup_frames").cast("double") / col("n_frames"))
            .otherwise(lit(0.0))).as("dup_frac"))
        .orderBy("doc_id")
    }))

  // head_sum oracle is byte-based to mirror the kernel exactly (DuckDB
  // can't substring a BLOB, so go through hex() and decode nibble pairs):
  // sums the first min(8, octet_length) UTF-8 bytes, 0 for empty text —
  // correct for non-ASCII and <8-char documents, not just the happy path.
  private val oHeadSum: String =
    "coalesce(list_sum(list_transform(" +
      "range(1, CAST(least(octet_length(encode(text)), 8) AS BIGINT) + 1), " +
      "j -> 16*(strpos('0123456789ABCDEF', " +
      "substr(hex(encode(text)), CAST(2*j-1 AS INTEGER), 1))-1) + " +
      "(strpos('0123456789ABCDEF', " +
      "substr(hex(encode(text)), CAST(2*j AS INTEGER), 1))-1))), 0)"

  // byte j (1-based) of the UTF-8 blob, via hex nibble decoding
  private def oByteAt(j: String): String =
    s"16*(strpos('0123456789ABCDEF', substr(hex(encode(text)), CAST(2*($j)-1 AS INTEGER), 1))-1)" +
      s" + (strpos('0123456789ABCDEF', substr(hex(encode(text)), CAST(2*($j) AS INTEGER), 1))-1)"

  val oracle: Map[String, String] = Map(
    "mm_binary_stats" ->
      ("SELECT doc_id, CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes, " +
        s"CAST($oHeadSum AS BIGINT) AS head_sum, lang " +
        "FROM documents ORDER BY doc_id"),
    "mm_frame_sample" ->
      ("SELECT doc_id, fi AS frame_idx, " +
        s"CAST(least($FrameBytes, octet_length(encode(text)) - $FrameBytes*fi) " +
        "AS INTEGER) AS n_bytes, " +
        "CAST(coalesce(list_sum(list_transform(" +
        s"range($FrameBytes*fi + 1, " +
        s"least($FrameBytes*fi + $FrameBytes, octet_length(encode(text))) + 1), " +
        s"j -> ${oByteAt("j")})), 0) AS BIGINT) AS checksum " +
        "FROM documents, LATERAL (SELECT unnest(range(0, " +
        s"CAST(ceil(octet_length(encode(text)) / $FrameBytes.0) AS BIGINT))) AS fi) u " +
        s"WHERE fi % $SampleEvery = 0 ORDER BY doc_id, frame_idx"),
    "mm_frame_dedup" -> oFrameDedup)

  private lazy val oFrameDedup: String =
    "WITH f AS (SELECT doc_id, fi, " +
      s"md5(substr(text, CAST(fi * $FrameBytes + 1 AS INTEGER), $FrameBytes)) AS h " +
      "FROM documents, LATERAL (SELECT unnest(range(0, " +
      s"CAST(ceil(length(text) / $FrameBytes.0) AS BIGINT))) AS fi) u), " +
      "r AS (SELECT doc_id, fi, row_number() OVER (PARTITION BY h " +
      "ORDER BY doc_id, fi) AS rn FROM f), " +
      "per AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_frames, " +
      "CAST(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT) AS dup_frames " +
      "FROM r GROUP BY 1) " +
      "SELECT d.doc_id, coalesce(n_frames, 0) AS n_frames, " +
      "coalesce(dup_frames, 0) AS dup_frames, " +
      oRound6("CASE WHEN coalesce(n_frames, 0) > 0 " +
        "THEN CAST(dup_frames AS DOUBLE) / n_frames ELSE 0.0 END") +
      " AS dup_frac " +
      "FROM documents d LEFT JOIN per USING (doc_id) ORDER BY doc_id"
}
