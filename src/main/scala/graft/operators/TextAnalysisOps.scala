package graft.operators

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._

/** Text-analysis operators (driver north star): quality scoring,
  * corpus-profile language ID, SimHash, rolling-hash fingerprints.
  *
  * Scale notes: everything is explode + 2-phase hash agg or per-row
  * codegen'd expressions; the language-ID profile (top-10 tokens per
  * lang) is vocabulary-sized and broadcast.
  */
object TextAnalysisOps {
  private val Stops = Seq("a", "the", "of", "and", "to", "in")

  /** token md5 → top-60-bit integer, identically derivable in DuckDB via
    * CAST(concat('0x', substr(md5(w),1,15)) AS BIGINT). */
  private def tokenHash(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  val queries: Map[String, QFn] = Map(
    "text_quality" -> ((s: SparkSession, d: String) => {
      val withToks = t(s, d, "documents")
        .withColumn("toks", split(col("text"), " "))
        .withColumn("n_tokens", size(col("toks")))
        .withColumn("alpha_raw",
          length(regexp_replace(col("text"), "[^a-z]", "")).cast("double") /
            col("n_chars"))
        .withColumn("stop_raw",
          size(filter(col("toks"), w => w.isInCollection(Stops)))
            .cast("double") / col("n_tokens"))
      withToks.select(
        col("doc_id"), col("n_tokens"),
        round6((col("n_chars") - (col("n_tokens") - 1)).cast("double") /
          col("n_tokens")).as("avg_tok_len"),
        round6(col("alpha_raw")).as("alpha_ratio"),
        round6(col("stop_raw")).as("stop_ratio"),
        round6(lit(0.5) * col("alpha_raw") +
          lit(0.5) * (lit(1.0) - col("stop_raw"))).as("quality"))
        .orderBy("doc_id")
    }),

    // Token counting two ways (north star): whitespace split and a
    // BPE-ish regex segmentation (letter runs / digit runs / punct runs —
    // the GPT-2 pre-tokenizer shape, ASCII-simplified so both engines'
    // regex dialects agree exactly).
    "text_token_count" -> ((s: SparkSession, d: String) =>
      t(s, d, "documents").select(
        col("doc_id"),
        size(split(col("text"), " ")).as("ws_tokens"),
        size(regexp_extract_all(col("text"),
          lit("[a-z]+|[0-9]+|[^a-z0-9 ]+"), lit(0))).as("bpe_tokens"))
        .orderBy("doc_id")),

    // Language ID against corpus-derived profiles: top-10 tokens per lang
    // (by frequency, token tie-break); prediction = argmax profile overlap
    // over a doc's distinct tokens, lang tie-break. Deterministic, and a
    // faithful miniature of n-gram-profile LID (Cavnar-Trenkle shape).
    "text_langid" -> ((s: SparkSession, d: String) => {
      val docs = t(s, d, "documents")
      val tok = docs.select(col("doc_id"), col("lang"),
        explode(split(col("text"), " ")).as("w"))
      val prof = tok.groupBy(col("lang"), col("w"))
        .agg(count(lit(1)).as("cnt"))
        .withColumn("rn", row_number().over(
          Window.partitionBy("lang").orderBy(col("cnt").desc, col("w"))))
        .where(col("rn") <= 10)
        .select(col("lang").as("plang"), col("w"))
      val dtok = docs.select(col("doc_id"),
        explode(split(col("text"), " ")).as("w")).distinct()
      dtok.join(broadcast(prof), "w")
        .groupBy(col("doc_id"), col("plang"))
        .agg(count(lit(1)).as("score"))
        .withColumn("rn", row_number().over(
          Window.partitionBy("doc_id").orderBy(col("score").desc, col("plang"))))
        .where(col("rn") === 1)
        .select(col("doc_id"), col("plang").as("pred_lang"), col("score"))
        .orderBy("doc_id")
    }),

    // 60-bit SimHash over md5-derived token bits, weighted by term count.
    "text_simhash" -> ((s: SparkSession, d: String) => {
      val tok = t(s, d, "documents")
        .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
        .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("cnt"))
        .withColumn("h", tokenHash(col("w")))
      tok.select(col("doc_id"), col("cnt"), col("h"),
        explode(sequence(lit(0), lit(59))).as("i"))
        .groupBy(col("doc_id"), col("i"))
        .agg(sum(col("cnt") *
          (expr("(shiftright(h, i) & 1)") * 2 - 1)).as("wsum"))
        .groupBy(col("doc_id"))
        .agg(sum(expr("if(wsum > 0, shiftleft(cast(1 as bigint), i), " +
          "cast(0 as bigint))")).as("fp"))
        .orderBy("doc_id")
    }),

    // ⊘ rolling-hash fingerprints via the codegen'd ShingleHash64
    // expression — no SQL oracle (iterative hash), ExtOpsSpec-verified.
    "text_fingerprint" -> ((s: SparkSession, d: String) => {
      import org.apache.spark.sql.GraftBridge
      def sh(c: Column, k: Int): Column =
        GraftBridge.column(
          graft.functions.ShingleHash64(GraftBridge.expression(c), k))
      t(s, d, "documents").select(
        col("doc_id"),
        sh(col("text"), 0).as("fp_full"),
        sh(col("text"), 8).as("fp_min8"))
        .orderBy("doc_id")
    }))

  private[operators] val alphaSql =
    "CAST(length(regexp_replace(text, '[^a-z]', '', 'g')) AS DOUBLE) / n_chars"
  private[operators] val stopSql =
    "CAST(len(list_filter(string_split(text, ' '), w -> list_contains(" +
      Stops.mkString("['", "', '", "']") + ", w))) AS DOUBLE) / " +
      "len(string_split(text, ' '))"

  /** The text_quality composite score as a reusable Column (identical
    * arithmetic to the `text_quality` key; PipelineOps reuses it). */
  private[operators] def qualityCol: Column = {
    val toks = split(col("text"), " ")
    val alpha = length(regexp_replace(col("text"), "[^a-z]", ""))
      .cast("double") / col("n_chars")
    val stop = size(filter(toks, w => w.isInCollection(Stops)))
      .cast("double") / size(toks)
    round6(lit(0.5) * alpha + lit(0.5) * (lit(1.0) - stop))
  }

  /** Oracle-side mirror of [[qualityCol]]. */
  private[operators] val qualitySql: String =
    oRound6(s"0.5 * ($alphaSql) + 0.5 * (1.0 - ($stopSql))")

  val oracle: Map[String, String] = Map(
    "text_quality" ->
      ("SELECT doc_id, CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens, " +
        oRound6("CAST(n_chars - (len(string_split(text, ' ')) - 1) AS DOUBLE) " +
          "/ len(string_split(text, ' '))") + " AS avg_tok_len, " +
        oRound6(alphaSql) + " AS alpha_ratio, " +
        oRound6(stopSql) + " AS stop_ratio, " +
        oRound6(s"0.5 * ($alphaSql) + 0.5 * (1.0 - ($stopSql))") + " AS quality " +
        "FROM documents ORDER BY doc_id"),
    "text_token_count" ->
      ("SELECT doc_id, CAST(len(string_split(text, ' ')) AS INTEGER) AS ws_tokens, " +
        "CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]+')) AS INTEGER) " +
        "AS bpe_tokens FROM documents ORDER BY doc_id"),
    "text_langid" ->
      ("WITH tok AS (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w " +
        "FROM documents), " +
        "pc AS (SELECT lang, w, count(*) AS cnt FROM tok GROUP BY 1, 2), " +
        "prof AS (SELECT lang AS plang, w FROM (SELECT *, row_number() OVER " +
        "(PARTITION BY lang ORDER BY cnt DESC, w) AS rn FROM pc) WHERE rn <= 10), " +
        "dtok AS (SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS w " +
        "FROM documents), " +
        "sc AS (SELECT doc_id, plang, count(*) AS score FROM dtok " +
        "JOIN prof USING (w) GROUP BY 1, 2) " +
        "SELECT doc_id, plang AS pred_lang, score FROM (SELECT *, row_number() " +
        "OVER (PARTITION BY doc_id ORDER BY score DESC, plang) AS rn FROM sc) " +
        "WHERE rn = 1 ORDER BY doc_id"),
    "text_simhash" ->
      ("WITH tok AS (SELECT doc_id, w, count(*) AS cnt FROM (SELECT doc_id, " +
        "unnest(string_split(text, ' ')) AS w FROM documents) GROUP BY 1, 2), " +
        "th AS (SELECT doc_id, cnt, CAST(concat('0x', substr(md5(w), 1, 15)) " +
        "AS BIGINT) AS h FROM tok), " +
        "bits AS (SELECT doc_id, i, sum(cnt * (2 * ((h >> i) & 1) - 1)) AS wsum " +
        "FROM th, (SELECT unnest(range(0, 60)) AS i) ii GROUP BY 1, 2) " +
        "SELECT doc_id, CAST(sum(CASE WHEN wsum > 0 THEN (CAST(1 AS BIGINT) << i) " +
        "ELSE 0 END) AS BIGINT) AS fp FROM bits GROUP BY doc_id ORDER BY doc_id"))
}
