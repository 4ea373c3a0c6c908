package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables._

/** SURVEY §2.7 scalar function families (string / date / math / array /
  * json / map), one query per family, dialect-trap-aware (SURVEY §7.3.7):
  * DuckDB length/year/datediff return BIGINT (Spark INT) → mirrored casts;
  * DuckDB floor(double) stays DOUBLE (Spark → LONG) → CAST ... AS BIGINT;
  * array arithmetic is cast to DOUBLE element-wise before the fixed-order
  * sum so both engines do identical IEEE ops.
  */
object FnOps {
  val queries: Map[String, QFn] = Map(
    "fn_string" -> ((s: SparkSession, d: String) =>
      t(s, d, "part").select(
        col("p_partkey"),
        upper(col("p_name")).as("up"),
        lower(col("p_type")).as("lo"),
        substring(col("p_name"), 1, 5).as("sub"),
        length(col("p_name")).as("len"),
        expr("replace(p_name, ' ', '_')").as("rep"),
        lpad(col("p_brand"), 10, "0").as("pad"),
        split(col("p_name"), " ").getItem(0).as("first_word"),
        regexp_extract(col("p_name"), "([a-z]+)", 1).as("re"),
        trim(concat(lit("  "), col("p_brand"), lit("  "))).as("trm"),
        when(col("p_name").like("%red%"), 1).otherwise(0).as("likef"),
        concat(col("p_brand"), lit(":"), col("p_type")).as("cat"))
        .orderBy("p_partkey")),

    // Hash family — the fingerprinting/bucketing staple: md5 and
    // sha2-256 hex digests (engine-portable by definition), plus a
    // composite-key hash over a delimiter-joined column pair (the
    // surrogate-key recipe; the delimiter prevents ("ab","c")/("a","bc")
    // collisions). xxhash64 stays internal-only: DuckDB has no matching
    // surface, and the md5-derived paths (dedup_exact, sample_stratified)
    // already prove the cross-engine hash discipline.
    "fn_hash" -> ((s: SparkSession, d: String) =>
      t(s, d, "part").select(
        col("p_partkey"),
        md5(col("p_name")).as("h_md5"),
        sha2(col("p_name"), 256).as("h_sha256"),
        md5(concat_ws("|", col("p_brand"), col("p_type"))).as("h_comp"))
        .orderBy("p_partkey")),

    // URL family — the web-corpus curation staple (domain-level
    // filtering, per-site dedup, registered-domain rollups all start
    // here). URLs derived deterministically from the documents table
    // (corpus has no URL column), then parsed with Hive parse_url
    // semantics: protocol, host, path, one query param, plus the
    // registered domain (last two host labels via substring_index —
    // the eTLD+1 approximation a real pipeline backs with the public
    // suffix list). All per-row codegen'd string ops, no shuffle
    // beyond the output sort; the DuckDB mirror parses the SAME url
    // string with anchored regexes, so the compare exercises parsing,
    // not re-derivation from the inputs.
    "fn_url" -> ((s: SparkSession, d: String) => {
      val urlCol = concat(lit("https://"), col("lang"),
        pmod(col("doc_id"), lit(3)).cast("string"), lit("."),
        col("source"), lit(".org/"), col("lang"), lit("/doc/"),
        col("doc_id").cast("string"),
        lit("?ref="), pmod(col("doc_id"), lit(13)).cast("string"),
        lit("&v="), pmod(col("doc_id"), lit(7)).cast("string"))
      t(s, d, "documents")
        .withColumn("url", urlCol)
        .select(col("doc_id"), col("url"),
          expr("parse_url(url, 'PROTOCOL')").as("proto"),
          expr("parse_url(url, 'HOST')").as("host"),
          expr("parse_url(url, 'PATH')").as("path"),
          expr("parse_url(url, 'QUERY', 'ref')").as("q_ref"),
          substring_index(expr("parse_url(url, 'HOST')"), ".", -2)
            .as("domain"))
        .orderBy("doc_id")
    }),

    "fn_date" -> ((s: SparkSession, d: String) =>
      t(s, d, "orders").select(
        col("o_orderkey"),
        date_trunc("month", col("o_orderdate")).as("mon"),
        year(col("o_orderdate")).as("yr"),
        month(col("o_orderdate")).as("mo"),
        dayofmonth(col("o_orderdate")).as("dy"),
        date_add(col("o_orderdate").cast("date"), 30).as("plus30"),
        datediff(to_date(lit("1998-01-01")),
          col("o_orderdate").cast("date")).as("dd"),
        unix_micros(col("o_orderdate").cast("timestamp")).as("ep_us"))
        .orderBy("o_orderkey")),

    // Bitwise family — exact integer ops, engine-identical by
    // definition. (Dialect: DuckDB's ^ is POWER, so the oracle spells
    // xor(a,b); Spark SQL's ^ is the xor.)
    "fn_bitwise" -> ((s: SparkSession, d: String) =>
      t(s, d, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"),
        expr("l_orderkey & l_partkey").as("band"),
        expr("l_orderkey | l_suppkey").as("bor"),
        expr("l_orderkey ^ l_partkey").as("bxor"),
        expr("shiftleft(l_linenumber, 3)").as("shl"),
        expr("shiftright(l_partkey, 2)").as("shr"),
        expr("bit_count(l_orderkey)").as("bc"))
        .orderBy("l_orderkey", "l_linenumber", "band", "bor", "bxor",
          "shr")),

    "fn_math" -> ((s: SparkSession, d: String) =>
      t(s, d, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"),
        abs(col("l_discount") - 0.05).as("ab"),
        floor(col("l_extendedprice")).as("fl"),
        ceil(col("l_extendedprice")).as("ce"),
        round6(sqrt(col("l_quantity"))).as("sq"),
        round6(pow(col("l_quantity"), 2)).as("pw"),
        round6(log(col("l_extendedprice"))).as("ln1"),
        round6(log10(col("l_extendedprice"))).as("lg"),
        (col("l_orderkey") % 7).as("md"),
        signum(col("l_discount") - 0.05).cast("int").as("sg"),
        (floor(col("l_extendedprice") * 10 + lit(0.5)).cast("double") / 10)
          .as("rnd"))
        .orderBy("l_orderkey", "l_linenumber", "fl", "sq", "ab")),

    "fn_array" -> ((s: SparkSession, d: String) =>
      t(s, d, "embeddings").select(
        col("vec_id"),
        size(col("embedding")).as("n"),
        element_at(col("embedding"), 1).as("first"),
        array_min(col("embedding")).as("mn"),
        element_at(array_sort(col("embedding")), 2).as("sorted2"),
        round6(aggregate(
          transform(slice(col("embedding"), 1, 3), x => x.cast("double")),
          lit(0.0), (acc, x) => acc + x)).as("s3sum"),
        round6(aggregate(
          zip_with(col("embedding"), col("embedding"),
            (a, b) => a.cast("double") * b.cast("double")),
          lit(0.0), (acc, x) => acc + x)).as("dot_self"))
        .orderBy("vec_id")),

    "fn_json" -> ((s: SparkSession, d: String) =>
      events(s, d)
        .select(get_json_object(col("props"), "$.k").cast("long").as("k_val"),
          col("value"))
        .groupBy(col("k_val"))
        .agg(count(lit(1)).as("cnt"), sumDec(col("value")).as("sum_v"))
        .orderBy("k_val")),

    // Map build + explode; oracle sees the re-exploded sorted rows
    // (SURVEY §2.7: MAP-typed parquet outputs are interop-fragile).
    "fn_map" -> ((s: SparkSession, d: String) =>
      t(s, d, "events")
        .groupBy(col("user_id"), col("event_type"))
        .agg(count(lit(1)).as("cnt"))
        .groupBy(col("user_id"))
        .agg(map_from_entries(
          sort_array(collect_list(struct(col("event_type"), col("cnt")))))
          .as("m"))
        .select(col("user_id"), explode(col("m")).as(Seq("event_type", "cnt")))
        .orderBy("user_id", "event_type")))

  val oracle: Map[String, String] = Map(
    "fn_string" ->
      ("SELECT p_partkey, upper(p_name) AS up, lower(p_type) AS lo, " +
        "substr(p_name, 1, 5) AS sub, CAST(length(p_name) AS INTEGER) AS len, " +
        "replace(p_name, ' ', '_') AS rep, lpad(p_brand, 10, '0') AS pad, " +
        "string_split(p_name, ' ')[1] AS first_word, " +
        "regexp_extract(p_name, '([a-z]+)', 1) AS re, " +
        "trim('  ' || p_brand || '  ') AS trm, " +
        "CASE WHEN p_name LIKE '%red%' THEN 1 ELSE 0 END AS likef, " +
        "p_brand || ':' || p_type AS cat FROM part ORDER BY p_partkey"),
    "fn_hash" ->
      ("SELECT p_partkey, md5(p_name) AS h_md5, sha256(p_name) AS h_sha256, " +
        "md5(p_brand || '|' || p_type) AS h_comp " +
        "FROM part ORDER BY p_partkey"),
    "fn_url" ->
      ("WITH u AS (SELECT doc_id, 'https://' || lang || " +
        "CAST(doc_id % 3 AS VARCHAR) || '.' || source || '.org/' || " +
        "lang || '/doc/' || CAST(doc_id AS VARCHAR) || '?ref=' || " +
        "CAST(doc_id % 13 AS VARCHAR) || '&v=' || " +
        "CAST(doc_id % 7 AS VARCHAR) AS url FROM documents), " +
        "p AS (SELECT doc_id, url, " +
        "regexp_extract(url, '^([a-z]+)://', 1) AS proto, " +
        "regexp_extract(url, '^[a-z]+://([^/?#]+)', 1) AS host, " +
        "regexp_extract(url, '^[a-z]+://[^/?#]+([^?#]*)', 1) AS path, " +
        "regexp_extract(url, '[?&]ref=([^&#]*)', 1) AS q_ref FROM u) " +
        "SELECT doc_id, url, proto, host, path, q_ref, " +
        "regexp_extract(host, '[^.]+\\.[^.]+$', 0) AS domain " +
        "FROM p ORDER BY doc_id"),
    "fn_date" ->
      ("SELECT o_orderkey, CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS mon, " +
        "CAST(year(o_orderdate) AS INTEGER) AS yr, " +
        "CAST(month(o_orderdate) AS INTEGER) AS mo, " +
        "CAST(day(o_orderdate) AS INTEGER) AS dy, " +
        "CAST(o_orderdate AS DATE) + 30 AS plus30, " +
        "CAST(datediff('day', CAST(o_orderdate AS DATE), DATE '1998-01-01') AS INTEGER) AS dd, " +
        "epoch_us(o_orderdate) AS ep_us FROM orders ORDER BY o_orderkey"),
    "fn_bitwise" ->
      ("SELECT l_orderkey, l_linenumber, " +
        "CAST(l_orderkey & l_partkey AS BIGINT) AS band, " +
        "CAST(l_orderkey | l_suppkey AS BIGINT) AS bor, " +
        "CAST(xor(l_orderkey, l_partkey) AS BIGINT) AS bxor, " +
        "CAST(l_linenumber << 3 AS INTEGER) AS shl, " +
        "CAST(l_partkey >> 2 AS BIGINT) AS shr, " +
        "CAST(bit_count(l_orderkey) AS INTEGER) AS bc " +
        "FROM lineitem ORDER BY l_orderkey, l_linenumber, band, bor, " +
        "bxor, shr"),
    "fn_math" ->
      ("SELECT l_orderkey, l_linenumber, abs(l_discount - 0.05) AS ab, " +
        "CAST(floor(l_extendedprice) AS BIGINT) AS fl, " +
        "CAST(ceil(l_extendedprice) AS BIGINT) AS ce, " +
        oRound6("sqrt(l_quantity)") + " AS sq, " +
        oRound6("pow(l_quantity, 2)") + " AS pw, " +
        oRound6("ln(l_extendedprice)") + " AS ln1, " +
        oRound6("log10(l_extendedprice)") + " AS lg, " +
        "mod(l_orderkey, 7) AS md, " +
        "CAST(sign(l_discount - 0.05) AS INTEGER) AS sg, " +
        "floor(l_extendedprice * 10 + 0.5) / 10 AS rnd " +
        "FROM lineitem ORDER BY l_orderkey, l_linenumber, fl, sq, ab"),
    "fn_array" ->
      ("SELECT vec_id, CAST(len(embedding) AS INTEGER) AS n, " +
        "embedding[1] AS first, list_min(embedding) AS mn, " +
        "list_sort(embedding)[2] AS sorted2, " +
        oRound6("CAST(embedding[1] AS DOUBLE) + CAST(embedding[2] AS DOUBLE) + " +
        "CAST(embedding[3] AS DOUBLE)") + " AS s3sum, " +
        oRound6("list_sum(list_transform(range(1, len(embedding) + 1), " +
        "i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)))") +
        " AS dot_self " +
        "FROM embeddings ORDER BY vec_id"),
    "fn_json" ->
      ("SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val, " +
        "count(*) AS cnt, " + oSumDec("value") + " AS sum_v " +
        "FROM events GROUP BY 1 ORDER BY k_val"),
    "fn_map" ->
      ("SELECT user_id, event_type, count(*) AS cnt FROM events " +
        "GROUP BY user_id, event_type ORDER BY user_id, event_type"))
}
