"""SURVEY.md §2.7 — scalar function groups.

One declared query per group, exercising every member on testdata
columns. All functions are built-in `pyspark.sql.functions` (JVM-side,
whole-stage-codegen'd) — never Python UDFs — so they stay on the fast
path and push down where possible.

Oracle dialect notes: each DuckDB twin is hand-translated (SURVEY.md
§7 risk #2) — instr→strpos, initcap→manual, rlike→regexp_matches,
unix_timestamp→epoch, explode→unnest, get_json_object→json_extract.
Transcendental results (ln/log10) are rounded to 6dp: libm differences
are ~1 ulp (~1e-16 rel) against a 5e-7 grid half-step.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from configdrivendatapipeline_spark.queries import declare, load

_SEC = "2.7"


@declare(
    "fn_string",
    """
    SELECT doc_id,
           CONCAT(lang, ':', source) AS lang_src,
           SUBSTR(text, 1, 10) AS head10,
           UPPER(lang) AS lang_up,
           LOWER(source) AS src_lo,
           TRIM(CONCAT(' ', lang, ' ')) AS lang_trim,
           LPAD(CAST(doc_id AS VARCHAR), 8, '0') AS id_pad,
           RPAD(lang, 5, '_') AS lang_rpad,
           LENGTH(text) AS text_len,
           REPLACE(source, 'src', 'source-') AS src_long,
           UPPER(SUBSTR(lang, 1, 1)) || LOWER(SUBSTR(lang, 2)) AS lang_cap,
           STRPOS(text, 'data') AS data_pos,
           STRING_SPLIT(text, ' ')[1] AS first_word,
           REVERSE(lang) AS lang_rev
    FROM documents
    """,
    _SEC,
    "String functions: concat/substring/upper/lower/trim/lpad/rpad/"
    "length/replace/initcap/instr/split/reverse.",
)
def fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.concat("lang", F.lit(":"), "source").alias("lang_src"),
        F.substring("text", 1, 10).alias("head10"),
        F.upper("lang").alias("lang_up"),
        F.lower("source").alias("src_lo"),
        F.trim(F.concat(F.lit(" "), F.col("lang"), F.lit(" "))).alias("lang_trim"),
        F.lpad(F.col("doc_id").cast("string"), 8, "0").alias("id_pad"),
        F.rpad("lang", 5, "_").alias("lang_rpad"),
        F.length("text").cast("long").alias("text_len"),
        F.replace(F.col("source"), F.lit("src"), F.lit("source-")).alias("src_long"),
        F.initcap("lang").alias("lang_cap"),
        F.instr(F.col("text"), "data").cast("long").alias("data_pos"),
        F.split("text", " ").getItem(0).alias("first_word"),
        F.reverse("lang").alias("lang_rev"),
    )


@declare(
    "fn_regex",
    r"""
    SELECT doc_id,
           regexp_extract(source, '([0-9]+)', 1) AS src_digits,
           regexp_replace(text, '[aeiou]', '*', 'g') AS devoweled,
           regexp_matches(source, '^src[0-9]$') AS single_digit_src
    FROM documents
    """,
    _SEC,
    "Regex extract / replace / match.",
)
def fn_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.regexp_extract("source", r"([0-9]+)", 1).alias("src_digits"),
        F.regexp_replace("text", r"[aeiou]", "*").alias("devoweled"),
        F.col("source").rlike(r"^src[0-9]$").alias("single_digit_src"),
    )


@declare(
    "fn_date",
    """
    SELECT o_orderkey,
           EXTRACT(year FROM o_orderdate) AS order_year,
           EXTRACT(month FROM o_orderdate) AS order_month,
           EXTRACT(day FROM o_orderdate) AS order_dom,
           CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
           CAST(o_orderdate AS DATE) + 30 AS due_day,
           datediff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS days_to_2002,
           datediff('month', date_trunc('month', o_orderdate),
                    TIMESTAMP '2002-01-01 00:00:00') AS months_to_2002,
           last_day(CAST(o_orderdate AS DATE)) AS month_end,
           CAST(epoch(o_orderdate) AS BIGINT) AS order_epoch,
           make_date(2030, CAST(EXTRACT(month FROM o_orderdate) AS INT), 1) AS proj_month
    FROM orders
    """,
    _SEC,
    "Temporal functions: year/month/day/date_trunc/date_add/datediff/"
    "months_between (on month starts, where both dialects agree)/"
    "last_day/unix_timestamp/make_date.",
)
def fn_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("order_year"),
        F.month("o_orderdate").cast("long").alias("order_month"),
        F.dayofmonth("o_orderdate").cast("long").alias("order_dom"),
        F.date_trunc("month", "o_orderdate").cast("date").alias("month_start"),
        F.date_add(F.col("o_orderdate").cast("date"), 30).alias("due_day"),
        F.datediff(F.lit("2002-01-01").cast("date"), F.col("o_orderdate").cast("date"))
        .cast("long")
        .alias("days_to_2002"),
        F.months_between(
            F.lit("2002-01-01").cast("timestamp"), F.date_trunc("month", "o_orderdate")
        )
        .cast("long")
        .alias("months_to_2002"),
        F.last_day(F.col("o_orderdate").cast("date")).alias("month_end"),
        F.unix_timestamp("o_orderdate").alias("order_epoch"),
        F.make_date(F.lit(2030), F.month("o_orderdate"), F.lit(1)).alias("proj_month"),
    )


@declare(
    "fn_math",
    """
    SELECT l_orderkey, l_linenumber,
           ROUND(l_quantity / 2, 1) AS half_qty,
           CAST(FLOOR(l_extendedprice) AS BIGINT) AS price_floor,
           CAST(CEIL(l_extendedprice) AS BIGINT) AS price_ceil,
           ABS(l_discount - 0.05) AS disc_dev,
           POW(2, l_linenumber) AS pow2_line,
           SQRT(l_quantity) AS qty_sqrt,
           ROUND(LN(l_extendedprice), 6) AS price_ln,
           ROUND(LOG10(l_extendedprice), 6) AS price_log10,
           CAST(l_orderkey % 7 AS BIGINT) AS okey_mod7,
           CAST(SIGN(l_discount - 0.05) AS INT) AS disc_sign,
           GREATEST(l_discount, l_tax) AS max_rate,
           LEAST(l_discount, l_tax) AS min_rate
    FROM lineitem
    """,
    _SEC,
    "Math functions: round/floor/ceil/abs/pow/sqrt/ln/log10/mod/sign/"
    "greatest/least. ln and log10 rounded to 6dp (libm ulp tolerance).",
)
def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.col("l_quantity") / 2, 1).alias("half_qty"),
        F.floor("l_extendedprice").alias("price_floor"),
        F.ceil("l_extendedprice").alias("price_ceil"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.pow(F.lit(2), F.col("l_linenumber")).alias("pow2_line"),
        F.sqrt("l_quantity").alias("qty_sqrt"),
        F.round(F.log(F.col("l_extendedprice")), 6).alias("price_ln"),
        F.round(F.log10("l_extendedprice"), 6).alias("price_log10"),
        F.pmod(F.col("l_orderkey"), F.lit(7)).cast("long").alias("okey_mod7"),
        F.signum(F.col("l_discount") - 0.05).cast("int").alias("disc_sign"),
        F.greatest("l_discount", "l_tax").alias("max_rate"),
        F.least("l_discount", "l_tax").alias("min_rate"),
    )


@declare(
    "fn_cond",
    """
    SELECT c_custkey,
           CASE WHEN c_acctbal < 0 THEN 'debt'
                WHEN c_acctbal < 5000 THEN 'low'
                ELSE 'high' END AS bal_band,
           COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'other') AS seg_or_other,
           NULLIF(c_nationkey, 0) AS natkey_nz,
           CASE WHEN c_acctbal > 0 THEN 'pos' ELSE 'nonpos' END AS bal_if,
           COALESCE(NULLIF(c_name, ''), 'unnamed') AS name_nvl
    FROM customer
    """,
    _SEC,
    "Conditionals: CASE WHEN / coalesce / nullif / if / nvl.",
)
def fn_cond(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.when(F.col("c_acctbal") < 0, "debt")
        .when(F.col("c_acctbal") < 5000, "low")
        .otherwise("high")
        .alias("bal_band"),
        F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("other")).alias(
            "seg_or_other"
        ),
        F.nullif(F.col("c_nationkey"), F.lit(0)).alias("natkey_nz"),
        F.expr("IF(c_acctbal > 0, 'pos', 'nonpos')").alias("bal_if"),
        F.nvl(F.nullif(F.col("c_name"), F.lit("")), F.lit("unnamed")).alias("name_nvl"),
    )


@declare(
    "fn_hash",
    """
    SELECT doc_id,
           md5(text) AS text_md5,
           sha256(text) AS text_sha256
    FROM documents
    """,
    _SEC,
    "Cryptographic hashes for dedup keys: md5 / sha2-256.",
)
def fn_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.md5("text").alias("text_md5"),
        F.sha2("text", 256).alias("text_sha256"),
    )


@declare(
    "fn_hash_fast",
    """
    SELECT COUNT(*) AS n_docs,
           COUNT(DISTINCT text) AS n_distinct_text,
           TRUE AS xxh64_injective,
           TRUE AS crc32_low_collision
    FROM documents
    """,
    _SEC,
    "Non-cryptographic hashes (xxhash64, crc32) — bucket/shard keys. "
    "Raw values are engine-specific (DuckDB has no xxhash64 twin), so "
    "the checkable output is the self-consistency invariant the hash "
    "must satisfy on this corpus: xxhash64 is injective over the "
    "distinct texts (64-bit — expected collisions ≈ 0 at any testable "
    "scale) and crc32 loses at most 16 to birthday collisions (32-bit "
    "— expectation ~n²/2³³). Spark COMPUTES both hashes over the full "
    "corpus and tests the invariant; the oracle states it must hold.",
)
def fn_hash_fast(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return d.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("text").alias("n_distinct_text"),
        (F.countDistinct(F.xxhash64("text")) == F.countDistinct("text")).alias(
            "xxh64_injective"
        ),
        (
            (F.countDistinct("text") - F.countDistinct(F.crc32("text"))) <= 16
        ).alias("crc32_low_collision"),
    )


@declare(
    "fn_array",
    """
    WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
    SELECT doc_id,
           len(toks) AS n_toks,
           list_contains(toks, 'data') AS has_data,
           array_to_string(list_sort(toks[1:5]), '|') AS head_sorted,
           array_to_string(toks[2:4], '|') AS mid_slice,
           array_to_string(list_sort(list_distinct(toks[1:8])), '|') AS head_uniq,
           toks[3] AS third_tok
    FROM d
    """,
    _SEC,
    "Array functions: size/contains/sort/slice/distinct/element_at "
    "over tokenized text (arrays emitted pipe-joined for hashability).",
)
def fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("toks")
    )
    return d.select(
        "doc_id",
        F.size("toks").cast("long").alias("n_toks"),
        F.array_contains("toks", "data").alias("has_data"),
        F.concat_ws("|", F.array_sort(F.slice("toks", 1, 5))).alias("head_sorted"),
        F.concat_ws("|", F.slice("toks", 2, 3)).alias("mid_slice"),
        F.concat_ws(
            "|", F.array_sort(F.array_distinct(F.slice("toks", 1, 8)))
        ).alias("head_uniq"),
        F.element_at("toks", 3).alias("third_tok"),
    )


@declare(
    "fn_array_hof",
    """
    WITH e AS (SELECT vec_id,
                      list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
               FROM embeddings)
    SELECT vec_id,
           ROUND(list_reduce(list_transform(v, x -> x * 2.0), (a, b) -> a + b), 6)
               + 0.0 AS sum2x,
           len(list_filter(v, x -> x > 0.1)) AS n_big,
           len(list_filter(v, x -> x > 0.25)) > 0 AS any_huge,
           ROUND(list_reduce(list_transform(v, x -> x * x), (a, b) -> a + b), 6)
               AS dot_self
    FROM e
    """,
    _SEC,
    "Higher-order array functions (transform/filter/aggregate/exists/"
    "zip_with) over 64-dim embeddings; left-fold sums are order-fixed "
    "so doubles match exactly.",
)
def fn_array_hof(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    return e.select(
        "vec_id",
        F.round(
            F.aggregate(
                F.transform("v", lambda x: x * 2.0),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
            6,
        ).alias("sum2x"),
        F.size(F.filter("v", lambda x: x > 0.1)).cast("long").alias("n_big"),
        F.exists("v", lambda x: x > 0.25).alias("any_huge"),
        F.round(
            F.aggregate(
                F.zip_with("v", "v", lambda a, b: a * b),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
            6,
        ).alias("dot_self"),
    )


@declare(
    "fn_explode",
    """
    WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
    SELECT doc_id, unnest(toks) AS token
    FROM d
    """,
    _SEC,
    "Array → rows (explode/unnest).",
)
def fn_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return d.select("doc_id", F.explode(F.split("text", " ")).alias("token"))


@declare(
    "fn_posexplode",
    """
    WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
    SELECT doc_id,
           CAST(unnest(range(len(toks))) AS INT) AS pos,
           unnest(toks) AS token
    FROM d
    """,
    _SEC,
    "Array → rows with position (posexplode).",
)
def fn_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "token")
    )


@declare(
    "fn_explode_outer",
    """
    WITH d AS (SELECT doc_id,
                      list_filter(string_split(text, ' '), t -> t = 'spark') AS hits
               FROM documents)
    SELECT doc_id, unnest(hits) AS hit FROM d WHERE len(hits) > 0
    UNION ALL
    SELECT doc_id, NULL FROM d WHERE len(hits) = 0
    """,
    _SEC,
    "explode_outer: empty arrays yield a null row instead of vanishing.",
)
def fn_explode_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.filter(F.split("text", " "), lambda t: t == "spark").alias("hits"),
    )
    return d.select("doc_id", F.explode_outer("hits").alias("hit"))


@declare(
    "fn_map",
    """
    SELECT doc_id,
           array_to_string(map_keys(MAP(['lang', 'source'], [lang, source])), '|')
               AS meta_keys,
           array_to_string(map_values(MAP(['lang', 'source'], [lang, source])), '|')
               AS meta_vals,
           MAP(['lang', 'source'], [lang, source])['lang'][1] AS lang_val
    FROM documents
    """,
    _SEC,
    "Map functions: create_map / map_keys / map_values / element access "
    "(key/value arrays emitted pipe-joined for hashability).",
)
def fn_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    m = F.create_map(F.lit("lang"), F.col("lang"), F.lit("source"), F.col("source"))
    return d.select(
        "doc_id",
        F.concat_ws("|", F.map_keys(m)).alias("meta_keys"),
        F.concat_ws("|", F.map_values(m)).alias("meta_vals"),
        m.getItem("lang").alias("lang_val"),
    )


@declare(
    "fn_json",
    """
    SELECT event_id,
           json_extract_string(props, '$.k') AS k_str,
           CAST(json_extract(props, '$.k') AS INT) AS k_int,
           to_json(struct_pack(k := CAST(json_extract(props, '$.k') AS INT)))
               AS props_roundtrip
    FROM events
    """,
    _SEC,
    "JSON functions on events.props: get_json_object / from_json "
    "(schema'd) / to_json.",
)
def fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    parsed = F.from_json("props", T.StructType([T.StructField("k", T.IntegerType())]))
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        parsed.getField("k").alias("k_int"),
        F.to_json(F.struct(parsed.getField("k").alias("k"))).alias("props_roundtrip"),
    )


@declare(
    "fn_bits",
    """
    SELECT l_orderkey, l_partkey,
           (l_orderkey & l_partkey) AS b_and,
           (l_orderkey | l_partkey) AS b_or,
           xor(l_orderkey, l_partkey) AS b_xor,
           (l_partkey << 3) AS shl,
           (l_partkey >> 2) AS shr,
           CAST(bit_count(l_orderkey) AS INT) AS popcnt
    FROM lineitem
    WHERE l_linenumber = 1
    """,
    _SEC,
    "Bitwise function group (&, |, xor, shifts, popcount) — the "
    "primitives bitmap indexes, bloom words and feature flags are "
    "built from. All map-side integer codegen; note DuckDB's ^ is "
    "exponentiation, so the oracle spells xor() while Spark SQL's "
    "^ IS xor — exactly the cross-engine trap a declared oracle "
    "catches.",
)
def fn_bits(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_linenumber") == 1)
    return li.select(
        "l_orderkey",
        "l_partkey",
        F.expr("l_orderkey & l_partkey").alias("b_and"),
        F.expr("l_orderkey | l_partkey").alias("b_or"),
        F.expr("l_orderkey ^ l_partkey").alias("b_xor"),
        F.expr("shiftleft(l_partkey, 3)").alias("shl"),
        F.expr("shiftright(l_partkey, 2)").alias("shr"),
        F.bit_count("l_orderkey").alias("popcnt"),
    )


@declare(
    "fn_struct",
    """
    WITH s AS (
      SELECT o_orderkey,
             struct_pack(pri := o_orderpriority, price := o_totalprice)
               AS meta,
             [struct_pack(k := 'status', v := o_orderstatus),
              struct_pack(k := 'priority', v := o_orderpriority)] AS kvs
      FROM orders)
    SELECT o_orderkey,
           meta.pri AS pri,
           CAST(ROUND(meta.price, 2) AS DOUBLE) AS price,
           kvs[1].v AS status,
           kvs[2].v AS prio_kv,
           CAST(len(kvs) AS INT) AS n_kvs
    FROM s
    """,
    _SEC,
    "Struct (nested record) surface: build, field-access, and "
    "array-of-struct indexing — the shape every semi-structured "
    "event schema uses. Structs stay IN-PLAN only (built and "
    "consumed inside one projection — whole-stage codegen flattens "
    "them away); outputs re-emit as scalars per the house rule that "
    "nested-typed OUTPUT columns don't hash cross-engine.",
)
def fn_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    s = o.select(
        "o_orderkey",
        F.struct(
            F.col("o_orderpriority").alias("pri"),
            F.col("o_totalprice").alias("price"),
        ).alias("meta"),
        F.array(
            F.struct(F.lit("status").alias("k"), F.col("o_orderstatus").alias("v")),
            F.struct(F.lit("priority").alias("k"), F.col("o_orderpriority").alias("v")),
        ).alias("kvs"),
    )
    return s.select(
        "o_orderkey",
        F.col("meta.pri").alias("pri"),
        F.round(F.col("meta.price"), 2).cast("double").alias("price"),
        F.element_at("kvs", 1).getField("v").alias("status"),
        F.element_at("kvs", 2).getField("v").alias("prio_kv"),
        F.size("kvs").alias("n_kvs"),
    )


@declare(
    "fn_try_arith",
    """
    WITH v AS (
      SELECT l_orderkey,
             CAST(l_orderkey AS BIGINT) * 1000000000 AS big,
             CAST(l_partkey AS BIGINT) AS small
      FROM lineitem WHERE l_linenumber = 1)
    SELECT l_orderkey,
           CASE WHEN big <= (9223372036854775807 // GREATEST(small, 1))
                THEN big * small ELSE NULL END AS prod_safe,
           CASE WHEN small <> 0 THEN big // small ELSE NULL END AS div_safe,
           big + small AS sum_ok
    FROM v
    """,
    _SEC,
    "Overflow- and zero-safe arithmetic (try_multiply / try_divide): "
    "NULL instead of a job-killing exception when a product leaves "
    "BIGINT range or a divisor is zero — at 100 TB one poisoned row "
    "must not fail the stage; quarantine NULLs downstream instead. "
    "The oracle replays the exact overflow boundary analytically, so "
    "the NULL SET (not just counts) is hash-checked.",
)
def fn_try_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_linenumber") == 1)
    v = li.select(
        "l_orderkey",
        (F.col("l_orderkey").cast("long") * F.lit(1_000_000_000)).alias("big"),
        F.col("l_partkey").cast("long").alias("small"),
    )
    return v.select(
        "l_orderkey",
        F.expr("try_multiply(big, small)").alias("prod_safe"),
        F.expr("try_divide(big, small)").cast("long").alias("div_safe"),
        F.expr("try_add(big, small)").alias("sum_ok"),
    )


@declare(
    "fn_base64",
    """
    SELECT doc_id,
           base64(CAST(lang AS BLOB)) AS lang_b64,
           CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
           (lang = CAST(from_base64(base64(CAST(lang AS BLOB))) AS VARCHAR))
             AS roundtrip_ok
    FROM documents
    """,
    _SEC,
    "Binary/base64 surface: encode, byte length, and a decode "
    "round-trip asserted per row — the transport encoding every "
    "opaque-payload column crosses system boundaries with. A wrong "
    "padding or charset flips roundtrip_ok and fails the hash.",
)
def fn_base64(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.base64(F.col("lang").cast("binary")).alias("lang_b64"),
        F.length(F.col("text").cast("binary")).cast("long").alias("n_bytes"),
        (
            F.col("lang")
            == F.unbase64(F.base64(F.col("lang").cast("binary"))).cast("string")
        ).alias("roundtrip_ok"),
    )


@declare(
    "fn_collate",
    """
    WITH v AS (
      SELECT doc_id, source, upper(source) AS shouty FROM documents)
    SELECT lower(shouty) AS source_ci, COUNT(*) AS n_docs
    FROM v
    WHERE lower(shouty) = lower(source)
    GROUP BY lower(shouty)
    """,
    _SEC,
    "Collation-aware comparison (Spark 4 COLLATE UTF8_LCASE): "
    "case-insensitive equality and grouping WITHOUT materializing "
    "lower() copies of every string — the collation rides the type, "
    "so the optimizer still prunes and pushes down. The oracle "
    "states the lower()-normalized semantics the collation must "
    "reproduce; outputs are emitted normalized so both engines hash "
    "identically.",
)
def fn_collate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    v = docs.select(
        "doc_id",
        "source",
        F.upper("source").alias("shouty"),
    )
    ci = F.expr("shouty COLLATE UTF8_LCASE")
    return (
        v.filter(ci == F.col("source"))
        .groupBy(F.lower("shouty").alias("source_ci"))
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


@declare(
    "fn_url",
    r"""
    WITH u AS (
      SELECT doc_id,
             'https://' || source || '.example.com/docs/' ||
             CAST(doc_id AS VARCHAR) || '?lang=' || lang || '&q=1' AS url
      FROM documents)
    SELECT doc_id,
           regexp_extract(url, '^https://([^/]+)', 1) AS host,
           regexp_extract(url, '^https://[^/]+(/[^?]*)', 1) AS path,
           regexp_extract(url, '\?(.*)$', 1) AS query,
           regexp_extract(url, '[?&]lang=([^&]*)', 1) AS lang_param
    FROM u
    """,
    _SEC,
    "URL decomposition with Spark's parse_url (JVM-native, "
    "whole-stage-codegen'd): HOST / PATH / QUERY plus keyed "
    "parameter extraction — the normalization step ahead of every "
    "domain filter and source attribution. The oracle re-derives "
    "the same parts by regex over the synthesized fixture, proving "
    "parse_url's semantics on the shapes a crawler actually emits.",
)
def fn_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.com/docs/"),
        F.col("doc_id").cast("string"),
        F.lit("?lang="),
        F.col("lang"),
        F.lit("&q=1"),
    )
    u = docs.select("doc_id", url.alias("url"))
    return u.select(
        "doc_id",
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.parse_url("url", F.lit("PATH")).alias("path"),
        F.parse_url("url", F.lit("QUERY")).alias("query"),
        F.parse_url("url", F.lit("QUERY"), F.lit("lang")).alias("lang_param"),
    )


@declare(
    "fn_crypto",
    """
    SELECT doc_id,
           TRUE AS aes_roundtrip_ok,
           sha256(text) AS sha256_hex,
           md5(text) AS md5_hex
    FROM documents
    """,
    _SEC,
    "Column-level crypto surface: AES-128 encrypt/decrypt "
    "(deterministic ECB for the oracle property — production uses "
    "GCM, whose random IV is deliberately unverifiable) proven by "
    "the decrypt∘encrypt == identity round trip inside the plan, "
    "beside sha256/md5 digests both engines share. This is the "
    "at-rest tokenization step of a PII-bearing lake column; all "
    "JVM-native, no Python crossing.",
)
def fn_crypto(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    dec = F.expr(
        "cast(aes_decrypt(aes_encrypt(text, '0123456789abcdef', 'ECB'),"
        " '0123456789abcdef', 'ECB') as string)"
    )
    return docs.select(
        "doc_id",
        (dec == F.col("text")).alias("aes_roundtrip_ok"),
        F.sha2("text", 256).alias("sha256_hex"),
        F.md5("text").alias("md5_hex"),
    )


def _geohash_exprs() -> tuple:
    """(morton_expr, char_exprs): exact-integer geohash-6 built from
    15-bit quantized lat/lon (columns latb/lonb) — bit interleave
    starting with longitude (the geohash convention), then six
    5-bit groups mapped through the base32 alphabet. The SAME
    rendered arithmetic feeds Spark's F.expr and the DuckDB oracle,
    so the hash replays bit-for-bit."""
    terms = []
    for i in range(30):
        if i % 2 == 0:
            src, bit = "lonb", 14 - i // 2
        else:
            src, bit = "latb", 14 - (i - 1) // 2
        terms.append(f"((({src} >> {bit}) & 1) * {1 << (29 - i)})")
    morton = " + ".join(terms)
    alphabet = "0123456789bcdefghjkmnpqrstuvwxyz"
    chars = [
        f"substr('{alphabet}', CAST((gh >> {25 - 5 * c}) & 31 AS INT) + 1, 1)"
        for c in range(6)
    ]
    return morton, chars


@declare(
    "fn_geohash",
    f"""
    WITH pts AS (
      SELECT c_custkey AS id,
             CAST((c_custkey * 7919) % 180000001 - 90000000 AS BIGINT)
               AS lat_u,
             CAST((c_custkey * 104729) % 360000001 - 180000000 AS BIGINT)
               AS lon_u
      FROM customer),
    q AS (
      SELECT id, lat_u, lon_u,
             ((lat_u + 90000000) * 32768) // 180000001 AS latb,
             ((lon_u + 180000000) * 32768) // 360000001 AS lonb
      FROM pts),
    m AS (SELECT id, lat_u, lon_u, {_geohash_exprs()[0]} AS gh FROM q)
    SELECT id, lat_u, lon_u,
           {" || ".join(_geohash_exprs()[1])} AS geohash6
    FROM m
    """,
    _SEC,
    "Geohash-6 encoding in exact integer arithmetic: 15-bit "
    "quantized lat/lon, longitude-first bit interleave (the same "
    "Morton trick layout_zorder uses for write clustering), six "
    "base32 chars — the prefix-searchable spatial key that turns "
    "proximity queries into string-prefix range scans and spatial "
    "shuffles into equi-joins. No floating point anywhere, so both "
    "engines agree to the last bit.",
)
def fn_geohash(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    morton, chars = _geohash_exprs()
    pts = cust.select(
        F.col("c_custkey").alias("id"),
        ((F.col("c_custkey").cast("long") * 7919) % 180000001 - 90000000)
        .alias("lat_u"),
        ((F.col("c_custkey").cast("long") * 104729) % 360000001 - 180000000)
        .alias("lon_u"),
    )
    q = pts.select(
        "id", "lat_u", "lon_u",
        F.expr("((lat_u + 90000000) * 32768) div 180000001").alias("latb"),
        F.expr("((lon_u + 180000000) * 32768) div 360000001").alias("lonb"),
    )
    m = q.select("id", "lat_u", "lon_u", F.expr(morton).alias("gh"))
    concat = "concat(" + ", ".join(
        c.replace("substr('", "substring('") for c in chars
    ) + ")"
    return m.select("id", "lat_u", "lon_u", F.expr(concat).alias("geohash6"))


@declare(
    "fn_soundex_blocking",
    """
    WITH w AS (
      SELECT DISTINCT token AS w FROM (
        SELECT unnest(string_split(text, ' ')) AS token FROM documents)
      WHERE regexp_matches(token, '^[A-Za-z]+$')),
    s1 AS (SELECT w, upper(w) AS u FROM w),
    s2 AS (SELECT w, substr(u, 1, 1) AS f,
           translate(substr(u, 1, 1),
             'BFPVCGJKQSXZDTLMNRAEIOUYHW',
             '11112222222233455600000000') AS fc,
           translate(translate(substr(u, 2), 'HW', ''),
             'BFPVCGJKQSXZDTLMNRAEIOUY',
             '111122222222334556000000') AS codes
           FROM s1),
    s3 AS (SELECT w, f,
           list_reduce(list_prepend(fc, string_split(codes, '')),
                       (acc, c) -> CASE WHEN substr(acc, -1, 1) = c
                                   THEN acc ELSE acc || c END) AS coll
           FROM s2),
    s4 AS (SELECT w,
           f || substr(replace(substr(coll, 2), '0', '') || '000', 1, 3)
             AS sdx
           FROM s3)
    SELECT sdx, CAST(COUNT(*) AS BIGINT) AS n_tokens,
           array_to_string(list(w ORDER BY w), ',') AS members
    FROM s4 GROUP BY sdx
    """,
    _SEC,
    "Phonetic blocking keys via Spark's JVM-native soundex, grouped "
    "into collision blocks — the classic record-linkage blocking "
    "step (candidate pairs only form within a block, turning O(n²) "
    "name matching into per-block work). The oracle re-implements "
    "American Soundex from first principles — H/W transparency, "
    "first-letter-code dedup, vowel separators, the fold-based "
    "run-collapse — and matches the builtin bit-for-bit, so the "
    "builtin's exact semantics are proven, not assumed (RE2's "
    "missing backreferences forced the fold; see the list_reduce).",
)
def fn_soundex_blocking(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    w = (
        docs.select(F.explode(F.split("text", " ")).alias("w"))
        .filter(F.col("w").rlike("^[A-Za-z]+$"))
        .distinct()
    )
    return (
        w.select("w", F.soundex("w").alias("sdx"))
        .groupBy("sdx")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.array_join(F.array_sort(F.collect_list("w")), ",").alias(
                "members"
            ),
        )
    )


@declare(
    "fn_ipv4_cidr",
    """
    WITH ips AS (
      SELECT c_custkey,
             CAST((c_custkey * 2654435761) % 4294967296 AS BIGINT) AS ip
      FROM customer)
    SELECT c_custkey,
           CAST(ip // 16777216 AS BIGINT) || '.' ||
           CAST((ip // 65536) % 256 AS BIGINT) || '.' ||
           CAST((ip // 256) % 256 AS BIGINT) || '.' ||
           CAST(ip % 256 AS BIGINT) AS ip_str,
           (ip // 16777216) = 10 AS in_10_slash8,
           (ip // 1048576) = (3232235520 // 1048576) AS in_192_168_slash12,
           (ip // 16777216) >= 224 AND (ip // 16777216) <= 239 AS is_multicast
    FROM ips
    """,
    _SEC,
    "IPv4/CIDR arithmetic in pure integers: synthesize addresses "
    "from keys, render dotted-quad, and test CIDR membership by "
    "prefix division (ip div 2^(32−prefix) equality — the mask "
    "trick that makes network filtering a codegen'd integer compare "
    "instead of string parsing) — the log-analytics primitive "
    "behind every private-range filter, bot-block list, and "
    "multicast gate. No UDF, no regex; identical arithmetic both "
    "engines.",
)
def fn_ipv4_cidr(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    ips = cust.select(
        "c_custkey",
        ((F.col("c_custkey").cast("long") * 2654435761) % 4294967296).alias(
            "ip"
        ),
    )
    return ips.select(
        "c_custkey",
        F.expr(
            "concat(CAST(ip div 16777216 AS STRING), '.',"
            " CAST((ip div 65536) % 256 AS STRING), '.',"
            " CAST((ip div 256) % 256 AS STRING), '.',"
            " CAST(ip % 256 AS STRING))"
        ).alias("ip_str"),
        F.expr("(ip div 16777216) = 10").alias("in_10_slash8"),
        F.expr("(ip div 1048576) = (3232235520 div 1048576)").alias(
            "in_192_168_slash12"
        ),
        F.expr(
            "(ip div 16777216) >= 224 AND (ip div 16777216) <= 239"
        ).alias("is_multicast"),
    )
