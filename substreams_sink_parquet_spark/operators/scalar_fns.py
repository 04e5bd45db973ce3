"""Scalar expression function families (SURVEY.md §2B): string, date/time,
math, conditional, array (incl. higher-order functions), map, JSON.

All of these stay JVM-side inside whole-stage codegen — no Python UDFs.
Cross-engine hash-stability notes:
- no ROUND on doubles (JVM rounds via shortest decimal repr, DuckDB via
  binary value — they disagree near .5 boundaries); sqrt/abs/floor/ceil and
  integer math are exact instead;
- day-of-week is normalized to ISO (Mon=1) since engines disagree on origin;
- timestamps are projected as DATE or epoch seconds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import register
from ..tables import load


@register(
    "q_fn_string",
    r"""
    SELECT doc_id,
           upper(lang) AS lang_up,
           length(text) AS n_chars2,
           substring(text, 1, 20) AS head20,
           concat_ws(':', source, lang) AS src_lang,
           regexp_extract(text, '[a-z]+') AS first_word,
           str_split(text, ' ')[2] AS second_word,
           trim(lower(source)) AS src_norm,
           regexp_replace(text, 'data', 'D', 'g') AS masked_len_src,
           TRUE AS has_text
    FROM documents
    """,
    doc="String functions: case, length, substring, concat, regexp extract/replace, split, trim",
)
def q_fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.upper("lang").alias("lang_up"),
        F.length("text").alias("n_chars2"),
        F.substring("text", 1, 20).alias("head20"),
        F.concat_ws(":", "source", "lang").alias("src_lang"),
        F.regexp_extract("text", "[a-z]+", 0).alias("first_word"),
        # try_element_at: a single-word doc ANSI-aborted the whole query
        # on the out-of-range index (code review r12, hostile-fixture
        # find); NULL-on-missing matches DuckDB's list indexing
        F.try_element_at(F.split("text", " "), F.lit(2)).alias("second_word"),
        F.trim(F.lower("source")).alias("src_norm"),
        F.regexp_replace("text", "data", "D").alias("masked_len_src"),
        F.lit(True).alias("has_text"),
    )


@register(
    "q_fn_date",
    """
    SELECT o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS odate,
           EXTRACT(year FROM o_orderdate) AS oyear,
           EXTRACT(month FROM o_orderdate) AS omonth,
           EXTRACT(day FROM o_orderdate) AS oday,
           strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS omonth_start,
           strftime(CAST(o_orderdate AS DATE) + 30, '%Y-%m-%d') AS due_date,
           datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since_95,
           strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end,
           CAST(isodow(o_orderdate) AS INTEGER) AS iso_dow
    FROM orders
    """,
    doc="Date/time functions: extract, trunc, add, diff, last_day, ISO day-of-week",
)
def q_fn_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    fmt = "yyyy-MM-dd"
    return orders.select(
        "o_orderkey",
        F.date_format(d, fmt).alias("odate"),
        F.year("o_orderdate").cast("long").alias("oyear"),
        F.month("o_orderdate").cast("long").alias("omonth"),
        F.dayofmonth("o_orderdate").cast("long").alias("oday"),
        F.date_format(F.date_trunc("month", "o_orderdate"), fmt).alias("omonth_start"),
        F.date_format(F.date_add(d, 30), fmt).alias("due_date"),
        F.datediff(d, F.lit("1995-01-01").cast("date")).cast("long").alias("days_since_95"),
        F.date_format(F.last_day(d), fmt).alias("month_end"),
        (F.weekday("o_orderdate") + 1).cast("int").alias("iso_dow"),
    )


@register(
    "q_fn_math",
    """
    SELECT l_orderkey, l_linenumber,
           abs(l_extendedprice - 1000) AS abs_diff,
           sqrt(l_extendedprice) AS price_sqrt,
           CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
           CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
           CAST(l_orderkey % 7 AS BIGINT) AS key_mod7,
           l_extendedprice * l_extendedprice AS price_sq,
           CAST(sign(l_extendedprice - 30000) AS DOUBLE) AS over_30k,
           CAST(FLOOR(l_quantity / 5) AS BIGINT) AS qty_bucket
    FROM lineitem
    """,
    doc="Math functions: abs, sqrt (IEEE-exact), floor/ceil, mod, square, sign, integer division",
)
def q_fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    p = F.col("l_extendedprice")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(p - 1000).alias("abs_diff"),
        F.sqrt(p).alias("price_sqrt"),
        F.floor(p).alias("price_floor"),
        F.ceil(p).alias("price_ceil"),
        (F.col("l_orderkey") % 7).alias("key_mod7"),
        (p * p).alias("price_sq"),
        F.signum(p - 30000).alias("over_30k"),
        F.floor(F.col("l_quantity") / 5).alias("qty_bucket"),
    )


@register(
    "q_fn_cond",
    """
    SELECT o_orderkey,
           CASE WHEN o_totalprice > 200000 THEN 'big'
                WHEN o_totalprice > 50000  THEN 'mid'
                ELSE 'small' END AS size_class,
           COALESCE(NULLIF(o_orderstatus, 'O'), 'OPEN') AS status_norm,
           GREATEST(o_totalprice, 100000.0) AS at_least_100k,
           LEAST(o_totalprice, 100000.0) AS at_most_100k,
           CASE WHEN o_orderpriority LIKE '1%' OR o_orderpriority LIKE '2%'
                THEN TRUE ELSE FALSE END AS is_urgent
    FROM orders
    """,
    doc="Conditionals: CASE WHEN, coalesce, nullif, greatest/least (selection, not arithmetic)",
)
def q_fn_cond(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    tp = F.col("o_totalprice")
    return orders.select(
        "o_orderkey",
        F.when(tp > 200000, "big").when(tp > 50000, "mid").otherwise("small").alias("size_class"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("OPEN")).alias("status_norm"),
        F.greatest(tp, F.lit(100000.0)).alias("at_least_100k"),
        F.least(tp, F.lit(100000.0)).alias("at_most_100k"),
        (F.col("o_orderpriority").like("1%") | F.col("o_orderpriority").like("2%")).alias("is_urgent"),
    )


@register(
    "q_fn_array",
    r"""
    WITH t AS (SELECT doc_id, str_split(text, ' ') AS words FROM documents)
    SELECT doc_id,
           len(words) AS n_words,
           words[1] AS first_word,
           words[-1] AS last_word,
           COALESCE(list_contains(words, 'data'), FALSE) AS has_data,
           array_to_string(list_sort(words)[1:5], ',') AS first5_sorted,
           len(list_filter(words, w -> length(w) > 4)) AS n_long_words,
           CAST(list_sum(list_transform(words, w -> length(w))) AS BIGINT) AS total_word_chars,
           len(list_distinct(words)) AS n_unique_words
    FROM t
    """,
    doc="Array functions + higher-order functions: size, element_at, contains, slice, sort, filter, transform, aggregate",
)
def q_fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    words = F.split("text", " ")
    t = docs.select("doc_id", words.alias("words"))
    return t.select(
        "doc_id",
        F.size("words").alias("n_words"),
        F.element_at("words", 1).alias("first_word"),
        F.element_at("words", -1).alias("last_word"),
        F.coalesce(
            F.array_contains("words", "data"), F.lit(False)
        ).alias("has_data"),
        F.array_join(F.slice(F.sort_array("words"), 1, 5), ",").alias("first5_sorted"),
        F.size(F.filter("words", lambda w: F.length(w) > 4)).alias("n_long_words"),
        F.aggregate(
            F.transform("words", lambda w: F.length(w).cast("long")),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("total_word_chars"),
        F.size(F.array_distinct("words")).alias("n_unique_words"),
    )


@register(
    "q_fn_map",
    """
    SELECT doc_id,
           'lang,source' AS map_keys_sorted,
           lang AS lang_val,
           source AS source_val,
           2 AS map_size,
           upper(lang) AS lang_val_up
    FROM documents
    """,
    doc="Map functions: map_from_arrays, map_keys, element_at, size, transform_values "
        "(oracle computes the equivalent scalars — DuckDB map dialect differs)",
)
def q_fn_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    m = F.map_from_arrays(
        F.array(F.lit("lang"), F.lit("source")), F.array(F.col("lang"), F.col("source"))
    )
    mt = F.transform_values(m, lambda k, v: F.upper(v))
    return docs.select(
        "doc_id",
        F.array_join(F.sort_array(F.map_keys(m)), ",").alias("map_keys_sorted"),
        F.element_at(m, F.lit("lang")).alias("lang_val"),
        F.element_at(m, F.lit("source")).alias("source_val"),
        F.size(m).alias("map_size"),
        F.element_at(mt, F.lit("lang")).alias("lang_val_up"),
    )


@register(
    "q_fn_json",
    r"""
    SELECT event_id,
           CAST(regexp_extract(props, '"k":\s*(-?\d+)', 1) AS BIGINT) AS k_val,
           CASE WHEN regexp_extract(props, '"k":\s*(-?\d+)', 1) <> '' THEN TRUE ELSE FALSE END AS has_k,
           CAST(regexp_extract(props, '"k":\s*(-?\d+)', 1) AS BIGINT) % 10 AS k_mod10
    FROM events
    """,
    doc="JSON extraction: get_json_object / from_json (oracle uses regex so it "
        "does not depend on the DuckDB JSON extension)",
)
def q_fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.types import LongType, StructField, StructType

    ev = load(spark, sf_dir, "events")
    parsed = F.from_json("props", StructType([StructField("k", LongType())]))
    k = parsed["k"]
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("k_val"),
        k.isNotNull().alias("has_k"),
        (k % 10).alias("k_mod10"),
    )


@register(
    "q_fn_bitwise",
    """
    SELECT o_orderkey,
           o_orderkey & 255 AS low_byte,
           o_orderkey | 4096 AS with_flag,
           xor(o_orderkey, o_custkey) AS keys_xor,
           ~o_orderkey AS inverted,
           o_orderkey << 2 AS shl2,
           o_orderkey >> 3 AS shr3,
           bit_count(o_orderkey) AS popcount
    FROM orders
    """,
    doc="Bitwise functions: and/or/xor/not, shifts, popcount (exact ints)",
)
def q_fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    return orders.select(
        "o_orderkey",
        k.bitwiseAND(F.lit(255)).alias("low_byte"),
        k.bitwiseOR(F.lit(4096)).alias("with_flag"),
        k.bitwiseXOR(F.col("o_custkey")).alias("keys_xor"),
        F.bitwise_not(k).alias("inverted"),
        F.shiftleft(k, 2).alias("shl2"),
        F.shiftright(k, 3).alias("shr3"),
        F.bit_count(k).alias("popcount"),
    )


@register(
    "q_fn_regex",
    """
    SELECT doc_id,
           CASE WHEN text IS NULL THEN NULL
                ELSE COALESCE(array_to_string(
                    list_sort(regexp_extract_all(text, '[a-z]{5,}')), ','), '')
                END AS long_words,
           len(regexp_extract_all(text, 'a')) AS n_a,
           COALESCE(regexp_matches(text, '^[A-Z]'), FALSE) AS starts_upper,
           regexp_replace(text, '[0-9]+', '#', 'g') AS digits_masked
    FROM documents
    """,
    doc="Regex family: extract_all (sorted-joined for order-insensitive "
        "hashing), count, rlike, global replace",
)
def q_fn_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.array_join(
            F.array_sort(F.regexp_extract_all("text", F.lit("[a-z]{5,}"), 0)), ","
        ).alias("long_words"),
        F.regexp_count("text", F.lit("a")).alias("n_a"),
        # fail-closed: "starts uppercase" of NO text is false — and a
        # null boolean renders differently across the engines' pandas
        # conversions (None vs NaN), so the verdict must never be null
        F.coalesce(
            F.col("text").rlike("^[A-Z]"), F.lit(False)
        ).alias("starts_upper"),
        F.regexp_replace("text", "[0-9]+", "#").alias("digits_masked"),
    )


@register(
    "q_fn_struct",
    """
    SELECT o_orderkey,
           o_orderpriority AS pri,
           o_totalprice AS price,
           CASE WHEN ROW(o_orderpriority, o_orderstatus)
                     = ROW('1-URGENT', 'F') THEN TRUE ELSE FALSE END AS is_urgent_f
    FROM orders
    """,
    doc="Struct ops: build (named_struct), field access via dot path, "
        "struct equality comparison",
)
def q_fn_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    s = F.struct(
        F.col("o_orderpriority").alias("pri"),
        F.col("o_orderstatus").alias("st"),
        F.col("o_totalprice").alias("price"),
    )
    probe = F.struct(F.lit("1-URGENT").alias("pri"), F.lit("F").alias("st"))
    return orders.withColumn("__s", s).select(
        "o_orderkey",
        F.col("__s.pri").alias("pri"),
        F.col("__s.price").alias("price"),
        (F.struct(F.col("__s.pri"), F.col("__s.st")) == probe).alias("is_urgent_f"),
    )


@register(
    "q_fn_hash",
    """
    SELECT doc_id,
           md5(text) AS text_md5,
           sha256(text) AS text_sha256,
           md5(CAST(doc_id AS VARCHAR) || ':' || text) AS keyed_md5
    FROM documents
    """,
    doc="Cryptographic hash functions: md5 / sha2-256, incl. keyed concat",
)
def q_fn_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.md5("text").alias("text_md5"),
        F.sha2("text", 256).alias("text_sha256"),
        F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":"), F.col("text"))).alias("keyed_md5"),
    )


@register(
    "q_lateral_posexplode",
    """
    SELECT doc_id, t.i - 1 AS pos, str_split(text, ' ')[t.i] AS word
    FROM documents,
         UNNEST(range(1, len(str_split(text, ' ')) + 1)) AS t(i)
    WHERE doc_id < 50
    """,
    doc="Lateral table generator: posexplode with ordinal position (UDTF-"
        "style row expansion as a built-in)",
)
def q_lateral_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    return docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "word")
    )


@register(
    "q_fn_url",
    """
    SELECT doc_id,
           'https://' || source || '.example.com/docs/'
               || CAST(doc_id AS VARCHAR) || '?lang=' || lang AS url,
           CASE WHEN lang IS NOT NULL
                THEN source || '.example.com' END AS host,
           CASE WHEN lang IS NOT NULL
                THEN '/docs/' || CAST(doc_id AS VARCHAR) END AS path,
           'lang=' || lang AS query,
           lang AS lang_param
    FROM documents
    """,
    doc="URL functions: parse_url host/path/query/parameter extraction, "
        "oracled against the constructed ground truth (fixtures carry no "
        "URL column, so the URL is built from columns and re-parsed)",
)
def q_fn_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"), F.col("source"), F.lit(".example.com/docs/"),
        F.col("doc_id").cast("string"), F.lit("?lang="), F.col("lang"),
    )
    t = docs.select("doc_id", url.alias("url"))
    return t.select(
        "doc_id",
        "url",
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.parse_url("url", F.lit("PATH")).alias("path"),
        F.parse_url("url", F.lit("QUERY")).alias("query"),
        F.parse_url("url", F.lit("QUERY"), F.lit("lang")).alias("lang_param"),
    )


@register(
    "q_fn_variant",
    r"""
    SELECT event_id,
           CAST(regexp_extract(props, '"k":\s*(-?\d+)', 1) AS BIGINT) AS k_val,
           CASE WHEN regexp_extract(props, '"k":\s*(-?\d+)', 1) <> ''
                THEN 'BIGINT' END AS k_type
    FROM events
    """,
    doc="Spark 4 VariantType: parse_json -> semi-structured variant column, "
        "variant_get typed extraction + schema_of_variant (binary-encoded "
        "JSON: ~8x faster repeated access than string re-parsing at scale; "
        "oracle extracts the same ground truth with regex)",
)
def q_fn_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    v = F.parse_json("props")
    return ev.select(
        "event_id",
        F.variant_get(v, "$.k", "bigint").alias("k_val"),
        F.when(
            F.variant_get(v, "$.k", "bigint").isNotNull(),
            F.schema_of_variant(F.variant_get(v, "$.k", "variant")),
        ).alias("k_type"),
    )


@register(
    "q_fn_try",
    """
    SELECT o_orderkey,
           TRY_CAST(o_orderpriority AS INTEGER) AS bad_cast,
           TRY_CAST(split_part(o_orderpriority, '-', 1) AS INTEGER) AS prio_num,
           o_totalprice / NULLIF(o_orderkey % 3, 0) AS safe_div,
           CASE WHEN o_orderkey >= 2 THEN NULL
                ELSE o_orderkey * 4611686018427387904 END AS safe_mul,
           str_split(o_orderpriority, '-')[3] AS oob_elem
    FROM orders
    """,
    doc="try_* error-safe functions (the ANSI-mode escape hatch: NULL "
        "instead of abort on bad cast / div-by-zero / long overflow / "
        "out-of-bounds access) — the production posture for dirty data "
        "under ANSI, oracled against DuckDB TRY_CAST/NULLIF/CASE "
        "equivalents",
)
def q_fn_try(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.expr("try_cast(o_orderpriority AS INT)").alias("bad_cast"),
        F.expr("try_cast(split_part(o_orderpriority, '-', 1) AS INT)").alias("prio_num"),
        F.expr("try_divide(o_totalprice, o_orderkey % 3)").alias("safe_div"),
        F.expr("try_multiply(o_orderkey, 4611686018427387904L)").alias("safe_mul"),
        F.expr("try_element_at(split(o_orderpriority, '-'), 3)").alias("oob_elem"),
    )
