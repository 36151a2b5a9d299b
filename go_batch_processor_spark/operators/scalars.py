"""Scalar function operators (SURVEY.md §2.2.h): string / date / math /
json / array / case.

All JVM-side built-ins inside whole-stage codegen — no Python in the row
path. Parity notes per the registry rules: width-divergent results (length,
year, size) are cast to BIGINT on both sides; libm-dependent math (ln) is
rounded; stored 2-decimal prices are never rounded at <=2 decimals.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from go_batch_processor_spark.catalog import load_table
from go_batch_processor_spark.registry import register


@register(
    "scalar_string",
    oracle="""
    SELECT p_partkey,
           upper(p_name)                       AS name_upper,
           substr(p_type, 1, 5)                AS type_prefix,
           CAST(length(p_name) AS BIGINT)      AS name_len,
           p_brand || '#' || p_type            AS brand_type,
           (p_name LIKE '%o%')                 AS has_o
    FROM part
    """,
)
def scalar_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """upper / substr / length / concat / LIKE over part descriptors."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.substring("p_type", 1, 5).alias("type_prefix"),
        F.length("p_name").cast("long").alias("name_len"),
        F.concat(F.col("p_brand"), F.lit("#"), F.col("p_type")).alias("brand_type"),
        F.col("p_name").like("%o%").alias("has_o"),
    )


@register(
    "scalar_date",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS BIGINT)     AS order_year,
           CAST(month(o_orderdate) AS BIGINT)    AS order_month,
           date_trunc('month', o_orderdate)      AS month_start,
           CAST(datediff('day', TIMESTAMP '1995-01-01', o_orderdate) AS BIGINT)
                                                 AS days_since_epoch95
    FROM orders
    """,
)
def scalar_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """year / month / date_trunc / datediff on order dates."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("order_year"),
        F.month("o_orderdate").cast("long").alias("order_month"),
        F.date_trunc("month", F.col("o_orderdate")).alias("month_start"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("date"))
        .cast("long")
        .alias("days_since_epoch95"),
    )


@register(
    "scalar_math",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(l_extendedprice * 0.8, 3)  AS discounted,
           abs(l_discount - 0.05)           AS disc_dev,
           round(sqrt(l_quantity), 6)       AS qty_sqrt,
           round(ln(l_extendedprice), 6)    AS price_ln
    FROM lineitem
    """,
)
def scalar_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """round / abs / sqrt / ln. sqrt is IEEE-exact; ln is libm-dependent,
    hence rounded to 6 digits on both sides."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.col("l_extendedprice") * 0.8, 3).alias("discounted"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.round(F.sqrt("l_quantity"), 6).alias("qty_sqrt"),
        F.round(F.log(F.col("l_extendedprice")), 6).alias("price_ln"),
    )


@register(
    "scalar_json",
    oracle="""
    SELECT event_id,
           CAST(props->>'k' AS BIGINT) AS prop_k,
           (props->>'k' IS NOT NULL)   AS has_k
    FROM events
    """,
)
def scalar_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON field extraction from the events.props string column."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k")
    return ev.select(
        "event_id",
        k.cast("long").alias("prop_k"),
        k.isNotNull().alias("has_k"),
    )


@register(
    "scalar_array",
    oracle="""
    SELECT vec_id,
           CAST(len(embedding) AS BIGINT) AS dim,
           round(CAST(embedding[1] AS DOUBLE) + embedding[2] + embedding[3], 6)
                                          AS head3_sum,
           round(CAST(embedding[64] AS DOUBLE), 6) AS last_elem
    FROM embeddings
    """,
)
def scalar_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """size / element_at / slice over ArrayType(Float) embeddings.

    Floats are cast to double before arithmetic so both engines accumulate
    at the same precision (float->double conversion is exact).
    """
    e = load_table(spark, sf_dir, "embeddings")
    head3 = (
        F.element_at("embedding", 1).cast("double")
        + F.element_at("embedding", 2).cast("double")
        + F.element_at("embedding", 3).cast("double")
    )
    return e.select(
        "vec_id",
        F.size("embedding").cast("long").alias("dim"),
        F.round(head3, 6).alias("head3_sum"),
        F.round(F.element_at("embedding", 64).cast("double"), 6).alias("last_elem"),
    )


@register(
    "scalar_regex",
    oracle="""
    SELECT p_partkey,
           regexp_extract(p_type, '^([A-Z]+)', 1)      AS type_first,
           regexp_replace(p_name, ' ', '_', 'g')       AS name_snake,
           regexp_matches(p_name, 'w.dget')            AS is_widget
    FROM part
    """,
)
def scalar_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex extract / replace / match (patterns kept to the ASCII subset
    where Java regex and RE2 semantics coincide)."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.regexp_extract("p_type", "^([A-Z]+)", 1).alias("type_first"),
        F.regexp_replace("p_name", " ", "_").alias("name_snake"),
        F.col("p_name").rlike("w.dget").alias("is_widget"),
    )


@register(
    "scalar_null_branch",
    oracle="""
    SELECT o_orderkey,
           coalesce(nullif(o_orderstatus, 'O'), 'open')  AS status_label,
           (o_totalprice IS NOT NULL)                    AS has_price,
           ifnull(nullif(o_orderpriority, o_orderpriority), 'none') AS always_none
    FROM orders
    """,
)
def scalar_null_branch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL plumbing: coalesce / nullif / ifnull three-valued semantics."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.coalesce(F.nullif("o_orderstatus", F.lit("O")), F.lit("open")).alias(
            "status_label"
        ),
        F.col("o_totalprice").isNotNull().alias("has_price"),
        F.ifnull(
            F.nullif("o_orderpriority", F.col("o_orderpriority")), F.lit("none")
        ).alias("always_none"),
    )


@register(
    "scalar_datetime_arith",
    oracle="""
    SELECT o_orderkey,
           o_orderdate + INTERVAL '30 days'          AS due_date,
           CAST(quarter(o_orderdate) AS BIGINT)      AS order_quarter,
           CAST(dayofweek(o_orderdate) AS BIGINT)    AS order_dow,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS month_end
    FROM orders
    """,
)
def scalar_datetime_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval arithmetic + calendar field extraction.

    DuckDB dayofweek is 0=Sunday..6 while Spark dayofweek is 1=Sunday..7;
    Spark side subtracts 1 to align on the DuckDB convention.
    """
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")).alias("due_date"),
        F.quarter("o_orderdate").cast("long").alias("order_quarter"),
        (F.dayofweek("o_orderdate") - 1).cast("long").alias("order_dow"),
        # Date-typed outputs cross to pandas as python date objects (vs
        # DuckDB datetime64) — emit timestamps for comparator parity.
        F.last_day(F.col("o_orderdate").cast("date")).cast("timestamp").alias("month_end"),
    )


@register(
    "scalar_map_ops",
    oracle="""
    SELECT event_id,
           'k'                          AS first_key,
           CAST(props->>'k' AS BIGINT)  AS k_value,
           1::BIGINT                    AS n_keys
    FROM events
    """,
)
def scalar_map_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType surface: parse JSON to map, then map_keys / element_at /
    size — all JVM-side (oracle hardcodes the fixture's single key)."""
    ev = load_table(spark, sf_dir, "events")
    m = F.from_json("props", T.MapType(T.StringType(), T.LongType()))
    return ev.select(
        "event_id",
        F.element_at(F.map_keys(m), 1).alias("first_key"),
        F.element_at(m, "k").alias("k_value"),
        F.size(F.map_keys(m)).cast("long").alias("n_keys"),
    )


@register(
    "join_cross_product",
    oracle="""
    SELECT n.n_name, r.r_name
    FROM nation n CROSS JOIN region r
    """,
)
def join_cross_product(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit cartesian product (BroadcastNestedLoopJoin) — legitimate
    only for fixed-cardinality dims; anything larger must carry a key."""
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return n.crossJoin(F.broadcast(r)).select("n_name", "r_name")


@register(
    "scalar_posexplode",
    oracle="""
    SELECT vec_id,
           CAST(generate_subscripts(embedding[1:4], 1) - 1 AS INTEGER) AS pos,
           round(CAST(unnest(embedding[1:4]) AS DOUBLE), 6) AS val
    FROM embeddings
    """,
)
def scalar_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode: one-to-many expansion WITH ordinality (0-based position)
    over the first 4 embedding components."""
    e = load_table(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id", F.posexplode(F.slice("embedding", 1, 4)).alias("pos", "v")
    ).select("vec_id", "pos", F.round(F.col("v").cast("double"), 6).alias("val"))


@register(
    "scalar_bitwise",
    oracle="""
    SELECT event_id,
           event_id & 255                    AS low_byte,
           event_id | 4096                   AS with_flag,
           CAST(xor(event_id, 1365) AS BIGINT) AS xored,
           (event_id << 2) & 65535           AS shifted_mask
    FROM events
    """,
)
def scalar_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise AND/OR/XOR/shift — the building blocks the SimHash and
    bucketing operators rely on, surfaced as a checkable query."""
    ev = load_table(spark, sf_dir, "events")
    eid = F.col("event_id")
    return ev.select(
        "event_id",
        eid.bitwiseAND(F.lit(255)).alias("low_byte"),
        eid.bitwiseOR(F.lit(4096)).alias("with_flag"),
        eid.bitwiseXOR(F.lit(1365)).alias("xored"),
        F.shiftleft(eid, 2).bitwiseAND(F.lit(65535)).alias("shifted_mask"),
    )


@register(
    "scalar_hash",
    oracle="""
    SELECT doc_id,
           md5(text)    AS text_md5,
           sha256(text) AS text_sha256
    FROM documents
    """,
)
def scalar_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cryptographic content hashes — cross-engine-stable identities (unlike
    xxhash64/murmur, which are engine-internal); these are what dedup and
    lineage keys should use when results must be portable."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.md5("text").alias("text_md5"),
        F.sha2("text", 256).alias("text_sha256"),
    )


@register(
    "scalar_case",
    oracle="""
    SELECT event_id,
           CASE WHEN value < 50 THEN 'low'
                WHEN value < 150 THEN 'mid'
                ELSE 'high' END AS bucket,
           CASE WHEN event_type = 'error' THEN 0 ELSE 1 END AS ok_flag
    FROM events
    """,
)
def scalar_case(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN bucketing (searched case, else branch, int literals)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.when(F.col("value") < 50, "low")
        .when(F.col("value") < 150, "mid")
        .otherwise("high")
        .alias("bucket"),
        F.when(F.col("event_type") == "error", 0).otherwise(1).alias("ok_flag"),
    )


@register(
    "scalar_url_parse",
    oracle="""
    WITH u AS (
      SELECT p_partkey,
             'https://www.' || replace(lower(p_brand), '#', '') ||
             '.example.com/parts/' || replace(lower(p_type), ' ', '-') ||
             '?id=' || CAST(p_partkey AS VARCHAR) ||
             '&sz=' || CAST(p_size AS VARCHAR) AS url
      FROM part
    )
    SELECT p_partkey,
           regexp_extract(url, 'https?://([^/]+)/', 1)   AS host,
           regexp_extract(url, '://[^/]+(/[^?]*)', 1)    AS path,
           regexp_extract(url, '[?&]id=([0-9]+)', 1)     AS id_param,
           regexp_extract(url, '[?&]sz=([0-9]+)', 1)     AS sz_param
    FROM u
    """,
)
def scalar_url_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL component extraction (host / path / query params) — the log- and
    crawl-processing staple. The fixture schema has no URL column, so both
    engines build IDENTICAL deterministic URLs from part attributes first
    (the text_pii_scrub convention), then parse with the same regexes.
    Spark's parse_url() would be the native route, but DuckDB has no
    equivalent, so the oracle-checkable surface uses regexp_extract on
    both sides — pure row expressions, whole-stage codegen, zero shuffle."""
    p = load_table(spark, sf_dir, "part")
    url = F.concat(
        F.lit("https://www."),
        F.replace(F.lower("p_brand"), F.lit("#"), F.lit("")),
        F.lit(".example.com/parts/"),
        F.replace(F.lower("p_type"), F.lit(" "), F.lit("-")),
        F.lit("?id="),
        F.col("p_partkey").cast("string"),
        F.lit("&sz="),
        F.col("p_size").cast("string"),
    )
    return p.select(
        "p_partkey",
        F.regexp_extract(url, r"https?://([^/]+)/", 1).alias("host"),
        F.regexp_extract(url, r"://[^/]+(/[^?]*)", 1).alias("path"),
        F.regexp_extract(url, r"[?&]id=([0-9]+)", 1).alias("id_param"),
        F.regexp_extract(url, r"[?&]sz=([0-9]+)", 1).alias("sz_param"),
    )


@register(
    "scalar_try_safe",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           TRY_CAST(l_returnflag AS BIGINT)          AS flag_as_int,
           CASE WHEN l_quantity - 25 <> 0
                THEN l_extendedprice / (l_quantity - 25) END AS safe_div,
           CASE WHEN l_extendedprice - 100 > 0
                THEN round(ln(l_extendedprice - 100), 6) END AS safe_ln,
           CASE WHEN l_discount >= 0
                THEN round(sqrt(l_discount), 6) END          AS safe_sqrt
    FROM lineitem
    """,
)
def scalar_try_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe scalar arithmetic under ANSI mode: try_cast for lossy
    casts, try_divide for zero denominators, and guarded domains for
    ln/sqrt — NULL instead of a job-killing exception. The difference
    that matters at 100 TB: one malformed row out of a trillion must
    not fail the job; the try_* family (plus PERMISSIVE parsing,
    source_csv_malformed) is the engine's bad-data posture.

    DuckDB has no try_divide/ln-guard, so the oracle spells the same
    semantics with CASE guards — Spark's try_* returns NULL exactly
    where the guards do (division by zero, non-positive log domain,
    unparseable cast). Narrow projection, zero shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    # The numeric-shape guard in front of try_cast is the production
    # pattern, not decoration (r9, measured): try_cast pays a JVM
    # exception per FAILING row (~8 us each — 600k all-failing rows cost
    # ~5 s at sf0.1; the guarded form is ~0.2 s). In the intended
    # one-bad-row-in-a-trillion regime try_cast alone is fine; on a
    # column where failure is common, prefilter with a cheap RLIKE so
    # the exception path never runs. The regex must accept EVERYTHING
    # the cast accepts or the guard changes semantics: Spark's
    # string->bigint cast trims surrounding whitespace and takes a
    # leading '+', so the pattern carries \s* and [+-] (r10 ADVICE fix —
    # '^-?[0-9]+$' silently nulled ' 5 ' and '+5'; probed guarded ==
    # unguarded on whitespace/sign/empty/alpha/decimal/exponent inputs,
    # pinned in tests/test_round10_fixes.py).
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.expr(
            "try_cast(CASE WHEN l_returnflag RLIKE '^\\\\s*[+-]?[0-9]+\\\\s*$'"
            " THEN l_returnflag END AS BIGINT)"
        ).alias("flag_as_int"),
        F.expr("try_divide(l_extendedprice, l_quantity - 25)").alias("safe_div"),
        F.when(
            F.col("l_extendedprice") - 100 > 0,
            F.round(F.log(F.col("l_extendedprice") - 100), 6),
        ).alias("safe_ln"),
        F.when(F.col("l_discount") >= 0, F.round(F.sqrt("l_discount"), 6)).alias(
            "safe_sqrt"
        ),
    )
