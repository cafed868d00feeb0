"""Scalar function families (SURVEY §2.B): string, date/time, math, array, JSON.

Cross-engine determinism rules observed here:
* no ``round()`` on doubles at a scale at-or-below the data's decimal scale
  (engines disagree on ties) — ``floor/ceil/abs/sqrt/x*x`` are IEEE-exact;
* day-of-week normalized to Monday=0 (Spark ``weekday`` ↔ DuckDB ``isodow-1``);
* array order is always made explicit before comparison (``sort_array``).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from airflow_cms_inpatient_etl_spark.queries.base import register
from airflow_cms_inpatient_etl_spark.sources.registry import load_table


@register(
    "string_functions",
    oracle="""
    SELECT c_custkey,
           UPPER(c_mktsegment) AS seg_upper,
           LOWER(c_name) AS name_lower,
           SUBSTRING(c_name, 1, 8) AS name_prefix,
           CAST(REGEXP_EXTRACT(c_name, '#(\\d+)', 1) AS BIGINT) AS name_num,
           CONCAT(c_mktsegment, '-', c_name) AS seg_name,
           LENGTH(c_name) AS name_len,
           REPLACE(c_name, 'Customer', 'Cust') AS name_short,
           SPLIT_PART(c_name, '#', 2) AS name_id_str,
           LPAD(CAST(c_custkey AS VARCHAR), 10, '0') AS key_padded,
           TRIM('  pad  ') AS trimmed
    FROM customer
    """,
)
def string_functions(spark, sf_dir):
    """upper/lower/substring/regexp_extract/concat/length/replace/split_part/lpad/trim."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_mktsegment").alias("seg_upper"),
        F.lower("c_name").alias("name_lower"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.regexp_extract("c_name", r"#(\d+)", 1).cast("bigint").alias("name_num"),
        F.concat(F.col("c_mktsegment"), F.lit("-"), F.col("c_name")).alias("seg_name"),
        F.length("c_name").alias("name_len"),
        F.expr("replace(c_name, 'Customer', 'Cust')").alias("name_short"),
        F.split_part(F.col("c_name"), F.lit("#"), F.lit(2)).alias("name_id_str"),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("key_padded"),
        F.trim(F.lit("  pad  ")).alias("trimmed"),
    )


@register(
    "date_functions",
    oracle="""
    SELECT o_orderkey,
           EXTRACT(YEAR FROM o_orderdate) AS order_year,
           EXTRACT(MONTH FROM o_orderdate) AS order_month,
           EXTRACT(DAY FROM o_orderdate) AS order_day,
           ISODOW(o_orderdate) - 1 AS order_weekday,
           DATE_TRUNC('month', o_orderdate) AS order_month_start,
           DATE_DIFF('day', CAST(o_orderdate AS DATE), DATE '2001-12-31') AS days_to_eoy,
           STRFTIME(o_orderdate, '%Y%m%d') AS order_yyyymmdd,
           CAST(CAST(STRPTIME(STRFTIME(o_orderdate, '%Y%m%d'), '%Y%m%d') AS DATE) AS VARCHAR) AS roundtrip_date,
           CAST(CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) AS VARCHAR) AS plus_3_months
    FROM orders
    """,
)
def date_functions(spark, sf_dir):
    """year/month/day/weekday/date_trunc/datediff/format + the reference's
    YYYYMMDD-text-date parse (``to_date(c,'yyyyMMdd')`` — SURVEY §1.2 notes the
    reference stores dates as TEXT and never parses; we add the explicit op)."""
    o = load_table(spark, sf_dir, "orders")
    yyyymmdd = F.date_format("o_orderdate", "yyyyMMdd")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("bigint").alias("order_year"),
        F.month("o_orderdate").cast("bigint").alias("order_month"),
        F.dayofmonth("o_orderdate").cast("bigint").alias("order_day"),
        F.weekday("o_orderdate").cast("bigint").alias("order_weekday"),
        F.date_trunc("month", F.col("o_orderdate")).alias("order_month_start"),
        F.datediff(F.lit("2001-12-31").cast("date"), F.col("o_orderdate").cast("date"))
        .cast("bigint")
        .alias("days_to_eoy"),
        yyyymmdd.alias("order_yyyymmdd"),
        F.to_date(yyyymmdd, "yyyyMMdd").cast("string").alias("roundtrip_date"),
        F.add_months(F.col("o_orderdate").cast("date"), 3).cast("string").alias("plus_3_months"),
    )


@register(
    "math_functions",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ABS(l_discount - 0.05) AS disc_dev,
           CAST(FLOOR(l_extendedprice) AS BIGINT) AS price_floor,
           CAST(CEIL(l_extendedprice) AS BIGINT) AS price_ceil,
           SQRT(l_quantity) AS qty_sqrt,
           l_quantity * l_quantity AS qty_sq,
           l_orderkey % 7 AS key_mod,
           CAST(SIGN(l_discount - 0.05) AS DOUBLE) AS disc_sign,
           GREATEST(l_discount, l_tax) AS max_rate,
           LEAST(l_discount, l_tax) AS min_rate
    FROM lineitem
    """,
)
def math_functions(spark, sf_dir):
    """abs/floor/ceil/sqrt/square/mod/sign/greatest/least — all IEEE-exact ops
    (no libm transcendentals whose last-ulp behavior differs across engines)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.floor("l_extendedprice").alias("price_floor"),
        F.ceil("l_extendedprice").alias("price_ceil"),
        F.sqrt("l_quantity").alias("qty_sqrt"),
        (F.col("l_quantity") * F.col("l_quantity")).alias("qty_sq"),
        (F.col("l_orderkey") % 7).alias("key_mod"),
        F.signum(F.col("l_discount") - 0.05).alias("disc_sign"),
        F.greatest("l_discount", "l_tax").alias("max_rate"),
        F.least("l_discount", "l_tax").alias("min_rate"),
    )


@register(
    "array_functions",
    oracle="""
    WITH toks AS (
        SELECT doc_id, STRING_SPLIT_REGEX(TRIM(text), '\\s+') AS words FROM documents
    )
    SELECT doc_id,
           LEN(words) AS n_tokens,
           LEN(LIST_DISTINCT(words)) AS n_distinct_tokens,
           LIST_CONTAINS(words, 'spark') AS has_spark,
           words[1] AS first_token,
           words[-1] AS last_token,
           COALESCE(LIST_POSITION(words, 'data'), 0) AS data_pos,
           ARRAY_TO_STRING(LIST_SORT(LIST_DISTINCT(words)), ' ') AS sorted_vocab
    FROM toks
    """,
)
def array_functions(spark, sf_dir):
    """split→array, size, distinct, contains, indexing (1-based/-1), position,
    sort+join — the ICD9 nine-slot idiom generalized to real arrays (SURVEY §1.1)."""
    d = load_table(spark, sf_dir, "documents")
    words = F.split(F.trim(F.col("text")), r"\s+")
    return d.select(
        "doc_id",
        F.size(words).alias("n_tokens"),
        F.size(F.array_distinct(words)).alias("n_distinct_tokens"),
        F.array_contains(words, "spark").alias("has_spark"),
        F.element_at(words, 1).alias("first_token"),
        F.element_at(words, -1).alias("last_token"),
        F.array_position(words, "data").cast("int").alias("data_pos"),
        F.array_join(F.sort_array(F.array_distinct(words)), " ").alias("sorted_vocab"),
    )


@register(
    "explode_token_counts",
    oracle="""
    SELECT w AS token, COUNT(*) AS n
    FROM (SELECT UNNEST(STRING_SPLIT_REGEX(TRIM(text), '\\s+')) AS w FROM documents)
    GROUP BY w
    ORDER BY n DESC, token
    LIMIT 20
    """,
)
def explode_token_counts(spark, sf_dir):
    """explode (UNNEST) + count + deterministic top-k — the word-count shape;
    at scale this is the partial-agg-friendly token histogram."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("token"))
        .limit(20)
    )


@register(
    "date_spine_monthly",
    oracle="""
    WITH bounds AS (
        SELECT DATE_TRUNC('month', MIN(o_orderdate)) AS lo,
               DATE_TRUNC('month', MAX(o_orderdate)) AS hi
        FROM orders
    ),
    spine AS (
        SELECT UNNEST(GENERATE_SERIES(lo, hi, INTERVAL '1 month')) AS month_start FROM bounds
    ),
    m AS (
        SELECT DATE_TRUNC('month', o_orderdate) AS month_start,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
        FROM orders GROUP BY 1
    )
    SELECT s.month_start, COALESCE(m.n_orders, 0) AS n_orders,
           COALESCE(m.sum_price, 0.0) AS sum_price
    FROM spine s LEFT JOIN m USING (month_start)
    """,
)
def date_spine_monthly(spark, sf_dir):
    """Date spine (generated month scaffold LEFT JOIN aggregates): zero-filled
    months even where no orders exist — the gap-free time-series shape.
    The spine derives from the data's own bounds via ``sequence`` + explode;
    no driver-side date loop."""
    o = load_table(spark, sf_dir, "orders")
    month = F.date_trunc("month", F.col("o_orderdate"))
    bounds = o.agg(
        F.date_trunc("month", F.min("o_orderdate")).alias("lo"),
        F.date_trunc("month", F.max("o_orderdate")).alias("hi"),
    )
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("interval 1 month"))).alias("month_start")
    )
    m = o.groupBy(month.alias("month_start")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,4)")).cast("double").alias("sum_price"),
    )
    return spine.join(m, "month_start", "left").select(
        "month_start",
        F.coalesce(F.col("n_orders"), F.lit(0)).alias("n_orders"),
        F.coalesce(F.col("sum_price"), F.lit(0.0)).alias("sum_price"),
    )


@register(
    "posexplode_tokens",
    oracle="""
    SELECT doc_id,
           UNNEST(RANGE(0, LEN(words))) AS pos,
           UNNEST(words) AS token
    FROM (SELECT doc_id, STRING_SPLIT_REGEX(TRIM(text), '\\s+') AS words
          FROM documents WHERE doc_id < 50)
    """,
)
def posexplode_tokens(spark, sf_dir):
    """posexplode (UNNEST WITH ORDINALITY): position-preserving flatten."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    return d.select(
        "doc_id",
        F.posexplode(F.split(F.trim(F.col("text")), r"\s+")).alias("pos", "token"),
    )


@register(
    "json_functions",
    oracle="""
    SELECT event_id,
           JSON_EXTRACT_STRING(props, '$.k') AS k_str,
           CAST(JSON_EXTRACT_STRING(props, '$.k') AS BIGINT) AS k_int,
           CAST(JSON_EXTRACT_STRING(props, '$.k') AS BIGINT) % 10 AS k_bucket
    FROM events
    """,
)
def json_functions(spark, sf_dir):
    """get_json_object (path extraction) + from_json (schema'd parse) over the
    events.props JSON payload — both produce the same values."""
    e = load_table(spark, sf_dir, "events")
    parsed = F.from_json(F.col("props"), "k BIGINT")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        parsed.getField("k").alias("k_int"),
        (parsed.getField("k") % 10).alias("k_bucket"),
    )


@register(
    "error_safe_functions",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           TRY_CAST(CASE WHEN l_linenumber % 2 = 1 THEN '42'
                         ELSE l_returnflag END AS INTEGER) AS parsed_or_null,
           l_quantity / NULLIF(l_linenumber % 2, 0) AS qty_over_odd,
           CASE WHEN l_orderkey % 2 = 0 THEN CAST(NULL AS BIGINT)
                ELSE l_orderkey + 1 END AS next_key_or_null,
           ([l_quantity, l_extendedprice])[l_linenumber] AS picked_or_null
    FROM lineitem
    """,
)
def error_safe_functions(spark, sf_dir):
    """Error-safe expression surface: try_cast (malformed strings → NULL
    instead of job abort), try_divide (÷0 → NULL), try_add (BIGINT overflow →
    NULL instead of silent wrap-around), try_element_at (out-of-bounds →
    NULL).  At 100 TB a single malformed row must quarantine itself as NULL,
    not kill a 1000-executor job — the try_* family is how ANSI-strict
    pipelines stay total.  The oracle derives each expected NULL from the
    error condition itself (NULLIF guards, CASE on the overflow predicate),
    not from DuckDB try-variants — an independent formulation."""
    li = load_table(spark, sf_dir, "lineitem")
    maybe_num = F.when(F.col("l_linenumber") % 2 == 1, F.lit("42")).otherwise(
        F.col("l_returnflag")
    )
    bigint_max = F.lit(9223372036854775807).cast("bigint")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        maybe_num.try_cast("int").alias("parsed_or_null"),
        F.try_divide(F.col("l_quantity"), F.col("l_linenumber") % 2).alias("qty_over_odd"),
        F.when(
            F.col("l_orderkey") % 2 == 0,
            # +1 keeps the addend strictly positive (orderkey 0 exists), so
            # the even branch always overflows → NULL
            F.try_add(bigint_max, F.col("l_orderkey") + 1),
        )
        .otherwise(F.try_add(F.col("l_orderkey"), F.lit(1)))
        .alias("next_key_or_null"),
        F.try_element_at(
            F.array(F.col("l_quantity"), F.col("l_extendedprice")), F.col("l_linenumber")
        ).alias("picked_or_null"),
    )


@register(
    "variant_functions",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(JSON_EXTRACT_STRING(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           MIN(CAST(JSON_EXTRACT_STRING(props, '$.k') AS BIGINT)) AS min_k,
           MAX(CAST(JSON_EXTRACT_STRING(props, '$.k') AS BIGINT)) AS max_k,
           CAST(COUNT(CASE WHEN JSON_EXTRACT_STRING(props, '$.missing') IS NOT NULL
                           THEN 1 END) AS BIGINT) AS n_with_missing_field
    FROM events
    GROUP BY event_type
    """,
)
def variant_functions(spark, sf_dir):
    """Spark 4 VARIANT ingestion of semi-structured payloads: ``parse_json``
    turns the props JSON into the binary Variant encoding once at scan time
    (instead of re-tokenizing the JSON text per field access, the 10×
    difference at 100 TB of telemetry), then ``variant_get`` with typed paths
    feeds ordinary integer aggregation; absent paths are NULL, not errors.
    The oracle reads the same values through DuckDB's JSON path functions —
    Variant is an encoding, so results are engine-comparable."""
    e = load_table(spark, sf_dir, "events")
    v = F.parse_json(F.col("props"))
    k = F.variant_get(v, "$.k", "bigint")
    missing = F.variant_get(v, "$.missing", "string")
    return e.select("event_type", k.alias("k"), missing.alias("m")).groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("k").alias("sum_k"),
        F.min("k").alias("min_k"),
        F.max("k").alias("max_k"),
        F.count("m").alias("n_with_missing_field"),
    )
