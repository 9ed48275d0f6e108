"""Scalar expression surface: CASE/IF, IN-list, BETWEEN, LIKE,
IS [NOT] NULL, CAST matrix, string functions (||, substring with the
reference's negative-start rule, replace, repeat), extract, boolean
3VL, div-by-zero -> NULL, typed literals, interval arithmetic.

Reference: complete expression language planner/mod.rs:42-98; kernels
src/array/ops.rs; binding rules binder/expr.rs (citations per query).
All expressions are Spark built-ins (whole-stage codegen) — no Python
UDFs anywhere on this surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from risinglight_spark.functions.scalar import substring_rl, substring_rl_sql
from risinglight_spark.operators import Tables, register_views
from risinglight_spark.registry import register


def _sql(name: str, sql: str, doc: str, oracle: str | None = None) -> None:
    def fn(spark: SparkSession, sf_dir: str, _sql: str = sql) -> DataFrame:
        register_views(spark, sf_dir)
        return spark.sql(_sql)

    fn.__name__ = name
    register(name, oracle=oracle or sql, doc=doc)(fn)


_sql(
    "expr_case_if",
    """
    SELECT o_orderkey,
           CASE WHEN o_totalprice > 300000 THEN 'big'
                WHEN o_totalprice > 100000 THEN 'mid'
                ELSE 'small' END AS bucket,
           CASE o_orderstatus WHEN 'O' THEN 1 WHEN 'F' THEN 2 ELSE 0 END AS status_code,
           IF(o_orderpriority = '1-URGENT', 'urgent', 'normal') AS urgency
    FROM orders WHERE o_orderkey < 1000
    """,
    doc="CASE (searched + simple) and IF (ref: binder/expr.rs:256-279 "
    "nested if-then-else; kernels ops.rs:269-302).",
)

_sql(
    "expr_in_between_like",
    """
    SELECT p_partkey, p_name, p_brand, p_size
    FROM part
    WHERE p_brand IN ('Brand#12', 'Brand#23', 'Brand#34')
      AND p_size BETWEEN 10 AND 20
      AND p_name LIKE '%gear%'
    """,
    doc="IN-list (OR-fold, binder/expr.rs:281-290), BETWEEN "
    "(>= AND <=, binder/expr.rs:222-234), const-pattern LIKE "
    "(regex-anchored, ops.rs:207-229).",
)

_sql(
    "expr_null_checks",
    """
    SELECT user_id, event_id, value,
           value IS NULL AS v_null,
           value IS NOT NULL AS v_set,
           coalesce(value, -1.0) AS v_filled
    FROM events
    WHERE user_id < 50
    """,
    doc="IS [NOT] NULL = validity bitmap inversion (ref: ops.rs; "
    "binder/expr.rs:180-183).",
)


@register(
    "expr_boolean_3vl",
    oracle="""
    SELECT event_id,
           (value > 50) AND (value < 100) AS band,
           (value > 50) OR (value IS NULL) AS either,
           NOT (value > 50) AS neg,
           ((value > 50) <> (value < 100)) AS xor_val
    FROM events WHERE event_id < 200
    """,
    doc="Three-valued AND/OR/NOT/XOR over a nullable column (ref: 3VL on "
    "validity bitmaps, src/array/ops.rs:170-205; test "
    "nullable_and_or_eval.slt).  xor rendered as <> on booleans.",
)
def expr_boolean_3vl(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    v = F.col("value")
    gt, lt = v > 50, v < 100
    return t.events.filter(F.col("event_id") < 200).select(
        "event_id",
        (gt & lt).alias("band"),
        (gt | v.isNull()).alias("either"),
        (~gt).alias("neg"),
        (gt != lt).alias("xor_val"),
    )


@register(
    "expr_div_by_zero",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice / nullif(l_tax, 0.0) AS price_per_tax,
           l_quantity / (l_linenumber - l_linenumber) AS div0_int,
           l_quantity % 7 AS mod7
    FROM lineitem WHERE l_orderkey < 300
    """,
    doc="Division by zero yields NULL (ref: divisor 'safened', validity "
    "cleared — src/array/ops.rs:159-168,759-806).  Spark non-ANSI "
    "matches; DuckDB also returns NULL for x/0.  The nullif form in the "
    "oracle documents the intent; div0_int divides by a genuine 0.",
)
def expr_div_by_zero(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return t.lineitem.filter(F.col("l_orderkey") < 300).select(
        "l_orderkey",
        "l_linenumber",
        (
            F.col("l_extendedprice")
            / F.nullif(F.col("l_tax"), F.lit(0.0))
        ).alias("price_per_tax"),
        (F.col("l_quantity") / (F.col("l_linenumber") - F.col("l_linenumber"))).alias(
            "div0_int"
        ),
        (F.col("l_quantity") % 7).alias("mod7"),
    )


@register(
    "expr_string_funcs",
    oracle=f"""
    SELECT c_custkey,
           c_name || '@' || c_mktsegment AS tagged,
           {substring_rl_sql('c_name', '-3', '3')} AS tail3,
           {substring_rl_sql('c_name', '2', '-2')} AS back2,
           replace(c_name, 'Customer', 'Cust') AS short_name,
           repeat(c_mktsegment, 2) AS seg2,
           upper(c_mktsegment) AS seg_up,
           lower(c_name) AS name_lo,
           length(c_name) AS name_len
    FROM customer WHERE c_custkey < 100
    """,
    doc="String surface: || concat (ops.rs:231-243), substring with the "
    "reference's negative-start/backwards-window rule (ops.rs:304-335 — "
    "the oracle replays the exact formula via substring_rl_sql), literal "
    "replace (ops.rs:628-636), repeat (ops.rs:638-653).",
)
def expr_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    name = F.col("c_name")
    return t.customer.filter(F.col("c_custkey") < 100).select(
        "c_custkey",
        F.concat(name, F.lit("@"), F.col("c_mktsegment")).alias("tagged"),
        substring_rl(name, -3, 3).alias("tail3"),
        substring_rl(name, 2, -2).alias("back2"),
        F.replace(name, F.lit("Customer"), F.lit("Cust")).alias("short_name"),
        F.repeat(F.col("c_mktsegment"), 2).alias("seg2"),
        F.upper(F.col("c_mktsegment")).alias("seg_up"),
        F.lower(name).alias("name_lo"),
        F.length(name).alias("name_len"),
    )


@register(
    "expr_extract_date",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INT) AS y,
           CAST(month(o_orderdate) AS INT) AS m,
           CAST(day(o_orderdate) AS INT) AS d
    FROM orders WHERE o_orderkey < 500
    """,
    doc="extract(year/month/day FROM ts) — the only three parts the "
    "reference supports (src/array/ops.rs:245-267).",
)
def expr_extract_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    d = F.col("o_orderdate")
    return t.orders.filter(F.col("o_orderkey") < 500).select(
        "o_orderkey",
        F.year(d).alias("y"),
        F.month(d).alias("m"),
        F.dayofmonth(d).alias("d"),
    )


@register(
    "expr_cast_matrix",
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderkey AS VARCHAR) AS k_str,
           CAST(floor(o_totalprice) AS BIGINT) AS price_int,
           CAST(CAST(o_orderkey AS VARCHAR) AS BIGINT) AS k_roundtrip,
           CAST(o_orderkey AS DOUBLE) AS k_dbl,
           CAST(o_orderdate AS DATE) AS d,
           CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS d_str,
           CAST('true' AS BOOLEAN) AS b
    FROM orders WHERE o_orderkey < 300
    """,
    doc="CAST matrix: int<->string, double->int, ts->date->string, "
    "string->bool (only true/false accepted — ref ops.rs:363-608). "
    "double->int rounds half-away on both engines for positive values; "
    "BIGINT chosen where DuckDB would widen.",
)
def expr_cast_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    k, p, d = F.col("o_orderkey"), F.col("o_totalprice"), F.col("o_orderdate")
    return t.orders.filter(k < 300).select(
        k.alias("o_orderkey"),
        k.cast("string").alias("k_str"),
        F.floor(p).cast("bigint").alias("price_int"),
        k.cast("string").cast("bigint").alias("k_roundtrip"),
        k.cast("double").alias("k_dbl"),
        d.cast("date").alias("d"),
        d.cast("date").cast("string").alias("d_str"),
        F.lit("true").cast("boolean").alias("b"),
    )


_sql(
    "expr_interval_arith",
    """
    SELECT o_orderkey,
           CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS due_date,
           CAST(o_orderdate - INTERVAL 2 MONTH AS DATE) AS lookback,
           CAST(o_orderdate + INTERVAL 1 YEAR AS DATE) AS next_year
    FROM orders WHERE o_orderkey < 300
    """,
    doc="date +/- interval literals — the reference's only interval forms "
    "are 'N' day/month/year (binder/expr.rs:236-249; types/interval.rs).",
)

_sql(
    "expr_typed_literals",
    """
    SELECT DATE '2024-06-15' AS d,
           CAST(TIMESTAMP '2024-06-15 12:30:00' AS STRING) AS ts_str,
           CAST(1.5 AS DOUBLE) AS f,
           CAST(42 AS INT) AS i,
           'text' AS s,
           true AS b,
           CAST(NULL AS INT) AS n
    FROM (SELECT 1) AS one
    """,
    doc="Typed literals (ref: binder/expr.rs:185-249 — date/timestamp/"
    "interval/blob/vector literal parsing). blob/vector literals are "
    "covered by multimodal_* and vector_* entries.",
    oracle="""
    SELECT DATE '2024-06-15' AS d,
           CAST(TIMESTAMP '2024-06-15 12:30:00' AS VARCHAR) AS ts_str,
           CAST(1.5 AS DOUBLE) AS f,
           CAST(42 AS INT) AS i,
           'text' AS s,
           true AS b,
           CAST(NULL AS INT) AS n
    """,
)


@register(
    "unnest_with_ordinality",
    oracle="""
    SELECT doc_id, tok.pos AS pos, tok.t AS token
    FROM (
      SELECT doc_id,
             unnest(list_transform(
               list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> ''),
               (x, i) -> {'pos': i - 1, 't': x})) AS tok
      FROM documents
    )
    WHERE doc_id < 10
    """,
    doc="UNNEST WITH ORDINALITY / lateral explode: tokens of each "
    "document with their positions (posexplode).  Arrays are "
    "first-class here (vector columns), so positional flattening is "
    "part of the engine surface; map-side only, no shuffle.",
)
def unnest_with_ordinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from risinglight_spark.functions import text as T

    t = Tables(spark, sf_dir)
    return (
        t.documents.filter(F.col("doc_id") < 10)
        .select(
            "doc_id",
            F.posexplode(T.tokens(F.col("text"))).alias("pos", "token"),
        )
    )


@register(
    "expr_string_library",
    oracle="""
    SELECT o_orderkey,
           lpad(o_orderpriority, 12, '*') AS padded_l,
           rpad(o_clerk_sub, 8, '.') AS padded_r,
           reverse(o_orderpriority) AS rev,
           split_part(o_orderpriority, '-', 1) AS prio_code,
           ltrim(rtrim('  ' || o_orderpriority || '  ')) AS trimmed,
           upper(o_orderpriority) AS up, lower(o_orderpriority) AS lo,
           instr(o_orderpriority, '-')::BIGINT AS dash_at
    FROM (
      SELECT o_orderkey, o_orderpriority,
             substring(o_orderpriority, 1, 3) AS o_clerk_sub
      FROM orders WHERE o_orderkey < 500
    )
    """,
    doc="String library breadth: lpad/rpad, reverse, split_part, "
    "ltrim/rtrim, case mapping, instr — the everyday string surface a "
    "migrating workload expects beyond the reference's concat/"
    "substring/replace/repeat set.",
)
def expr_string_library(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    p = F.col("o_orderpriority")
    return t.orders.filter(F.col("o_orderkey") < 500).select(
        "o_orderkey",
        F.lpad(p, 12, "*").alias("padded_l"),
        F.rpad(F.substring(p, 1, 3), 8, ".").alias("padded_r"),
        F.reverse(p).alias("rev"),
        F.split_part(p, F.lit("-"), F.lit(1)).alias("prio_code"),
        F.ltrim(F.rtrim(F.concat(F.lit("  "), p, F.lit("  ")))).alias("trimmed"),
        F.upper(p).alias("up"),
        F.lower(p).alias("lo"),
        F.instr(p, "-").cast("bigint").alias("dash_at"),
    )


@register(
    "expr_math_library",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           abs(l_extendedprice - 30000.0) AS absdiff,
           CAST(ceil(l_discount * 100) AS BIGINT) AS ceil_pct,
           CAST(floor(l_tax * 100) AS BIGINT) AS floor_pct,
           round(l_extendedprice / 1000.0, 2) AS price_k,
           CAST(sign(l_extendedprice - 30000.0) AS DOUBLE) AS sgn,
           CAST(l_quantity AS BIGINT) % 7 AS qmod,
           round(sqrt(l_extendedprice), 10) AS root,
           round(ln(l_extendedprice), 10) AS lnp,
           round(power(l_discount + 1.0, 2.0), 10) AS p2
    FROM lineitem WHERE l_orderkey < 200
    """,
    doc="Math library breadth: abs/ceil/floor/round/sign/mod/sqrt/ln/"
    "power.  Transcendentals (sqrt aside) are rounded to 10 dp in BOTH "
    "engines — JVM StrictMath and libm disagree in the last ulp, the "
    "same last-ulp class the IDF query handles.",
)
def expr_math_library(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    ep, disc, tax, qty = (
        F.col("l_extendedprice"),
        F.col("l_discount"),
        F.col("l_tax"),
        F.col("l_quantity"),
    )
    return t.lineitem.filter(F.col("l_orderkey") < 200).select(
        "l_orderkey",
        "l_linenumber",
        F.abs(ep - 30000.0).alias("absdiff"),
        F.ceil(disc * 100).alias("ceil_pct"),
        F.floor(tax * 100).alias("floor_pct"),
        F.round(ep / 1000.0, 2).alias("price_k"),
        F.signum(ep - 30000.0).alias("sgn"),
        (qty.cast("bigint") % 7).alias("qmod"),
        F.round(F.sqrt(ep), 10).alias("root"),
        F.round(F.log(ep), 10).alias("lnp"),
        F.round(F.pow(disc + 1.0, 2.0), 10).alias("p2"),
    )


@register(
    "expr_datetime_library",
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderdate AS DATE) AS d,
           CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS plus30,
           CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
           last_day(CAST(o_orderdate AS DATE)) AS month_end,
           date_diff('day', DATE '1998-01-01', CAST(o_orderdate AS DATE))::INT AS days_since,
           (dayofweek(o_orderdate) + 1)::INT AS dow,  -- DuckDB 0=Sun, Spark 1=Sun
           (quarter(o_orderdate))::INT AS qtr,
           strftime(o_orderdate, '%Y-%m') AS ym
    FROM orders WHERE o_orderkey < 500
    """,
    doc="Datetime library breadth: interval add, month truncation, "
    "last_day, day diffs, day-of-week, quarter, formatting — mapped "
    "across dialects (Spark date_format/datediff vs DuckDB "
    "strftime/date_diff) with identical values.",
)
def expr_datetime_library(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    d = F.col("o_orderdate").cast("date")
    return t.orders.filter(F.col("o_orderkey") < 500).select(
        "o_orderkey",
        d.alias("d"),
        F.date_add(d, 30).alias("plus30"),
        F.date_trunc("month", F.col("o_orderdate")).cast("date").alias("month_start"),
        F.last_day(d).alias("month_end"),
        F.datediff(d, F.lit("1998-01-01").cast("date")).cast("int").alias("days_since"),
        F.dayofweek(d).cast("int").alias("dow"),
        F.quarter(d).cast("int").alias("qtr"),
        F.date_format(d, "yyyy-MM").alias("ym"),
    )


@register(
    "expr_regexp_library",
    oracle=r"""
    SELECT doc_id,
           regexp_extract(text, '([A-Za-z]+)', 1) AS first_word,
           regexp_replace(text, '[0-9]+', '#', 'g') AS digits_masked,
           regexp_matches(text, '[.!?]$') AS ends_sentence,
           regexp_extract(text, '([A-Za-z]+)\s+([A-Za-z]+)', 2) AS second_word
    FROM documents WHERE doc_id < 300
    """,
    doc="Regexp scalar library: extract (group refs), global replace, "
    "match predicate — all JVM-side regexp codegen, no Python. "
    "DuckDB regexp_replace needs the 'g' flag to match Spark's "
    "replace-all semantics.",
)
def expr_regexp_library(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    txt = F.col("text")
    return t.documents.filter(F.col("doc_id") < 300).select(
        "doc_id",
        F.regexp_extract(txt, r"([A-Za-z]+)", 1).alias("first_word"),
        F.regexp_replace(txt, r"[0-9]+", "#").alias("digits_masked"),
        txt.rlike(r"[.!?]$").alias("ends_sentence"),
        F.regexp_extract(txt, r"([A-Za-z]+)\s+([A-Za-z]+)", 2).alias(
            "second_word"
        ),
    )


@register(
    "expr_bitwise_ops",
    oracle="""
    SELECT o_orderkey,
           o_orderkey & 255 AS band,
           o_orderkey | 4096 AS bor,
           xor(o_orderkey, o_custkey) AS bxor,
           (o_orderkey << 2)::BIGINT AS shl,
           (o_orderkey >> 1)::BIGINT AS shr,
           ~o_orderkey AS bnot,
           bit_count(o_orderkey)::INT AS popcnt
    FROM orders WHERE o_orderkey < 2000
    """,
    doc="Bitwise expression family (& | xor << >> ~ bit_count) — used "
    "by every hash/partition/bloom trick in the engine; all codegen "
    "integer ops.",
)
def expr_bitwise_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    k = F.col("o_orderkey")
    return t.orders.filter(k < 2000).select(
        "o_orderkey",
        k.bitwiseAND(F.lit(255)).alias("band"),
        k.bitwiseOR(F.lit(4096)).alias("bor"),
        k.bitwiseXOR(F.col("o_custkey")).alias("bxor"),
        F.shiftleft(k, 2).cast("bigint").alias("shl"),
        F.shiftright(k, 1).cast("bigint").alias("shr"),
        F.bitwise_not(k).alias("bnot"),
        F.bit_count(k).cast("int").alias("popcnt"),
    )


@register(
    "expr_array_library",
    oracle="""
    SELECT vec_id,
           len(embedding)::INT AS dim,
           round(embedding[1], 8) AS first_dim,
           round(embedding[len(embedding)], 8) AS last_dim,
           round(list_min(embedding), 8) AS mn,
           round(list_max(embedding), 8) AS mx,
           list_contains(list_transform(embedding, x -> x > 0.0), true)
             AS has_positive,
           round(list_sort(embedding)[2], 8) AS second_smallest
    FROM embeddings WHERE vec_id < 200
    """,
    doc="Collection/array scalar library over the embedding column: "
    "size, indexing, min/max, existence predicate, sort — the "
    "building blocks the vector ops compose; all higher-order "
    "JVM expressions, no explode.",
)
def expr_array_library(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    e = F.col("embedding")
    return t.embeddings.filter(F.col("vec_id") < 200).select(
        "vec_id",
        F.size(e).alias("dim"),
        F.round(F.element_at(e, 1), 8).alias("first_dim"),
        F.round(F.element_at(e, F.size(e)), 8).alias("last_dim"),
        F.round(F.array_min(e), 8).alias("mn"),
        F.round(F.array_max(e), 8).alias("mx"),
        F.exists(e, lambda x: x > 0.0).alias("has_positive"),
        F.round(F.element_at(F.sort_array(e), 2), 8).alias(
            "second_smallest"
        ),
    )


@register(
    "expr_hash_json_library",
    oracle="""
    WITH j AS (
      SELECT doc_id, source,
             '{"id":' || doc_id || ',"src":"' || source
               || '","tags":[1,2,' || (doc_id % 10) || ']}' AS payload
      FROM documents WHERE doc_id < 300
    )
    SELECT doc_id,
           md5(payload) AS payload_md5,
           sha256(source) AS src_sha256,
           json_extract_string(payload, '$.src') AS src_back,
           json_extract(payload, '$.tags[2]')::INT AS third_tag,
           len(json_extract(payload, '$.tags')::JSON[])::INT AS n_tags
    FROM j
    """,
    doc="Hash + JSON scalar library: md5/sha256 digests and nested "
    "JSON path extraction (field, array index, array length) — all "
    "JVM-side codegen.  The JSON payload is built with identical "
    "string concatenation on both engines so digests and paths are "
    "comparable bit-for-bit.",
)
def expr_hash_json_library(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    payload = F.concat(
        F.lit('{"id":'), F.col("doc_id"),
        F.lit(',"src":"'), F.col("source"),
        F.lit('","tags":[1,2,'), F.col("doc_id") % 10, F.lit("]}"),
    )
    d = t.documents.filter(F.col("doc_id") < 300).select(
        "doc_id", "source", payload.alias("payload")
    )
    return d.select(
        "doc_id",
        F.md5("payload").alias("payload_md5"),
        F.sha2(F.col("source"), 256).alias("src_sha256"),
        F.get_json_object("payload", "$.src").alias("src_back"),
        F.get_json_object("payload", "$.tags[2]").cast("int").alias(
            "third_tag"
        ),
        F.json_array_length(F.get_json_object("payload", "$.tags")).cast(
            "int"
        ).alias("n_tags"),
    )


@register(
    "expr_try_functions",
    oracle="""
    SELECT n_nationkey,
           CASE WHEN (n_nationkey - 5) = 0 THEN NULL
                ELSE CAST(n_nationkey AS DOUBLE) / (n_nationkey - 5)
           END AS try_div,
           TRY_CAST(n_name AS INTEGER) AS try_int,
           TRY_CAST('2020-01-' || lpad(CAST(n_nationkey AS VARCHAR), 2, '0')
                    AS DATE) AS try_date
    FROM nation
    """,
    doc="Error-safe try_* functions (Spark's ANSI-mode escape hatches): "
    "try_divide -> NULL on zero, try_cast -> NULL on malformed input — "
    "the semantics this engine pins globally (ANSI off) expressed "
    "per-expression, so individual expressions stay total even under "
    "ANSI sessions.  Oracle renders the CASE / TRY_CAST equivalents.",
)
def expr_try_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return t.nation.select(
        "n_nationkey",
        F.try_divide(
            F.col("n_nationkey").cast("double"), F.col("n_nationkey") - 5
        ).alias("try_div"),
        F.expr("try_cast(n_name AS INT)").alias("try_int"),
        F.expr(
            "try_cast(concat('2020-01-', lpad(CAST(n_nationkey AS STRING),"
            " 2, '0')) AS DATE)"
        ).alias("try_date"),
    )


@register(
    "expr_higher_order_library",
    oracle="""
    SELECT n_nationkey,
           array_to_string(
             list_transform([1, 2, 3], x -> x * n_nationkey), ',')
             AS xformed,
           array_to_string(
             list_filter([1, 2, 3, 4], x -> x % 2 = 0), ',') AS evens,
           len(list_filter([1, 2, 3], x -> x > n_nationkey)) > 0
             AS any_gt,
           len(list_filter([1, 2, 3], x -> x <= n_nationkey)) = 3
             AS all_le,
           list_sum(list_transform([1, 2, 3], x -> x * n_nationkey))
             ::BIGINT AS agg_sum
    FROM nation WHERE n_nationkey < 5
    """,
    doc="Higher-order array function library: transform / filter / "
    "exists / forall / aggregate — Catalyst's lambda surface (the "
    "reference has no array type at all; this is the Spark-native "
    "expression vocabulary every pipeline op here builds on).  DuckDB "
    "list_* equivalents replay each formula; arrays serialize to "
    "strings for the order-insensitive compare.",
)
def expr_higher_order_library(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    arr = F.array(F.lit(1), F.lit(2), F.lit(3))
    arr4 = F.array(F.lit(1), F.lit(2), F.lit(3), F.lit(4))
    k = F.col("n_nationkey")
    return t.nation.filter(k < 5).select(
        "n_nationkey",
        F.array_join(F.transform(arr, lambda x: x * k), ",").alias(
            "xformed"
        ),
        F.array_join(
            F.filter(arr4, lambda x: x % 2 == 0), ","
        ).alias("evens"),
        F.exists(arr, lambda x: x > k).alias("any_gt"),
        F.forall(arr, lambda x: x <= k).alias("all_le"),
        F.aggregate(
            F.transform(arr, lambda x: x * k),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        ).alias("agg_sum"),
    )
