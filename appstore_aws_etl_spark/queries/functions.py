"""§2.8 Scalar function surface (F1-F14).

All JVM-side built-ins inside whole-stage codegen — no Python in these
paths. Each family pins one cross-dialect convention explicitly on both
sides (SURVEY.md §7.4.4): day-of-week is ISO (Mon=1) via
``weekday()+1`` <-> ``isodow``; double->int steps through ``trunc``;
DuckDB's missing ``initcap`` is spelled out; floor/ceil/sign are cast
to BIGINT because the engines' native return types differ.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..catalog import load
from ..registry import query


@query(
    "fn_string_basic",
    oracle="""
    SELECT c_custkey,
           upper(c_mktsegment)                  AS seg_up,
           lower(c_name)                        AS name_lo,
           trim('  ' || c_mktsegment || ' ')    AS seg_trim,
           length(c_name)                       AS name_len,
           substring(c_name, 1, 8)              AS name_head,
           c_mktsegment || ':' || c_name        AS seg_name
    FROM customer
    """,
    tags=("function", "string"),
)
def fn_string_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1 string basics (1-based substring in both dialects)."""
    c = load(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_mktsegment").alias("seg_up"),
        F.lower("c_name").alias("name_lo"),
        F.trim(F.concat(F.lit("  "), F.col("c_mktsegment"), F.lit(" "))).alias("seg_trim"),
        F.length("c_name").alias("name_len"),
        F.substring("c_name", 1, 8).alias("name_head"),
        F.concat(F.col("c_mktsegment"), F.lit(":"), F.col("c_name")).alias("seg_name"),
    )


@query(
    "fn_string_pad",
    oracle="""
    SELECT p_partkey,
           strpos(p_type, 'O')                                        AS pos_o,
           lpad(CAST(p_size AS VARCHAR), 4, '0')                      AS size_pad,
           rpad(p_brand, 12, '.')                                     AS brand_pad,
           upper(substring(lower(p_brand), 1, 1)) || substring(lower(p_brand), 2) AS brand_cap,
           replace(p_type, ' ', '_')                                  AS type_snake
    FROM part
    """,
    tags=("function", "string"),
)
def fn_string_pad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2 search/pad/initcap/replace (initcap hand-rolled in the oracle
    — DuckDB 1.0 has no initcap; single-token input keeps them equal)."""
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.instr("p_type", "O").alias("pos_o"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_pad"),
        F.rpad("p_brand", 12, ".").alias("brand_pad"),
        F.initcap(F.lower("p_brand")).alias("brand_cap"),
        F.replace("p_type", F.lit(" "), F.lit("_")).alias("type_snake"),
    )


@query(
    "fn_regex",
    oracle="""
    SELECT p_partkey,
           regexp_extract(p_type, '^([A-Z]+)', 1)            AS first_word,
           regexp_replace(p_type, '[AEIOU]', '*', 'g')       AS devoweled,
           CASE WHEN regexp_matches(p_type, 'BRUSHED|POLISHED') THEN 1 ELSE 0 END AS is_finished
    FROM part
    """,
    tags=("function", "string"),
)
def fn_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3 regex extract/replace/match (patterns restricted to the
    common Java/RE2 subset; Spark's regexp_replace is global by default,
    DuckDB needs the 'g' flag)."""
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.regexp_extract("p_type", r"^([A-Z]+)", 1).alias("first_word"),
        F.regexp_replace("p_type", "[AEIOU]", "*").alias("devoweled"),
        F.when(F.col("p_type").rlike("BRUSHED|POLISHED"), 1).otherwise(0).alias("is_finished"),
    )


@query(
    "fn_split",
    oracle="""
    SELECT doc_id,
           len(string_split(text, ' '))                    AS n_tokens,
           string_split(text, ' ')[1]                      AS first_token,
           string_split(text, ' ')[-1]                     AS last_token
    FROM documents
    """,
    tags=("function", "string"),
)
def fn_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4 split to array (+ element access; full explode is F10)."""
    d = load(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.element_at(toks, 1).alias("first_token"),
        F.element_at(toks, -1).alias("last_token"),
    )


@query(
    "fn_date_parts",
    oracle="""
    SELECT o_orderkey,
           year(o_orderdate)                      AS yr,
           month(o_orderdate)                     AS mon,
           day(o_orderdate)                       AS dom,
           quarter(o_orderdate)                   AS qtr,
           isodow(o_orderdate)                    AS iso_dow,
           CAST(strftime(o_orderdate, '%H') AS INTEGER) AS hr
    FROM orders
    """,
    tags=("function", "date"),
)
def fn_date_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5 date-part extraction; ISO day-of-week pinned (Mon=1)."""
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mon"),
        F.dayofmonth("o_orderdate").alias("dom"),
        F.quarter("o_orderdate").alias("qtr"),
        (F.weekday("o_orderdate") + 1).alias("iso_dow"),
        F.hour("o_orderdate").alias("hr"),
    )


@query(
    "fn_date_arith",
    oracle="""
    SELECT o_orderkey,
           CAST(CAST(o_orderdate AS DATE) + 30 AS TIMESTAMP)                 AS due_date,
           date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01')    AS days_to_2002,
           CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS TIMESTAMP)   AS plus3m,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP)            AS month_end
    FROM orders
    """,
    tags=("function", "date"),
)
def fn_date_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F6 date arithmetic (add_months clamps month-end identically in
    both engines; all DATE results served as midnight timestamps)."""
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.date_add(F.col("o_orderdate"), 30).cast("timestamp").alias("due_date"),
        F.datediff(F.lit("2002-01-01").cast("date"), F.col("o_orderdate")).alias(
            "days_to_2002"
        ),
        F.add_months(F.col("o_orderdate"), 3).cast("timestamp").alias("plus3m"),
        F.last_day(F.col("o_orderdate")).cast("timestamp").alias("month_end"),
    )


@query(
    "fn_date_trunc",
    oracle="""
    SELECT o_orderkey,
           CAST(date_trunc('year',  o_orderdate) AS TIMESTAMP) AS y_start,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS m_start,
           CAST(date_trunc('week',  o_orderdate) AS TIMESTAMP) AS w_start,
           CAST(date_trunc('day',   o_orderdate) AS TIMESTAMP) AS d_start
    FROM orders
    """,
    tags=("function", "date"),
)
def fn_date_trunc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F7 truncation to calendar boundaries (week = ISO Monday start in
    both engines)."""
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.date_trunc("year", "o_orderdate").alias("y_start"),
        F.date_trunc("month", "o_orderdate").alias("m_start"),
        F.date_trunc("week", "o_orderdate").alias("w_start"),
        F.date_trunc("day", "o_orderdate").alias("d_start"),
    )


@query(
    "fn_math",
    oracle="""
    SELECT o_orderkey,
           round(o_totalprice, 1)                        AS price_r1,
           CAST(floor(o_totalprice) AS BIGINT)           AS price_floor,
           CAST(ceil(o_totalprice) AS BIGINT)            AS price_ceil,
           abs(o_totalprice - 200000)                    AS dist_200k,
           round(pow(o_totalprice / 100000, 2), 6)       AS pow2,
           round(sqrt(o_totalprice), 6)                  AS root,
           round(ln(o_totalprice), 6)                    AS log_e,
           round(exp(o_totalprice / 1000000), 6)         AS exp_m,
           o_orderkey % 7                                AS key_mod,
           CAST(sign(o_totalprice - 200000) AS BIGINT)   AS over_under
    FROM orders
    """,
    tags=("function", "math"),
)
def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F8 math functions (floor/ceil/sign cast to BIGINT — native
    return types differ; transcendentals rounded at 6 dp)."""
    o = load(spark, sf_dir, "orders")
    price = F.col("o_totalprice")
    return o.select(
        "o_orderkey",
        F.round(price, 1).alias("price_r1"),
        F.floor(price).alias("price_floor"),
        F.ceil(price).alias("price_ceil"),
        F.abs(price - 200000).alias("dist_200k"),
        F.round(F.pow(price / 100000, 2), 6).alias("pow2"),
        F.round(F.sqrt(price), 6).alias("root"),
        F.round(F.log(price), 6).alias("log_e"),
        F.round(F.exp(price / 1000000), 6).alias("exp_m"),
        (F.col("o_orderkey") % 7).alias("key_mod"),
        F.signum(price - 200000).cast("long").alias("over_under"),
    )


@query(
    "fn_conditional",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice > 300000 THEN 'high'
                WHEN o_totalprice > 150000 THEN 'mid'
                ELSE 'low' END                          AS price_band,
           coalesce(nullif(o_orderstatus, 'O'), 'OPEN') AS status_label,
           greatest(o_totalprice, 250000.0)             AS floor_price,
           least(CAST(o_orderkey AS BIGINT), o_custkey) AS min_key
    FROM orders
    """,
    tags=("function", "conditional"),
)
def fn_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F9 CASE/coalesce/nullif/greatest/least."""
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 300000, "high")
        .when(F.col("o_totalprice") > 150000, "mid")
        .otherwise("low")
        .alias("price_band"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("OPEN")).alias(
            "status_label"
        ),
        F.greatest(F.col("o_totalprice"), F.lit(250000.0)).alias("floor_price"),
        F.least(F.col("o_orderkey"), F.col("o_custkey")).alias("min_key"),
    )


@query(
    "fn_array_explode",
    oracle="""
    SELECT doc_id,
           generate_subscripts(string_split(text, ' '), 1) - 1 AS pos,
           unnest(string_split(text, ' '))                     AS token
    FROM documents
    WHERE doc_id % 10 = 0
    """,
    tags=("function", "array"),
)
def fn_array_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F10 posexplode of a tokenized column (0-based positions; the
    oracle zips unnest with generate_subscripts)."""
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 10 == 0)
    return d.select("doc_id", F.posexplode(F.split("text", " ")).alias("pos", "token"))


@query(
    "fn_array_hof",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
    SELECT doc_id,
           len(list_filter(toks, x -> length(x) > 5))            AS n_long,
           CAST(list_sum(list_transform(toks, x -> length(x))) AS BIGINT) AS total_chars,
           len(list_distinct(toks))                              AS n_distinct,
           array_to_string(list_slice(list_sort(toks), 1, 3), ',') AS first3
    FROM t
    """,
    tags=("function", "array"),
)
def fn_array_hof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F11 higher-order array functions: transform/filter/aggregate +
    distinct/sort/slice, all codegen'd JVM lambdas (no Python)."""
    d = load(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    return d.select(
        "doc_id",
        F.size(F.filter(toks, lambda x: F.length(x) > 5)).alias("n_long"),
        F.aggregate(
            F.transform(toks, lambda x: F.length(x).cast("long")),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("total_chars"),
        F.size(F.array_distinct(toks)).alias("n_distinct"),
        F.array_join(F.slice(F.sort_array(toks), 1, 3), ",").alias("first3"),
    )


@query(
    "fn_map",
    oracle="""
    SELECT event_id,
           'k'                                             AS only_key,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value,
           'k=' || json_extract_string(props, '$.k')       AS entry_str
    FROM events
    """,
    tags=("function", "map"),
)
def fn_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F12 map construction and access: props JSON -> MapType, then
    map_keys/map_values/entries (oracle computes the equivalent values
    straight from JSON since the key set is fixed)."""
    ev = load(spark, sf_dir, "events")
    m = F.from_json("props", T.MapType(T.StringType(), T.LongType()))
    return ev.select(
        "event_id",
        F.element_at(F.map_keys(m), 1).alias("only_key"),
        F.element_at(m, F.lit("k")).alias("k_value"),
        F.concat(
            F.element_at(F.map_keys(m), 1),
            F.lit("="),
            F.element_at(F.map_values(m), 1).cast("string"),
        ).alias("entry_str"),
    )


@query(
    "fn_bitwise",
    oracle="""
    SELECT o_orderkey,
           o_orderkey & 255        AS low_byte,
           o_orderkey | 4096       AS with_flag,
           xor(o_orderkey, 21845)  AS xored,
           o_orderkey << 2         AS shl,
           o_orderkey >> 3         AS shr
    FROM orders
    """,
    tags=("function", "math"),
)
def fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F8-adjacent bitwise ops (key partitioning/bucketing arithmetic)."""
    o = load(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    return o.select(
        "o_orderkey",
        k.bitwiseAND(F.lit(255)).alias("low_byte"),
        k.bitwiseOR(F.lit(4096)).alias("with_flag"),
        k.bitwiseXOR(F.lit(21845)).alias("xored"),
        F.shiftleft(k, 2).alias("shl"),
        F.shiftright(k, 3).alias("shr"),
    )


@query(
    "fn_map_explode",
    oracle="""
    SELECT event_id,
           'k' AS map_key,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS map_value
    FROM events
    """,
    tags=("function", "map"),
)
def fn_map_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F12 map entry explosion: one row per (key, value) pair (props
    maps have exactly one key, so the oracle enumerates it)."""
    ev = load(spark, sf_dir, "events")
    m = F.from_json("props", T.MapType(T.StringType(), T.LongType()))
    return ev.select("event_id", F.explode(m).alias("map_key", "map_value"))


@query(
    "fn_variant",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_long,
           json_extract_string(props, '$.k')                 AS k_str
    FROM events
    """,
    tags=("function", "json"),
)
def fn_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F13/F14 Spark 4 VariantType path: parse_json -> typed
    variant_get extraction (the shredded-JSON model for semi-structured
    columns at scale; the variant itself never leaves the plan)."""
    ev = load(spark, sf_dir, "events")
    v = F.parse_json("props")
    return ev.select(
        "event_id",
        F.try_variant_get(v, "$.k", "bigint").alias("k_long"),
        F.try_variant_get(v, "$.k", "string").alias("k_str"),
    )


@query(
    "fn_json_extract",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_typed,
           json_extract_string(props, '$.k')                 AS k_raw,
           CAST(json_extract_string(props, '$.missing') AS BIGINT) AS absent
    FROM events
    """,
    tags=("function", "json"),
)
def fn_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F13 typed field extraction from a JSON string column."""
    ev = load(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("k_typed"),
        F.get_json_object("props", "$.k").alias("k_raw"),
        F.get_json_object("props", "$.missing").cast("long").alias("absent"),
    )


@query(
    "fn_json_struct",
    oracle="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS BIGINT)    AS k_field,
           '{"k":' || json_extract_string(props, '$.k') || '}' AS rebuilt
    FROM events
    """,
    tags=("function", "json"),
)
def fn_json_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F14 from_json -> typed struct -> to_json round trip (compact
    serialization matches DuckDB's)."""
    ev = load(spark, sf_dir, "events")
    parsed = F.from_json("props", T.StructType([T.StructField("k", T.LongType())]))
    return ev.select(
        "event_id",
        parsed.getField("k").alias("k_field"),
        F.to_json(parsed).alias("rebuilt"),
    )


@query(
    "fn_array_setops",
    oracle="""
    WITH s AS (
        SELECT o_custkey,
               coalesce(list_sort(list_distinct(
                   list(o_orderpriority) FILTER (o_orderstatus = 'O'))), []) AS open_prio,
               coalesce(list_sort(list_distinct(
                   list(o_orderpriority) FILTER (o_orderstatus = 'F'))), []) AS closed_prio
        FROM orders WHERE o_custkey < 100
        GROUP BY o_custkey
    )
    SELECT o_custkey,
           coalesce(array_to_string(list_sort(list_distinct(
               list_concat(open_prio, closed_prio))), ','), '') AS prio_union,
           coalesce(array_to_string(list_sort(list_filter(open_prio,
               x -> list_contains(closed_prio, x))), ','), '')  AS prio_both,
           coalesce(array_to_string(list_sort(list_filter(open_prio,
               x -> NOT list_contains(closed_prio, x))), ','), '')
               AS prio_only_open
    FROM s
    """,
    tags=("function", "array"),
)
def fn_array_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array set algebra (union/intersect/except) over per-customer
    priority sets, canonically sorted so both engines hash-match.
    Spark's array_union/array_intersect/array_except are codegen'd
    JVM expressions — no shuffle beyond the grouping."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_custkey") < 100)
    open_p = F.array_sort(
        F.array_distinct(
            F.collect_list(
                F.when(F.col("o_orderstatus") == "O", F.col("o_orderpriority"))
            )
        )
    )
    closed_p = F.array_sort(
        F.array_distinct(
            F.collect_list(
                F.when(F.col("o_orderstatus") == "F", F.col("o_orderpriority"))
            )
        )
    )
    s = o.groupBy("o_custkey").agg(
        open_p.alias("open_prio"), closed_p.alias("closed_prio")
    )
    # arrays serve as comma-joined strings (the registry's convention
    # for array outputs — the driver compare is scalar-typed)
    return s.select(
        "o_custkey",
        F.concat_ws(",", F.array_sort(F.array_union("open_prio", "closed_prio"))).alias("prio_union"),
        F.concat_ws(",", F.array_sort(F.array_intersect("open_prio", "closed_prio"))).alias("prio_both"),
        F.concat_ws(",", F.array_sort(F.array_except("open_prio", "closed_prio"))).alias("prio_only_open"),
    )


@query(
    "agg_string_agg",
    oracle="""
    SELECT r_name, string_agg(n_name, ',' ORDER BY n_name) AS nations
    FROM nation JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name
    """,
    tags=("agg", "function"),
)
def agg_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LISTAGG/string_agg: per-region comma-joined sorted nation names
    (sorted collect -> concat_ws pins the order that string_agg's
    ORDER BY pins on the oracle side)."""
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    return (
        # bounded: region <= 5 rows
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.concat_ws(",", F.array_sort(F.collect_list("n_name"))).alias("nations")
        )
    )


@query(
    "fn_hash_encode",
    oracle="""
    SELECT c_custkey,
           md5(c_name)                                   AS name_md5,
           sha256(c_name)                                AS name_sha256,
           lower(hex(c_name))                            AS name_hex,
           to_base64(encode(c_name))                     AS name_b64,
           decode(from_base64(to_base64(encode(c_name)))) = c_name AS roundtrip_ok,
           printf('%d-%s', c_custkey, c_mktsegment)      AS tagged
    FROM customer
    """,
    tags=("function", "hash"),
)
def fn_hash_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing and binary-encoding family: md5 / sha-256 digests, hex
    and base64 of the UTF-8 bytes, a base64 round-trip proof, and
    printf-style formatting. All JVM built-ins — no shuffle, fully
    codegen'd, and the digests are the content-addressing primitives
    the dedup/fingerprint operators build on."""
    c = load(spark, sf_dir, "customer")
    name = F.col("c_name")
    return c.select(
        "c_custkey",
        F.md5(name).alias("name_md5"),
        F.sha2(name, 256).alias("name_sha256"),
        F.lower(F.hex(name)).alias("name_hex"),
        F.base64(name.cast("binary")).alias("name_b64"),
        (F.decode(F.unbase64(F.base64(name.cast("binary"))), "UTF-8") == name).alias("roundtrip_ok"),
        F.format_string("%d-%s", F.col("c_custkey"), F.col("c_mktsegment")).alias("tagged"),
    )


@query(
    "fn_date_calendar",
    oracle="""
    SELECT o_orderkey,
           o_orderdate + INTERVAL 3 MONTH                    AS plus_3m,
           CAST(last_day(o_orderdate) AS TIMESTAMP)          AS month_end,
           CAST(quarter(o_orderdate) AS BIGINT)              AS qtr,
           CAST(day(last_day(o_orderdate)) AS BIGINT)        AS days_in_month,
           (year(o_orderdate) % 4 = 0 AND year(o_orderdate) % 100 <> 0)
               OR year(o_orderdate) % 400 = 0                AS is_leap_year
    FROM orders
    """,
    tags=("function", "date"),
)
def fn_date_calendar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar arithmetic family: month addition with end-of-month
    clamping, last-day-of-month, quarter, month length, leap-year
    arithmetic. Month addition clamps identically on both engines
    (Jan 31 + 1 month = Feb 28/29). Day-grain results are served as
    TIMESTAMP on both sides (DATE-vs-datetime64 dtype trap)."""
    o = load(spark, sf_dir, "orders")
    yr = F.year("o_orderdate")
    return o.select(
        "o_orderkey",
        F.add_months("o_orderdate", 3).cast("timestamp").alias("plus_3m"),
        F.last_day("o_orderdate").cast("timestamp").alias("month_end"),
        F.quarter("o_orderdate").cast("long").alias("qtr"),
        F.day(F.last_day("o_orderdate")).cast("long").alias("days_in_month"),
        (((yr % 4 == 0) & (yr % 100 != 0)) | (yr % 400 == 0)).alias("is_leap_year"),
    )


@query(
    "fn_url_parse",
    oracle="""
    SELECT doc_id,
           'https://' || source || '.example.com/docs/' || doc_id
               || '?lang=' || lang || '&id=' || doc_id              AS url,
           source || '.example.com'                                AS host,
           '/docs/' || doc_id                                      AS path,
           'lang=' || lang || '&id=' || doc_id                     AS query,
           lang                                                    AS lang_param,
           'https'                                                 AS protocol
    FROM documents
    """,
    tags=("fn", "llm", "text"),
)
def fn_url_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL decomposition — HOST / PATH / QUERY / a named QUERY
    parameter / PROTOCOL via Spark's JVM-side ``parse_url`` — the
    domain-extraction primitive web-corpus curation filters on
    (per-domain quotas, blocklists, source attribution).

    The URL is constructed from the row's own columns, so the oracle
    states each component as ground truth by construction — the check
    verifies parse_url's extraction agrees with the generative schema
    exactly (any divergence — encoding, delimiter handling — would
    hash-mismatch)."""
    docs = load(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"), F.col("source"), F.lit(".example.com/docs/"),
        F.col("doc_id"), F.lit("?lang="), F.col("lang"),
        F.lit("&id="), F.col("doc_id"),
    )
    return docs.select(
        "doc_id",
        url.alias("url"),
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY")).alias("query"),
        F.parse_url(url, F.lit("QUERY"), F.lit("lang")).alias("lang_param"),
        F.parse_url(url, F.lit("PROTOCOL")).alias("protocol"),
    )


@query(
    "fn_try_arith",
    oracle="""
    SELECT o_orderkey,
           try_cast(CAST(o_orderkey AS VARCHAR) AS BIGINT)      AS parsed_ok,
           try_cast(o_orderstatus || '-' || CAST(o_orderkey AS VARCHAR)
                    AS BIGINT)                                  AS parsed_bad,
           round(o_totalprice / nullif(o_orderkey % 7, 0), 4)   AS safe_ratio,
           CAST(try_cast('2024-02-' || lpad(CAST(o_orderkey % 31 + 1 AS VARCHAR), 2, '0')
                         AS DATE) AS TIMESTAMP)                 AS maybe_date
    FROM orders
    """,
    tags=("fn", "error-handling"),
)
def fn_try_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe expression family — ``try_cast`` / ``try_divide`` /
    ``try_to_date`` return NULL instead of failing the task, the
    difference between one malformed row poisoning a 100 TB job at
    stage 40 and it flowing to a quarantine filter. Cases exercised:
    a valid numeric parse, a guaranteed-invalid parse, division whose
    denominator cycles through zero, and calendar-invalid dates
    (Feb 30/31) from a constructed day-of-month."""
    o = load(spark, sf_dir, "orders")
    okey_s = F.col("o_orderkey").cast("string")
    return o.select(
        "o_orderkey",
        okey_s.try_cast("bigint").alias("parsed_ok"),
        F.concat(F.col("o_orderstatus"), F.lit("-"), okey_s)
            .try_cast("bigint").alias("parsed_bad"),
        F.round(
            F.try_divide(F.col("o_totalprice"), F.col("o_orderkey") % 7), 4
        ).alias("safe_ratio"),
        F.try_to_date(
            F.concat(F.lit("2024-02-"), F.lpad((F.col("o_orderkey") % 31 + 1).cast("string"), 2, "0")),
            "yyyy-MM-dd",
        ).cast("timestamp").alias("maybe_date"),
    )


@query(
    "fn_surrogate_key",
    oracle="""
    WITH h AS (
        SELECT o_orderkey, md5('ord:' || CAST(o_orderkey AS VARCHAR)) AS hx
        FROM orders
    )
    SELECT o_orderkey,
           substr(hx, 1, 8) || '-' || substr(hx, 9, 4) || '-' ||
           substr(hx, 13, 4) || '-' || substr(hx, 17, 4) || '-' ||
           substr(hx, 21, 12)                                  AS surrogate_uuid,
           CAST((o_orderkey * 2654435761) % 4294967296 AS BIGINT) AS surrogate_int
    FROM h
    """,
    tags=("fn", "etl"),
)
def fn_surrogate_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic surrogate keys: a UUID-shaped id derived from the
    namespaced md5 of the business key (UUIDv3's construction) and a
    Knuth-hash integer key — both reproducible on any engine and any
    run, unlike uuid()/monotonically_increasing_id(), which change
    under retry and break idempotent re-loads (the engine has ZERO
    nondeterministic id generation anywhere for this reason)."""
    o = load(spark, sf_dir, "orders")
    hx = F.md5(F.concat(F.lit("ord:"), F.col("o_orderkey").cast("string")))
    return o.select(
        "o_orderkey",
        F.concat_ws(
            "-",
            F.substring(hx, 1, 8),
            F.substring(hx, 9, 4),
            F.substring(hx, 13, 4),
            F.substring(hx, 17, 4),
            F.substring(hx, 21, 12),
        ).alias("surrogate_uuid"),
        ((F.col("o_orderkey") * F.lit(2654435761)) % F.lit(4294967296))
        .cast("long")
        .alias("surrogate_int"),
    )
