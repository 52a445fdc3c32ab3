"""§2.4 Aggregations (A2-A14; A1 is the flagship in flagship.py).

Everything here is Spark's built-in hash aggregation: partial (map-side)
aggregation collapses input before the shuffle, and AQE coalesces the
post-shuffle partitions. Grouping keys are low-cardinality dimension
values, so the exchanges stay tiny no matter the input size.

Determinism discipline (SURVEY.md §7.4): every computed double is
rounded identically on both sides; collections are sorted + joined to
strings; extremum-of-group uses max_by/min_by with unique tie-breaks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load, register_views
from ..registry import query


@query(
    "agg_global",
    oracle="""
    SELECT count(*)                        AS n_rows,
           CAST(sum(l_linenumber) AS BIGINT) AS sum_lines,
           round(sum(l_extendedprice), 2)  AS sum_price,
           round(min(l_extendedprice), 2)  AS min_price,
           round(max(l_extendedprice), 2)  AS max_price,
           round(avg(l_quantity), 4)       AS avg_qty
    FROM lineitem
    """,
    tags=("agg",),
)
def agg_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 whole-table aggregation — no grouping key, single-row result."""
    li = load(spark, sf_dir, "lineitem")
    return li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("l_linenumber").alias("sum_lines"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
        F.round(F.min("l_extendedprice"), 2).alias("min_price"),
        F.round(F.max("l_extendedprice"), 2).alias("max_price"),
        F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
    )


@query(
    "agg_count_distinct",
    oracle="""
    SELECT l_returnflag,
           count(DISTINCT l_partkey) AS n_parts,
           count(DISTINCT l_suppkey) AS n_supps
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("agg",),
)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 exact distinct counts (expand + two-phase agg under the hood)."""
    return (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("n_parts"),
            F.countDistinct("l_suppkey").alias("n_supps"),
        )
    )


@query("agg_approx_distinct", oracle=None, tags=("agg", "approx"))
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 HyperLogLog++ cardinality estimate.

    Oracle-less by design: HLL sketches differ across engines
    (SURVEY.md §7.4.5). Our own tolerance test lives in
    tests/test_aggregates.py (estimate within 5% of exact).
    """
    return (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx_parts"))
    )


@query("agg_approx_percentile", oracle=None, tags=("agg", "approx"))
def agg_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4-adjacent: t-digest-style approximate percentiles — the global
    quantile path at 100 TB (exact percentile on an ungrouped column
    would sort the world). Oracle-less (sketch-dependent); tolerance vs
    the exact percentile is unit-tested."""
    return (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.approx_percentile("l_extendedprice", F.lit(0.5), F.lit(10000)).alias(
                "p50_approx"
            ),
            F.approx_percentile("l_extendedprice", F.lit(0.95), F.lit(10000)).alias(
                "p95_approx"
            ),
        )
    )


@query(
    "agg_filtered",
    oracle="""
    SELECT l_returnflag,
           round(sum(l_extendedprice) FILTER (WHERE l_quantity > 25), 2) AS big_qty_price,
           count(*) FILTER (WHERE l_discount > 0.05)                     AS n_discounted
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("agg",),
)
def agg_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 conditional aggregation within groups."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(
            F.sum(F.when(F.col("l_quantity") > 25, F.col("l_extendedprice"))), 2
        ).alias("big_qty_price"),
        F.count(F.when(F.col("l_discount") > 0.05, F.lit(1))).alias("n_discounted"),
    )


_GROUPING_SETS_ORACLE = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       count(*)                  AS n
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
"""


@query("agg_grouping_sets", oracle=_GROUPING_SETS_ORACLE, tags=("agg",))
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6 multiple grouping levels in one pass (Expand operator)."""
    register_views(spark, sf_dir, ["lineitem"])
    return spark.sql(_GROUPING_SETS_ORACLE)


@query(
    "agg_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    tags=("agg",),
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7 hierarchical subtotals."""
    return (
        load(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"), F.count(F.lit(1)).alias("n"))
    )


@query(
    "agg_cube",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
    FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    tags=("agg",),
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8 all grouping combinations."""
    return (
        load(spark, sf_dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"), F.count(F.lit(1)).alias("n"))
    )


@query(
    "agg_stats",
    oracle="""
    SELECT l_returnflag,
           round(stddev_samp(l_quantity), 4)                 AS sd_qty,
           round(var_samp(l_quantity), 4)                    AS var_qty,
           round(corr(l_quantity, l_extendedprice), 4)       AS corr_qty_price,
           round(covar_samp(l_quantity, l_extendedprice), 2) AS covar_qty_price
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("agg",),
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9 statistical aggregates (single-pass moment computation)."""
    return (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.round(F.stddev_samp("l_quantity"), 4).alias("sd_qty"),
            F.round(F.var_samp("l_quantity"), 4).alias("var_qty"),
            F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias("corr_qty_price"),
            F.round(F.covar_samp("l_quantity", "l_extendedprice"), 2).alias("covar_qty_price"),
        )
    )


@query(
    "agg_percentile",
    oracle="""
    SELECT l_returnflag,
           round(quantile_cont(l_extendedprice, 0.5), 4)  AS p50_price,
           round(quantile_cont(l_extendedprice, 0.95), 4) AS p95_price,
           round(median(l_quantity), 4)                   AS med_qty
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("agg",),
)
def agg_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A10 exact interpolated percentiles.

    Exact percentile is a sort-based aggregate — fine per-group at any
    scale because each group's values land on one reducer; for global
    percentiles at 100 TB prefer approx_percentile (t-digest).
    """
    return (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.round(F.percentile("l_extendedprice", F.lit(0.5)), 4).alias("p50_price"),
            F.round(F.percentile("l_extendedprice", F.lit(0.95)), 4).alias("p95_price"),
            F.round(F.median("l_quantity"), 4).alias("med_qty"),
        )
    )


@query(
    "agg_argmax",
    oracle="""
    SELECT l_returnflag,
           arg_max(l_orderkey, l_extendedprice + l_orderkey * 1e-9) AS max_price_order,
           arg_min(l_orderkey, l_extendedprice + l_orderkey * 1e-9) AS min_price_order
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("agg",),
)
def agg_argmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A11 arg-extremum with a unique tie-break.

    ``l_extendedprice`` can repeat within a group, which would make a
    bare max_by nondeterministic (SURVEY.md §7.4.2); the ordering value
    is perturbed by the unique key scaled far below price resolution.
    """
    li = load(spark, sf_dir, "lineitem")
    order_val = F.col("l_extendedprice") + F.col("l_orderkey") * F.lit(1e-9)
    return li.groupBy("l_returnflag").agg(
        F.max_by("l_orderkey", order_val).alias("max_price_order"),
        F.min_by("l_orderkey", order_val).alias("min_price_order"),
    )


@query(
    "agg_collect",
    oracle="""
    SELECT l_orderkey,
           string_agg(CAST(l_linenumber AS VARCHAR), ',' ORDER BY l_linenumber) AS line_numbers,
           count(*) AS n_lines
    FROM lineitem
    GROUP BY l_orderkey
    """,
    tags=("agg",),
)
def agg_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A12 per-group collection, made deterministic by sorting before
    joining to a string (collect_list order is otherwise partition-
    dependent)."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_orderkey").agg(
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list("l_linenumber")), lambda x: x.cast("string")
            ),
            ",",
        ).alias("line_numbers"),
        F.count(F.lit(1)).alias("n_lines"),
    )


@query(
    "agg_pivot",
    oracle="""
    SELECT l_returnflag,
           round(sum(l_quantity) FILTER (WHERE l_linestatus = 'F'), 2) AS F,
           round(sum(l_quantity) FILTER (WHERE l_linestatus = 'O'), 2) AS O
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("agg",),
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A13 pivot rows->columns with an explicit value list (explicit
    values avoid the extra distinct-collection job Spark otherwise runs
    — mandatory at scale)."""
    return (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(F.round(F.sum("l_quantity"), 2))
    )


@query(
    "agg_topk_group",
    oracle="""
    SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice
    FROM (
        SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice,
               row_number() OVER (
                   PARTITION BY l_returnflag
                   ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
               ) AS rn
        FROM lineitem
    ) WHERE rn <= 3
    """,
    tags=("agg", "window"),
)
def agg_topk_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A14 top-k rows per group via ranked window + filter.

    Spark pushes a per-partition top-k (WindowGroupLimit) below the
    shuffle, so only k rows per group per partition move — scale-safe.
    """
    from pyspark.sql import Window

    li = load(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_returnflag").orderBy(
        F.col("l_extendedprice").desc(), "l_orderkey", "l_linenumber"
    )
    return (
        li.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("l_returnflag", "l_orderkey", "l_linenumber", "l_extendedprice")
    )


@query(
    "agg_unpivot",
    oracle="""
    WITH wide AS (
        SELECT l_returnflag,
               round(sum(l_quantity), 2)      AS sum_qty,
               round(sum(l_extendedprice), 2) AS sum_price,
               round(avg(l_discount), 4)      AS avg_disc
        FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, 'sum_qty' AS metric, sum_qty AS value FROM wide
    UNION ALL
    SELECT l_returnflag, 'sum_price', sum_price FROM wide
    UNION ALL
    SELECT l_returnflag, 'avg_disc', avg_disc FROM wide
    """,
    tags=("agg",),
)
def agg_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A13's inverse: melt a wide per-flag aggregate into long
    (key, metric, value) form via DataFrame.unpivot — the
    serving-layer reshape for metric stores. Unpivot is a zero-shuffle
    projection (each input row fans out to one row per value column)."""
    li = load(spark, sf_dir, "lineitem")
    wide = li.groupBy("l_returnflag").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
        F.round(F.avg("l_discount"), 4).alias("avg_disc"),
    )
    return wide.unpivot(
        ids=["l_returnflag"],
        values=["sum_qty", "sum_price", "avg_disc"],
        variableColumnName="metric",
        valueColumnName="value",
    )


@query(
    "agg_mad_robust",
    oracle="""
    WITH med AS (
        SELECT c_mktsegment, median(c_acctbal) AS seg_median
        FROM customer GROUP BY c_mktsegment
    )
    SELECT c.c_mktsegment,
           round(max(m.seg_median), 4)                        AS seg_median,
           round(median(abs(c.c_acctbal - m.seg_median)), 4)  AS mad
    FROM customer c JOIN med m ON c.c_mktsegment = m.c_mktsegment
    GROUP BY c.c_mktsegment
    """,
    tags=("agg", "stats"),
)
def agg_mad_robust(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust dispersion: median absolute deviation per segment. Two
    passes over the same grouping key — per-group median, broadcast
    back (segment dimension is tiny), then median of absolute
    deviations. Both engines compute the exact interpolated median, so
    the result is deterministic, unlike mean/stddev whose summation
    order drifts."""
    c = load(spark, sf_dir, "customer")
    med = c.groupBy("c_mktsegment").agg(F.median("c_acctbal").alias("seg_median"))
    # bounded: keyed by c_mktsegment, 5 rows
    joined = c.join(F.broadcast(med), "c_mktsegment")
    return joined.groupBy("c_mktsegment").agg(
        F.round(F.max("seg_median"), 4).alias("seg_median"),
        F.round(F.median(F.abs(F.col("c_acctbal") - F.col("seg_median"))), 4).alias("mad"),
    )


@query(
    "agg_heavy_hitters",
    oracle="""
    WITH tok AS (
        SELECT unnest(string_split(lower(text), ' ')) AS token FROM documents
    ), n AS (
        SELECT count(*) AS n FROM tok
    )
    SELECT t.token, count(*) AS cnt,
           round(count(*) * 1.0 / max(nn.n), 6) AS share
    FROM tok t CROSS JOIN n nn
    GROUP BY t.token
    HAVING count(*) >= 0.0345 * max(nn.n)
    """,
    tags=("agg", "sketch", "custom-operator"),
)
def agg_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters (tokens above 3.45% corpus frequency) via
    Misra-Gries per-partition sketches + merged-candidate exact recount
    (operators/sketches.py). The result is EXACT — the sketch only
    prunes the candidate space — so the oracle is the plain
    GROUP BY/HAVING. At 100 TB the full-vocabulary shuffle never
    happens: each partition streams through at most k counters and the
    recount touches only the candidate set. Round 10 moved the key to
    the document-level operator (heavy_hitters_docs): both passes
    tokenize in Python at C speed over Arrow batches instead of
    re-running the JVM regex split + explode per pass, which the 100x
    tier measured as the actual cost (~10 s -> ~2 s; the token-stream
    heavy_hitters stays for callers that already hold a token column)."""
    from ..operators.sketches import heavy_hitters_docs

    docs = load(spark, sf_dir, "documents")
    return heavy_hitters_docs(docs, text_col="text", phi=0.0345)


@query(
    "agg_corr_regr",
    oracle="""
    SELECT l_returnflag,
           round(corr(l_quantity, l_extendedprice), 4)       AS corr_qty_price,
           round(corr(l_extendedprice, l_discount), 4)       AS corr_price_disc,
           round(covar_samp(l_quantity, l_extendedprice), 2) AS covar_qty_price,
           round(regr_slope(l_extendedprice, l_quantity), 4) AS slope_price_on_qty,
           round(regr_r2(l_extendedprice, l_quantity), 6)    AS r2_price_on_qty
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("agg", "stats"),
)
def agg_corr_regr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bivariate statistics per return flag: Pearson correlation,
    sample covariance, and OLS slope/R² (regr_* family). Single
    map-side-combinable aggregation pass; results rounded where
    accumulation-order noise lives (~1e-12 relative)."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias("corr_qty_price"),
        F.round(F.corr("l_extendedprice", "l_discount"), 4).alias("corr_price_disc"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 2).alias("covar_qty_price"),
        F.round(F.regr_slope("l_extendedprice", "l_quantity"), 4).alias("slope_price_on_qty"),
        F.round(F.regr_r2("l_extendedprice", "l_quantity"), 6).alias("r2_price_on_qty"),
    )


@query(
    "agg_boolean_aggs",
    oracle="""
    SELECT o_orderpriority,
           count(*) FILTER (WHERE o_totalprice > 200000) AS n_big,
           bool_and(o_totalprice > 0)                    AS all_positive,
           bool_or(o_orderstatus = 'P')                  AS any_pending,
           count(*)                                      AS n
    FROM orders GROUP BY o_orderpriority
    """,
    tags=("agg", "boolean"),
)
def agg_boolean_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean aggregate family: conditional count, universal and
    existential quantifiers per group — one map-side-combinable pass."""
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.count_if(F.col("o_totalprice") > 200000).alias("n_big"),
        F.bool_and(F.col("o_totalprice") > 0).alias("all_positive"),
        F.bool_or(F.col("o_orderstatus") == "P").alias("any_pending"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "agg_countmin_sketch",
    oracle="""
    WITH seeds(seed, a, b) AS (
        VALUES (0, 911382323, 972663749), (1, 640874693, 495124967),
               (2, 853187461, 161803399), (3, 718064159, 577215665)
    ), sk AS (
        SELECT seed, ((user_id * a + b) % 1000003) % 256 AS bucket,
               count(*) AS c
        FROM events CROSS JOIN seeds
        GROUP BY 1, 2
    ), probes AS (
        SELECT DISTINCT user_id FROM events
    )
    SELECT p.user_id, CAST(min(sk.c) AS BIGINT) AS cm_estimate
    FROM probes p
    CROSS JOIN seeds s
    JOIN sk ON sk.seed = s.seed
           AND sk.bucket = ((p.user_id * s.a + s.b) % 1000003) % 256
    GROUP BY p.user_id
    ORDER BY p.user_id
    """,
    tags=("agg", "sketch"),
)
def agg_countmin_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch: d=4 pairwise-independent hash rows x w=256
    buckets, estimate = min over rows. The hash is plain modular
    arithmetic ((key*a + b) mod p mod w) so the sketch is
    engine-portable and the oracle exact — unlike xxhash64, which only
    Spark implements.

    Scale shape: the BUILD is one map-side-combinable aggregation over
    (seed, bucket) — the sketch is d*w = 1024 rows no matter the input
    size, the whole point of the structure at 100 TB (it then
    broadcasts to estimate any key without rescanning the stream). The
    probe side here queries every distinct key to make the estimate
    error measurable against the oracle."""
    ev = load(spark, sf_dir, "events").select("user_id")
    seeds = spark.createDataFrame(
        [
            (0, 911382323, 972663749),
            (1, 640874693, 495124967),
            (2, 853187461, 161803399),
            (3, 718064159, 577215665),
        ],
        "seed INT, a BIGINT, b BIGINT",
    )
    bucket = ((F.col("user_id") * F.col("a") + F.col("b")) % 1000003) % 256
    sketch = (
        # bounded: 4 hash-seed parameter rows
        ev.join(F.broadcast(seeds))
        .groupBy(F.col("seed"), bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    # bounded: 4 hash-seed parameter rows
    probes = ev.distinct().join(F.broadcast(seeds)).select(
        "user_id", "seed", bucket.alias("bucket")
    )
    return (
        # bounded: sketch is seeds x 256 buckets <= 1024 rows
        probes.join(F.broadcast(sketch), ["seed", "bucket"])
        .groupBy("user_id")
        .agg(F.min("c").alias("cm_estimate"))
        .orderBy("user_id")
    )


@query(
    "agg_bloom_filter",
    oracle="""
    WITH seeds(seed, a, b) AS (
        VALUES (0, 911382323, 972663749), (1, 640874693, 495124967),
               (2, 853187461, 161803399)
    ), pos AS (
        SELECT DISTINCT ((user_id * a + b) % 1000003) % 2079 AS p
        FROM events CROSS JOIN seeds
    ), words AS (
        SELECT p // 63 AS word_id, bit_or(1::BIGINT << CAST(p % 63 AS INT)) AS bits
        FROM pos GROUP BY 1
    ), probe AS (
        SELECT c_custkey,
               ((c_custkey * s.a + s.b) % 1000003) % 2079 AS p
        FROM customer CROSS JOIN seeds s
    )
    SELECT c_custkey,
           bool_and(coalesce((w.bits >> CAST(p.p % 63 AS INT)) & 1, 0) = 1)
               AS maybe_present
    FROM probe p LEFT JOIN words w ON w.word_id = p.p // 63
    GROUP BY c_custkey
    ORDER BY c_custkey
    """,
    tags=("agg", "sketch"),
)
def agg_bloom_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom filter build + probe with engine-portable arithmetic:
    k=3 modular hashes into m=2079 bits packed as 33 x 63-bit words
    (bit 63 stays clear so the BIGINT shift never touches the sign).
    Probing every customer key against the event-user filter yields the
    classic semi-join pre-filter: false positives possible, false
    negatives impossible.

    Scale shape: the build is one distinct + one 33-row bit_or
    aggregation — the filter is ~constant size regardless of input, so
    it broadcasts to the probe side for free. This is exactly the
    runtime-filter pattern Spark's own bloom-join uses; here it is
    materialized as data so the oracle can verify every bit."""
    seeds = spark.createDataFrame(
        [(0, 911382323, 972663749), (1, 640874693, 495124967), (2, 853187461, 161803399)],
        "seed INT, a BIGINT, b BIGINT",
    )
    hpos = lambda key: ((F.col(key) * F.col("a") + F.col("b")) % 1000003) % 2079  # noqa: E731
    ev = load(spark, sf_dir, "events").select("user_id")
    # bounded: 3 hash-seed parameter rows
    pos = ev.join(F.broadcast(seeds)).select(hpos("user_id").alias("p")).distinct()
    # shiftleft's bit-count argument must be a column here, which only
    # the SQL form accepts (the Python helper takes a literal int)
    words = pos.groupBy((F.col("p") / 63).cast("long").alias("word_id")).agg(
        F.bit_or(F.expr("shiftleft(CAST(1 AS BIGINT), CAST(p % 63 AS INT))")).alias("bits")
    )
    probe = (
        load(spark, sf_dir, "customer")
        .select("c_custkey")
        # bounded: 3 hash-seed parameter rows
        .join(F.broadcast(seeds))
        .select("c_custkey", hpos("c_custkey").alias("p"))
    )
    hit = (
        F.coalesce(
            F.expr("shiftright(bits, CAST(p % 63 AS INT))") % 2, F.lit(0).cast("long")
        )
        == 1
    )
    return (
        probe.join(
            # bounded: bloom words <= ceil(2079/63) = 33 rows
            F.broadcast(words),
            (F.col("p") / 63).cast("long") == F.col("word_id"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.bool_and(hit).alias("maybe_present"))
        .orderBy("c_custkey")
    )


@query(
    "agg_mode",
    oracle="""
    WITH c AS (
        SELECT l_returnflag, l_quantity, count(*) AS n
        FROM lineitem GROUP BY 1, 2
    ), r AS (
        SELECT *, max(n) OVER (PARTITION BY l_returnflag) AS mx FROM c
    )
    SELECT l_returnflag,
           min(l_quantity) AS mode_qty,
           CAST(max(n) AS BIGINT) AS mode_count
    FROM r WHERE n = mx
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    tags=("agg",),
)
def agg_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical mode per group with an explicit tie-break (smallest
    value among the most frequent) — engine built-in mode() functions
    break ties arbitrarily, so the deterministic two-level form is
    what a cross-engine pipeline actually ships: value-count agg, a
    windowed max over the small distinct-value relation, then a
    min-filter. Two shuffles, both on bounded keys (flag and
    flag x distinct quantity)."""
    li = load(spark, sf_dir, "lineitem")
    c = li.groupBy("l_returnflag", "l_quantity").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("l_returnflag")
    r = c.withColumn("mx", F.max("n").over(w)).filter(F.col("n") == F.col("mx"))
    return (
        r.groupBy("l_returnflag")
        .agg(
            F.min("l_quantity").alias("mode_qty"),
            F.max("n").alias("mode_count"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "agg_skew_kurtosis",
    oracle="""
    WITH m AS (
        SELECT l_returnflag,
               avg(l_quantity)                                     AS mu,
               avg(l_quantity * l_quantity)                        AS r2,
               avg(l_quantity * l_quantity * l_quantity)           AS r3,
               avg(l_quantity*l_quantity*l_quantity*l_quantity)    AS r4
        FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag,
           round((r3 - 3*mu*r2 + 2*mu*mu*mu)
                 / pow(r2 - mu*mu, 1.5), 4)                        AS skew_qty,
           round((r4 - 4*mu*r3 + 6*mu*mu*r2 - 3*mu*mu*mu*mu)
                 / pow(r2 - mu*mu, 2.0) - 3.0, 4)                  AS kurt_qty
    FROM m
    """,
    tags=("agg", "stats"),
)
def agg_skew_kurtosis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Third/fourth standardized moments per group — population
    skewness and excess kurtosis, matching Spark's built-in
    ``skewness``/``kurtosis`` definitions (no sample-bias correction,
    which is why the oracle states the raw-moment algebra explicitly
    instead of calling DuckDB's sample-corrected builtins).

    Scale shape: Spark's side IS the builtins — a single-pass
    streaming central-moment aggregate inside whole-stage codegen, one
    shuffle with map-side partials; l_quantity's bounded domain keeps
    the fourth raw moment far from double overflow."""
    return (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.round(F.skewness("l_quantity"), 4).alias("skew_qty"),
            F.round(F.kurtosis("l_quantity"), 4).alias("kurt_qty"),
        )
    )


@query(
    "agg_exact_median_distributed",
    oracle="""
    SELECT l_returnflag, round(median(l_quantity), 4) AS median_qty
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("agg", "scalable", "custom-operator"),
)
def agg_exact_median_distributed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT interpolated median without a per-group value sort on one
    reducer: aggregate to a (group, value) frequency table, running-sum
    the counts in value order, and pick the bracketing rank(s) — the
    classic rank-selection rewrite that turns an O(group size) sort
    state into O(distinct values) aggregate state, the difference
    between a median over 100 TB of skewed fact rows and an OOM.
    Matches ``agg_percentile``'s sort-based `median()` exactly (even
    counts average the two middle values).

    Plan: two shuffles (value-level agg, then the tiny per-group
    window over distinct values) and map-side partials do the heavy
    reduction — the window input is |distinct values| rows per group,
    not |rows|."""
    li = load(spark, sf_dir, "lineitem")
    counts = li.groupBy("l_returnflag", "l_quantity").agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy("l_returnflag").orderBy("l_quantity").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    tot = Window.partitionBy("l_returnflag")
    c = (
        counts.withColumn("cum", F.sum("n").over(w))
        .withColumn("total", F.sum("n").over(tot))
    )
    lo_rank = F.floor((F.col("total") + 1) / 2)
    hi_rank = F.floor(F.col("total") / 2) + 1
    covers = lambda k: (F.col("cum") - F.col("n") < k) & (F.col("cum") >= k)  # noqa: E731
    return (
        c.groupBy("l_returnflag")
        .agg(
            F.max(F.when(covers(lo_rank), F.col("l_quantity"))).alias("_lo"),
            F.max(F.when(covers(hi_rank), F.col("l_quantity"))).alias("_hi"),
        )
        .select(
            "l_returnflag",
            F.round((F.col("_lo") + F.col("_hi")) / 2.0, 4).alias("median_qty"),
        )
    )


@query(
    "agg_exact_quantiles_distributed",
    oracle="""
    SELECT l_returnflag,
           round(quantile_cont(l_quantity, 0.25), 4) AS p25_qty,
           round(quantile_cont(l_quantity, 0.50), 4) AS p50_qty,
           round(quantile_cont(l_quantity, 0.75), 4) AS p75_qty
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("agg", "scalable", "custom-operator"),
)
def agg_exact_quantiles_distributed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT interpolated quartiles by rank selection over a value-
    frequency table — ``agg_exact_median_distributed`` generalized to
    quantile_cont semantics (position h=(n-1)q over the multiset,
    linear interpolation between the bracketing order statistics).
    Aggregate state is O(distinct values) per group instead of a full
    per-group sort, so the same query runs over 100 TB of fact rows.

    Quantiles are restricted to dyadic fractions (1/4, 1/2, 3/4) on
    purpose: h and the interpolation fraction are then exactly
    representable doubles, so the bracket choice and interpolated
    value are bit-identical on any engine — q=0.95 would put h within
    one ulp of an integer whenever (n-1) is a multiple of 20 and let
    the two engines pick different brackets."""
    li = load(spark, sf_dir, "lineitem")
    counts = li.groupBy("l_returnflag", "l_quantity").agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy("l_returnflag").orderBy("l_quantity").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    tot = Window.partitionBy("l_returnflag")
    c = (
        counts.withColumn("cum", F.sum("n").over(w))
        .withColumn("total", F.sum("n").over(tot))
    )

    def covers(rank):
        return (F.col("cum") - F.col("n") < rank) & (F.col("cum") >= rank)

    aggs, finals = [], ["l_returnflag"]
    for q, name in ((0.25, "p25_qty"), (0.50, "p50_qty"), (0.75, "p75_qty")):
        h = (F.col("total") - 1) * F.lit(q)
        lo = F.floor(h) + 1            # 1-based rank of the lower bracket
        frac = h - F.floor(h)
        hi = F.when(frac == 0, lo).otherwise(lo + 1)
        aggs += [
            F.max(F.when(covers(lo), F.col("l_quantity"))).alias(f"_lo_{name}"),
            F.max(F.when(covers(hi), F.col("l_quantity"))).alias(f"_hi_{name}"),
            F.max(frac).alias(f"_f_{name}"),  # constant within the group
        ]
        finals.append(
            F.round(
                F.col(f"_lo_{name}")
                + F.col(f"_f_{name}") * (F.col(f"_hi_{name}") - F.col(f"_lo_{name}")),
                4,
            ).alias(name)
        )
    return c.groupBy("l_returnflag").agg(*aggs).select(*finals)


@query(
    "agg_bitwise",
    oracle="""
    SELECT l_returnflag,
           bit_and(CAST(l_quantity AS BIGINT)) AS qty_and,
           bit_or(CAST(l_quantity AS BIGINT))  AS qty_or,
           bit_xor(CAST(l_quantity AS BIGINT)) AS qty_xor
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("agg",),
)
def agg_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise aggregates (AND/OR/XOR fold per group) — flag-mask
    consolidation and parity checking; single-pass, commutative, so
    map-side partials combine like any algebraic aggregate."""
    li = load(spark, sf_dir, "lineitem")
    q = F.col("l_quantity").cast("long")
    return li.groupBy("l_returnflag").agg(
        F.bit_and(q).alias("qty_and"),
        F.bit_or(q).alias("qty_or"),
        F.bit_xor(q).alias("qty_xor"),
    )


@query(
    "agg_entropy_group",
    oracle="""
    WITH c AS (
        SELECT user_id, event_type, count(*) AS n
        FROM events GROUP BY user_id, event_type
    ), t AS (
        SELECT user_id, event_type, n, sum(n) OVER (PARTITION BY user_id) AS tot
        FROM c
    )
    SELECT user_id,
           round(-sum((n * 1.0 / tot) * log2(n * 1.0 / tot)), 4) AS type_entropy,
           CAST(count(*) AS BIGINT) AS n_types
    FROM t GROUP BY user_id
    """,
    tags=("agg", "stats"),
)
def agg_entropy_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of each user's event-type mix — the behavioral-
    diversity score (0 = monomaniac, log2(5) = uniform over the five
    types). Two grouped aggregations over bounded keys; the inner
    count relation is |users| x |types|, so the window total is cheap
    at any scale. At most five log terms per user, so the 4-dp round
    is far above float noise."""
    ev = load(spark, sf_dir, "events")
    c = ev.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("n"))
    tot = Window.partitionBy("user_id")
    t = c.withColumn("tot", F.sum("n").over(tot))
    p = F.col("n") * 1.0 / F.col("tot")
    return t.groupBy("user_id").agg(
        F.round(-F.sum(p * F.log2(p)), 4).alias("type_entropy"),
        F.count(F.lit(1)).alias("n_types"),
    )


@query(
    "agg_geometric_mean",
    oracle="""
    SELECT l_returnflag,
           round(exp(avg(ln(1.0 + l_discount))), 4) AS geo_mean_factor,
           round(exp(avg(ln(l_extendedprice))), 2)  AS geo_mean_price
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("agg", "stats"),
)
def agg_geometric_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geometric mean via the log-space rewrite exp(avg(ln x)) — the
    compound-growth/ratio average engines lack as a builtin. The
    rewrite is also WHY it scales: a naive running product overflows
    a double after a few thousand factors, while the log-sum is an
    ordinary algebraic aggregate with map-side partials and bounded
    magnitude."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.exp(F.avg(F.log(F.lit(1.0) + F.col("l_discount")))), 4).alias(
            "geo_mean_factor"
        ),
        F.round(F.exp(F.avg(F.log("l_extendedprice"))), 2).alias("geo_mean_price"),
    )


@query(
    "agg_weighted_median",
    oracle="""
    WITH c AS (
        SELECT l_returnflag, l_extendedprice AS v, sum(l_quantity) AS w
        FROM lineitem GROUP BY l_returnflag, l_extendedprice
    ), t AS (
        SELECT l_returnflag, v, w,
               sum(w) OVER (PARTITION BY l_returnflag ORDER BY v
                            ROWS UNBOUNDED PRECEDING) AS cw,
               sum(w) OVER (PARTITION BY l_returnflag) AS tw
        FROM c
    )
    SELECT l_returnflag,
           round(min(CASE WHEN cw >= tw / 2.0 THEN v END), 4) AS weighted_median_price
    FROM t GROUP BY l_returnflag
    """,
    tags=("agg", "stats", "scalable", "custom-operator"),
)
def agg_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted (lower) median — the smallest value whose cumulative
    weight reaches half the total, weights = quantities: 'the price at
    which half the shipped units are cheaper'. Same rank-selection-
    over-a-frequency-table shape as agg_exact_median_distributed, but
    the frequency is a SUM of weights, which no sort-based percentile
    builtin supports — the rewrite is the only way to get it, and it
    scales the same way (aggregate state = distinct values)."""
    li = load(spark, sf_dir, "lineitem")
    c = li.groupBy("l_returnflag", F.col("l_extendedprice").alias("v")).agg(
        F.sum("l_quantity").alias("w")
    )
    w_cum = Window.partitionBy("l_returnflag").orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_tot = Window.partitionBy("l_returnflag")
    t = c.withColumn("cw", F.sum("w").over(w_cum)).withColumn(
        "tw", F.sum("w").over(w_tot)
    )
    return t.groupBy("l_returnflag").agg(
        F.round(
            F.min(F.when(F.col("cw") >= F.col("tw") / 2.0, F.col("v"))), 4
        ).alias("weighted_median_price")
    )


@query(
    "agg_variance_merge",
    oracle="""
    SELECT n.n_regionkey AS region,
           CAST(count(*) AS BIGINT)        AS n,
           round(var_pop(c.c_acctbal), 4)  AS var_bal
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_regionkey
    """,
    tags=("agg", "stats", "scalable", "custom-operator"),
)
def agg_variance_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact variance by MERGING per-nation summary states into
    region-level results — Chan's parallel update, written out as two
    grouped aggregations:

        state_i = (n_i, mean_i, M2_i)                 per nation
        merged  = (sum n_i,
                   weighted mean,
                   sum M2_i + sum n_i*(mean_i - mean)^2)   per region

    This is the algebra that makes EVERY distributed moment aggregate
    work (Spark's own partial aggregation does exactly this under the
    hood); stating it explicitly makes the mergeable-state contract
    testable — the oracle computes var_pop directly from the raw rows,
    so the hash check proves the merge is exact, not approximate. The
    same shape is how pre-aggregated daily summaries roll up to
    monthly stats without touching row data again."""
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    states = (
        # bounded: nation <= 25 rows
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_nationkey", "n_regionkey")
        .agg(
            F.count(F.lit(1)).alias("n_i"),
            F.avg("c_acctbal").alias("mean_i"),
            (F.var_pop("c_acctbal") * F.count(F.lit(1))).alias("m2_i"),
        )
    )
    merged = states.groupBy(F.col("n_regionkey").alias("region")).agg(
        F.sum("n_i").alias("n"),
        (F.sum(F.col("n_i") * F.col("mean_i")) / F.sum("n_i")).alias("mean"),
        F.sum("m2_i").alias("m2_within"),
        F.sum(F.col("n_i") * F.col("mean_i") * F.col("mean_i")).alias("nm2"),
    )
    # between-group term: sum n_i*(mean_i - mean)^2 = sum n_i*mean_i^2 - n*mean^2
    return merged.select(
        "region",
        "n",
        F.round(
            (F.col("m2_within") + F.col("nm2") - F.col("n") * F.col("mean") * F.col("mean"))
            / F.col("n"),
            4,
        ).alias("var_bal"),
    )
