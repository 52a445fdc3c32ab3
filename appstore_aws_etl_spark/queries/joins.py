"""§2.3 Joins (J1-J13).

Join strategy at scale (SURVEY.md §4.1): Catalyst picks broadcast-hash
for dims under the broadcast threshold, sort-merge for large x large;
AQE re-plans to broadcast at runtime and splits skewed partitions. The
queries here only *hint* where the right strategy is knowable a priori
(broadcast for bounded dims); plan shape is asserted in tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import fanout_width, load
from ..operators.asof import asof_join
from ..registry import query


@query(
    "join_inner",
    oracle="""
    SELECT o.o_orderkey, o.o_orderdate, l.l_linenumber,
           round(l.l_extendedprice * (1 - l.l_discount), 4) AS net_price
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_totalprice > 300000
    """,
    tags=("join",),
)
def join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 inner equi-join, fact x fact shape (sort-merge at scale).

    The selective orders filter is applied *before* the join — at 100 TB
    that's the difference between shuffling the full fact table and a
    few percent of it.
    """
    o = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    li = load(spark, sf_dir, "lineitem")
    return o.join(li, o.o_orderkey == li.l_orderkey).select(
        "o_orderkey",
        "o_orderdate",
        "l_linenumber",
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("net_price"),
    )


@query(
    "join_broadcast",
    oracle="""
    SELECT s.s_name,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           count(*) AS n_lines
    FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
    GROUP BY s.s_name
    """,
    tags=("join",),
)
def join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 broadcast hash join: the dim ships to every executor, the
    fact table never shuffles for the join (same SQL result as J1-style
    shuffle join — the hint is physical only). This is the contractual
    broadcast-join demonstrator (like udf_scalar for row UDFs); for a
    dim that grows with SF the production pattern is NO forced hint —
    AQE broadcasts from observed sizes (see the bounded-broadcast lint
    in tests/test_plan_lint.py, which exempts exactly this operator)."""
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    return (
        # bounded: contractual J2 broadcast demonstrator — lint-exempted
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


_BIG_ORDERS = "SELECT * FROM orders WHERE o_totalprice > 400000"


@query(
    "join_left",
    oracle=f"""
    SELECT c.c_custkey, o.o_orderkey
    FROM customer c LEFT JOIN ({_BIG_ORDERS}) o ON c.c_custkey = o.o_custkey
    """,
    tags=("join",),
)
def join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3 left outer join — unmatched customers survive with null keys."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return c.join(o, c.c_custkey == o.o_custkey, "left").select("c_custkey", "o_orderkey")


@query(
    "join_right",
    oracle=f"""
    SELECT o.o_orderkey, c.c_custkey
    FROM ({_BIG_ORDERS}) o RIGHT JOIN customer c ON c.c_custkey = o.o_custkey
    """,
    tags=("join",),
)
def join_right(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4 right outer join (mirror of J3)."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return o.join(c, c.c_custkey == o.o_custkey, "right").select("o_orderkey", "c_custkey")


@query(
    "join_full",
    oracle="""
    SELECT b.c_custkey AS building_cust, o.o_custkey AS big_spender_cust, o.o_orderkey
    FROM (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING') b
    FULL JOIN (SELECT o_custkey, o_orderkey FROM orders WHERE o_totalprice > 400000) o
      ON b.c_custkey = o.o_custkey
    """,
    tags=("join",),
)
def join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5 full outer join — unmatched rows from both sides survive."""
    b = (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    o = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 400000)
        .select("o_custkey", "o_orderkey")
    )
    return o.join(b, b.c_custkey == o.o_custkey, "full").select(
        F.col("c_custkey").alias("building_cust"),
        F.col("o_custkey").alias("big_spender_cust"),
        "o_orderkey",
    )


@query(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
    """,
    tags=("join",),
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J6 left semi join = EXISTS. Right side reduced to keys before the
    join; no row multiplication, no right columns leak."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@query(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
    """,
    tags=("join",),
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J7 left anti join = NOT EXISTS."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@query(
    "join_cross",
    oracle="""
    SELECT r.r_name, n.n_name FROM region r CROSS JOIN nation n
    """,
    tags=("join",),
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J8 Cartesian product — only ever sane on bounded inputs (5 x 25);
    the engine guards big crosses by requiring explicit crossJoin()."""
    r = load(spark, sf_dir, "region").select("r_name")
    n = load(spark, sf_dir, "nation").select("n_name")
    return r.crossJoin(n)


@query(
    "join_theta",
    oracle="""
    SELECT s.s_suppkey, c.c_custkey
    FROM supplier s JOIN customer c
      ON s.s_acctbal > c.c_acctbal AND s.s_nationkey <> c.c_nationkey
    """,
    tags=("join",),
)
def join_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J9 theta (non-equi) join -> broadcast nested loop; bounded sides
    by construction (supplier is 10 rows x sf)."""
    s = load(spark, sf_dir, "supplier")
    c = load(spark, sf_dir, "customer")
    cond = (s.s_acctbal > c.c_acctbal) & (s.s_nationkey != c.c_nationkey)
    return s.join(c, cond).select("s_suppkey", "c_custkey")


@query(
    "join_range",
    oracle="""
    SELECT o.o_orderkey, l.l_linenumber, o.o_orderdate, l.l_shipdate
    FROM orders o JOIN lineitem l
      ON o.o_orderkey = l.l_orderkey
     AND l.l_shipdate BETWEEN o.o_orderdate AND o.o_orderdate + INTERVAL 60 DAY
    """,
    tags=("join",),
)
def join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J10 range join: equi key + time-interval containment. The equi
    key drives the shuffle; the range predicate evaluates as the hash
    join's residual condition (never a nested loop).

    Round 14 (guide §3.1): the orders side — projected to the two
    columns the query needs, 16 bytes/row — is the shuffled-hash BUILD
    under partition discipline: the explicit ``repartition(w, key)``
    derives w from the LINEITEM bytes (the bigger side), and orders is
    a fixed ~1/4 of lineitem's rows at a fraction of its width, so the
    per-partition build is bounded by construction at any scale (the
    r8 hint ban targeted unbounded session-width fact builds). SHJ
    removes both sides' sorts; interleaved 100x A/B
    (AB_JOINS100X_r14): 4.62 -> 3.31 s median. At sf0.1 the width
    collapses to the session width (plan shape unchanged vs the hint
    alone; 1x SHJ already measured faster in r7)."""
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = load(spark, sf_dir, "lineitem")
    w = fanout_width(
        spark, sf_dir, "lineitem", expansion=4, bytes_per_partition=32 << 20
    )
    o = o.repartition(w, "o_orderkey")
    li = li.select("l_orderkey", "l_linenumber", "l_shipdate").repartition(
        w, "l_orderkey"
    )
    cond = (
        (o.o_orderkey == li.l_orderkey)
        & (li.l_shipdate >= o.o_orderdate)
        & (li.l_shipdate <= F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
    )
    return o.hint("shuffle_hash").join(li, cond).select(
        "o_orderkey", "l_linenumber", "o_orderdate", "l_shipdate"
    )


@query(
    "join_asof",
    oracle="""
    WITH c AS (
        SELECT user_id, date_trunc('second', ts) AS cts, event_id
        FROM events WHERE event_type = 'click'
    ), p AS (
        SELECT user_id, date_trunc('second', ts) AS pts, event_id
        FROM events WHERE event_type = 'purchase'
    )
    SELECT p.event_id AS purchase_id,
           p.user_id,
           p.pts AS purchase_ts,
           (SELECT max(c.event_id) FROM c
             WHERE c.user_id = p.user_id AND c.cts <= p.pts
               AND c.cts = (SELECT max(c2.cts) FROM c c2
                            WHERE c2.user_id = p.user_id AND c2.cts <= p.pts)
           ) AS asof_event_id
    FROM p
    """,
    tags=("join", "custom-operator"),
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J11 as-of join: each purchase event matched to the user's latest
    click at-or-before it (operators/asof.py; semantics = DuckDB
    ASOF JOIN with >=, ties -> greatest event_id).

    Timestamps are truncated to seconds first: the fixture is ns
    precision and Spark stores µs (SURVEY.md §7.4.3).
    """
    ev = load(spark, sf_dir, "events").withColumn(
        "ts2", F.date_trunc("second", F.col("ts"))
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts2").alias("cts"), "event_id"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", F.col("ts2").alias("purchase_ts")
    )
    return asof_join(
        purchases,
        clicks,
        on=["user_id"],
        left_ts="purchase_ts",
        right_ts="cts",
        right_payload=["event_id"],
        tie_break="event_id",
    ).select("purchase_id", "user_id", "purchase_ts", "asof_event_id")


@query(
    "join_multikey",
    oracle="""
    SELECT a.l_orderkey, a.l_linenumber, a.l_quantity, b.l_extendedprice
    FROM (SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem) a
    JOIN (SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem) b
      ON a.l_orderkey = b.l_orderkey AND a.l_linenumber = b.l_linenumber
    """,
    tags=("join",),
)
def join_multikey(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J12 composite-key equi-join (both key columns drive one shuffle).

    History of the join strategy: r7 hinted shuffle_hash; r8/r9 removed
    it after the 100x tier OOM'd the unbounded per-partition build at
    FIXED widths (shuffle=16 and 64 — ~400 MB deserialized build maps);
    rounds 8-13 ran sort-merge. Round 14 restores the hash build UNDER
    PARTITION DISCIPLINE (guide §3.1 + §2.5): the explicit
    ``repartition(w, keys)`` below derives w from the fact's on-disk
    bytes (fanout_width, expansion=4 parquet->in-memory decode,
    32 MB of input bytes per partition), so the per-partition build is
    bounded by construction at ANY scale — the exact condition whose
    absence caused the r8/r9 OOMs. SHJ then replaces both sides'
    O(n log n) sorts with an O(n) per-partition hash build; interleaved
    100x A/B (AB_JOINS100X_r14): SMJ-at-session-width 5.82 s ->
    width+SHJ 3.98 s median (width alone 4.93 — the sorts, not the
    width, are the cost). At sf0.1 the derived width collapses to the
    session width, so the bench plan keeps its measured shape."""
    li = load(spark, sf_dir, "lineitem")
    # both sides project the SAME columns so the two join inputs are
    # byte-identical subplans and Catalyst reuses ONE exchange
    # (ReusedExchange) for both — the shuffle WRITE of the dominant
    # fact exchange happens once instead of twice at the 100x tier,
    # where this key ran 7.5x behind DuckDB. The coalesce() outputs
    # reference each column from BOTH sides (values are equal — the
    # composite key is unique, the join 1:1) purely so column pruning
    # cannot re-narrow the sides back into two divergent, non-reusable
    # projections (round-9 plan work; asserted by test_plans.py).
    proj = li.select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
    w = fanout_width(
        spark, sf_dir, "lineitem", expansion=4, bytes_per_partition=32 << 20
    )
    proj = proj.repartition(w, "l_orderkey", "l_linenumber")
    a, b = proj.alias("a"), proj.hint("shuffle_hash").alias("b")
    return a.join(
        b,
        (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        & (F.col("a.l_linenumber") == F.col("b.l_linenumber")),
    ).select(
        F.col("a.l_orderkey").alias("l_orderkey"),
        F.col("a.l_linenumber").alias("l_linenumber"),
        F.coalesce(F.col("a.l_quantity"), F.col("b.l_quantity")).alias("l_quantity"),
        F.coalesce(
            F.col("b.l_extendedprice"), F.col("a.l_extendedprice")
        ).alias("l_extendedprice"),
    )


@query(
    "join_self",
    oracle="""
    SELECT a.s_suppkey AS supp_a, b.s_suppkey AS supp_b, a.s_nationkey
    FROM supplier a JOIN supplier b
      ON a.s_nationkey = b.s_nationkey AND a.s_suppkey < b.s_suppkey
    """,
    tags=("join",),
)
def join_self(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J13 self join via aliases: same-nation supplier pairs."""
    s = load(spark, sf_dir, "supplier")
    a, b = s.alias("a"), s.alias("b")
    return a.join(
        b,
        (F.col("a.s_nationkey") == F.col("b.s_nationkey"))
        & (F.col("a.s_suppkey") < F.col("b.s_suppkey")),
    ).select(
        F.col("a.s_suppkey").alias("supp_a"),
        F.col("b.s_suppkey").alias("supp_b"),
        F.col("a.s_nationkey"),
    )


@query(
    "join_null_safe",
    oracle="""
    SELECT c.c_custkey, c.grp AS c_grp, o.o_orderkey
    FROM (
        SELECT c_custkey, nullif(c_custkey % 7, 6) AS grp
        FROM customer WHERE c_custkey < 200
    ) c
    JOIN (
        SELECT o_orderkey, nullif(o_orderkey % 7, 6) AS grp
        FROM orders WHERE o_orderkey < 100
    ) o
      ON c.grp IS NOT DISTINCT FROM o.grp
    """,
    tags=("join",),
)
def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (<=> / IS NOT DISTINCT FROM): NULL keys
    match each other instead of vanishing — the semantics MERGE and CDC
    key-comparisons need. Catalyst plans <=> as a hash join on the
    key's null-wrapped form, so it stays shuffle-on-key (never a
    nested loop)."""
    c = (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") < 200)
        .select("c_custkey", F.nullif(F.col("c_custkey") % 7, F.lit(6)).alias("c_grp"))
    )
    o = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") < 100)
        .select("o_orderkey", F.nullif(F.col("o_orderkey") % 7, F.lit(6)).alias("o_grp"))
    )
    return c.join(o, c["c_grp"].eqNullSafe(o["o_grp"])).select(
        "c_custkey", "c_grp", "o_orderkey"
    )


@query(
    "join_bloom_prefilter",
    oracle="""
    SELECT o.o_orderkey, o.o_custkey, o.o_totalprice
    FROM orders o
    WHERE EXISTS (SELECT 1 FROM customer c
                  WHERE c.c_custkey = o.o_custkey AND c.c_acctbal > 9000)
    """,
    tags=("join", "runtime-filter"),
)
def join_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime-filter join: the dim side's join keys are compressed to
    a distinct set of 8192 hash buckets (a coarse Bloom filter built
    and applied entirely JVM-side), the fact table is pre-filtered by
    bucket membership via a broadcast semi-join, and only the
    survivors run the exact semi-join. False positives are eliminated
    by the exact stage, so the result equals the plain semi-join — the
    point at 100 TB is that the bucket prefilter is a few KB broadcast
    that drops most fact rows before the real join's shuffle/probe
    work. Mirrors Spark's own injected runtime bloom filters
    (spark.sql.optimizer.runtime.bloomFilter.enabled) but stays
    explicit and engine-portable."""
    o = load(spark, sf_dir, "orders")
    dim = load(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 9000)
    nbuckets = F.lit(8192)
    buckets = dim.select(F.pmod(F.xxhash64("c_custkey"), nbuckets).alias("b")).distinct()
    pre = o.join(
        # bounded: distinct hash buckets <= 8192 rows
        F.broadcast(buckets),
        F.pmod(F.xxhash64("o_custkey"), nbuckets) == F.col("b"),
        "left_semi",
    )
    # the exact stage's key list scales with SF (customer slice), so no
    # forced hint — AQE broadcasts it while observed-small and falls
    # back to a shuffled semi-join at scale; only the <=8192-row bucket
    # table above is unconditionally broadcastable.
    exact = pre.join(
        dim.select("c_custkey"),
        F.col("o_custkey") == F.col("c_custkey"),
        "left_semi",
    )
    return exact.select("o_orderkey", "o_custkey", "o_totalprice")


@query(
    "join_interval_overlap",
    oracle="""
    WITH a AS (
        SELECT user_id, event_id AS a_id,
               date_trunc('second', ts) AS a_start,
               date_trunc('second', ts) + INTERVAL 30 MINUTE AS a_end
        FROM events WHERE event_type = 'error'
    ), b AS (
        SELECT user_id, event_id AS b_id,
               date_trunc('second', ts) AS b_start,
               date_trunc('second', ts) + INTERVAL 30 MINUTE AS b_end
        FROM events WHERE event_type = 'purchase'
    )
    SELECT a.user_id, a.a_id, b.b_id,
           CAST(date_diff('second',
                          greatest(a.a_start, b.b_start),
                          least(a.a_end, b.b_end)) AS BIGINT) AS overlap_s
    FROM a JOIN b
      ON a.user_id = b.user_id AND a.a_start < b.b_end AND b.b_start < a.a_end
    """,
    tags=("join", "interval", "custom-operator"),
)
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap join via coarse time-bucket partitioning: each
    30-minute interval is exploded to the (at most two) 30-minute
    epoch bins it touches, candidates meet on the (user_id, bin)
    equi-key, duplicates from shared bins are dropped, and the exact
    overlap predicate filters the survivors. The oracle states the
    textbook theta-join; the Spark plan contains only hash joins — the
    bin explode bounds candidate generation the way a DuckDB/Trino
    interval-join binning rule would, and at 100 TB the bin width is
    the knob trading fanout (duration/width rows per interval) against
    candidate precision."""
    ev = load(spark, sf_dir, "events")

    def side(event_type: str, prefix: str):
        start = F.date_trunc("second", F.col("ts"))
        df = ev.filter(F.col("event_type") == event_type).select(
            "user_id",
            F.col("event_id").alias(f"{prefix}_id"),
            start.alias(f"{prefix}_start"),
            (start + F.expr("INTERVAL 30 MINUTES")).alias(f"{prefix}_end"),
        )
        return df.withColumn(
            "bin",
            F.explode(
                F.sequence(
                    F.floor(F.unix_timestamp(f"{prefix}_start") / 1800),
                    F.floor((F.unix_timestamp(f"{prefix}_end") - 1) / 1800),
                )
            ),
        )

    a, b = side("error", "a"), side("purchase", "b")
    joined = a.join(b, ["user_id", "bin"]).filter(
        (F.col("a_start") < F.col("b_end")) & (F.col("b_start") < F.col("a_end"))
    )
    return (
        joined.select("user_id", "a_id", "b_id", "a_start", "a_end", "b_start", "b_end")
        .distinct()
        .select(
            "user_id",
            "a_id",
            "b_id",
            (
                F.unix_timestamp(F.least("a_end", "b_end"))
                - F.unix_timestamp(F.greatest("a_start", "b_start"))
            ).alias("overlap_s"),
        )
    )


@query(
    "join_asof_nearest",
    oracle="""
    WITH l AS (
        SELECT user_id, event_id, date_trunc('second', ts) AS lts
        FROM events WHERE event_type = 'view'
    ), r AS (
        SELECT user_id, event_id AS r_id, date_trunc('second', ts) AS rts, value
        FROM events WHERE event_type = 'purchase'
        QUALIFY row_number() OVER (
            PARTITION BY user_id, date_trunc('second', ts) ORDER BY event_id DESC) = 1
    ), b AS (
        SELECT l.user_id, l.event_id, l.lts, r.r_id AS b_id, r.rts AS b_ts, r.value AS b_val
        FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.lts >= r.rts
    ), f AS (
        SELECT l.user_id, l.event_id, r.r_id AS f_id, r.rts AS f_ts, r.value AS f_val
        FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.lts <= r.rts
    )
    SELECT b.user_id, b.event_id,
           CASE WHEN b.b_ts IS NOT NULL AND (f.f_ts IS NULL
                     OR epoch(b.lts) - epoch(b.b_ts) <= epoch(f.f_ts) - epoch(b.lts))
                THEN b.b_id ELSE f.f_id END AS near_id,
           CASE WHEN b.b_ts IS NOT NULL AND (f.f_ts IS NULL
                     OR epoch(b.lts) - epoch(b.b_ts) <= epoch(f.f_ts) - epoch(b.lts))
                THEN b.b_val ELSE f.f_val END AS near_value
    FROM b JOIN f USING (user_id, event_id)
    """,
    tags=("join", "asof", "custom-operator"),
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-neighbor as-of join: each view event paired with the
    closest purchase of the same user in EITHER time direction
    (ties prefer the earlier/backward match). One union + one key
    partition with two window frames (operators/asof.py
    direction='nearest') — no inequality join anywhere. The right side
    is deduplicated to one row per (user, second) on both engines so
    tie-resolution is engine-independent."""
    from ..operators.asof import asof_join

    ev = load(spark, sf_dir, "events")
    sec = F.date_trunc("second", F.col("ts"))
    l = ev.filter(F.col("event_type") == "view").select(
        "user_id", "event_id", sec.alias("lts")
    )
    w = Window.partitionBy("user_id", "rts").orderBy(F.col("r_id").desc())
    r = (
        ev.filter(F.col("event_type") == "purchase")
        .select("user_id", F.col("event_id").alias("r_id"), sec.alias("rts"), "value")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    out = asof_join(
        l, r, on=["user_id"], left_ts="lts", right_ts="rts",
        right_payload=["r_id", "value"], tie_break="r_id", direction="nearest",
    )
    return out.select(
        "user_id",
        "event_id",
        F.col("asof_r_id").alias("near_id"),
        F.col("asof_value").alias("near_value"),
    )


@query(
    "join_salted_skew",
    oracle="""
    SELECT c_mktsegment,
           count(*) AS n_events,
           round(sum(value), 2) AS total_value
    FROM events JOIN customer ON user_id = c_custkey
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
    tags=("join", "skew", "custom-operator"),
)
def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key salted equi-join (operators/skew.py salted_join), then
    the usual segment rollup. Hot keys are passed explicitly (the four
    lowest user ids) so the salt path executes deterministically; the
    oracle is the PLAIN join — the whole point is that two-path
    salting is result-identical while spreading each hot key over 8
    salt buckets instead of one reducer.

    Scale shape: only the declared-hot slice of the right side is
    replicated (8x a handful of customer rows); the cold path is an
    ordinary shuffle join. At 100 TB hot keys come from a one-pass
    count (bounded parameter list), not a guess."""
    from ..operators.skew import salted_join

    ev = load(spark, sf_dir, "events").withColumnRenamed("user_id", "k")
    cust = load(spark, sf_dir, "customer").withColumnRenamed("c_custkey", "k")
    joined = salted_join(ev, cust, on="k", salt_buckets=8, how="inner",
                         hot_keys=[0, 1, 2, 3])
    return (
        joined.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .orderBy("c_mktsegment")
    )


@query(
    "join_asof_tolerance",
    oracle="""
    WITH c AS (
        SELECT user_id, date_trunc('second', ts) AS cts, event_id
        FROM events WHERE event_type = 'click'
    ), p AS (
        SELECT user_id, date_trunc('second', ts) AS pts, event_id
        FROM events WHERE event_type = 'purchase'
    )
    SELECT p.event_id AS purchase_id,
           p.user_id,
           p.pts AS purchase_ts,
           (SELECT max(c.event_id) FROM c
             WHERE c.user_id = p.user_id AND c.cts <= p.pts
               AND c.cts >= p.pts - INTERVAL 1 HOUR
               AND c.cts = (SELECT max(c2.cts) FROM c c2
                            WHERE c2.user_id = p.user_id AND c2.cts <= p.pts
                              AND c2.cts >= p.pts - INTERVAL 1 HOUR)
           ) AS asof_event_id
    FROM p
    """,
    tags=("join", "custom-operator"),
)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a match-distance cap (pandas merge_asof
    ``tolerance``): each purchase matched to the user's latest click
    at-or-before it, but only within the last hour — a stale quote
    must NOT attach. The cap is a row-local null-out after the carry
    (operators/asof.py tolerance_seconds), so the plan stays one
    shuffle + one window; the oracle states the same cap inside the
    correlated-subquery form of join_asof."""
    from ..operators.asof import asof_join

    ev = load(spark, sf_dir, "events").withColumn(
        "ts2", F.date_trunc("second", F.col("ts"))
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id"), F.col("ts2").alias("cts")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", F.col("ts2").alias("pts")
    )
    out = asof_join(
        purchases,
        clicks,
        on=["user_id"],
        left_ts="pts",
        right_ts="cts",
        right_payload=["event_id"],
        tie_break="event_id",
        tolerance_seconds=3600.0,
    )
    return out.select(
        "purchase_id",
        "user_id",
        F.col("pts").alias("purchase_ts"),
        F.col("asof_event_id"),
    )


@query(
    "join_pit_scd2",
    oracle="""
    WITH dim AS (
        SELECT c_custkey, c_acctbal AS bal_v1,
               TIMESTAMP '1990-01-01' AS valid_from,
               CASE WHEN c_custkey % 4 = 0 THEN TIMESTAMP '1995-06-01' END AS valid_to,
               1 AS version
        FROM customer
        UNION ALL
        SELECT c_custkey, round(c_acctbal + 100, 4), TIMESTAMP '1995-06-01',
               CAST(NULL AS TIMESTAMP), 2
        FROM customer WHERE c_custkey % 4 = 0
    )
    SELECT o.o_orderkey, o.o_custkey, o.o_orderdate,
           d.bal_v1 AS acctbal_asof, d.version
    FROM orders o
    JOIN dim d
      ON o.o_custkey = d.c_custkey
     AND o.o_orderdate >= d.valid_from
     AND (d.valid_to IS NULL OR o.o_orderdate < d.valid_to)
    ORDER BY o.o_orderkey
    """,
    tags=("join", "etl"),
)
def join_pit_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time fact lookup against an SCD Type-2 dimension — THE
    dimensional join of a warehouse: each order attaches the customer
    attribute version that was in effect ON ITS ORDER DATE, not the
    current one. The synthetic dimension gives every 4th customer a
    mid-range version break (1995-06-01), so facts genuinely split
    across versions.

    Scale shape: because SCD2 validity intervals PARTITION time per
    key, this is an equi-join on the surrogate/natural key with the
    interval bounds as a post-join filter — never a range/theta join.
    The dimension (even versioned) is orders of magnitude smaller than
    the fact table, so it broadcasts; at a dimension too big for
    broadcast the same plan degrades gracefully to a shuffled hash
    join on c_custkey. Exactly one version matches per fact row by
    construction, so the join neither duplicates nor drops facts."""
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    v1 = c.select(
        "c_custkey",
        F.col("c_acctbal").alias("bal_v1"),
        F.lit("1990-01-01").cast("timestamp").alias("valid_from"),
        F.when(
            F.col("c_custkey") % 4 == 0, F.lit("1995-06-01").cast("timestamp")
        ).alias("valid_to"),
        F.lit(1).alias("version"),
    )
    v2 = c.filter(F.col("c_custkey") % 4 == 0).select(
        "c_custkey",
        F.round(F.col("c_acctbal") + 100, 4).alias("bal_v1"),
        F.lit("1995-06-01").cast("timestamp").alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
        F.lit(2).alias("version"),
    )
    dim = v1.unionByName(v2)
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    return (
        o.join(
            dim,
            (F.col("o_custkey") == F.col("c_custkey"))
            & (F.col("o_orderdate") >= F.col("valid_from"))
            & (F.col("valid_to").isNull() | (F.col("o_orderdate") < F.col("valid_to"))),
        )
        .select(
            "o_orderkey",
            "o_custkey",
            "o_orderdate",
            F.col("bal_v1").alias("acctbal_asof"),
            "version",
        )
        .orderBy("o_orderkey")
    )
