"""Remaining TPC-H shapes (Q2, Q9, Q11, Q12, Q16, Q20, Q21), adapted.

The fixture has no ``partsupp`` table and ``lineitem`` carries no
commit/receipt dates or ship modes, so each query keeps its defining
plan shape (the part TPC-H exercises) while substituting fixture
columns:

* supply relation   -> distinct (l_partkey, l_suppkey) pairs from
  lineitem, with unit price ``min(l_extendedprice / l_quantity)`` as
  the supply-cost stand-in (min is order-insensitive, so the float is
  reproducible across engines);
* lateness          -> ``l_shipdate > o_orderdate + fixed interval``;
* supplier complaint-> negative account balance.

Scale notes repeat the house style: dims broadcast, the fact shuffles
once on its aggregation/join key, correlated subqueries are
decorrelated into window functions or aggregate-joins Catalyst can
plan, and top-k goes through TakeOrderedAndProject, never a full sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import query

# Shared supply-relation stand-in (partsupp proxy), SQL + DataFrame.
_SUPPLY_SQL = """
        SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
               min(l_extendedprice / l_quantity) AS ps_supplycost,
               sum(l_quantity) AS ps_shipqty
        FROM lineitem GROUP BY 1, 2"""


def _supply(
    spark: SparkSession, sf_dir: str, lineitem: DataFrame | None = None
) -> DataFrame:
    """``lineitem`` lets callers pre-filter the fact BELOW the supply
    aggregation: grouping on (partkey, suppkey) commutes with any
    partkey-/suppkey-level row filter, so a caller that only consumes
    one supplier slice can shrink the agg's exchange by the filter's
    selectivity instead of aggregating the full fact (round-11 100x
    burn-down for Q2/Q11)."""
    li = lineitem if lineitem is not None else load(spark, sf_dir, "lineitem")
    return li.groupBy(
        F.col("l_partkey").alias("ps_partkey"), F.col("l_suppkey").alias("ps_suppkey")
    ).agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("ps_supplycost"),
        F.sum("l_quantity").alias("ps_shipqty"),
    )


@query(
    "tpch_q2_min_cost_supplier",
    oracle=f"""
    WITH supply AS ({_SUPPLY_SQL})
    SELECT s_acctbal, s_name, n_name, p_partkey, p_brand
    FROM part
    JOIN supply ON p_partkey = ps_partkey
    JOIN supplier ON s_suppkey = ps_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE p_size <= 15 AND p_type = 'STANDARD' AND r_name = 'EUROPE'
      AND ps_supplycost = (
          SELECT min(ps2.ps_supplycost)
          FROM supply ps2
          JOIN supplier s2 ON s2.s_suppkey = ps2.ps_suppkey
          JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
          JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
          WHERE ps2.ps_partkey = p_partkey AND r2.r_name = 'EUROPE')
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
    tags=("analytics", "subquery"),
)
def tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 minimum-cost supplier. The correlated min-cost subquery is
    decorrelated into a window min over the region-filtered supply
    relation — one shuffle on partkey instead of a re-executed
    subquery per row. Bounded dims (nation, region) broadcast; the
    part/supplier slices scale with SF, so AQE picks their join
    strategy from observed sizes; limit is TakeOrderedAndProject.

    Round 11 (100x burn-down): the Europe-supplier filter is pushed
    BELOW the supply aggregation (grouping on (partkey, suppkey)
    commutes with a suppkey-level filter), so the dominant exchange
    aggregates the ~1/5 European slice of lineitem instead of all of
    it; the supplier relation is small enough for Catalyst's static
    auto-broadcast, so the push-down costs no lineitem shuffle. The
    per-part window min is unchanged — it runs over every European
    supplier of each part, exactly the correlated subquery's scope."""
    p = (
        load(spark, sf_dir, "part")
        .filter((F.col("p_size") <= 15) & (F.col("p_type") == "STANDARD"))
        .select("p_partkey", "p_brand")
    )
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    euro_snk = s.join(
        # bounded: nation x region <= 25 rows
        F.broadcast(n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)),
        s.s_nationkey == F.col("n_nationkey"),
    ).select("s_suppkey", "s_name", "s_acctbal", "n_name")
    li = load(spark, sf_dir, "lineitem").join(
        euro_snk.select("s_suppkey"), F.col("l_suppkey") == F.col("s_suppkey")
    )
    sup = _supply(spark, sf_dir, lineitem=li).join(
        euro_snk, F.col("ps_suppkey") == F.col("s_suppkey")
    )
    w = Window.partitionBy("ps_partkey")
    best = sup.withColumn("min_cost", F.min("ps_supplycost").over(w)).filter(
        F.col("ps_supplycost") == F.col("min_cost")
    )
    return (
        best.join(p, F.col("ps_partkey") == F.col("p_partkey"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_brand")
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@query(
    "tpch_q9_product_profit",
    oracle="""
    SELECT n_name AS nation, year(o_orderdate) AS o_year,
           round(sum(l_extendedprice * (1 - l_discount)
                     - 0.5 * p_retailprice * l_quantity), 2) AS sum_profit
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN orders ON o_orderkey = l_orderkey
    WHERE p_name LIKE 'red%'
    GROUP BY 1, 2
    ORDER BY nation, o_year DESC
    """,
    tags=("analytics",),
)
def tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 product-type profit (no partsupp: supply cost stands in as
    half the part retail price). Part filter broadcasts and prunes the
    fact first; orders is the only non-broadcast join and shares the
    orderkey shuffle; final agg shuffles on the tiny (nation, year)
    key."""
    p = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_name").like("red%"))
        .select("p_partkey", "p_retailprice")
    )
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = load(spark, sf_dir, "lineitem")
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - 0.5 * F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        # bounded: nation <= 25 rows
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(F.round(F.sum(profit), 2).alias("sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


@query(
    "tpch_q11_important_stock",
    oracle=f"""
    WITH supply AS ({_SUPPLY_SQL}),
    natsup AS (
        SELECT ps_partkey, ps_supplycost * ps_shipqty AS val
        FROM supply
        JOIN supplier ON s_suppkey = ps_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE n_name = 'NATION_7'
    )
    SELECT ps_partkey, round(sum(val), 2) AS part_value
    FROM natsup
    GROUP BY ps_partkey
    HAVING sum(val) > (SELECT sum(val) * 0.001 FROM natsup)
    ORDER BY part_value DESC, ps_partkey
    """,
    tags=("analytics", "subquery"),
)
def tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 important stock: per-part inventory value within one
    nation, kept when above a fraction of the nation total. The
    uncorrelated scalar subquery becomes a 1-row broadcast-joined
    aggregate — the nation slice is computed once and feeds both the
    per-part agg and the total.

    Round 11 (100x burn-down): the one-nation supplier filter is
    pushed BELOW the supply aggregation. Grouping on (partkey,
    suppkey) commutes with any suppkey-level row filter, so the
    supply agg runs over the ~1/25 nation slice of lineitem instead
    of all of it — the query's dominant exchange shrinks 25x, and the
    supplier side is small enough that Catalyst's static 10 MB
    auto-broadcast joins it without shuffling lineitem at all."""
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_7")
    # bounded: nation slice <= 25 rows
    s7 = s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).select("s_suppkey")
    li = load(spark, sf_dir, "lineitem").join(
        s7, F.col("l_suppkey") == F.col("s_suppkey")
    )
    natsup = _supply(spark, sf_dir, lineitem=li).select(
        "ps_partkey", (F.col("ps_supplycost") * F.col("ps_shipqty")).alias("val")
    )
    per_part = natsup.groupBy("ps_partkey").agg(F.sum("val").alias("raw_value"))
    total = natsup.agg((F.sum("val") * 0.001).alias("thresh"))
    return (
        # bounded: 1-row scalar aggregate
        per_part.join(F.broadcast(total))
        .filter(F.col("raw_value") > F.col("thresh"))
        .select("ps_partkey", F.round("raw_value", 2).alias("part_value"))
        .orderBy(F.col("part_value").desc(), "ps_partkey")
    )


@query(
    "tpch_q12_late_lines",
    oracle="""
    SELECT CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
                THEN 'late' ELSE 'ontime' END AS ship_bucket,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY 1
    ORDER BY ship_bucket
    """,
    tags=("analytics",),
)
def tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 shipping-mode/priority matrix (no l_shipmode: lines bucket
    by lateness against order date instead). One orderkey shuffle for
    the join, conditional-sum pivot, 2-row output.

    The orders side is reduced BEFORE its exchange (round 9): the
    priority string becomes the boolean it is only ever tested as, and
    the +60d lateness cutoff is folded into the projected timestamp —
    Catalyst keeps post-join expressions post-join, so without the
    explicit projection the exchange carries the raw string (100×
    interleaved A/B at shuffle=64: 5.9 → 5.4 s, identical output).

    Round 12 second pass (AB_R12B_100X): the orderkey join runs
    shuffled-hash with the thin (key, ts, bool) order projection as
    the build side — the 60M lines skip the SMJ sort, same as the
    rest of the orders x lineitem family got in r12. Interleaved
    5-run medians at 100x: 7.54 -> 6.16 s. The per-orderkey
    collect_list pre-aggregation (the q3/q4 trick adapted to carry
    the shipdate multiset) was built, measured, and LOST (12.5 s
    median): unlike q3's one-double revenue, the array buffers cost
    more than the key-repetition they remove."""
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        (F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")).alias("late_after"),
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH").alias("high"),
    )
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        li.join(o.hint("shuffle_hash"), li.l_orderkey == o.o_orderkey)
        .withColumn(
            "ship_bucket",
            F.when(F.col("l_shipdate") > F.col("late_after"), "late").otherwise(
                "ontime"
            ),
        )
        .groupBy("ship_bucket")
        .agg(
            F.sum(F.when(F.col("high"), 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~F.col("high"), 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("ship_bucket")
    )


@query(
    "tpch_q16_supplier_part_count",
    oracle=f"""
    WITH supply AS ({_SUPPLY_SQL})
    SELECT p_brand, p_type, p_size, count(DISTINCT ps_suppkey) AS supplier_cnt
    FROM supply JOIN part ON p_partkey = ps_partkey
    WHERE p_brand <> 'Brand#21' AND p_type <> 'PROMO' AND p_size <= 10
      AND ps_suppkey NOT IN (
          SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
    tags=("analytics", "subquery"),
)
def tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 supplier count per part attribute (complaint suppliers ->
    negative balance). NOT IN becomes a broadcast left-anti join —
    NULL-safe here because keys are non-null; the distinct count
    shuffles once on the 3-attribute key.

    Round 11 (100x burn-down): the supply AGGREGATE is gone — Q16
    consumes neither ps_supplycost nor ps_shipqty, only the distinct
    (partkey, suppkey) incidence, and count(DISTINCT ps_suppkey)
    deduplicates repeated pairs itself. Reading raw lineitem pairs
    drops the query's heaviest exchange (the full-fact (partkey,
    suppkey) agg with two value buffers, which on this fixture barely
    reduced row count anyway) AND two double columns from the parquet
    scan; what remains is the partkey join shuffle on 2-long rows and
    the small distinct-count exchange."""
    bad = load(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    p = (
        load(spark, sf_dir, "part")
        .filter(
            (F.col("p_brand") != "Brand#21")
            & (F.col("p_type") != "PROMO")
            & (F.col("p_size") <= 10)
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    pairs = load(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").alias("ps_partkey"),
        F.col("l_suppkey").alias("ps_suppkey"),
    )
    return (
        pairs
        .join(bad, F.col("ps_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(p, F.col("ps_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("ps_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


@query(
    "tpch_q20_excess_share_suppliers",
    oracle="""
    WITH red_ship AS (
        SELECT l_suppkey, l_partkey, sum(l_quantity) AS qty
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        WHERE p_name LIKE 'red%'
          AND l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01'
        GROUP BY 1, 2
    ), dominant AS (
        SELECT DISTINCT l_suppkey
        FROM red_ship a
        WHERE qty > 0.3 * (SELECT sum(qty) FROM red_ship b
                           WHERE b.l_partkey = a.l_partkey)
    )
    SELECT s_name, s_acctbal
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_7' AND s_suppkey IN (SELECT l_suppkey FROM dominant)
    ORDER BY s_name
    """,
    tags=("analytics", "subquery"),
)
def tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 suppliers holding an excess share (no ps_availqty: a
    supplier qualifies when it shipped >30% of a red part's 1997
    volume). The correlated sum decorrelates into a window sum over
    (partkey); the IN becomes a left-semi join."""
    p = load(spark, sf_dir, "part").filter(F.col("p_name").like("red%")).select(
        "p_partkey"
    )
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    red = (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    w = Window.partitionBy("l_partkey")
    dominant = (
        red.withColumn("part_qty", F.sum("qty").over(w))
        .filter(F.col("qty") > 0.3 * F.col("part_qty"))
        .select("l_suppkey")
        .distinct()
    )
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_7")
    return (
        # bounded: nation slice <= 25 rows
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(dominant, s.s_suppkey == F.col("l_suppkey"), "left_semi")
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )


@query(
    "tpch_q21_waiting_supplier",
    oracle="""
    WITH late AS (
        SELECT l_orderkey, l_suppkey, l_shipdate
        FROM lineitem JOIN orders ON o_orderkey = l_orderkey
        WHERE o_orderstatus = 'F'
          AND l_shipdate > o_orderdate + INTERVAL 30 DAY
    )
    SELECT s_name, count(*) AS numwait
    FROM late l1 JOIN supplier ON s_suppkey = l1.l_suppkey
    WHERE EXISTS (
            SELECT 1 FROM lineitem l2
            WHERE l2.l_orderkey = l1.l_orderkey
              AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (
            SELECT 1 FROM late l3
            WHERE l3.l_orderkey = l1.l_orderkey
              AND l3.l_suppkey <> l1.l_suppkey)
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 100
    """,
    tags=("analytics", "subquery"),
)
def tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 suppliers who kept finished orders waiting (lateness =
    shipped >30 days after order date).

    The EXISTS / NOT EXISTS pair decorrelates into per-order facts.
    Rounds 4-9 computed them as two count_distinct aggregates and
    joined them back — correct, but lineitem crossed the wire TWICE
    (the raw join side plus order_supps' partial-aggregate exchange of
    ~every (orderkey, suppkey) pair) and the aggregates re-joined on
    the same key. Round 10: both facts are windowed min/max over the
    ONE l_orderkey partitioning the orders join already established —

        EXISTS other supplier       <=>  min(suppkey) != max(suppkey)
        NOT EXISTS other late supp  <=>  min(late supp) == max(late supp)

    (distinct-count >= 2 and == 1 need only the extremes, never the
    count), so the exists/not-exists legs SHARE the join's exchange:
    lineitem shuffles once, the WindowExec adds a per-partition sort
    on the already-clustered key, and both legs evaluate in one pass.
    Interleaved 100x A/B (AB_Q21_r10.json, identical results at
    sf0.01): two-exchange 25.0-31.2 s vs one-exchange 4.95-10.2 s —
    5.1x, moving q21 from ~2x DuckDB to under it.

    The orders build keeps its shuffle_hash hint: a narrow 2-long-
    column, <=1-row-per-key build whose per-partition maps stay
    bounded under the factor-scaled partition discipline
    (re-adjudicated at 100x in round 9; tools/bench10x.py)."""
    o = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
        .hint("shuffle_hash")
    )
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    joined = li.join(o, li.l_orderkey == o.o_orderkey).withColumn(
        "is_late",
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"),
    )
    w = Window.partitionBy("l_orderkey")
    late_supp = F.when(F.col("is_late"), F.col("l_suppkey"))
    per_order = joined.select(
        "l_orderkey",
        "l_suppkey",
        "is_late",
        (F.min("l_suppkey").over(w) != F.max("l_suppkey").over(w)).alias(
            "has_other_supp"
        ),
        F.min(late_supp).over(w).alias("late_min"),
        F.max(late_supp).over(w).alias("late_max"),
    )
    blamed = per_order.filter(
        F.col("is_late")
        & F.col("has_other_supp")
        & (F.col("late_min") == F.col("late_max"))
    )
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        blamed.join(s, blamed.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(100)
    )
