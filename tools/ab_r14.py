"""Round-14 interleaved A/Bs (BASELINE.md protocol: same session,
alternating runs, medians AND mins).

Variant sets (pick with --set):
  ngram   old (session-width gram join) vs shipped (fanout width)
  joins   join_multikey / join_range / tpch_q5 re-plans
  audit   analytics_cohort_retention / ts_seasonal_baseline re-plans

    SPARK_GRAFT_SF_DIR=/tmp/bench10x/x100 SPARK_GRAFT_SHUFFLE=64 \
    SPARK_GRAFT_AQE=true python tools/ab_r14.py --set ngram --runs 3 \
        --out AB_NGRAMW100X_r14.json
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import appstore_aws_etl_spark.queries  # noqa: F401
from appstore_aws_etl_spark.catalog import fanout_width, load
from appstore_aws_etl_spark.ckpt import release_checkpoints
from appstore_aws_etl_spark.llm.dedup import ngram_jaccard_pairs
from appstore_aws_etl_spark.registry import REGISTRY
from appstore_aws_etl_spark.session import get_spark
from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


# ------------------------------------------------------------- ngram --
def old_jaccard(spark):
    docs = load(spark, SF_DIR, "documents")
    return ngram_jaccard_pairs(docs, n=3, scope_cols=["lang", "source"], df_cap=100)


def old_containment(spark):
    docs = load(spark, SF_DIR, "documents")
    return ngram_jaccard_pairs(
        docs, scope_cols=["lang", "source"], df_cap=100, include_containment=True
    )


def old_editdist(spark):
    docs = load(spark, SF_DIR, "documents")
    cand = ngram_jaccard_pairs(
        docs, n=3, scope_cols=["lang", "source"], df_cap=100, pairs_only=True
    )
    ta = docs.select(F.col("doc_id").alias("id_a"), F.col("text").alias("text_a"))
    tb = docs.select(F.col("doc_id").alias("id_b"), F.col("text").alias("text_b"))
    lev = F.levenshtein("text_a", "text_b")
    return (
        cand.join(ta, "id_a").join(tb, "id_b")
        .select("id_a", "id_b", lev.alias("lev_dist"),
                (F.round(1.0 - lev / F.greatest(F.length("text_a"),
                                                F.length("text_b")), 4)
                 + F.lit(0.0)).alias("lev_sim"))
    )


# ------------------------------------------------------------- joins --
def mk_width(spark):
    return fanout_width(spark, SF_DIR, "lineitem", expansion=4,
                        bytes_per_partition=32 << 20)


def new_join_multikey_w(spark):
    """Repartition-only arm: SMJ at a data-derived width, one reused
    exchange (today's shape, wider)."""
    li = load(spark, SF_DIR, "lineitem")
    proj = li.select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
    proj = proj.repartition(mk_width(spark), "l_orderkey", "l_linenumber")
    a, b = proj.alias("a"), proj.alias("b")
    return a.join(
        b,
        (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        & (F.col("a.l_linenumber") == F.col("b.l_linenumber")),
    ).select(
        F.col("a.l_orderkey").alias("l_orderkey"),
        F.col("a.l_linenumber").alias("l_linenumber"),
        F.coalesce(F.col("a.l_quantity"), F.col("b.l_quantity")).alias("l_quantity"),
        F.coalesce(F.col("b.l_extendedprice"), F.col("a.l_extendedprice")).alias("l_extendedprice"),
    )


def new_join_multikey_shj(spark):
    """Width + shuffled-hash arm: per-partition build bounded by the
    repartition discipline (bytes_per_partition), no sorts."""
    li = load(spark, SF_DIR, "lineitem")
    proj = li.select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
    proj = proj.repartition(mk_width(spark), "l_orderkey", "l_linenumber")
    a, b = proj.alias("a"), proj.hint("shuffle_hash").alias("b")
    return a.join(
        b,
        (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        & (F.col("a.l_linenumber") == F.col("b.l_linenumber")),
    ).select(
        F.col("a.l_orderkey").alias("l_orderkey"),
        F.col("a.l_linenumber").alias("l_linenumber"),
        F.coalesce(F.col("a.l_quantity"), F.col("b.l_quantity")).alias("l_quantity"),
        F.coalesce(F.col("b.l_extendedprice"), F.col("a.l_extendedprice")).alias("l_extendedprice"),
    )


def new_join_range_shj(spark):
    """Orders side (narrow: 2 carried cols) as the shuffled-hash build."""
    o = load(spark, SF_DIR, "orders").select("o_orderkey", "o_orderdate")
    li = load(spark, SF_DIR, "lineitem")
    cond = (
        (o.o_orderkey == li.l_orderkey)
        & (li.l_shipdate >= o.o_orderdate)
        & (li.l_shipdate <= F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
    )
    return o.hint("shuffle_hash").join(li, cond).select(
        "o_orderkey", "l_linenumber", "o_orderdate", "l_shipdate"
    )


def new_tpch_q5_shj(spark):
    o = load(spark, SF_DIR, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = load(spark, SF_DIR, "lineitem")
    c = load(spark, SF_DIR, "customer")
    s = load(spark, SF_DIR, "supplier")
    r = load(spark, SF_DIR, "region").filter(F.col("r_name") == "ASIA")
    n_asia = F.broadcast(
        load(spark, SF_DIR, "nation").join(
            F.broadcast(r), F.col("n_regionkey") == r.r_regionkey
        ).select("n_nationkey", "n_name")
    )
    s2 = s.join(n_asia, s.s_nationkey == F.col("n_nationkey")).select(
        "s_suppkey", F.col("s_nationkey").alias("supp_nk"), "n_name"
    )
    c2 = c.join(
        n_asia.select(F.col("n_nationkey").alias("cnk")),
        c.c_nationkey == F.col("cnk"),
    ).select("c_custkey", F.col("c_nationkey").alias("cust_nk"))
    li2 = li.join(s2, li.l_suppkey == s2.s_suppkey)
    o2 = o.join(c2, o.o_custkey == c2.c_custkey)
    return (
        li2.join(o2.hint("shuffle_hash"), li2.l_orderkey == o2.o_orderkey)
        .filter(F.col("cust_nk") == F.col("supp_nk"))
        .groupBy("n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
    )


# ------------------------------------------------------------- audit --
def new_cohort_window(spark):
    """distinct (user, week) pairs -> window min over user (one user
    exchange, no collect_set object agg)."""
    from pyspark.sql import Window

    ev = load(spark, SF_DIR, "events")
    pairs = (
        ev.select("user_id", F.date_trunc("week", F.col("ts")).alias("week"))
        .repartition("user_id")
        .groupBy("user_id", "week")
        .agg(F.count(F.lit(1)).alias("__n"))
    )
    w = Window.partitionBy("user_id")
    return (
        pairs.select(
            F.min("week").over(w).alias("cohort_week"),
            "week",
        )
        .select(
            "cohort_week",
            (F.datediff(F.col("week"), F.col("cohort_week")) / 7)
            .cast("long").alias("week_offset"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


def new_seasonal_shared_exchange(spark):
    """One user-keyed exchange shared by the grouped mean and a
    shuffled-hash join-back (no window sort)."""
    ev = load(spark, SF_DIR, "events")
    base = ev.select(
        "event_id", "user_id", "ts", "value", F.hour("ts").cast("long").alias("hr")
    ).repartition("user_id")
    season = base.groupBy("user_id", "hr").agg(
        F.round(F.avg("value"), 4).alias("seasonal")
    )
    return base.join(season.hint("shuffle_hash"), ["user_id", "hr"]).select(
        "event_id", "user_id", "hr", "seasonal",
        F.round(F.col("value") - F.col("seasonal"), 4).alias("residual"),
    )


SETS = {
    "ngram": {
        "llm_jaccard_ngram": ("old", old_jaccard),
        "llm_containment_pairs": ("old", old_containment),
        "llm_edit_distance_verify": ("old", old_editdist),
    },
    "joins": {
        "join_multikey.w": ("new", new_join_multikey_w),
        "join_multikey.shj": ("new", new_join_multikey_shj),
        "join_range.shj": ("new", new_join_range_shj),
        "tpch_q5_local_supplier_volume.shj": ("new", new_tpch_q5_shj),
    },
    "audit": {
        "analytics_cohort_retention.win": ("new", new_cohort_window),
        "ts_seasonal_baseline.shx": ("new", new_seasonal_shared_exchange),
    },
}

FORCED_EVAL = {"ts_seasonal_baseline"}


def main() -> None:
    args = sys.argv[1:]
    runs = 5
    out = None
    which = "ngram"
    if "--runs" in args:
        runs = int(args[args.index("--runs") + 1])
    if "--out" in args:
        out = args[args.index("--out") + 1]
    if "--set" in args:
        which = args[args.index("--set") + 1]

    spark = get_spark(
        "ab-r14",
        shuffle_partitions=int(os.environ.get("SPARK_GRAFT_SHUFFLE", "2")),
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.sql.adaptive.enabled": os.environ.get("SPARK_GRAFT_AQE", "false"),
        },
    )
    REGISTRY["agg_group"].fn(spark, SF_DIR).count()
    REGISTRY["udf_pandas"].fn(spark, SF_DIR).count()

    variants: dict[str, dict] = {}
    for label, (kind, alt) in SETS[which].items():
        key = label.split(".")[0]

        def act(df, key=key):
            if key in FORCED_EVAL:
                df.write.format("noop").mode("overwrite").save()
            else:
                df.count()

        variants[label] = {
            "shipped": (lambda key=key: act(REGISTRY[key].fn(spark, SF_DIR), key)),
            "alt": (lambda alt=alt, key=key: act(alt(spark), key)),
            "alt_kind": kind,
        }

    res: dict[str, dict[str, list[float]]] = {
        k: {"shipped": [], "alt": []} for k in variants
    }
    for label, v in variants.items():  # warm both arms
        try:
            v["shipped"]()
            release_checkpoints(spark)
            v["alt"]()
            release_checkpoints(spark)
        except Exception as e:
            print(f"{label}: warm FAILED {type(e).__name__}: {e}", flush=True)
    for i in range(runs):
        for label, v in variants.items():
            for arm in ("shipped", "alt"):
                t0 = time.perf_counter()
                try:
                    v[arm]()
                    res[label][arm].append(round(time.perf_counter() - t0, 4))
                except Exception as e:
                    print(f"{label}/{arm}: FAILED {type(e).__name__}", flush=True)
                    res[label][arm].append(-1.0)
                release_checkpoints(spark)

    summary = {}
    for label, r in res.items():
        ok_s = [t for t in r["shipped"] if t > 0]
        ok_a = [t for t in r["alt"] if t > 0]
        summary[label] = {
            "alt_is": variants[label]["alt_kind"],
            "shipped_median": round(statistics.median(ok_s), 3) if ok_s else None,
            "alt_median": round(statistics.median(ok_a), 3) if ok_a else None,
            "shipped_min": round(min(ok_s), 3) if ok_s else None,
            "alt_min": round(min(ok_a), 3) if ok_a else None,
            "runs_shipped": r["shipped"],
            "runs_alt": r["alt"],
        }
        s = summary[label]
        print(
            f"{label:44s} shipped med {s['shipped_median']} min {s['shipped_min']}"
            f" | alt({s['alt_is']}) med {s['alt_median']} min {s['alt_min']}"
        )
    if out:
        with open(out, "w") as fh:
            json.dump(
                {"sf_dir": SF_DIR, "runs": runs, "set": which,
                 "shuffle": os.environ.get("SPARK_GRAFT_SHUFFLE", "2"),
                 "aqe": os.environ.get("SPARK_GRAFT_AQE", "false"),
                 "results": summary},
                fh, indent=1,
            )
    spark.stop()


if __name__ == "__main__":
    main()
