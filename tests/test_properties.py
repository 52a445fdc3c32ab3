"""Property-based spot checks (SURVEY.md §5.2.6): algebraic identities
that must hold for any data — run over hypothesis-generated literal
frames (bounded sizes: each example pays Spark job overhead)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),          # key (collisions likely)
        st.integers(min_value=-1000, max_value=1000),   # value
    ),
    min_size=1,
    max_size=30,
)

_SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(data=rows)
@settings(**_SETTINGS)
def test_count_splits_by_filter(spark, data):
    df = spark.createDataFrame(data, schema="k int, v int")
    pred = F.col("v") > 0
    assert df.filter(pred).count() + df.filter(~pred).count() == df.count()


@given(data=rows)
@settings(**_SETTINGS)
def test_groupby_sum_equals_global_sum(spark, data):
    df = spark.createDataFrame(data, schema="k int, v int")
    grouped = df.groupBy("k").agg(F.sum("v").alias("s"))
    total_grouped = grouped.agg(F.sum("s").alias("t")).collect()[0]["t"]
    total = df.agg(F.sum("v").alias("t")).collect()[0]["t"]
    assert total_grouped == total


@given(data=rows)
@settings(**_SETTINGS)
def test_distinct_plus_dups_partition_rows(spark, data):
    df = spark.createDataFrame(data, schema="k int, v int")
    n_distinct = df.distinct().count()
    dup_count = (
        df.groupBy("k", "v").agg((F.count(F.lit(1)) - 1).alias("extra"))
        .agg(F.sum("extra").alias("d")).collect()[0]["d"]
    )
    assert n_distinct + dup_count == df.count()


@given(data=rows)
@settings(**_SETTINGS)
def test_semi_anti_partition_left(spark, data):
    df = spark.createDataFrame(data, schema="k int, v int")
    right = df.filter(F.col("v") % 2 == 0).select("k").distinct()
    semi = df.join(right, "k", "left_semi").count()
    anti = df.join(right, "k", "left_anti").count()
    assert semi + anti == df.count()


asof_side = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),    # join key
        st.integers(min_value=0, max_value=20),   # ts
        st.integers(min_value=-99, max_value=99), # payload / tie-break
    ),
    min_size=1,
    max_size=15,
)


@given(left=asof_side, right=asof_side)
@settings(**_SETTINGS)
def test_asof_join_matches_pandas_merge_asof(spark, left, right):
    """Backward inclusive as-of join == pandas.merge_asof (the widely
    used reference semantics), including key groups with no match and
    same-timestamp ties (ours: greatest tie_break; pandas: last row in
    sort order, so sorting right by (ts, payload) aligns the two)."""
    import pandas as pd

    from appstore_aws_etl_spark.operators.asof import asof_join

    ldf = spark.createDataFrame(left, schema="k int, ts int, lv int")
    rdf = spark.createDataFrame(right, schema="k int, ts int, rv int")
    got = {
        (r["k"], r["ts"], r["lv"], r["asof_rv"])
        for r in asof_join(
            ldf, rdf, on=["k"], left_ts="ts", right_ts="ts",
            right_payload=["rv"], tie_break="rv",
        ).collect()
    }
    lp = pd.DataFrame(left, columns=["k", "ts", "lv"]).sort_values(["ts", "k", "lv"])
    rp = pd.DataFrame(right, columns=["k", "ts", "rv"]).sort_values(["ts", "rv"])
    ref_pdf = pd.merge_asof(lp, rp, on="ts", by="k", direction="backward")
    ref = {
        (int(r.k), int(r.ts), int(r.lv), None if pd.isna(r.rv) else int(r.rv))
        for r in ref_pdf.itertuples()
    }
    assert got == ref


@given(data=rows, frac=st.sampled_from([0.1, 0.25, 0.5, 1.0]))
@settings(**_SETTINGS)
def test_stratified_sample_quota_exact(spark, data, frac):
    """Every stratum contributes exactly ceil(frac * n) rows, for any
    stratum distribution and fraction."""
    import math

    from appstore_aws_etl_spark.llm.sampling import stratified_sample

    uniq = {(k, v) for k, v in data}
    df = spark.createDataFrame(
        [(k, i) for i, (k, _) in enumerate(uniq)], schema="k int, id int"
    )
    expected = {}
    for k, _ in uniq:
        expected[k] = expected.get(k, 0) + 1
    expected = {k: math.ceil(frac * n) for k, n in expected.items()}
    got = {
        r["k"]: r["count"]
        for r in stratified_sample(df, ["k"], "id", frac).groupBy("k").count().collect()
    }
    assert got == expected


edges_strategy = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=25),
        st.integers(min_value=1, max_value=25),
    ),
    min_size=1,
    max_size=30,
).filter(lambda es: any(a != b for a, b in es))


@given(edges=edges_strategy)
@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_label_propagation_matches_union_find(spark, edges):
    """Any random edge set: the distributed relax+compress walk must
    produce exactly the per-component minimum a sequential union-find
    computes."""
    from appstore_aws_etl_spark.operators.labelprop import propagate_min_labels

    edges = [(a, b) for a, b in edges if a != b]
    df = spark.createDataFrame(edges, schema="src int, dst int")
    und = df.union(df.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    labels = und.select(F.col("src").alias("node")).distinct().withColumn(
        "component", F.col("node")
    )
    got = {
        r["node"]: r["component"]
        for r in propagate_min_labels(und, labels, max_rounds=30).collect()
    }

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comp_min: dict[int, int] = {}
    nodes = {n for e in edges for n in e}
    for n in nodes:
        r = find(n)
        comp_min[r] = min(comp_min.get(r, n), n)
    expect = {n: comp_min[find(n)] for n in nodes}
    assert got == expect


series_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),              # key
        st.floats(min_value=-100, max_value=100,
                  allow_nan=False, allow_infinity=False),   # value
    ),
    min_size=1,
    max_size=40,
)


@given(data=series_strategy)
@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_ewma_segmented_equals_single_pass(spark, data):
    """Any random per-key series: the (key, time-segment) pre-split
    path with seed stitching must reproduce the single-pass EWMA.
    The stitch is exact algebra but reassociates float ops, so the
    operator's contract (timeseries.py ewma docstring) promises
    equality of UNROUNDED values within float ulp — compared here at
    rtol 1e-9 on round_to=None outputs. (Comparing rounded outputs
    with an absolute 1e-6 tolerance is wrong: ~1e-12 stitch drift can
    straddle a 6-dp rounding boundary, making the two rounded values
    differ by exactly one quantum — hypothesis finds such inputs.)"""
    import datetime as dt
    import math

    from appstore_aws_etl_spark.operators.timeseries import ewma

    base = dt.datetime(2024, 1, 1)
    rows = [
        (k, i, base + dt.timedelta(seconds=7 * i), float(v))
        for i, (k, v) in enumerate(data)
    ]
    df = spark.createDataFrame(rows, schema="user_id int, event_id int, ts timestamp, value double")
    kwargs = dict(key="user_id", ts="ts", value="value", alpha=0.35,
                  order_cols=("event_id",), round_to=None)
    single = {
        (r["user_id"], r["event_id"]): r["ewma"]
        for r in ewma(df, **kwargs).collect()
    }
    segmented = {
        (r["user_id"], r["event_id"]): r["ewma"]
        for r in ewma(df, seg_seconds=20, **kwargs).collect()  # ~3 rows/segment
    }
    assert set(single) == set(segmented)
    for k in single:
        assert math.isclose(single[k], segmented[k], rel_tol=1e-9, abs_tol=1e-9), (
            k, single[k], segmented[k],
        )


@given(data=st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),      # key
        st.integers(min_value=0, max_value=72),     # hour offset (3 days)
        st.integers(min_value=-50, max_value=50),   # value
    ),
    min_size=1, max_size=25,
))
@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_gapfill_dense_span_and_sum_preserving(spark, data):
    """Any random sparse series: the gap-filled rollup must (a) emit
    one bucket per hour of each key's [first, last] activity span with
    no holes, (b) preserve each key's total event count and value sum,
    and (c) zero-fill exactly the silent buckets."""
    import datetime as dt

    from appstore_aws_etl_spark.operators.timeseries import gapfill_rollup

    base = dt.datetime(2024, 1, 1)
    rows = [
        (k, base + dt.timedelta(hours=h, minutes=7), float(v))
        for k, h, v in data
    ]
    df = spark.createDataFrame(rows, schema="k int, t timestamp, v double")
    out = gapfill_rollup(df, key="k", ts="t", grain="1 hour", agg_col="v").collect()

    per_key_hours: dict[int, set[int]] = {}
    per_key_n: dict[int, int] = {}
    per_key_sum: dict[int, float] = {}
    for r in out:
        h = int((r["bucket"] - base).total_seconds() // 3600)
        assert h not in per_key_hours.get(r["k"], set())  # no dup buckets
        per_key_hours.setdefault(r["k"], set()).add(h)
        per_key_n[r["k"]] = per_key_n.get(r["k"], 0) + r["n_events"]
        per_key_sum[r["k"]] = per_key_sum.get(r["k"], 0.0) + r["sum_v"]

    want_hours: dict[int, list[int]] = {}
    want_n: dict[int, int] = {}
    want_sum: dict[int, float] = {}
    for k, h, v in data:
        want_hours.setdefault(k, []).append(h)
        want_n[k] = want_n.get(k, 0) + 1
        want_sum[k] = want_sum.get(k, 0.0) + v
    for k, hs in want_hours.items():
        assert per_key_hours[k] == set(range(min(hs), max(hs) + 1))  # dense span
        assert per_key_n[k] == want_n[k]
        assert abs(per_key_sum[k] - round(want_sum[k], 2)) < 1e-6


@given(data=st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),      # key
        st.integers(min_value=0, max_value=30),     # hour offset
        st.integers(min_value=-50, max_value=50),   # value
    ),
    min_size=1, max_size=20,
))
@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_interpolate_linear_matches_numpy_interp(spark, data):
    """Any random sparse series: the distributed linear interpolation
    must equal numpy.interp over each key's observed (hour, mean)
    points at every dense bucket (to the operator's 4-dp rounding),
    mark exactly the unobserved buckets as gaps, and never extrapolate
    outside the observed span."""
    import datetime as dt

    import numpy as np

    from appstore_aws_etl_spark.operators.timeseries import interpolate_linear

    base = dt.datetime(2024, 1, 1)
    rows = [
        (k, base + dt.timedelta(hours=h, minutes=11), float(v))
        for k, h, v in data
    ]
    df = spark.createDataFrame(rows, schema="k int, t timestamp, v double")
    out = interpolate_linear(df, key="k", ts="t", value="v", grain="1 hour").collect()

    obs: dict[int, dict[int, list[float]]] = {}
    for k, h, v in data:
        obs.setdefault(k, {}).setdefault(h, []).append(float(v))
    expect: dict[int, dict[int, float]] = {}
    observed_hours: dict[int, set[int]] = {}
    for k, by_h in obs.items():
        hs = sorted(by_h)
        means = [round(float(np.mean(by_h[h])), 4) for h in hs]
        observed_hours[k] = set(hs)
        dense = range(hs[0], hs[-1] + 1)
        interped = np.interp(list(dense), hs, means)
        expect[k] = {h: float(y) for h, y in zip(dense, interped)}

    seen: dict[int, set[int]] = {}
    for r in out:
        h = int((r["bucket"] - base).total_seconds() // 3600)
        k = r["k"]
        assert h in expect[k]  # never outside the observed span
        assert h not in seen.get(k, set())  # no duplicate buckets
        seen.setdefault(k, set()).add(h)
        assert r["is_gap"] == (h not in observed_hours[k])
        assert abs(r["value_interp"] - expect[k][h]) <= 1e-4 + 1e-9
    for k in expect:
        assert seen[k] == set(expect[k])  # dense span, no holes


@given(vecs=st.lists(
    st.lists(st.floats(min_value=-4, max_value=4, allow_nan=False,
                       allow_infinity=False, width=32),
             min_size=4, max_size=4),
    min_size=1, max_size=12,
))
@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_semantic_dedup_matches_sequential_greedy(spark, vecs):
    """Any random vector set, forced into ONE cluster: the distributed
    keep-first greedy must return exactly what a sequential reference
    greedy computes (keep a vector iff it is not >= threshold-similar
    to any already-KEPT lower-id vector)."""
    import math

    from appstore_aws_etl_spark.llm.similarity import semantic_dedup

    # avoid zero vectors (cosine undefined; operator clamps the norm)
    vecs = [v if any(abs(x) > 1e-6 for x in v) else [1.0, 0, 0, 0] for v in vecs]
    threshold = 0.9
    df = spark.createDataFrame(
        [(i, [float(x) for x in v], 0) for i, v in enumerate(vecs)],
        schema="vec_id long, embedding array<double>, label int",
    )
    got = {r["vec_id"] for r in
           semantic_dedup(df, n_centroids=1, iterations=1,
                          threshold=threshold).collect()}

    def cos(a, b):
        da = math.sqrt(sum(x * x for x in a)) or 1e-12
        db = math.sqrt(sum(x * x for x in b)) or 1e-12
        return sum(x * y for x, y in zip(a, b)) / (da * db)

    kept: list[int] = []
    for i, v in enumerate(vecs):
        if all(cos(v, vecs[j]) < threshold for j in kept):
            kept.append(i)
    assert got == set(kept)


@given(data=st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=10_000),   # order key
        st.integers(min_value=-100, max_value=100),   # integer value (exact sums)
    ),
    min_size=1, max_size=60, unique_by=lambda t: t[0],
))
@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_prefix_sum_partition_count_invariant(spark, data):
    """The two-phase prefix sum must equal the sequential cumulative sum
    for EVERY partition count (regression net for the r5 bug where two
    independent evaluations of repartitionByRange could sample different
    range boundaries and corrupt the offsets). Integer values make the
    comparison exact."""
    from appstore_aws_etl_spark.operators.prefix import partitioned_prefix_sum

    df = spark.createDataFrame(
        [(k, float(v)) for k, v in data], schema="k int, v double"
    )
    want = {}
    run = 0.0
    for k, v in sorted(data):
        run += v
        want[k] = run
    for parts in (1, 3, 11):
        out = partitioned_prefix_sum(
            df, value="v", order_by=["k"], out="cum", num_partitions=parts
        )
        got = {r["k"]: r["cum"] for r in out.collect()}
        assert got == want, f"num_partitions={parts}"


@given(edges=edges_strategy, k=st.sampled_from([2, 3]))
@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_kcore_matches_sequential_peel(spark, edges, k):
    """Any random graph: the distributed peel must keep exactly the
    nodes a sequential peel keeps, with the same within-core degrees."""
    from appstore_aws_etl_spark.operators.kcore import kcore_nodes

    uniq = {(a, b) for a, b in edges if a != b}
    df = spark.createDataFrame(sorted(uniq), schema="src int, dst int")
    und = df.union(df.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    got = {r["node"]: r["degree"] for r in kcore_nodes(und, k=k).collect()}

    adj: dict[int, set[int]] = {}
    for a, b in uniq:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    changed = True
    while changed:
        changed = False
        for n in list(adj):
            if len(adj[n]) < k:
                for m in adj.pop(n):
                    if m in adj:
                        adj[m].discard(n)
                changed = True
    expect = {n: len(ns) for n, ns in adj.items()}
    assert got == expect


@given(data=st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),     # group
        st.integers(min_value=-50, max_value=50),  # value
    ),
    min_size=1, max_size=40,
))
@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_rank_selection_median_matches_sort_based(spark, data):
    """Any random grouped multiset: the value-frequency rank-selection
    median must equal Spark's sort-based median() exactly (dyadic
    interpolation on integer inputs is exact, so == not approx)."""
    df = spark.createDataFrame(
        [(k, float(v)) for k, v in data], schema="g int, v double"
    )
    from pyspark.sql import Window

    counts = df.groupBy("g", "v").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("g").orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    tot = Window.partitionBy("g")
    c = counts.withColumn("cum", F.sum("n").over(w)).withColumn(
        "total", F.sum("n").over(tot)
    )
    lo_r = F.floor((F.col("total") + 1) / 2)
    hi_r = F.floor(F.col("total") / 2) + 1
    covers = lambda r: (F.col("cum") - F.col("n") < r) & (F.col("cum") >= r)  # noqa: E731
    got = {
        r["g"]: r["med"]
        for r in c.groupBy("g")
        .agg(
            F.max(F.when(covers(lo_r), F.col("v"))).alias("_lo"),
            F.max(F.when(covers(hi_r), F.col("v"))).alias("_hi"),
        )
        .select("g", ((F.col("_lo") + F.col("_hi")) / 2.0).alias("med"))
        .collect()
    }
    want = {
        r["g"]: r["med"]
        for r in df.groupBy("g").agg(F.median("v").alias("med")).collect()
    }
    assert got == want


@given(data=st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),   # user
        st.integers(min_value=0, max_value=30),  # time
        st.integers(min_value=0, max_value=4),   # type
    ),
    min_size=1, max_size=40,
))
@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_running_distinct_matches_sequential(spark, data):
    """Any random event stream: the first-occurrence-flag rewrite must
    equal a sequential per-user set walk at every event."""
    import datetime as dt

    rows = [
        (u, i, dt.datetime(2024, 1, 1) + dt.timedelta(hours=t), f"t{ty}")
        for i, (u, t, ty) in enumerate(data)
    ]
    df = spark.createDataFrame(rows, schema="user_id int, event_id int, ts timestamp, event_type string")
    from pyspark.sql import Window

    w_first = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    w_run = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    got = {
        r["event_id"]: r["n"]
        for r in df.select(
            "user_id", "ts", "event_id",
            (F.row_number().over(w_first) == 1).alias("f"),
        )
        .select(
            "event_id",
            F.sum(F.when(F.col("f"), 1).otherwise(0)).over(w_run).alias("n"),
        )
        .collect()
    }
    seen: dict[int, set[str]] = {}
    for u, i, ts_, ty in sorted(rows, key=lambda r: (r[0], r[2], r[1])):
        seen.setdefault(u, set()).add(ty)
        assert got[i] == len(seen[u]), f"event {i}"


@given(data=st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),                  # key
        st.floats(min_value=-20, max_value=20,
                  allow_nan=False, allow_infinity=False),       # value
    ),
    min_size=1, max_size=40,
))
@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_cusum_reflected_walk_identity(spark, data):
    """Any random per-key series: the window-algebra closed form
    C_t - min(0, running-min C) must equal the direct recurrence
    S_t = max(0, S_{t-1} + d_t) to float tolerance."""
    import datetime as dt

    from pyspark.sql import Window

    rows = [
        (k, i, dt.datetime(2024, 1, 1) + dt.timedelta(minutes=i), float(v))
        for i, (k, v) in enumerate(data)
    ]
    df = spark.createDataFrame(rows, schema="k int, event_id int, ts timestamp, v double")
    w = Window.partitionBy("k").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    target = 1.5
    with_c = df.select(
        "k", "ts", "event_id",
        F.sum(F.col("v") - F.lit(target)).over(w).alias("c"),
    )
    got = {
        r["event_id"]: r["s"]
        for r in with_c.select(
            "event_id",
            (F.col("c") - F.least(F.lit(0.0), F.min("c").over(w))).alias("s"),
        ).collect()
    }
    state: dict[int, float] = {}
    for k, i, _ts, v in rows:
        state[k] = max(0.0, state.get(k, 0.0) + (v - target))
        assert abs(got[i] - state[k]) < 1e-9, f"event {i}"


@given(data=st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),    # group
        st.integers(min_value=0, max_value=30),   # value
        st.integers(min_value=1, max_value=9),    # weight
    ),
    min_size=1, max_size=30,
))
@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_weighted_median_matches_sequential(spark, data):
    """Any random weighted multiset: the cumulative-weight rank
    selection must return the smallest value whose cumulative weight
    reaches half the total — checked against a sequential walk."""
    from pyspark.sql import Window

    df = spark.createDataFrame(
        [(g, float(v), float(w)) for g, v, w in data], schema="g int, v double, w double"
    )
    c = df.groupBy("g", "v").agg(F.sum("w").alias("w"))
    w_cum = Window.partitionBy("g").orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_tot = Window.partitionBy("g")
    t = c.withColumn("cw", F.sum("w").over(w_cum)).withColumn(
        "tw", F.sum("w").over(w_tot)
    )
    got = {
        r["g"]: r["m"]
        for r in t.groupBy("g")
        .agg(F.min(F.when(F.col("cw") >= F.col("tw") / 2.0, F.col("v"))).alias("m"))
        .collect()
    }
    agg: dict[int, dict[float, float]] = {}
    for g, v, w in data:
        agg.setdefault(g, {})
        agg[g][float(v)] = agg[g].get(float(v), 0.0) + w
    for g, vw in agg.items():
        tot = sum(vw.values())
        cw = 0.0
        for v in sorted(vw):
            cw += vw[v]
            if cw >= tot / 2.0:
                assert got[g] == v, f"group {g}"
                break


@given(data=st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=1),    # user
        st.integers(min_value=0, max_value=5),    # hour
        st.integers(min_value=0, max_value=59),   # minute
        st.integers(min_value=-50, max_value=50), # value
    ),
    min_size=1, max_size=30,
))
@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_ohlc_bars_match_sequential(spark, data):
    """Any random tick stream: per-(user, hour) open/high/low/close
    must equal a sequential walk in (ts, event_id) order, including
    same-timestamp ties broken by event_id."""
    import datetime as dt

    import appstore_aws_etl_spark.queries  # noqa: F401

    rows = [
        (u, i, dt.datetime(2024, 1, 1, h, m), float(v))
        for i, (u, h, m, v) in enumerate(data)
    ]
    df = spark.createDataFrame(rows, schema="user_id int, event_id int, ts timestamp, value double")
    from pyspark.sql import Window

    w_open = Window.partitionBy("user_id", "bucket").orderBy("ts", "event_id")
    w_close = Window.partitionBy("user_id", "bucket").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    seq = df.select(
        "user_id", F.date_trunc("hour", "ts").alias("bucket"), "value", "ts", "event_id"
    ).select(
        "user_id", "bucket", "value",
        F.row_number().over(w_open).alias("ro"),
        F.row_number().over(w_close).alias("rc"),
    )
    got = {
        (r["user_id"], r["bucket"].hour): (r["open"], r["high"], r["low"], r["close"], r["n"])
        for r in seq.groupBy("user_id", "bucket").agg(
            F.max(F.when(F.col("ro") == 1, F.col("value"))).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max(F.when(F.col("rc") == 1, F.col("value"))).alias("close"),
            F.count(F.lit(1)).alias("n"),
        ).collect()
    }
    bars: dict[tuple, list] = {}
    for u, i, t, v in sorted(rows, key=lambda r: (r[0], r[2], r[1])):
        k = (u, t.hour)
        if k not in bars:
            bars[k] = [v, v, v, v, 0]
        bars[k][1] = max(bars[k][1], v)
        bars[k][2] = min(bars[k][2], v)
        bars[k][3] = v  # last in order = close
        bars[k][4] += 1
    assert got == {k: tuple(b) for k, b in bars.items()}
