"""Unit tests for custom composite operators on tiny literal frames."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Row

from appstore_aws_etl_spark.operators import asof_join, sessionize


def ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def test_asof_backward_inclusive(spark):
    left = spark.createDataFrame(
        [
            Row(k="a", lts=ts("2024-01-01 10:00:00"), lid=1),
            Row(k="a", lts=ts("2024-01-01 12:00:00"), lid=2),
            Row(k="b", lts=ts("2024-01-01 10:00:00"), lid=3),  # no match
        ]
    )
    right = spark.createDataFrame(
        [
            Row(k="a", rts=ts("2024-01-01 09:00:00"), rid=10, v=1.0),
            Row(k="a", rts=ts("2024-01-01 10:00:00"), rid=11, v=2.0),  # exact match
            Row(k="a", rts=ts("2024-01-01 11:30:00"), rid=12, v=3.0),
            Row(k="b", rts=ts("2024-01-01 10:00:01"), rid=13, v=4.0),  # after left
        ]
    )
    out = asof_join(
        left, right, on=["k"], left_ts="lts", right_ts="rts",
        right_payload=["rid", "v"], tie_break="rid",
    )
    got = {r["lid"]: (r["asof_rid"], r["asof_v"]) for r in out.collect()}
    assert got == {1: (11, 2.0), 2: (12, 3.0), 3: (None, None)}


def test_asof_rejects_reserved_payload_name(spark):
    left = spark.createDataFrame([Row(k="a", lts=ts("2024-01-01 10:00:00"))])
    right = spark.createDataFrame(
        [Row(k="a", rts=ts("2024-01-01 09:00:00"), __rts=1)]
    )
    with pytest.raises(ValueError, match="__rts"):
        asof_join(left, right, on=["k"], left_ts="lts", right_ts="rts",
                  right_payload=["__rts"])


def test_asof_strict_excludes_exact(spark):
    left = spark.createDataFrame([Row(k="a", lts=ts("2024-01-01 10:00:00"), lid=1)])
    right = spark.createDataFrame(
        [
            Row(k="a", rts=ts("2024-01-01 09:00:00"), rid=10),
            Row(k="a", rts=ts("2024-01-01 10:00:00"), rid=11),
        ]
    )
    out = asof_join(
        left, right, on=["k"], left_ts="lts", right_ts="rts",
        right_payload=["rid"], tie_break="rid", allow_exact_matches=False,
    )
    assert out.collect()[0]["asof_rid"] == 10


def test_asof_tie_break_takes_greatest(spark):
    left = spark.createDataFrame([Row(k="a", lts=ts("2024-01-01 10:00:00"), lid=1)])
    right = spark.createDataFrame(
        [
            Row(k="a", rts=ts("2024-01-01 09:00:00"), rid=10),
            Row(k="a", rts=ts("2024-01-01 09:00:00"), rid=12),
            Row(k="a", rts=ts("2024-01-01 09:00:00"), rid=11),
        ]
    )
    out = asof_join(
        left, right, on=["k"], left_ts="lts", right_ts="rts",
        right_payload=["rid"], tie_break="rid",
    )
    assert out.collect()[0]["asof_rid"] == 12


def test_asof_forward(spark):
    left = spark.createDataFrame(
        [
            Row(k="a", lts=ts("2024-01-01 10:00:00"), lid=1),
            Row(k="a", lts=ts("2024-01-01 12:00:00"), lid=2),  # no later right
        ]
    )
    right = spark.createDataFrame(
        [
            Row(k="a", rts=ts("2024-01-01 09:00:00"), rid=9),
            Row(k="a", rts=ts("2024-01-01 10:00:00"), rid=10),  # exact
            Row(k="a", rts=ts("2024-01-01 10:30:00"), rid=11),
        ]
    )
    inclusive = asof_join(
        left, right, on=["k"], left_ts="lts", right_ts="rts",
        right_payload=["rid"], tie_break="rid", direction="forward",
    )
    got = {r["lid"]: r["asof_rid"] for r in inclusive.collect()}
    assert got == {1: 10, 2: None}
    strict = asof_join(
        left, right, on=["k"], left_ts="lts", right_ts="rts",
        right_payload=["rid"], tie_break="rid", direction="forward",
        allow_exact_matches=False,
    )
    got = {r["lid"]: r["asof_rid"] for r in strict.collect()}
    assert got == {1: 11, 2: None}


def test_gapfill_rollup_dense_and_zero_filled(spark):
    from appstore_aws_etl_spark.operators.timeseries import gapfill_rollup

    ev = spark.createDataFrame(
        [
            Row(u=1, t=ts("2024-01-01 10:10:00"), v=1.0),
            Row(u=1, t=ts("2024-01-01 10:40:00"), v=2.0),
            # silent hours 11:00 and 12:00
            Row(u=1, t=ts("2024-01-01 13:05:00"), v=3.0),
            Row(u=2, t=ts("2024-01-01 00:00:00"), v=5.0),  # single-bucket span
        ]
    )
    out = gapfill_rollup(ev, key="u", ts="t", grain="1 hour", agg_col="v")
    rows = {(r["u"], r["bucket"].hour): (r["n_events"], r["sum_v"]) for r in out.collect()}
    assert rows == {
        (1, 10): (2, 3.0),
        (1, 11): (0, 0.0),
        (1, 12): (0, 0.0),
        (1, 13): (1, 3.0),
        (2, 0): (1, 5.0),
    }


def test_interpolate_linear_fills_gaps_on_the_line(spark):
    from appstore_aws_etl_spark.operators.timeseries import interpolate_linear

    ev = spark.createDataFrame(
        [
            Row(u=1, t=ts("2024-01-01 10:10:00"), v=1.0),
            Row(u=1, t=ts("2024-01-01 10:40:00"), v=3.0),  # hour 10 avg = 2.0
            # silent hours 11:00 and 12:00 -> thirds of the 2.0 -> 5.0 line
            Row(u=1, t=ts("2024-01-01 13:05:00"), v=5.0),
            Row(u=2, t=ts("2024-01-01 00:00:00"), v=7.0),  # single-bucket span
        ]
    )
    out = interpolate_linear(ev, key="u", ts="t", value="v", grain="1 hour")
    rows = {(r["u"], r["bucket"].hour): (r["value_interp"], r["is_gap"]) for r in out.collect()}
    assert rows == {
        (1, 10): (2.0, False),
        (1, 11): (3.0, True),
        (1, 12): (4.0, True),
        (1, 13): (5.0, False),
        (2, 0): (7.0, False),
    }


def test_merge_upsert_insert_update_passthrough(spark):
    from appstore_aws_etl_spark.operators.upsert import merge_upsert

    target = spark.createDataFrame(
        [Row(k=1, v="a", n=10), Row(k=2, v="b", n=20)]
    )
    source = spark.createDataFrame(
        [Row(k=2, v="B2", n=99), Row(k=3, v="c", n=30)]  # update + insert
    )
    out = {r["k"]: (r["v"], r["n"]) for r in merge_upsert(target, source, ["k"]).collect()}
    assert out == {1: ("a", 10), 2: ("B2", 99), 3: ("c", 30)}


def test_sessionize_gap(spark):
    df = spark.createDataFrame(
        [
            Row(u=1, t=ts("2024-01-01 10:00:00")),
            Row(u=1, t=ts("2024-01-01 10:03:00")),   # same session (<=5min)
            Row(u=1, t=ts("2024-01-01 10:09:00")),   # gap 6min -> new session
            Row(u=2, t=ts("2024-01-01 10:00:00")),
        ]
    )
    out = sessionize(df, key="u", ts="t", gap_seconds=300)
    got = {(r["u"], r["t"].minute): r["session_id"] for r in out.collect()}
    assert got == {(1, 0): 1, (1, 3): 1, (1, 9): 2, (2, 0): 1}


def test_scd2_collapses_multi_update_batches(spark):
    from datetime import datetime

    from appstore_aws_etl_spark.operators.scd import scd2_apply

    hist = spark.createDataFrame(
        [Row(k=1, attr="v0", valid_from=datetime(2024, 1, 1), valid_to=None)],
        "k int, attr string, valid_from timestamp, valid_to timestamp",
    )
    # two updates for the same key in one batch: only the latest lands
    upd = spark.createDataFrame(
        [
            Row(k=1, attr="v1", eff=datetime(2024, 2, 1)),
            Row(k=1, attr="v2", eff=datetime(2024, 3, 1)),
        ],
        "k int, attr string, eff timestamp",
    )
    out = scd2_apply(hist, upd, key="k", eff_ts_col="eff").collect()
    assert len(out) == 2  # closed original + one new open row (no fan-out)
    open_rows = [r for r in out if r["is_current"]]
    assert len(open_rows) == 1 and open_rows[0]["attr"] == "v2"
    closed = [r for r in out if not r["is_current"]]
    assert closed[0]["valid_to"] == datetime(2024, 3, 1)


def test_landing_s3_root_path_parsing():
    from appstore_aws_etl_spark.io.landing import LandingZone

    z = LandingZone("s3://bkt/data/raw", prefix="events")
    assert z._s3_parts() == ("bkt", "data/raw/events")
    assert z._s3_full_key("f.json") == "data/raw/events/f.json"
    assert LandingZone("s3://bkt")._s3_parts() == ("bkt", "")
    assert LandingZone("s3://bkt/data/")._s3_parts() == ("bkt", "data")


def test_ewma_matches_hand_rolled_recurrence(spark):
    from appstore_aws_etl_spark.operators.timeseries import ewma

    rows = [
        Row(user_id=1, event_id=i, ts=ts(f"2024-01-01 10:00:{i:02d}"), value=v)
        for i, v in enumerate([10.0, 20.0, 10.0, 40.0, 0.0])
    ] + [Row(user_id=2, event_id=9, ts=ts("2024-01-01 10:00:00"), value=7.0)]
    df = spark.createDataFrame(rows)
    out = ewma(df, key="user_id", ts="ts", value="value", alpha=0.5,
               order_cols=("event_id",))
    got = {(r["user_id"], r["event_id"]): r["ewma"] for r in out.collect()}

    # hand-rolled: y_0 = x_0; y_t = a*x_t + (1-a)*y_{t-1}
    y, expect = None, {}
    for i, v in enumerate([10.0, 20.0, 10.0, 40.0, 0.0]):
        y = v if y is None else 0.5 * v + 0.5 * y
        expect[(1, i)] = round(y, 6)
    expect[(2, 9)] = 7.0
    assert got == expect


def test_heavy_hitters_exact_under_eviction(spark):
    """Force MG evictions (vocab >> k) and check the result still
    equals the exact GROUP BY/HAVING answer."""
    from appstore_aws_etl_spark.operators.sketches import heavy_hitters

    # 2 hot tokens (400 each), 200 tail tokens (4 each): N = 1600
    rows = (["hot_a"] * 400 + ["hot_b"] * 400
            + [f"tail_{i}" for i in range(200) for _ in range(4)])
    df = spark.createDataFrame([Row(token=t) for t in rows]).repartition(8)
    phi = 0.1  # threshold 160 -> only hot_a / hot_b qualify; k = 40 << 202
    got = {r["token"]: r["cnt"] for r in heavy_hitters(df, "token", phi).collect()}
    assert got == {"hot_a": 400, "hot_b": 400}


def test_asof_nearest_picks_closer_side(spark):
    left = spark.createDataFrame(
        [
            Row(k="a", lts=ts("2024-01-01 10:00:00"), lid=1),  # exact -> backward
            Row(k="a", lts=ts("2024-01-01 12:00:00"), lid=2),  # only backward
            Row(k="b", lts=ts("2024-01-01 10:00:00"), lid=3),  # only forward
            Row(k="a", lts=ts("2024-01-01 11:20:00"), lid=4),  # forward closer
        ]
    )
    right = spark.createDataFrame(
        [
            Row(k="a", rts=ts("2024-01-01 09:00:00"), rid=10, v=1.0),
            Row(k="a", rts=ts("2024-01-01 10:00:00"), rid=11, v=2.0),
            Row(k="a", rts=ts("2024-01-01 11:30:00"), rid=12, v=3.0),
            Row(k="b", rts=ts("2024-01-01 10:00:01"), rid=13, v=4.0),
        ]
    )
    out = asof_join(
        left, right, on=["k"], left_ts="lts", right_ts="rts",
        right_payload=["rid", "v"], tie_break="rid", direction="nearest",
    )
    got = {r["lid"]: r["asof_rid"] for r in out.collect()}
    assert got == {1: 11, 2: 12, 3: 13, 4: 12}


def test_label_propagation_converges_and_caps(spark):
    """Chain 1-2-3-4-5: labels converge to min=1 in <= diameter rounds;
    an insufficient max_rounds raises instead of returning a
    half-propagated labeling."""
    import pytest

    from pyspark.sql import functions as F

    from appstore_aws_etl_spark.operators.labelprop import propagate_min_labels

    edges = spark.createDataFrame(
        [Row(src=i, dst=i + 1) for i in range(1, 5)]
    )
    und = edges.union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    labels = und.select(F.col("src").alias("node")).distinct().withColumn(
        "component", F.col("node")
    )
    out = propagate_min_labels(und, labels, "node", "component", max_rounds=10)
    assert {r["component"] for r in out.collect()} == {1}
    with pytest.raises(RuntimeError, match="did not converge"):
        propagate_min_labels(und, labels, "node", "component", max_rounds=1)


def test_recursive_hierarchy_stops_at_missing_ancestor(spark, tmp_path):
    """A partkey gap must terminate the walk AT the missing ancestor
    (depth = steps taken, top_branch = the dangling ancestor id) —
    mirroring the oracle's inner-join termination — instead of
    phantom-incrementing depth past the miss."""
    import appstore_aws_etl_spark.queries  # noqa: F401
    from appstore_aws_etl_spark.registry import REGISTRY

    # 7-ary parent(n) = (n-1)//7; drop node 8 so descendants of 8
    # (57..63 and their subtrees) strand mid-walk.
    keys = [k for k in range(1, 80) if k != 8]
    spark.createDataFrame([Row(p_partkey=k) for k in keys]).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "part.parquet"))
    out = REGISTRY["sub_recursive_hierarchy"].fn(spark, str(tmp_path))
    got = {r["node"]: (r["depth"], r["top_branch"]) for r in out.collect()}
    # 57: parent 8 missing -> one base row only
    assert got[57] == (1, 8)
    # 9: 9 -> 1 -> 0: depth 2, branch-under-root 1
    assert got[9] == (2, 1)
    # 2: directly under root
    assert got[2] == (1, 2)
    # 65: 65 -> 9 -> 1 -> 0 (unaffected by the gap)
    assert got[65] == (3, 1)


def test_ewma_segmented_stitch_matches_single_pass(spark):
    """An oversized key processed via (key, time-segment) pre-split —
    many segments, tiny Arrow batches — must reproduce the exact
    hand-rolled recurrence: the seed stitch is algebra, not an
    approximation. Memory bound under this path is the segment, not
    the key."""
    from appstore_aws_etl_spark.operators.timeseries import ewma

    n = 600  # one deliberately dominant key, one second apart
    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    vals = [float((i * 37) % 101) for i in range(n)]
    rows = [
        Row(user_id=1, event_id=i, ts=base + dt.timedelta(seconds=i), value=vals[i])
        for i in range(n)
    ] + [Row(user_id=2, event_id=n, ts=base, value=7.0)]
    df = spark.createDataFrame(rows).repartition(8)

    old_batch = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "32")
    try:
        out = ewma(
            df, key="user_id", ts="ts", value="value", alpha=0.3,
            order_cols=("event_id",), seg_seconds=60,  # 10 segments
        )
        got = {(r["user_id"], r["event_id"]): r["ewma"] for r in out.collect()}
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old_batch)

    y, expect = None, {}
    for i, v in enumerate(vals):
        y = v if y is None else 0.3 * v + 0.7 * y
        expect[(1, i)] = round(y, 6)
    expect[(2, n)] = 7.0
    assert len(got) == n + 1
    for k, v in expect.items():
        assert abs(got[k] - v) < 1e-6, (k, got[k], v)


def test_ewma_segmented_cross_key_segment_interleave(spark):
    """Regression (round 5): pandas multi-key groupby-window results
    come back ordered by per-level factorization codes, not row
    appearance — a segment id first observed under a DIFFERENT key
    reorders this key's groups, and a positional reset_index(drop=True)
    then shifted __u across rows (key 1's third value landed on its
    fourth row). The operator must align by row index. Layout: key 0
    has one row in the LATER segment only, so that segment's id
    factorizes first."""
    from appstore_aws_etl_spark.operators.timeseries import ewma

    base = dt.datetime(2024, 1, 1)
    data = [(1, 0.0), (1, 0.0), (1, 1.0), (0, 0.0), (1, 0.0)]
    rows = [
        Row(user_id=k, event_id=i, ts=base + dt.timedelta(seconds=7 * i),
            value=float(v))
        for i, (k, v) in enumerate(data)
    ]
    df = spark.createDataFrame(rows)
    out = ewma(
        df, key="user_id", ts="ts", value="value", alpha=0.35,
        order_cols=("event_id",), seg_seconds=20,
    )
    got = {(r["user_id"], r["event_id"]): r["ewma"] for r in out.collect()}
    # hand-rolled: key 1 series [0, 0, 1, 0] -> [0, 0, .35, .2275]
    expect = {(0, 3): 0.0, (1, 0): 0.0, (1, 1): 0.0,
              (1, 2): 0.35, (1, 4): 0.2275}
    assert len(got) == len(expect)
    for k, v in expect.items():
        assert abs(got[k] - v) < 1e-6, (k, got[k], v)


def test_recursive_hierarchy_deep_chain_log_rounds(spark, tmp_path):
    """Depth stress far beyond the fixture's log_7(n) levels: the walk
    only needs each node's ANCESTOR CHAIN present, so a depth-19 leaf
    costs 19 rows (node 7^19's chain down to the root), not 7^19 rows.
    Pointer doubling must resolve the exact depth in O(log depth)
    rounds — evidence the operator handles deep hierarchies, not just
    the shallow fixture tree."""
    import appstore_aws_etl_spark.queries  # noqa: F401
    from appstore_aws_etl_spark.registry import REGISTRY

    leaf = 7**19  # chain: leaf -> (leaf-1)//7 -> ... -> 1 -> 0
    chain, n = [], leaf
    while n > 0:
        chain.append(n)
        n = (n - 1) // 7
    depth = len(chain)  # walk rows = chain length (last row reaches root)
    assert depth >= 19
    keys = sorted(set(chain) | set(range(1, 100)))
    spark.createDataFrame(
        [Row(p_partkey=k) for k in keys]
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "part.parquet"))
    out = REGISTRY["sub_recursive_hierarchy"].fn(spark, str(tmp_path))
    got = {r["node"]: (r["depth"], r["top_branch"]) for r in out.collect()}
    assert got[leaf] == (depth, chain[-1])         # deep leaf, branch under root
    assert got[chain[1]] == (depth - 1, chain[-1])  # its parent: one less
    assert got[99] == (3, 1)                  # 99 -> 14 -> 1 -> 0
    assert got[2] == (1, 2)                   # directly under root


def test_label_propagation_compress_handles_long_chain(spark):
    """A 200-node path graph (diameter 199) must converge well inside
    O(log n) rounds thanks to the pointer-doubling compress step — a
    pure relax walk would need ~200 rounds and blow the cap."""
    from pyspark.sql import functions as F

    from appstore_aws_etl_spark.operators.labelprop import propagate_min_labels

    edges = spark.createDataFrame(
        [Row(src=i, dst=i + 1) for i in range(1, 200)]
    )
    und = edges.union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    labels = und.select(F.col("src").alias("node")).distinct().withColumn(
        "component", F.col("node")
    )
    out = propagate_min_labels(und, labels, "node", "component", max_rounds=12)
    rows = out.collect()
    assert len(rows) == 200
    assert {r["component"] for r in rows} == {1}


def test_operators_tolerate_empty_inputs(spark):
    """Empty-relation degenerate cases must return empty results with
    the right schema, not crash: an empty partition reaches every
    custom operator eventually at 100 TB (skewed filters, empty
    late-arriving files)."""
    from appstore_aws_etl_spark.operators.labelprop import propagate_min_labels
    from appstore_aws_etl_spark.operators.timeseries import ewma, gapfill_rollup

    empty_events = spark.createDataFrame(
        [], schema="user_id int, event_id int, ts timestamp, value double"
    )
    out = ewma(empty_events, key="user_id", ts="ts", value="value", alpha=0.3)
    assert out.count() == 0 and "ewma" in out.columns
    out_seg = ewma(
        empty_events, key="user_id", ts="ts", value="value", alpha=0.3,
        seg_seconds=60,
    )
    assert out_seg.count() == 0 and "ewma" in out_seg.columns

    assert gapfill_rollup(empty_events, key="user_id", ts="ts").count() == 0

    empty_edges = spark.createDataFrame([], schema="src long, dst long")
    labels = spark.createDataFrame([(1, 1), (2, 2)], schema="node long, component long")
    got = propagate_min_labels(empty_edges, labels, "node", "component")
    assert {(r["node"], r["component"]) for r in got.collect()} == {(1, 1), (2, 2)}


def test_asof_join_empty_quote_side(spark):
    """As-of join with an empty right (quote) side: every left row
    survives with null joined columns (left semantics), none dropped."""
    left = spark.createDataFrame(
        [Row(k="a", lts=ts("2024-01-01 10:00:00"), lid=1)]
    )
    right = spark.createDataFrame(
        [], schema="k string, rts timestamp, rid int"
    )
    got = asof_join(
        left, right, on=["k"], left_ts="lts", right_ts="rts",
        right_payload=["rid"], tie_break="rid",
    ).collect()
    assert len(got) == 1
    assert got[0]["asof_rid"] is None


def test_label_propagation_ignores_unseeded_edge_nodes(spark):
    """Contract: nodes present in the edge set but absent from the
    seeded labels neither appear in the output nor break the
    convergence count (a NULL old-label must not mask movement)."""
    from appstore_aws_etl_spark.operators.labelprop import propagate_min_labels

    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (2, 99), (99, 2)], schema="src long, dst long"
    )
    labels = spark.createDataFrame(
        [(1, 1), (2, 2)], schema="node long, component long"
    )
    got = {(r["node"], r["component"])
           for r in propagate_min_labels(edges, labels, "node", "component").collect()}
    assert got == {(1, 1), (2, 1)}  # 99 never seeded -> never emitted


def test_prefix_max_strict_matches_sequential(spark):
    import datetime as dt
    import random

    from appstore_aws_etl_spark.operators.prefix import partitioned_prefix_max

    rng = random.Random(7)
    base = dt.datetime(2024, 1, 1)
    rows = [
        (i, base + dt.timedelta(seconds=rng.randrange(0, 100000)))
        for i in range(400)
    ]
    df = spark.createDataFrame(rows, schema="arrival int, t timestamp")
    out = partitioned_prefix_max(
        df, value="t", order_by=["arrival"], out="hw", strict=True,
        num_partitions=7,
    )
    got = {r["arrival"]: r["hw"] for r in out.collect()}
    hw = None
    for i, t in rows:
        assert got[i] == hw, f"arrival {i}: {got[i]} != {hw}"
        hw = t if hw is None or t > hw else hw


def test_asof_tolerance_nulls_stale_matches(spark):
    from appstore_aws_etl_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [
            Row(k="a", lts=ts("2024-01-01 10:00:00"), lid=1),  # match 5 min back
            Row(k="a", lts=ts("2024-01-01 13:00:00"), lid=2),  # stale: 2h55m back
        ]
    )
    right = spark.createDataFrame(
        [Row(k="a", rts=ts("2024-01-01 09:55:00"), rid=10, v=1.5)]
    )
    out = asof_join(
        left, right, on=["k"], left_ts="lts", right_ts="rts",
        right_payload=["rid", "v"], tie_break="rid",
        tolerance_seconds=3600.0,
    )
    got = {r["lid"]: (r["asof_rid"], r["asof_v"]) for r in out.collect()}
    assert got == {1: (10, 1.5), 2: (None, None)}


def test_asof_null_payload_never_falls_back_to_stale_row(spark):
    """The matched right row's null payload must be emitted as null — not
    silently replaced by an older right row's value that the tolerance
    gate never inspected (struct-carry contract, operators/asof.py)."""
    from appstore_aws_etl_spark.operators.asof import asof_join

    left = spark.createDataFrame([Row(k="a", lts=ts("2024-01-01 10:00:00"), lid=1)])
    right = spark.createDataFrame(
        [
            # old row, OUTSIDE tolerance, non-null payload
            Row(k="a", rts=ts("2024-01-01 07:00:00"), rid=10, v=99.0),
            # nearest row, INSIDE tolerance, null payload
            Row(k="a", rts=ts("2024-01-01 09:59:00"), rid=11, v=None),
        ]
    )
    for direction in ("backward", "nearest"):
        out = asof_join(
            left, right, on=["k"], left_ts="lts", right_ts="rts",
            right_payload=["rid", "v"], tie_break="rid",
            direction=direction, tolerance_seconds=3600.0,
        )
        row = out.collect()[0]
        # rid comes from the nearest row; v is that row's null, NOT 99.0
        assert (row["asof_rid"], row["asof_v"]) == (11, None), direction
    # cross-column alignment without tolerance: both payloads from rid=11
    out = asof_join(
        left, right, on=["k"], left_ts="lts", right_ts="rts",
        right_payload=["rid", "v"], tie_break="rid",
    )
    row = out.collect()[0]
    assert (row["asof_rid"], row["asof_v"]) == (11, None)


def test_holt_linear_matches_hand_recurrence(spark):
    from appstore_aws_etl_spark.operators.timeseries import holt_linear

    xs = [10.0, 12.0, 11.0, 15.0, 14.0]
    rows = [
        Row(u=1, event_id=i, t=ts(f"2024-01-01 10:0{i}:00"), v=x)
        for i, x in enumerate(xs)
    ] + [Row(u=2, event_id=9, t=ts("2024-01-01 10:00:00"), v=7.0)]
    df = spark.createDataFrame(rows)
    out = {
        (r["u"], r["event_id"]): (r["level"], r["trend"])
        for r in holt_linear(
            df, key="u", ts="t", value="v", alpha=0.3, beta=0.1
        ).collect()
    }
    l, b = xs[0], 0.0
    expect = {(1, 0): (round(l, 6), 0.0)}
    for i, x in enumerate(xs[1:], start=1):
        lp = l
        l = 0.3 * x + 0.7 * (l + b)
        b = 0.1 * (l - lp) + 0.9 * b
        expect[(1, i)] = (round(l, 6), round(b, 6))
    expect[(2, 9)] = (7.0, 0.0)  # single-row key: seed only
    assert out == expect


def test_asof_tolerance_forward_and_nearest(spark):
    from appstore_aws_etl_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [
            Row(k="a", lts=ts("2024-01-01 10:00:00"), lid=1),
            Row(k="a", lts=ts("2024-01-01 06:00:00"), lid=2),  # next right 3h away
        ]
    )
    right = spark.createDataFrame(
        [Row(k="a", rts=ts("2024-01-01 09:00:00"), rid=10)]
    )
    fwd = asof_join(
        left, right, on=["k"], left_ts="lts", right_ts="rts",
        right_payload=["rid"], tie_break="rid", direction="forward",
        tolerance_seconds=3600.0,
    )
    got = {r["lid"]: r["asof_rid"] for r in fwd.collect()}
    # lid=1: next right is 1h BEFORE it (no forward match at all)
    # lid=2: right is 3h ahead -> outside the 1h cap -> nulled
    assert got == {1: None, 2: None}

    near = asof_join(
        left, right, on=["k"], left_ts="lts", right_ts="rts",
        right_payload=["rid"], tie_break="rid", direction="nearest",
        tolerance_seconds=3600.0,
    )
    got = {r["lid"]: r["asof_rid"] for r in near.collect()}
    # lid=1: nearest right is 1h back -> inside the cap
    # lid=2: nearest right is 3h ahead -> capped out
    assert got == {1: 10, 2: None}


def test_session_operators_handle_empty_input(spark):
    from appstore_aws_etl_spark.operators.kcore import kcore_nodes
    from appstore_aws_etl_spark.operators.prefix import partitioned_prefix_max
    from appstore_aws_etl_spark.operators.timeseries import (
        holt_linear,
        interpolate_linear,
    )

    empty_ev = spark.createDataFrame([], schema="u int, event_id int, t timestamp, v double")
    assert interpolate_linear(empty_ev, key="u", ts="t", value="v").count() == 0
    assert holt_linear(empty_ev, key="u", ts="t", value="v").count() == 0
    assert (
        partitioned_prefix_max(
            empty_ev, value="t", order_by=["event_id"], strict=True
        ).count()
        == 0
    )
    empty_edges = spark.createDataFrame([], schema="src int, dst int")
    assert kcore_nodes(empty_edges, k=2).count() == 0


def test_resize_media_batch_plumbing(spark):
    """The Arrow plumbing: resized sizes/digests come back row-aligned
    for a multi-row frame crossing batch boundaries."""
    import hashlib

    from appstore_aws_etl_spark.llm.multimodal import resize_media

    rows = [Row(media_id=i, payload=("doc-%03d " % i * (i + 1)).encode()) for i in range(7)]
    media = spark.createDataFrame(rows)
    got = {r["media_id"]: (r["orig_bytes"], r["resized_bytes"], r["resized_sha"])
           for r in resize_media(media, num=1, den=2).collect()}
    for i in range(7):
        payload = ("doc-%03d " % i * (i + 1)).encode()
        text = payload.decode()
        keep = -(-len(text) // 2)
        resized = text[:keep].encode()
        assert got[i] == (len(payload), len(resized),
                          hashlib.sha256(resized).hexdigest())
