"""Scale-mechanism tests: the machinery that matters at 100 TB —
bucketed shuffle-free joins, partitioned sinks with partition pruning,
salted skew joins, config resolution — verified on small data by
asserting plan shape and result equivalence."""

from __future__ import annotations

import json

import pytest

from pyspark.sql import functions as F

from appstore_aws_etl_spark.io.bucketing import bucketed_join, write_bucketed
from appstore_aws_etl_spark.io.config import get_secret, jdbc_options_from_secret
from appstore_aws_etl_spark.io.sinks import write_parquet
from appstore_aws_etl_spark.operators.skew import salted_join
from appstore_aws_etl_spark.plans import formatted_plan


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    # bucket metadata needs catalog tables; the (static) warehouse dir
    # defaults to ./spark-warehouse — tables are dropped on the way out
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet").withColumnRenamed(
        "l_orderkey", "o_orderkey"
    )
    write_bucketed(orders, "orders_b", "o_orderkey", num_buckets=8)
    write_bucketed(lineitem, "lineitem_b", "o_orderkey", num_buckets=8)
    # broadcast would bypass bucketing on this tiny data — force SMJ
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, "orders_b", "lineitem_b", on="o_orderkey")
        plan = formatted_plan(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # the whole point of bucketing
        plain = orders.join(lineitem, "o_orderkey")
        assert joined.count() == plain.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(10 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_partitioned_sink_prunes_partitions(spark, sf_dir, tmp_path):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").withColumn(
        "order_year", F.year("o_orderdate")
    )
    out = str(tmp_path / "orders_part")
    write_parquet(orders, out, partition_by=["order_year"])
    back = spark.read.parquet(out).filter(F.col("order_year") == 1997)
    plan = formatted_plan(back)
    # static partition pruning: only the 1997 directory is scanned
    assert "PartitionFilters: [isnotnull(order_year" in plan
    assert back.count() == orders.filter(F.col("order_year") == 1997).count()


def test_dynamic_partition_pruning(spark, sf_dir, tmp_path):
    """DPP: a partitioned fact joined to a *filtered* dim must prune
    fact partitions at runtime from the dim's filter (the mechanism
    that keeps star joins from scanning the full 100 TB fact)."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").withColumn(
        "order_year", F.year("o_orderdate")
    )
    fact_path = str(tmp_path / "orders_by_year")
    write_parquet(orders, fact_path, partition_by=["order_year"])
    fact = spark.read.parquet(fact_path)
    # dim filter on a NON-key column: pruning years are only known at
    # runtime, so Catalyst must insert a dynamicpruning subquery (a
    # join-key filter would become *static* pruning via constraint
    # propagation instead — also verified below)
    dim = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .filter(F.col("o_orderpriority") == "5-LOW")
        .select(F.year("o_orderdate").alias("y"))
        .distinct()
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.reuseBroadcastOnly", "false")
    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.useStats", "false")
    try:
        joined = fact.join(dim, fact.order_year == dim.y)
        plan = formatted_plan(joined)
        assert "dynamicpruningexpression" in plan.lower()
        expected = orders.join(
            dim.withColumnRenamed("y", "yy"), orders.order_year == F.col("yy")
        ).count()
        assert joined.count() == expected
        # join-key literal filter -> static partition pruning
        static_plan = formatted_plan(
            fact.join(dim.filter(F.col("y") == 1996), fact.order_year == dim.y)
        )
        part_lines = [ln for ln in static_plan.splitlines() if "PartitionFilters" in ln]
        assert any("= 1996" in ln for ln in part_lines)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(10 * 1024 * 1024))
        spark.conf.set(
            "spark.sql.optimizer.dynamicPartitionPruning.reuseBroadcastOnly", "true"
        )
        spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.useStats", "true")


def test_salted_join_matches_plain_join(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey"
    )
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        F.col("l_orderkey").alias("o_orderkey"), "l_quantity"
    )
    # threshold 2 -> every multi-line order is "hot": both paths exercised
    salted = salted_join(
        lineitem, orders, on="o_orderkey", salt_buckets=4, hot_key_threshold=2
    )
    plain = lineitem.join(orders, "o_orderkey")
    assert salted.count() == plain.count()
    s = salted.agg(F.round(F.sum("l_quantity"), 2).alias("q")).collect()[0]["q"]
    p = plain.agg(F.round(F.sum("l_quantity"), 2).alias("q")).collect()[0]["q"]
    assert s == p


def test_salted_join_caps_hot_key_detection(spark):
    """Round-13 hardening: a degenerate threshold (1 on a
    high-cardinality key) must NOT return the whole key domain to the
    driver — detection keeps only the max_hot_keys heaviest keys and
    the rest take the cold path, with the join result unchanged."""
    from pyspark.sql import Row

    # 500 distinct keys, all "hot" at threshold 1; keys 7 and 13 are
    # genuinely heavy so the capped detection must pick exactly those
    rows = [Row(k=i, v=i) for i in range(500)]
    rows += [Row(k=7, v=-1)] * 50 + [Row(k=13, v=-2)] * 40
    left = spark.createDataFrame(rows)
    right = spark.createDataFrame([Row(k=i, w=i * 10) for i in range(0, 500, 3)])
    got = salted_join(
        left, right, on="k", salt_buckets=3, hot_key_threshold=1, max_hot_keys=2
    )
    want = left.join(right, on="k")
    assert got.count() == want.count()
    g = got.agg(F.sum(F.col("v") * F.col("w")).alias("s")).collect()[0]["s"]
    w = want.agg(F.sum(F.col("v") * F.col("w")).alias("s")).collect()[0]["s"]
    assert g == w


def test_salted_join_left_outer_nulls_and_guard(spark):
    from pyspark.sql import Row

    left = spark.createDataFrame(
        [Row(k=1, v="a")] * 6 + [Row(k=2, v="b"), Row(k=3, v="miss"), Row(k=None, v="n")]
    )
    right = spark.createDataFrame([Row(k=1, w=10), Row(k=2, w=20), Row(k=9, w=90)])
    for how in ("left", "inner", "left_semi", "left_anti"):
        got = salted_join(
            left, right, on="k", salt_buckets=3, how=how, hot_keys=[1]
        ).collect()
        want = left.join(right, on="k", how=how).collect()
        key = lambda r: tuple((f, repr(r[f])) for f in sorted(r.asDict()))
        assert sorted(map(key, got)) == sorted(map(key, want)), how
    with pytest.raises(ValueError, match="outer"):
        salted_join(left, right, on="k", how="full")
    with pytest.raises(ValueError, match="outer"):
        salted_join(left, right, on="k", how="right")


def test_secret_resolution_env_and_file(tmp_path, monkeypatch):
    monkeypatch.setenv("APPSTORE_ETL_SECRET_WAREHOUSE_MAIN", '{"username": "u", "password": "p"}')
    sec = get_secret("warehouse/main")
    assert jdbc_options_from_secret(sec)["user"] == "u"

    (tmp_path / "apikey.json").write_text(json.dumps({"token": "t"}))
    assert get_secret("apikey", secrets_dir=str(tmp_path))["token"] == "t"

    plain = tmp_path / "raw.json"
    plain.write_text("not-json")
    assert get_secret("raw", secrets_dir=str(tmp_path), string_format="PLAIN TEXT") == "not-json"

    with pytest.raises(ValueError):
        get_secret("raw", secrets_dir=str(tmp_path), string_format="XML")
    # unresolvable secret: RuntimeError without boto3, a botocore
    # credential/endpoint error with it — either way it must raise
    with pytest.raises(Exception):
        get_secret("missing-secret-name")


def test_jdbc_sink_roundtrip_derby(spark):
    # the Spark distro ships embedded Derby (its Hive-metastore store),
    # so S9 gets a real in-process JDBC round-trip, no server needed
    from appstore_aws_etl_spark.io.sinks import write_jdbc

    url = "jdbc:derby:memory:etlsmoke;create=true"
    opts = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}
    df = spark.range(100).select(
        F.col("id").cast("long").alias("k"), (F.col("id") * 2).cast("double").alias("v")
    )
    write_jdbc(df, url, "smoke_t", options=opts, mode="overwrite")
    back = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", "smoke_t")
        .option("driver", opts["driver"])
        .load()
    )
    assert back.count() == 100
    assert back.agg(F.sum("v").alias("s")).collect()[0]["s"] == sum(2 * i for i in range(100))


def test_hll_rollup_within_tolerance_of_exact(spark, sf_dir):
    """Merged weekly HLL estimates must track exact weekly distincts
    (datasketches HLL at default lgk is well under 5% at these
    cardinalities)."""
    from pyspark.sql import functions as F

    import appstore_aws_etl_spark.queries  # noqa: F401 — populates REGISTRY
    from appstore_aws_etl_spark.catalog import load
    from appstore_aws_etl_spark.registry import REGISTRY

    approx = {
        r["week"]: r["approx_users"]
        for r in REGISTRY["agg_hll_rollup"].fn(spark, sf_dir).collect()
    }
    ev = load(spark, sf_dir, "events")
    exact = {
        r["week"]: r["n"]
        for r in ev.groupBy(F.date_trunc("week", F.col("ts")).alias("week"))
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(approx) == set(exact)
    for wk, n in exact.items():
        assert abs(approx[wk] - n) <= max(1, 0.05 * n)


def test_zorder_layout_sorts_and_interleaves(spark):
    """zvalue interleaves bits (locality property: close keys -> close
    z-values within a dimension) and zorder_by yields a globally
    range-sorted layout."""
    from pyspark.sql import Row
    from pyspark.sql import functions as F

    from appstore_aws_etl_spark.operators.layout import zorder_by, zvalue

    df = spark.createDataFrame(
        [Row(a=a, b=b) for a in range(8) for b in range(8)]
    )
    vals = {
        (r["a"], r["b"]): r["z"]
        for r in df.select("a", "b", zvalue(F.col("a"), F.col("b")).alias("z")).collect()
    }
    # interleave of small ints: z(a,b) = sum of bits of a at even
    # positions and b at odd — spot-check the algebra
    assert vals[(0, 0)] == 0 and vals[(1, 0)] == 1 and vals[(0, 1)] == 2
    assert vals[(3, 5)] == 0b100111  # a=11 -> 0101, b=101 -> 101010...
    assert all(
        vals[(a, b)] == vals[(a, 0)] | vals[(0, b)] for a in range(8) for b in range(8)
    )
    # layout: partitions are ranges of z, each sorted within
    parts = (
        zorder_by(df, "a", "b", out_col="z")
        .select(F.spark_partition_id().alias("pid"), "z")
        .collect()
    )
    by_pid = {}
    for r in parts:
        by_pid.setdefault(r["pid"], []).append(r["z"])
    flat = []
    for pid in sorted(by_pid):
        assert by_pid[pid] == sorted(by_pid[pid])
        flat.extend(by_pid[pid])
    assert flat == sorted(flat)


def test_adaptive_lsh_params_bound_bucket_work():
    """Round-9 rule: hyperplane signature width must scale with the
    corpus. bits-per-band = log2(n)+2 pins EXPECTED bucket size at
    ~1/4 row (n / 2^r <= 0.25 under the uniform model), so band-join
    verify work stays ~n/4 per band at any corpus; bands grow ~r/3 so
    near-threshold recall doesn't collapse as bands deepen. A fixed
    width is the quadratic blow-up the controlled 100x tier caught
    (~6e8 candidate pairs, 70+ GB of spill at 200k vectors)."""
    from appstore_aws_etl_spark.llm.similarity import adaptive_lsh_params

    for n in (100, 2_000, 200_000, 10_000_000, 10**12):
        n_planes, bands = adaptive_lsh_params(n)
        r = n_planes // bands
        assert n_planes == r * bands
        # expected bucket size under the uniform model stays bounded
        # (the 40-bit cap only engages past ~2.7e11 rows)
        if r < 40:
            assert n / 2 ** r <= 0.25
        assert bands >= 4
    # monotone: a bigger corpus never gets a narrower signature
    widths = [adaptive_lsh_params(n)[0] for n in (10**3, 10**6, 10**9)]
    assert widths == sorted(widths)


def test_adaptive_lsh_recall_target_mode():
    """Round-10 rule: when a threshold + recall target are given, bands
    are sized so a pair AT the threshold collides in >=1 band with
    probability >= the target at ANY corpus size (the r/3 heuristic
    only preserved exact-direction recall; near-threshold recall
    decayed to ~0.31 by r=32). Verify the guarantee analytically and
    that the guarantee-impossible regime refuses instead of silently
    under-recalling."""
    import math

    import pytest

    from appstore_aws_etl_spark.llm.similarity import adaptive_lsh_params

    for n in (2_000, 200_000, 10**9):
        n_planes, bands = adaptive_lsh_params(
            n, threshold=0.95, recall_target=0.9
        )
        r = n_planes // bands
        p = 1.0 - math.acos(0.95) / math.pi
        recall_at_threshold = 1.0 - (1.0 - p**r) ** bands
        assert recall_at_threshold >= 0.9, (n, r, bands, recall_at_threshold)
        # bucket-size discipline unchanged: bits per band still log2(n)+2
        if r < 40:
            assert n / 2**r <= 0.25
    # low thresholds need exponentially many bands — refuse, don't
    # silently cut the guarantee
    with pytest.raises(ValueError, match="bands"):
        adaptive_lsh_params(10**9, threshold=0.5, recall_target=0.9)
    # advisor round 10: p_band underflow (1 - p^r == 1.0 in floats) and
    # recall_target=1.0 must hit the SAME descriptive refusal, not
    # ZeroDivisionError / math-domain crashes
    with pytest.raises(ValueError, match="bands"):
        adaptive_lsh_params(10**9, threshold=-0.5, recall_target=0.9)
    with pytest.raises(ValueError, match="bands"):
        adaptive_lsh_params(10**9, threshold=0.95, recall_target=1.0)


def test_release_checkpoints_frees_persistent_rdds(spark, sf_dir):
    """Bench harnesses rely on release_checkpoints() to drop lazy
    localCheckpoint blocks deterministically between keys (the r8
    sweep-tail distortion); assert it actually empties the persistent
    RDD map after a checkpointed action."""
    from appstore_aws_etl_spark.catalog import load
    from appstore_aws_etl_spark.ckpt import lazy_checkpoint, release_checkpoints

    df = lazy_checkpoint(load(spark, sf_dir, "orders").select("o_orderkey"))
    assert df.count() > 0
    assert spark.sparkContext._jsc.getPersistentRDDs().size() >= 1
    release_checkpoints(spark)
    assert spark.sparkContext._jsc.getPersistentRDDs().size() == 0
