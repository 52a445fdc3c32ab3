"""SparkSession factory.

Defaults are chosen for correctness-at-scale first (AQE on, skew-join
handling on, sane shuffle partitioning), then tuned for the local[N]
test harness. On a real cluster the same builder applies — only
``master`` and memory sizing change.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    cpus = os.environ.get("SPARK_GRAFT_CPUS")
    if cpus:
        return int(cpus)
    return os.cpu_count() or 8


def get_spark(
    app_name: str = "appstore_aws_etl_spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults.

    AQE is always on: at 100 TB it coalesces post-shuffle partitions,
    splits skewed joins, and re-plans sort-merge -> broadcast when runtime
    stats allow. ``spark.sql.shuffle.partitions`` is set to a small
    multiple of cores locally; on a cluster AQE's coalescing makes the
    initial number non-critical as long as it's high enough.
    """
    n = default_parallelism()
    shuffle = shuffle_partitions or int(os.environ.get("SPARK_GRAFT_SHUFFLE", n))
    builder = (
        SparkSession.builder.master(f"local[{n}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        # Spark's default 10 MB implicit-broadcast threshold, on purpose
        # (rounds 1-7 ran 64 MB, and the round-8 100x tier caught the
        # footgun: size estimates are parquet-COMPRESSED bytes, so a
        # 6M-row projected fact side "fit" and Catalyst broadcast it —
        # 5.1 s vs 1.1 s at 10x, and a guaranteed driver OOM at real
        # scale). Genuine dimensions are explicitly F.broadcast()'d at
        # ~65 sites; implicit broadcasts stay for provably tiny sides.
        .config("spark.sql.autoBroadcastJoinThreshold", str(10 * 1024 * 1024))
        # AQE's runtime SMJ -> shuffled-hash conversion stays DISABLED
        # (spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold at
        # its 0 default). Round-9 finding: the conf round 8 pinned here
        # ("spark.sql.adaptive.shuffleHashJoinLocalMapThreshold") is
        # not a Spark conf at all — Spark silently accepts unknown
        # keys, so the "machinery" was a no-op for a full round. Once
        # the REAL conf was enabled at 64 MB, the 100x tier reproduced
        # the exact OOM the r8 static-hint analysis predicted: the
        # threshold checks COMPRESSED shuffle bytes but the hash map
        # builds deserialized rows, so join_multikey's 60M-row build
        # died ("not enough memory to build hash map") at shuffle=16
        # AND 64, while the measured wins (tpch_q12 5.9 -> 3.65 s)
        # share the same compressed-size bin as the OOM — no threshold
        # separates them (full table in BASELINE.md). Sort-merge
        # spills gracefully at every scale; that robustness is the
        # 100 TB-first default. Static shuffle_hash hints remain only
        # where the build side is a narrow aggregate/signature table
        # bounded well below task memory at any scale under partition
        # discipline.
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
