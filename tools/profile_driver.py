"""Driver-side cProfile for single registry keys (guide §1, §7.3).

The REST job profiler (profile_keys.py) showed several index-lifecycle
keys spending most of their wall time OUTSIDE Spark jobs — this tool
answers "where, exactly, in driver Python" by cProfiling the warm
(non-first) invocation of fn() + count() under the bench session
config and printing the top cumulative-time entries.

    python tools/profile_driver.py llm_knn_ivfpq_probe --top 30
"""

from __future__ import annotations

import cProfile
import io
import os
import pstats
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import appstore_aws_etl_spark.queries  # noqa: F401
from appstore_aws_etl_spark.ckpt import release_checkpoints
from appstore_aws_etl_spark.registry import REGISTRY
from appstore_aws_etl_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    args = sys.argv[1:]
    top = 30
    if "--top" in args:
        i = args.index("--top")
        top = int(args[i + 1])
        del args[i : i + 2]
    keys = args

    spark = get_spark(
        "profile-driver",
        shuffle_partitions=int(os.environ.get("SPARK_GRAFT_SHUFFLE", "2")),
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.sql.adaptive.enabled": os.environ.get("SPARK_GRAFT_AQE", "false"),
        },
    )
    REGISTRY["agg_group"].fn(spark, SF_DIR).count()

    for key in keys:
        fn = REGISTRY[key].fn
        fn(spark, SF_DIR).count()  # warm, mirrors bench.py
        release_checkpoints(spark)
        prof = cProfile.Profile()
        t0 = time.perf_counter()
        prof.enable()
        fn(spark, SF_DIR).count()
        prof.disable()
        wall = time.perf_counter() - t0
        release_checkpoints(spark)
        buf = io.StringIO()
        stats = pstats.Stats(prof, stream=buf)
        stats.sort_stats("cumulative").print_stats(top)
        print(f"===== {key}: wall {wall:.3f}s =====")
        print(buf.getvalue())

    spark.stop()


if __name__ == "__main__":
    main()
