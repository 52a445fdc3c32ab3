"""Per-key job-level profiler for the optimization round (guide §1).

Runs selected registry keys under the EXACT bench session config
(shuffle=2, AQE off) but with the UI/REST API enabled, and reports for
each key: warm + timed wall seconds, number of Spark jobs the timed run
scheduled, and the per-job durations (descending). Job scheduling at
sf0.1 has a fixed floor, so "many jobs" = driver-loop-bound key and the
optimization is fewer jobs/rounds; "few jobs, long job" = plan-bound.

    python tools/profile_keys.py llm_dedup_survivors graph_pagerank ...
    python tools/profile_keys.py --out PROFILE_r13.json key1 key2 ...
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import appstore_aws_etl_spark.queries  # noqa: F401
from appstore_aws_etl_spark.ckpt import release_checkpoints
from appstore_aws_etl_spark.registry import REGISTRY
from appstore_aws_etl_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def rest_jobs(spark):
    base = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{base}/api/v1/applications/{app_id}/jobs?status=succeeded") as r:
        return json.load(r)


def main() -> None:
    args = [a for a in sys.argv[1:]]
    out_file = None
    if "--out" in args:
        i = args.index("--out")
        out_file = args[i + 1]
        del args[i : i + 2]
    keys = args or list(REGISTRY)

    spark = get_spark(
        "profile",
        shuffle_partitions=int(os.environ.get("SPARK_GRAFT_SHUFFLE", "2")),
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.ui.enabled": "true",
            "spark.sql.adaptive.enabled": os.environ.get("SPARK_GRAFT_AQE", "false"),
        },
    )
    # warm the JVM + Arrow pool like bench.py does
    REGISTRY["agg_group"].fn(spark, SF_DIR).count()
    REGISTRY["udf_pandas"].fn(spark, SF_DIR).count()

    results = {}
    for name in keys:
        if name not in REGISTRY:
            print(f"!! unknown key {name}", file=sys.stderr)
            continue
        fn = REGISTRY[name].fn
        t0 = time.perf_counter()
        fn(spark, SF_DIR).count()
        warm = time.perf_counter() - t0
        release_checkpoints(spark)
        before_ids = {j["jobId"] for j in rest_jobs(spark)}
        t0 = time.perf_counter()
        fn(spark, SF_DIR).count()
        timed = time.perf_counter() - t0
        jobs = [j for j in rest_jobs(spark) if j["jobId"] not in before_ids]
        durs = sorted(
            (
                round(
                    (
                        time.mktime(time.strptime(j["completionTime"][:19], "%Y-%m-%dT%H:%M:%S"))
                        - time.mktime(time.strptime(j["submissionTime"][:19], "%Y-%m-%dT%H:%M:%S"))
                        + (int(j["completionTime"][20:23]) - int(j["submissionTime"][20:23])) / 1000.0
                    ),
                    3,
                )
                for j in jobs
            ),
            reverse=True,
        )
        release_checkpoints(spark)
        results[name] = {
            "warm_s": round(warm, 3),
            "timed_s": round(timed, 3),
            "n_jobs": len(jobs),
            "job_s_desc": durs[:25],
            "sum_job_s": round(sum(durs), 3),
        }
        print(
            f"{name:40s} warm {warm:6.2f}s timed {timed:6.2f}s "
            f"jobs {len(jobs):3d} sum_job {sum(durs):6.2f}s top {durs[:6]}"
        )

    if out_file:
        with open(out_file, "w") as fh:
            json.dump({"sf_dir": SF_DIR, "results": results}, fh, indent=1)


if __name__ == "__main__":
    main()
