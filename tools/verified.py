"""Summarize driver-recorded correctness evidence across rounds.

Reads every CORRECTNESS_r*.json in the repo root and prints, per round,
the keys that recorded hash-level or rows-only evidence, plus the
registry keys still carrying no driver evidence at all. The sweep
ordering itself is derived automatically from the same artifacts
(appstore_aws_etl_spark.evidence feeding __spark_entry__.queries()),
so this tool is purely a human-readable summary — nothing here gets
pasted anywhere. Run at round start, right after reading the new
artifacts:

    python tools/verified.py
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import appstore_aws_etl_spark.queries  # noqa: F401
from appstore_aws_etl_spark.registry import REGISTRY

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def round_green(path: str) -> tuple[list[str], list[str], list[str], list[str]]:
    """Classify one round's records into (hashed, rows_only, failed,
    unclassified) using the shared rules in
    appstore_aws_etl_spark.evidence (the same classification drives the
    queries() sweep ordering)."""
    from appstore_aws_etl_spark.evidence import classify

    data = json.load(open(path))
    buckets = {"hash": [], "rows_only": [], "failed": [], "unclassified": []}
    for k, v in sorted(data.items()):
        buckets[classify(v)].append(k)
    return (
        buckets["hash"], buckets["rows_only"],
        buckets["failed"], buckets["unclassified"],
    )


def main() -> None:
    from appstore_aws_etl_spark.evidence import classify

    verified: set[str] = set()
    latest: dict[str, tuple[int, str]] = {}  # key -> (round, class)
    rounds: list[int] = []
    for path in sorted(glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json"))):
        n = int(re.search(r"_r(\d+)", path).group(1))
        rounds.append(n)
        hashed, rows_only, failed, unclassified = round_green(path)
        green = hashed + rows_only
        verified.update(green)
        for k, v in json.load(open(path)).items():
            latest[k] = (n, classify(v))
        print(f"round {n}: {len(hashed)} hash + {len(rows_only)} rows-only"
              f" = {len(green)} green; {len(failed)} failed{': ' + str(failed) if failed else ''}"
              f"{'; ' + str(len(unclassified)) + ' unclassified: ' + str(unclassified) if unclassified else ''}")
    unswept = [k for k in REGISTRY if k not in verified]
    print(f"total driver-evidenced: {len(verified)}/{len(REGISTRY)}; "
          f"unswept ({len(unswept)}):")
    for k in unswept:
        print(f"  {k}")
    # The sentence BASELINE.md's correctness-gate row must carry —
    # printed here so the row is regenerated, never hand-maintained
    # (the hand-maintained version went stale in rounds 3, 4 AND 5).
    in_reg = {k: v for k, v in latest.items() if k in REGISTRY}
    n_hash = sum(1 for _, c in in_reg.values() if c == "hash")
    n_rows = sum(1 for _, c in in_reg.values() if c == "rows_only")
    n_fail = sum(1 for _, c in in_reg.values() if c == "failed")
    lo, hi = (min(rounds), max(rounds)) if rounds else (0, 0)
    print(
        f"\nBASELINE-ready: {len(in_reg)}/{len(REGISTRY)} registry keys carry "
        f"driver-recorded evidence across rounds {lo}-{hi} (latest record per "
        f"key): {n_hash} exact DuckDB hash-matches + {n_rows} rows-only "
        f"executions, {n_fail} failures."
    )


if __name__ == "__main__":
    main()
