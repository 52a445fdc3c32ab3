"""Local differential harness mirroring the driver's correctness gate.

Runs every registered query on Spark and its oracle SQL on DuckDB over
the same parquet tables, then compares row count, schema, and an
order-insensitive value comparison. Use while iterating:

    python tools/check.py                 # all queries at sf0.01
    python tools/check.py agg_group ...   # subset
    SF_DIR=/root/testdata/sf0.001 python tools/check.py
"""

from __future__ import annotations

import math
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

import appstore_aws_etl_spark.queries  # noqa: F401
from appstore_aws_etl_spark.registry import REGISTRY
from appstore_aws_etl_spark.schemas import TABLE_NAMES
from appstore_aws_etl_spark.session import get_spark

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.01")


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, canonicalize values, sort rows."""
    df = df.reindex(sorted(df.columns), axis=1)

    def canon(v):
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return "<NULL>"
        if pd.isna(v) if not isinstance(v, (list, tuple, set, dict)) else False:
            return "<NULL>"
        if isinstance(v, float):
            v += 0.0  # collapse IEEE negative zero
            if v == int(v) and abs(v) < 1e15:
                return f"{v:.1f}"
            return repr(v)
        if isinstance(v, pd.Timestamp):
            return v.isoformat()
        if isinstance(v, (list, tuple)):
            return "[" + ",".join(canon(x) for x in v) + "]"
        return str(v)

    out = df.map(canon)
    out = out.sort_values(by=list(out.columns), kind="mergesort").reset_index(drop=True)
    return out


def compare(name: str, spark_df, oracle_df) -> list[str]:
    problems = []
    if len(spark_df) != len(oracle_df):
        problems.append(f"rowcount spark={len(spark_df)} oracle={len(oracle_df)}")
        return problems
    s_cols = sorted(spark_df.columns)
    o_cols = sorted(oracle_df.columns)
    if s_cols != o_cols:
        problems.append(f"columns spark={s_cols} oracle={o_cols}")
        return problems
    ns, no = normalize(spark_df), normalize(oracle_df)
    if not ns.equals(no):
        neq = ns != no
        bad_cols = [c for c in ns.columns if neq[c].any()]
        for c in bad_cols[:3]:
            idx = neq[c].idxmax()
            problems.append(f"value col={c} row={idx} spark={ns[c][idx]!r} oracle={no[c][idx]!r}")
    return problems


def main() -> int:
    import datetime
    import json

    args = sys.argv[1:]
    json_path = None
    if "--json" in args:
        i = args.index("--json")
        if i + 1 >= len(args):
            print("usage: check.py [KEY ...] [--json OUT_PATH]", file=sys.stderr)
            return 2
        json_path = args[i + 1]
        args = args[:i] + args[i + 2:]
    keys = args or list(REGISTRY)
    spark = get_spark("check")
    con = duck_connection(SF_DIR)
    failures = 0
    records: dict[str, dict] = {}
    for name in keys:
        spec = REGISTRY[name]
        t0 = time.time()
        try:
            sdf = spec.fn(spark, SF_DIR).toPandas()
        except Exception:
            print(f"FAIL {name}: spark error\n{traceback.format_exc()}")
            failures += 1
            records[name] = {"status": "fail", "err": "spark error"}
            continue
        if spec.oracle is None:
            print(f"ok   {name} (rows-only: {len(sdf)} rows) [{time.time()-t0:.1f}s]")
            records[name] = {"status": "rows_only", "rows": len(sdf)}
            continue
        try:
            odf = con.execute(spec.oracle).fetchdf()
        except Exception:
            print(f"FAIL {name}: oracle error\n{traceback.format_exc()}")
            failures += 1
            records[name] = {"status": "fail", "err": "oracle error"}
            continue
        problems = compare(name, sdf, odf)
        if problems:
            failures += 1
            print(f"FAIL {name}: " + "; ".join(problems))
            records[name] = {"status": "fail", "err": "; ".join(problems)}
        else:
            print(f"ok   {name} ({len(sdf)} rows) [{time.time()-t0:.1f}s]")
            records[name] = {"status": "hash_match", "rows": len(sdf)}
    print(f"\n{len(keys) - failures}/{len(keys)} passed")
    if json_path:
        with open(json_path, "w") as fh:
            json.dump(
                {
                    "date": datetime.date.today().isoformat(),
                    "sf_dir": SF_DIR,
                    "passed": len(keys) - failures,
                    "total": len(keys),
                    "results": records,
                },
                fh,
                indent=1,
            )
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
