"""Round-12 llm_tfidf A/B at the 100x tier (verdict item 3): the r8
shape (exploded corpus repartitioned on doc_id, ReuseExchange feeding
both the tf and df branches) vs the r12 shape (df via the
document-level Arrow partials shared with keywords_topk; tf via plain
explode + (doc, term) hash agg, so the key's doc_id < 30 slice pushes
to the scan). r11 reading: 3.42 s vs DuckDB 0.835 (4.1x).

    python tools/ab_tfidf_r12.py --out AB_TFIDF_r12.json [n_runs]
"""

from __future__ import annotations

import datetime
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from pyspark.sql import functions as F

import appstore_aws_etl_spark.queries  # noqa: F401
from appstore_aws_etl_spark.catalog import load
from appstore_aws_etl_spark.ckpt import release_checkpoints
from appstore_aws_etl_spark.llm.text import tokenize
from appstore_aws_etl_spark.registry import REGISTRY
from appstore_aws_etl_spark.session import get_spark

FIXTURE = os.environ.get("AB_FIXTURE", "/tmp/bench10x/x100")


def tfidf_old(spark, sf_dir):
    """The r8-r11 shape, reconstructed verbatim (shared repartition
    exchange, docfreq derived from the tf table)."""
    df = load(spark, sf_dir, "documents")
    id_col, text_col = "doc_id", "text"
    terms = (
        tokenize(df, text_col)
        .select(id_col, F.explode("tokens").alias("term"))
        .repartition(F.col(id_col))
    )
    tf = terms.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    docfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = df.select(F.countDistinct(id_col).alias("n_docs"))
    out = (
        tf.join(F.broadcast(docfreq), "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.col("tf") * (F.log((F.col("n_docs") + 1) / (F.col("df") + 1)) + 1),
        )
        .select(id_col, "term", "tf", "df", "tfidf")
    )
    return out.filter(F.col("doc_id") < 30).withColumn("tfidf", F.round("tfidf", 4))


def main() -> None:
    out_path = "AB_TFIDF_r12.json"
    args = sys.argv[1:]
    if "--out" in args:
        out_path = args[args.index("--out") + 1]
        args = [a for a in args if a not in ("--out", out_path)]
    n = int(args[0]) if args else 3
    spark = get_spark("ab_tfidf_r12", shuffle_partitions=64)
    variants = {
        "tfidf_old": tfidf_old,
        "tfidf_new": lambda s, d: REGISTRY["llm_tfidf"].fn(s, d),
    }
    rows, times = {}, {v: [] for v in variants}
    for name, fn in variants.items():
        rows[name] = fn(spark, FIXTURE).count()
        release_checkpoints(spark)
    for _ in range(n):
        for name, fn in variants.items():
            t0 = time.perf_counter()
            fn(spark, FIXTURE).count()
            times[name].append(round(time.perf_counter() - t0, 2))
            release_checkpoints(spark)
    con = duckdb.connect()
    from appstore_aws_etl_spark.schemas import TABLE_NAMES

    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{FIXTURE}/{t}.parquet/*.parquet')"
        )
    oracle = REGISTRY["llm_tfidf"].oracle
    con.execute(f"SELECT count(*) FROM ({oracle})").fetchone()
    d_times = []
    for _ in range(n):
        t0 = time.perf_counter()
        con.execute(f"SELECT count(*) FROM ({oracle})").fetchone()
        d_times.append(round(time.perf_counter() - t0, 2))
    med = {v: sorted(ts)[len(ts) // 2] for v, ts in times.items()}
    out = {
        "date": datetime.date.today().isoformat(),
        "fixture": FIXTURE,
        "config": f"local[*] AQE on shuffle=64, warm per variant then {n} timed "
        "runs interleaved; DuckDB oracle timed same-session",
        "rows": rows,
        "times": times,
        "median": med,
        "duckdb": {"times": d_times, "median": sorted(d_times)[len(d_times) // 2]},
    }
    with open(out_path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
