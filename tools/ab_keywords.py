"""Round-11 100x adjudication (verdict item 2): llm_keywords read
8.12 s / 4.84x DuckDB at the 100x tier under the windowed-tfidf plan
(JVM regex split + explode + (doc, term) exchange + full-table window
sort) while plain llm_tfidf ran 3.14 s on the same corpus. Round 11
re-planned it as the heavy_hitters_docs document-level two-Arrow-pass
shape (llm/text.py keywords_topk): pass 1 lands the vocab-bounded df
vector, pass 2 emits exactly 3 rows per document — no full-size
exchange anywhere. This A/B times OLD shape vs NEW shape vs DuckDB,
ENGINES AND SHAPES INTERLEAVED in one session so box drift cannot
masquerade as a plan delta (the round-10 protocol).

    python tools/ab_keywords.py --out AB_KEYWORDS_r11.json
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import appstore_aws_etl_spark.queries  # noqa: F401
from appstore_aws_etl_spark.ckpt import release_checkpoints
from appstore_aws_etl_spark.registry import REGISTRY
from appstore_aws_etl_spark.schemas import TABLE_NAMES
from appstore_aws_etl_spark.session import get_spark

FIXTURE = "/tmp/bench10x/x100"
DUCK_TIMEOUT_S = 240.0


def keywords_old(spark, sf_dir):
    """The r6-r10 shape, reconstructed verbatim for the A/B: windowed
    top-3 over the shared-exchange tfidf plan."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from appstore_aws_etl_spark.catalog import load
    from appstore_aws_etl_spark.llm.text import tfidf

    docs = load(spark, sf_dir, "documents")
    scored = tfidf(docs).withColumn("tfidf", F.round("tfidf", 4))
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), "term")
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("doc_id", "term", "tfidf", "rnk")
    )


def main() -> int:
    out_path = "AB_KEYWORDS_local.json"
    if "--out" in sys.argv:
        out_path = sys.argv[sys.argv.index("--out") + 1]
    if not os.path.exists(os.path.join(FIXTURE, "_done")):
        raise SystemExit("build the 100x fixture first: "
                         "python tools/bench10x.py --factor 100 --only <any>")

    import duckdb

    spark = get_spark(
        "ab_keywords_r11",
        shuffle_partitions=64,  # the 100x-tier partition discipline
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{FIXTURE}/{t}.parquet/*.parquet')"
        )

    def spark_once(fn) -> float:
        t0 = time.perf_counter()
        fn(spark, FIXTURE).count()
        dt = time.perf_counter() - t0
        release_checkpoints(spark)
        return round(dt, 2)

    def duck_once(sql: str) -> float | None:
        timer = threading.Timer(DUCK_TIMEOUT_S, con.interrupt)
        timer.start()
        t0 = time.perf_counter()
        try:
            con.execute(f"SELECT count(*) FROM ({sql})").fetchone()
        except duckdb.Error:
            return None
        finally:
            timer.cancel()
        return round(time.perf_counter() - t0, 2)

    spark_once(REGISTRY["agg_group"].fn)  # JVM/codegen warm
    spark_once(REGISTRY["udf_pandas"].fn)  # Python/Arrow worker pool warm

    spec = REGISTRY["llm_keywords"]
    # warm every shape once, then three timed interleaved rounds
    spark_once(keywords_old)
    spark_once(spec.fn)
    duck_once(spec.oracle)
    old, new, duck = [], [], []
    for _ in range(3):
        old.append(spark_once(keywords_old))
        new.append(spark_once(spec.fn))
        duck.append(duck_once(spec.oracle))
    du = [v for v in duck if v is not None]
    results = {
        "fixture": FIXTURE,
        "old_windowed_tfidf": old,
        "new_two_pass_arrow": new,
        "duckdb": duck,
        "speedup_min": round(min(old) / min(new), 2),
        "ratio_old_vs_duckdb": round(min(old) / min(du), 2) if du else None,
        "ratio_new_vs_duckdb": round(min(new) / min(du), 2) if du else None,
        "date": time.strftime("%Y-%m-%d %H:%M"),
    }
    print(json.dumps(results), flush=True)
    with open(out_path, "w") as f:
        json.dump(results, f, indent=2)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
