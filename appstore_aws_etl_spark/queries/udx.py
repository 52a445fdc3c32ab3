"""§2.10 UDF / UDAF / UDTF surface (X1-X4).

The UDx logic is deliberately SQL-expressible so the DuckDB oracle
still applies — what's under test is the Python execution machinery
(row UDF, Arrow-vectorized UDF, grouped-agg UDF, table function), not
novel logic. Production guidance stays: built-ins first, pandas UDFs
when Python is unavoidable, row UDFs never in hot paths.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..catalog import load
from ..registry import query


@query(
    "udf_scalar",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice >= 300000 THEN 'platinum'
                WHEN o_totalprice >= 150000 THEN 'gold'
                ELSE 'standard' END AS tier
    FROM orders
    """,
    tags=("udx",),
)
def udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1 row-at-a-time Python UDF (the slow path, here by design)."""

    @F.udf(returnType=T.StringType())
    def tier(price: float) -> str:
        if price >= 300000:
            return "platinum"
        if price >= 150000:
            return "gold"
        return "standard"

    return load(spark, sf_dir, "orders").select(
        "o_orderkey", tier(F.col("o_totalprice")).alias("tier")
    )


@query(
    "udf_pandas",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(l_extendedprice * (1 - l_discount) * (1 + l_tax), 6) AS charged
    FROM lineitem
    """,
    tags=("udx",),
)
def udf_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2 Arrow-vectorized pandas UDF — whole columns cross the
    Python boundary as Arrow batches (~10-100x the row UDF).

    Rounded at 6 dp, where price(2dp)*disc(2dp)*tax(2dp) is decimally
    exact — numpy's half-even, Spark's HALF_UP, and DuckDB's value
    rounding all agree there (SURVEY.md §7.4.1)."""

    @F.pandas_udf(T.DoubleType())
    def charged(price: pd.Series, disc: pd.Series, tax: pd.Series) -> pd.Series:
        return (price * (1 - disc) * (1 + tax)).round(6)

    li = load(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        charged("l_extendedprice", "l_discount", "l_tax").alias("charged"),
    )


@query(
    "udf_grouped_agg",
    oracle="""
    SELECT l_returnflag,
           round(sum(l_extendedprice * l_quantity) / sum(l_quantity), 4)
               AS weighted_avg_price
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("udx",),
)
def udf_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3 grouped-aggregate pandas UDAF: quantity-weighted mean price."""

    @F.pandas_udf(T.DoubleType())
    def wavg(price: pd.Series, qty: pd.Series) -> float:
        return float((price * qty).sum() / qty.sum())

    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(wavg("l_extendedprice", "l_quantity").alias("weighted_avg_price"))
        .withColumn("weighted_avg_price", F.round("weighted_avg_price", 4))
    )


@query(
    "udtf_explode_like",
    oracle="""
    SELECT doc_id,
           unnest(string_split(text, ' ')) AS token,
           len(string_split(text, ' '))    AS doc_len
    FROM documents WHERE doc_id % 20 = 3
    """,
    tags=("udx",),
)
def udtf_explode_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 table function: one doc row -> one row per token, via
    mapInPandas (Arrow-batched, streaming output iterator)."""

    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("token", T.StringType()),
            T.StructField("doc_len", T.IntegerType()),
        ]
    )

    def tokenize_rows(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            toks = pdf["text"].str.split(" ")
            lens = toks.str.len()
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].repeat(lens),
                    "token": [t for row in toks for t in row],
                    "doc_len": lens.repeat(lens),
                }
            )

    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 20 == 3)
    return docs.select("doc_id", "text").mapInPandas(tokenize_rows, schema=out_schema)
