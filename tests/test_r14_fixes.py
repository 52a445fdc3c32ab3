"""Round-14 correctness fixes (r13 ADVICE) + fanout_width FS size path."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tests.conftest import SF_SMOKE


# ---------------------------------------------------------------- _conform
def test_conform_quotes_nested_struct_field_names(spark):
    """A nested struct field name with a space breaks simpleString DDL;
    _conform must fall back to the column-object cast (ADVICE medium)."""
    from appstore_aws_etl_spark.lakehouse.table import _conform

    schema = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField(
                "payload",
                T.StructType(
                    [
                        T.StructField("field name", T.IntegerType(), True),
                        T.StructField("ok", T.StringType(), True),
                    ]
                ),
                True,
            ),
        ]
    )
    df = spark.createDataFrame(
        [(1, {"field name": 7, "ok": "x"})], schema
    ).select(F.col("id").cast("int").alias("id"), "payload")
    out = _conform(df, schema)
    assert out.schema == schema
    row = out.collect()[0]
    assert row.id == 1 and row.payload["field name"] == 7 and row.payload.ok == "x"


def test_conform_missing_nullable_unsafe_field_is_null(spark):
    from appstore_aws_etl_spark.lakehouse.table import _conform

    schema = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField(
                "extra",
                T.StructType([T.StructField("a b", T.LongType(), True)]),
                True,
            ),
        ]
    )
    df = spark.range(1).select(F.col("id"))
    out = _conform(df, schema)
    assert out.schema == schema
    assert out.collect()[0].extra is None


# ------------------------------------------------------------ replay guard
_SCHEMA = T.StructType(
    [T.StructField("id", T.LongType(), True), T.StructField("v", T.StringType(), True)]
)


def test_replay_resume_ignores_base_from_recreated_log(spark, tmp_path):
    """A log deleted and re-created out-of-band must not let a stale
    snapshot resume into the new history (ADVICE low)."""
    from appstore_aws_etl_spark.lakehouse.log import replay
    from appstore_aws_etl_spark.lakehouse.table import LakeTable

    root = str(tmp_path / "t")
    t = LakeTable.create(spark, root, _SCHEMA)
    t.append(spark.range(5).select(F.col("id"), F.lit("a").alias("v")))
    t.append(spark.range(5).select(F.col("id") + 10, F.lit("b").alias("v")))
    stale = replay(spark, root)
    assert stale.version == 2

    shutil.rmtree(root)
    t2 = LakeTable.create(spark, root, _SCHEMA)
    t2.append(spark.range(3).select(F.col("id"), F.lit("new").alias("v")))
    fresh = replay(spark, root)  # version 1, commits [0, 1]
    resumed = replay(spark, root, base=stale)  # base version 2 not in log
    assert set(resumed.adds) == set(fresh.adds)
    assert resumed.version == fresh.version


def test_replay_resume_falls_back_when_base_version_gone(spark, tmp_path):
    """Direct unit check: base.version absent from the commit list ->
    full replay result, not a resumed mix."""
    from appstore_aws_etl_spark.lakehouse.log import Snapshot, replay
    from appstore_aws_etl_spark.lakehouse.table import LakeTable

    root = str(tmp_path / "t2")
    t = LakeTable.create(spark, root, _SCHEMA)
    t.append(spark.range(4).select(F.col("id"), F.lit("x").alias("v")))
    fresh = replay(spark, root)
    bogus = Snapshot(
        version=fresh.version - 100,
        metadata=dict(fresh.metadata),
        adds={"data/ghost.parquet": next(iter(fresh.adds.values()))},
        txns={},
    )
    out = replay(spark, root, base=bogus)
    assert set(out.adds) == set(fresh.adds)
    assert "data/ghost.parquet" not in out.adds


# -------------------------------------------------------- _param_relation
def test_param_relation_empty_has_typed_schema(spark):
    from appstore_aws_etl_spark.llm.similarity import _param_relation

    df = _param_relation(spark, [], "cid", "vec")
    assert df.count() == 0
    assert dict((f.name, f.dataType.simpleString()) for f in df.schema.fields) == {
        "cid": "bigint",
        "vec": "array<double>",
    }


def test_param_relation_nonempty_matches_pairs(spark):
    from appstore_aws_etl_spark.llm.similarity import _param_relation

    pairs = [(3, [1.0, 2.5]), (7, [0.0, -1.25])]
    rows = _param_relation(spark, pairs, "cid", "vec").orderBy("cid").collect()
    assert [(r.cid, list(r.vec)) for r in rows] == [
        (3, [1.0, 2.5]),
        (7, [0.0, -1.25]),
    ]


# ------------------------------------------------------------ fanout_width
def test_fanout_width_derives_from_file_scheme_uri(spark):
    """file:-scheme paths bypass os.path; the Hadoop FS branch must
    still derive a width from the table's real bytes (VERDICT item 2)."""
    from appstore_aws_etl_spark.catalog import fanout_width

    local = fanout_width(spark, SF_SMOKE, "lineitem", bytes_per_partition=1 << 12)
    via_fs = fanout_width(
        spark, f"file://{SF_SMOKE}", "lineitem", bytes_per_partition=1 << 12
    )
    session_width = int(spark.conf.get("spark.sql.shuffle.partitions"))
    assert via_fs == local
    assert via_fs > session_width  # tiny bpp forces a derived (non-fallback) width


def test_fanout_width_unreadable_path_falls_back_to_session(spark):
    from appstore_aws_etl_spark.catalog import fanout_width

    w = fanout_width(spark, "nosuchscheme://bucket/prefix", "lineitem")
    assert w == int(spark.conf.get("spark.sql.shuffle.partitions"))
