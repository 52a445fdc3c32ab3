from __future__ import annotations

from appstore_aws_etl_spark.io import LandingZone


def test_store_list_fetch_vacuum(tmp_path):
    lz = LandingZone(str(tmp_path), prefix="landing/appstore")
    uri = lz.store(b"payload-0", "reports/2024/r0.tsv.gz")
    assert uri.endswith("reports/2024/r0.tsv.gz")
    lz.store(b"payload-1", "reports/2024/r1.tsv.gz")
    assert lz.keys() == [
        "landing/appstore/reports/2024/r0.tsv.gz",
        "landing/appstore/reports/2024/r1.tsv.gz",
    ]
    assert lz.fetch("reports/2024/r0.tsv.gz") == b"payload-0"
    assert lz.vacuum() == 2
    assert lz.keys() == []


def test_listing_beyond_reference_1000_key_cap(tmp_path):
    # The reference truncates listings at 1000 keys (s3.py:18-20);
    # this implementation must not.
    lz = LandingZone(str(tmp_path))
    for i in range(1200):
        lz.store(b"x", f"k{i:05d}")
    assert len(lz.keys()) == 1200
    assert lz.vacuum() == 1200


def test_json_permissive_corrupt_record_capture(spark, tmp_path):
    """S7 robustness: malformed JSON lines land in the corrupt-record
    column under PERMISSIVE mode instead of failing the job, and
    DROPMALFORMED yields only the clean rows — the production contract
    for dirty analytics payloads."""
    from pyspark.sql import types as T

    p = tmp_path / "dirty.json"
    p.write_text(
        '{"k": 1, "v": "ok"}\n'
        '{"k": 2, "v": "also ok"}\n'
        '{"k": THIS IS NOT JSON\n'
        '{"k": 4, "v": "fine"}\n'
    )
    schema = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("v", T.StringType()),
            T.StructField("_corrupt", T.StringType()),
        ]
    )
    df = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .json(str(p))
        .cache()
    )
    assert df.count() == 4
    bad = df.filter(df["_corrupt"].isNotNull()).collect()
    assert len(bad) == 1 and "NOT JSON" in bad[0]["_corrupt"]
    clean = (
        spark.read.schema(schema)
        .option("mode", "DROPMALFORMED")
        .json(str(p))
    )
    assert clean.count() == 3
    df.unpersist()


def test_parquet_schema_evolution_mergeschema(spark, tmp_path):
    """S5 robustness: a table whose later files gained a column reads
    as the merged schema with nulls for the old files (mergeSchema) —
    the append-only schema-evolution contract of a parquet lakehouse."""
    from pyspark.sql import Row

    old = spark.createDataFrame([Row(id=1, a="x"), Row(id=2, a="y")])
    new = spark.createDataFrame([Row(id=3, a="z", b=30), Row(id=4, a="w", b=40)])
    old.write.parquet(str(tmp_path / "t" / "part=0"))
    new.write.parquet(str(tmp_path / "t" / "part=1"))
    merged = spark.read.option("mergeSchema", "true").parquet(str(tmp_path / "t"))
    assert {"id", "a", "b", "part"} <= set(merged.columns)
    rows = {r["id"]: (r["a"], r["b"]) for r in merged.collect()}
    assert rows[1] == ("x", None) and rows[3] == ("z", 30)
