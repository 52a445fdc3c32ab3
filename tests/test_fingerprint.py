"""util_table_fingerprint integrity properties: a single-row content
mutation flips the XOR; adding the same row TWICE (even multiplicity —
invisible to XOR since x^x=0) moves the modular SUM; and the
fingerprint is independent of row order and partition layout, which is
what makes it comparable across two engines or two cluster layouts."""

from __future__ import annotations

import datetime

from appstore_aws_etl_spark.registry import REGISTRY
import appstore_aws_etl_spark.queries  # noqa: F401

KEY = "util_table_fingerprint"


def _write_lineitem(spark, rows, path, partitions=1):
    df = spark.createDataFrame(
        rows,
        "l_orderkey BIGINT, l_partkey BIGINT, l_suppkey BIGINT, "
        "l_linenumber INT, l_quantity DOUBLE, l_extendedprice DOUBLE, "
        "l_discount DOUBLE, l_tax DOUBLE, l_returnflag STRING, "
        "l_linestatus STRING, l_shipdate TIMESTAMP",
    ).repartition(partitions)
    df.write.mode("overwrite").parquet(f"{path}/lineitem.parquet")
    return path


def _row(i, flag="N", qty=10.0):
    return (
        i, i * 7 % 100, i * 3 % 50, i % 5, qty, 100.0, 0.05, 0.02,
        flag, "O", datetime.datetime(2024, 1, 1 + i % 28),
    )


def _fp(spark, sf_dir):
    out = REGISTRY[KEY].fn(spark, sf_dir).collect()
    return {r["l_returnflag"]: (r["fp_xor"], r["fp_sum"], r["n_rows"]) for r in out}


def test_fingerprint_layout_independent_and_detects_mutation(spark, tmp_path):
    rows = [_row(i) for i in range(200)]
    base = _fp(spark, _write_lineitem(spark, rows, str(tmp_path / "a"), 1))

    # same content, shuffled order, different partition count -> identical
    import random

    shuffled = rows[:]
    random.Random(7).shuffle(shuffled)
    relaid = _fp(spark, _write_lineitem(spark, shuffled, str(tmp_path / "b"), 8))
    assert relaid == base

    # one row's quantity mutated -> XOR flips, count unchanged
    mutated = rows[:-1] + [_row(199, qty=11.0)]
    mut = _fp(spark, _write_lineitem(spark, mutated, str(tmp_path / "c"), 3))
    assert mut["N"][2] == base["N"][2]
    assert mut["N"][0] != base["N"][0]


def test_fingerprint_sum_catches_even_multiplicity(spark, tmp_path):
    rows = [_row(i) for i in range(50)]
    base = _fp(spark, _write_lineitem(spark, rows, str(tmp_path / "a")))

    # the same row appended TWICE: x^x cancels in the XOR, but the
    # modular sum and the count both move
    doubled = rows + [rows[0], rows[0]]
    dup = _fp(spark, _write_lineitem(spark, doubled, str(tmp_path / "b")))
    assert dup["N"][0] == base["N"][0]  # XOR is blind to this
    assert dup["N"][1] != base["N"][1]  # SUM is not
    assert dup["N"][2] == base["N"][2] + 2
