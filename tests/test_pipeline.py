"""End-to-end test of the declared App-Store ETL: land gzipped TSV ->
schema ingest with quarantine -> rollup -> partitioned serving table."""

from __future__ import annotations

import gzip

from appstore_aws_etl_spark.io.landing import LandingZone
from appstore_aws_etl_spark.pipelines import run_sales_pipeline
from appstore_aws_etl_spark.pipelines.appstore import ingest_reports, land_reports


def tsv_gz(rows: list[str]) -> bytes:
    header = "report_date\torder_id\tstatus\tunits\tproceeds"
    return gzip.compress(("\n".join([header, *rows]) + "\n").encode())


def test_sales_pipeline_end_to_end(spark, tmp_path):
    zone = LandingZone(str(tmp_path / "landing"), prefix="appstore")
    reports = {
        "2024-03-01": tsv_gz(
            [
                "2024-03-01\t1\tCOMPLETED\t2\t19.98",
                "2024-03-01\t2\tCOMPLETED\t1\t9.99",
                "2024-03-01\t3\tREFUNDED\t1\t-9.99",
                # type-corrupt row: order_id/units fail to parse
                "2024-03-01\tNOT_A_NUMBER\tCOMPLETED\tx\tbad",
            ]
        ),
        "2024-03-02": tsv_gz(["2024-03-02\t4\tCOMPLETED\t3\t29.97"]),
    }
    land_reports(zone, reports)
    assert len(zone.keys()) == 2

    # cache before inspecting the quarantine column — Spark disallows
    # pruning a raw CSV scan down to only _corrupt_record
    raw = ingest_reports(spark, zone).cache()
    # the malformed line is quarantined, not dropped silently
    assert raw.filter(raw._corrupt_record.isNotNull()).count() == 1

    serving = run_sales_pipeline(spark, zone, str(tmp_path / "serving"))
    got = {
        (str(r["report_day"]), r["status"]): (r["units"], r["proceeds"], r["n_orders"])
        for r in serving.collect()
    }
    assert got == {
        ("2024-03-01", "COMPLETED"): (3, 29.97, 2),
        ("2024-03-01", "REFUNDED"): (1, -9.99, 1),
        ("2024-03-02", "COMPLETED"): (3, 29.97, 1),
    }
    # serving table is date-partitioned (directory layout = pruning)
    assert (tmp_path / "serving" / "report_day=2024-03-01").is_dir()

    # full-refresh semantics: re-running overwrites, not duplicates
    serving2 = run_sales_pipeline(spark, zone, str(tmp_path / "serving"))
    assert serving2.count() == 3
