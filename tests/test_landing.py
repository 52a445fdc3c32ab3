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
