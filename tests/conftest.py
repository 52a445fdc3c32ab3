from __future__ import annotations

import os
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

# vendored pure-Python google.protobuf (vendor/README.md) — APPENDED so
# a real installation always wins; exported via PYTHONPATH so Spark's
# Python workers (separate processes) resolve it too, which is where
# transformWithStateInPandas' state server actually runs.
_VENDOR = os.path.join(_REPO, "vendor")
try:
    from google.protobuf import descriptor as _d  # noqa: F401
except ImportError:
    sys.path.append(_VENDOR)
    os.environ["PYTHONPATH"] = (
        os.environ["PYTHONPATH"] + os.pathsep + _VENDOR
        if os.environ.get("PYTHONPATH")
        else _VENDOR
    )

from appstore_aws_etl_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_SMOKE
