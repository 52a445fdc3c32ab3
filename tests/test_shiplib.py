"""The entry surface must work from a host process that (a) launched
from a cwd outside the repo, (b) has no PYTHONPATH, and (c) created its
SparkSession BEFORE importing ``__spark_entry__`` — the embedding
pattern a driver harness or notebook uses. Without shiplib, any
pandas_udf/mapInPandas key dies in the worker with
``ModuleNotFoundError: appstore_aws_etl_spark`` under exactly those
conditions (cloudpickle serializes module-level functions by
reference). On a cluster the same mechanism replaces ``--py-files``.
"""

from __future__ import annotations

import os
import subprocess
import sys
import zipfile

import appstore_aws_etl_spark  # noqa: F401
from appstore_aws_etl_spark import shiplib

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_package_zip_contains_full_package_and_is_cached():
    p1 = shiplib.package_zip()
    with zipfile.ZipFile(p1) as zf:
        names = zf.namelist()
    assert "appstore_aws_etl_spark/__init__.py" in names
    assert "appstore_aws_etl_spark/llm/multimodal.py" in names
    assert all(n.startswith("appstore_aws_etl_spark/") for n in names)
    assert not any("__pycache__" in n for n in names)
    # second call must reuse (mtime cache), not rewrite
    m1 = os.path.getmtime(p1)
    assert shiplib.package_zip() == p1
    assert os.path.getmtime(p1) == m1


def test_arm_env_prepends_repo_once():
    old = os.environ.get("PYTHONPATH")
    try:
        os.environ.pop("PYTHONPATH", None)
        shiplib.arm_env()
        assert os.environ["PYTHONPATH"].split(os.pathsep)[0] == REPO
        shiplib.arm_env()  # idempotent
        assert os.environ["PYTHONPATH"].split(os.pathsep).count(REPO) == 1
    finally:
        if old is None:
            os.environ.pop("PYTHONPATH", None)
        else:
            os.environ["PYTHONPATH"] = old


def test_udf_key_runs_from_hostile_host_process(tmp_path):
    """Subprocess: cwd=/tmp-like dir, PYTHONPATH stripped, session built
    before the entry import, then a mapInPandas-backed key executes."""
    script = tmp_path / "host.py"
    script.write_text(
        f"""
import sys
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[2]")
         .config("spark.sql.shuffle.partitions", "2")
         .config("spark.ui.enabled", "false")
         .config("spark.sql.session.timeZone", "UTC")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
sys.path.insert(0, {REPO!r})
import __spark_entry__ as e
q = e.queries()
n = q["llm_multimodal_decode"](spark, "/root/testdata/sf0.001").count()
assert n > 0, n
print("HOSTILE_OK", n)
"""
    )
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    out = subprocess.run(
        [sys.executable, str(script)],
        cwd=str(tmp_path),
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    assert "HOSTILE_OK" in out.stdout
