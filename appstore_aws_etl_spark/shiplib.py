"""Make the package importable inside Python worker processes.

cloudpickle serializes functions defined in an importable module BY
REFERENCE (module + qualname), so every pandas_udf / mapInPandas /
applyInPandas crossing requires ``appstore_aws_etl_spark`` to be
importable in the worker interpreter, not just the driver. When the
host process is launched from the repo root (the driver harness, tests,
bench.py) that holds through cwd/PYTHONPATH inheritance; a host that
imports ``__spark_entry__`` from some other cwd with a SparkSession it
already created would hit ``ModuleNotFoundError: appstore_aws_etl_spark``
in the worker on the first UDF-bearing query. On a real cluster the
same hole is "forgot --py-files".

Two closures, layered:

* ``arm_env()`` — prepend the repo root to ``$PYTHONPATH`` so a JVM
  gateway launched AFTER import passes it to every Python worker. Free,
  but powerless once the JVM is up.
* ``ensure_workers_can_import(spark)`` — zip the package (once per
  process, rebuilt when sources are newer) and ``addPyFile`` it (once
  per SparkContext). Covers pre-existing sessions; on a cluster this is
  exactly the supported ship-your-code path, so the entry surface works
  unchanged on 1000 executors.
"""

from __future__ import annotations

import os
import zipfile

_SHIPPED: set[str] = set()
_ZIP_PATH = "/tmp/appstore_aws_etl_spark_ship.zip"


def _pkg_dir() -> str:
    return os.path.dirname(os.path.abspath(__file__))


def arm_env() -> None:
    """Prepend the repo root to PYTHONPATH for JVMs not yet launched."""
    repo = os.path.dirname(_pkg_dir())
    parts = os.environ.get("PYTHONPATH", "").split(os.pathsep)
    if repo not in parts:
        os.environ["PYTHONPATH"] = (
            repo + ((os.pathsep + os.environ["PYTHONPATH"]) if os.environ.get("PYTHONPATH") else "")
        )


def package_zip() -> str:
    """Zip of the package suitable for ``addPyFile`` / ``--py-files``.

    Rebuilt only when a source file is newer than the existing zip;
    written atomically so concurrent processes never see a torn file.
    """
    pkg = _pkg_dir()
    sources = []
    for root, _dirs, files in os.walk(pkg):
        if "__pycache__" in root:
            continue
        for f in files:
            if f.endswith(".py"):
                sources.append(os.path.join(root, f))
    newest = max(os.path.getmtime(p) for p in sources)
    if os.path.exists(_ZIP_PATH) and os.path.getmtime(_ZIP_PATH) >= newest:
        return _ZIP_PATH
    tmp = f"{_ZIP_PATH}.{os.getpid()}.tmp"
    with zipfile.ZipFile(tmp, "w", zipfile.ZIP_DEFLATED) as zf:
        for p in sorted(sources):
            zf.write(p, os.path.join("appstore_aws_etl_spark", os.path.relpath(p, pkg)))
    os.replace(tmp, _ZIP_PATH)
    return _ZIP_PATH


def ensure_workers_can_import(spark) -> None:
    """Ship the package to this session's Python workers (idempotent)."""
    sc = spark.sparkContext
    app_id = sc.applicationId
    if app_id in _SHIPPED:
        return
    sc.addPyFile(package_zip())
    _SHIPPED.add(app_id)
