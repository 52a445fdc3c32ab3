"""Connection/credential resolution (SURVEY.md §2.1 S4).

Re-expresses the reference's Secrets Manager helper
(reference utils/utils/secrets.py:10-46) with its defects fixed:

* ⚠ the reference hard-codes ``'us-east-1'`` and silently ignores the
  caller's ``region_name`` (secrets.py:42) — here the requested region
  is actually used;
* an unrecognized format falls through to an implicit ``None`` there
  (secrets.py:45-46) — here it raises;
* errors were ``print``-ed then re-raised (secrets.py:23-34) — here
  they just propagate to the caller's logger.

Resolution order: explicit env var -> local JSON file (test/dev) ->
AWS Secrets Manager (gated on boto3, absent in this container).
Secrets are resolved **on the driver, outside the plan**, and injected
into reader/writer ``.option(...)`` calls — never shipped to executors
as data (SURVEY.md §3.3).
"""

from __future__ import annotations

import json
import os
from typing import Any

try:  # pragma: no cover - not installed in this container
    import boto3  # type: ignore
    from botocore.exceptions import ClientError  # type: ignore  # noqa: F401
except ImportError:
    boto3 = None


def get_secret(
    name: str,
    region_name: str = "us-east-1",
    string_format: str = "JSON",
    env_prefix: str = "APPSTORE_ETL_SECRET_",
    secrets_dir: str | None = None,
) -> Any:
    """Fetch a named secret as a parsed JSON document or raw string.

    Mirrors the reference surface ``get_secret(name, region, format)``
    (secrets.py:41) with layered sources so pipelines run identically
    in tests (env/file) and deployment (Secrets Manager).
    """
    if string_format not in ("JSON", "PLAIN TEXT"):
        raise ValueError(f"unsupported string_format: {string_format!r}")

    env_key = env_prefix + name.upper().replace("/", "_").replace("-", "_")
    raw = os.environ.get(env_key)

    if raw is None and secrets_dir:
        path = os.path.join(secrets_dir, f"{name}.json")
        if os.path.exists(path):
            with open(path, encoding="utf-8") as fh:
                raw = fh.read()

    if raw is None:
        if boto3 is None:
            raise RuntimeError(
                f"secret {name!r} not in env ({env_key}) or secrets_dir, "
                "and boto3 is unavailable for Secrets Manager"
            )
        client = boto3.session.Session().client(
            service_name="secretsmanager", region_name=region_name
        )
        raw = client.get_secret_value(SecretId=name)["SecretString"]

    if string_format == "JSON":
        return json.loads(raw)
    return raw


def jdbc_options_from_secret(secret: dict[str, str]) -> dict[str, str]:
    """Map a warehouse credential document to JDBC writer options (the
    Redshift-load edge of the declared pipeline, reference README.md:2)."""
    return {
        "user": secret["username"],
        "password": secret["password"],
        "driver": secret.get("driver", "com.amazon.redshift.jdbc42.Driver"),
    }
