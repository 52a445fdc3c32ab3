"""Landing-zone management (SURVEY.md §2.1 S1-S3).

Re-expresses the reference's ``BucketPath`` semantics
(reference utils/utils/s3.py:10-43: list keys under a prefix, store a
bytes payload, vacuum the prefix) with two deliberate fixes:

* **Pagination** — the reference lists a single ``list_objects_v2``
  page (s3.py:18-20), silently truncating at 1000 keys; this
  implementation iterates pages, and deletes in 1000-key batches
  (the S3 ``delete_objects`` hard cap).
* **Engine-owned refresh** — the reference's wipe-then-reload pattern
  (s3.py:33-43) is replaced in pipelines by
  ``df.write.mode("overwrite")`` so atomicity belongs to the committer,
  not user code; ``vacuum`` remains for raw (non-tabular) landings.

Works against local filesystem paths out of the box (the test and
local[.] path) and against ``s3://`` URIs when boto3 is available —
gated behind an import-try because the container has no AWS SDK.
"""

from __future__ import annotations

import os
import shutil
from dataclasses import dataclass

try:  # pragma: no cover - not installed in this container
    import boto3  # type: ignore
except ImportError:
    boto3 = None

_S3_BATCH = 1000  # S3 delete_objects per-request cap


@dataclass
class LandingZone:
    """A keyed byte-object namespace: ``{root}/{prefix}/{key}``.

    ``root`` is either a local directory or an ``s3://bucket`` URI.
    """

    root: str
    prefix: str = ""

    @property
    def _is_s3(self) -> bool:
        return self.root.startswith("s3://")

    def _local_base(self) -> str:
        return os.path.join(self.root, self.prefix) if self.prefix else self.root

    # -- S1: paginated listing ------------------------------------------------
    def keys(self) -> list[str]:
        """All keys under the prefix, paginated (fixes s3.py:18-20)."""
        if self._is_s3:
            if boto3 is None:
                raise RuntimeError("boto3 not available for s3:// landing zones")
            bucket = self.root[len("s3://") :].split("/", 1)[0]
            client = boto3.client("s3")
            paginator = client.get_paginator("list_objects_v2")
            out: list[str] = []
            for page in paginator.paginate(Bucket=bucket, Prefix=self.prefix):
                out.extend(obj["Key"] for obj in page.get("Contents", []))
            return out
        base = self._local_base()
        if not os.path.isdir(base):
            return []
        out = []
        for dirpath, _dirnames, filenames in os.walk(base):
            for f in filenames:
                rel = os.path.relpath(os.path.join(dirpath, f), base)
                out.append(rel if not self.prefix else f"{self.prefix}/{rel}")
        return sorted(out)

    # -- S2: raw object put ---------------------------------------------------
    def store(self, body: bytes, key: str) -> str:
        """Write one opaque payload, return its URI (s3.py:26-30 parity)."""
        if self._is_s3:
            if boto3 is None:
                raise RuntimeError("boto3 not available for s3:// landing zones")
            bucket = self.root[len("s3://") :].split("/", 1)[0]
            full_key = f"{self.prefix}/{key}" if self.prefix else key
            boto3.client("s3").put_object(Bucket=bucket, Key=full_key, Body=body)
            return f"s3://{bucket}/{full_key}"
        base = self._local_base()
        dest = os.path.join(base, key)
        os.makedirs(os.path.dirname(dest), exist_ok=True)
        with open(dest, "wb") as fh:
            fh.write(body)
        return dest

    def fetch(self, key: str) -> bytes:
        """Read one payload back (round-trip completeness)."""
        if self._is_s3:
            if boto3 is None:
                raise RuntimeError("boto3 not available for s3:// landing zones")
            bucket = self.root[len("s3://") :].split("/", 1)[0]
            full_key = f"{self.prefix}/{key}" if self.prefix else key
            return boto3.client("s3").get_object(Bucket=bucket, Key=full_key)["Body"].read()
        base = self._local_base()
        with open(os.path.join(base, key), "rb") as fh:
            return fh.read()

    # -- S3: vacuum -----------------------------------------------------------
    def vacuum(self) -> int:
        """Delete every object under the prefix; returns count deleted.

        Batched at 1000 keys (the reference's unbatched delete_objects,
        s3.py:37-41, fails beyond one batch).
        """
        keys = self.keys()
        if self._is_s3:
            if boto3 is None:
                raise RuntimeError("boto3 not available for s3:// landing zones")
            bucket = self.root[len("s3://") :].split("/", 1)[0]
            client = boto3.client("s3")
            for i in range(0, len(keys), _S3_BATCH):
                batch = [{"Key": k} for k in keys[i : i + _S3_BATCH]]
                client.delete_objects(Bucket=bucket, Delete={"Objects": batch})
            return len(keys)
        base = self._local_base()
        if os.path.isdir(base):
            shutil.rmtree(base)
        return len(keys)
