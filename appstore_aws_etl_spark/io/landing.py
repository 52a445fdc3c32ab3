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

    ``root`` is either a local directory or an ``s3://bucket[/path]``
    URI. A path component in the root URI is honored as a base prefix
    for every operation — earlier revisions silently dropped it, which
    made ``vacuum()`` on ``s3://bucket/data`` list-and-delete from the
    bucket *root* (with an empty prefix: the whole bucket).
    """

    root: str
    prefix: str = ""

    @property
    def _is_s3(self) -> bool:
        return self.root.startswith("s3://")

    def _local_base(self) -> str:
        return os.path.join(self.root, self.prefix) if self.prefix else self.root

    def _s3_parts(self) -> tuple[str, str]:
        """(bucket, effective key prefix) — the root URI's path joined
        with ``self.prefix``."""
        bucket, _, root_path = self.root[len("s3://") :].partition("/")
        if not bucket:
            raise ValueError(f"s3 root has no bucket: {self.root!r}")
        parts = [p for p in (root_path.strip("/"), self.prefix.strip("/")) if p]
        return bucket, "/".join(parts)

    def _s3_full_key(self, key: str) -> str:
        _, base = self._s3_parts()
        return f"{base}/{key}" if base else key

    # -- S1: paginated listing ------------------------------------------------
    def keys(self) -> list[str]:
        """All keys under the prefix, paginated (fixes s3.py:18-20)."""
        if self._is_s3:
            if boto3 is None:
                raise RuntimeError("boto3 not available for s3:// landing zones")
            bucket, base = self._s3_parts()
            root_path = self.root[len("s3://") :].partition("/")[2].strip("/")
            paginator = boto3.client("s3").get_paginator("list_objects_v2")
            out: list[str] = []
            for page in paginator.paginate(
                Bucket=bucket, Prefix=f"{base}/" if base else ""
            ):
                for obj in page.get("Contents", []):
                    k = obj["Key"]
                    # report keys relative to the root URI (local parity)
                    if root_path and k.startswith(root_path + "/"):
                        k = k[len(root_path) + 1 :]
                    out.append(k)
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
            bucket, _ = self._s3_parts()
            full_key = self._s3_full_key(key)
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
            bucket, _ = self._s3_parts()
            full_key = self._s3_full_key(key)
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
            bucket, base = self._s3_parts()
            if not base:
                # an empty effective prefix means "the whole bucket" —
                # refuse; vacuum is a prefix operation, not bucket wipe
                raise ValueError(
                    "vacuum() with no prefix would delete the entire "
                    f"bucket {bucket!r}; set a prefix or a root path"
                )
            root_path = self.root[len("s3://") :].partition("/")[2].strip("/")
            full = [f"{root_path}/{k}" if root_path else k for k in keys]
            client = boto3.client("s3")
            for i in range(0, len(full), _S3_BATCH):
                batch = [{"Key": k} for k in full[i : i + _S3_BATCH]]
                client.delete_objects(Bucket=bucket, Delete={"Objects": batch})
            return len(keys)
        base = self._local_base()
        if os.path.isdir(base):
            shutil.rmtree(base)
        return len(keys)
