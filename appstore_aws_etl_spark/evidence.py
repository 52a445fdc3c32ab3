"""Driver-evidence bookkeeping shared by the sweep ordering and tooling.

The external driver re-verifies ~50 query keys per round (dict order of
``__spark_entry__.queries()``) and records per-key results in
``CORRECTNESS_r{N}.json`` at the repo root. Rounds 1-4 maintained the
sweep ordering by hand-pasting frozensets of verified keys, and twice
the ordering went stale (frozen before the newest artifact landed), so
never-swept keys kept missing the budget. This module derives the
ordering from the artifacts directly: drop a new ``CORRECTNESS_r*.json``
in the repo root and the next ``queries()`` call re-prioritizes with no
code edit.

Classification rules (shared with ``tools/verified.py``):

* ``hash``      — ``hash_match`` is true: exact DuckDB evidence.
* ``rows_only`` — ``err == "no_oracle"`` AND an actual recorded
  execution (``spark_rows`` present, no negative rows/schema verdict).
  Oracle-less-by-design keys can never do better than this.
* ``failed``    — any other error or negative verdict.
* ``unclassified`` — a malformed record; treated as no evidence so the
  key is re-swept rather than silently skipped forever.
"""

from __future__ import annotations

import glob
import json
import os
import re
from typing import Any, Mapping

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def classify(record: Mapping[str, Any]) -> str:
    """Map one driver correctness record to an evidence level."""
    if record.get("hash_match") is True:
        return "hash"
    if (
        record.get("err") == "no_oracle"
        and record.get("spark_rows") is not None
        and record.get("rows_match") is not False
        and record.get("schema_match") is not False
    ):
        return "rows_only"
    if (
        (record.get("err") and record.get("err") != "no_oracle")
        or record.get("hash_match") is False
        or record.get("rows_match") is False
        or record.get("schema_match") is False
    ):
        return "failed"
    return "unclassified"


def load_rounds(root: str = REPO_ROOT) -> dict[int, dict[str, str]]:
    """{round: {key: level}} for every CORRECTNESS_r*.json under root."""
    rounds: dict[int, dict[str, str]] = {}
    for path in glob.glob(os.path.join(root, "CORRECTNESS_r*.json")):
        m = re.search(r"_r(\d+)", os.path.basename(path))
        if not m:
            continue
        try:
            data = json.load(open(path))
        except (OSError, json.JSONDecodeError):
            continue
        if not isinstance(data, dict):
            continue
        rounds[int(m.group(1))] = {
            k: classify(v) for k, v in data.items() if isinstance(v, dict)
        }
    return rounds


def evidence(root: str = REPO_ROOT) -> dict[str, tuple[str, int]]:
    """Best driver evidence per key: {key: (level, newest_round_at_that
    _level)} where level is 'hash' or 'rows_only'. Failed/unclassified
    records carry no evidence (the key stays re-sweepable)."""
    best: dict[str, tuple[str, int]] = {}
    rank = {"hash": 2, "rows_only": 1}
    for rnd, records in sorted(load_rounds(root).items()):
        for key, level in records.items():
            if level not in rank:
                continue
            prev = best.get(key)
            if prev is None or rank[level] >= rank[prev[0]]:
                best[key] = (level, rnd)
    return best


def sweep_order(
    registry_keys: list[str],
    has_oracle: Mapping[str, bool],
    root: str = REPO_ROOT,
) -> list[str]:
    """Order query keys so a budgeted ~50-key sweep maximizes fresh
    evidence:

    1. keys with NO driver evidence at all (registry order);
    2. keys that NOW have an exact oracle but whose best evidence is
       rows-only — an oracle upgrade awaiting its first hash sweep;
    3. everything else, oldest evidence first (stalest hash matches are
       re-validated against the current fixture before recent ones).
    """
    ev = evidence(root)
    never = [k for k in registry_keys if k not in ev]
    upgraded = [
        k
        for k in registry_keys
        if k in ev and ev[k][0] == "rows_only" and has_oracle.get(k, False)
    ]
    front = set(never) | set(upgraded)
    proven = sorted(
        (k for k in registry_keys if k not in front),
        key=lambda k: (ev[k][1], k),
    )
    return never + upgraded + proven
