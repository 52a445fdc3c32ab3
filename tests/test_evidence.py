"""Unit tests for the artifact-derived sweep ordering
(appstore_aws_etl_spark.evidence) — no Spark session needed."""

from __future__ import annotations

import json

from appstore_aws_etl_spark.evidence import classify, evidence, sweep_order


def _write_round(tmp_path, n, records):
    (tmp_path / f"CORRECTNESS_r0{n}.json").write_text(json.dumps(records))


HASH_OK = {"rows_match": True, "schema_match": True, "hash_match": True,
           "spark_rows": 5, "oracle_rows": 5, "err": None}
ROWS_OK = {"rows_match": None, "schema_match": None, "hash_match": None,
           "spark_rows": 9, "oracle_rows": None, "err": "no_oracle"}


def test_classify_levels():
    assert classify(HASH_OK) == "hash"
    assert classify(ROWS_OK) == "rows_only"
    assert classify({"err": "boom"}) == "failed"
    assert classify({"hash_match": False}) == "failed"
    # a no_oracle record that never executed is NOT rows-only green
    assert classify({"err": "no_oracle", "spark_rows": None}) == "unclassified"
    # a no_oracle record with a negative rows verdict is a failure
    assert classify({"err": "no_oracle", "spark_rows": 3,
                     "rows_match": False}) == "failed"
    # an empty/malformed record carries no evidence
    assert classify({}) == "unclassified"


def test_evidence_keeps_best_level_and_newest_round(tmp_path):
    _write_round(tmp_path, 1, {"a": HASH_OK, "b": ROWS_OK})
    _write_round(tmp_path, 2, {"a": HASH_OK, "b": HASH_OK, "c": {"err": "x"}})
    ev = evidence(str(tmp_path))
    assert ev["a"] == ("hash", 2)       # re-verified: newest round wins
    assert ev["b"] == ("hash", 2)       # upgraded rows_only -> hash
    assert "c" not in ev                # failures are not evidence


def test_sweep_order_fronts_unswept_then_upgrades_then_stalest(tmp_path):
    _write_round(tmp_path, 1, {"old_hash": HASH_OK, "approx": ROWS_OK,
                               "upgraded": ROWS_OK})
    _write_round(tmp_path, 2, {"new_hash": HASH_OK})
    registry = ["new_hash", "never1", "old_hash", "upgraded", "approx", "never2"]
    # 'upgraded' now carries an oracle; 'approx' is oracle-less by design
    has_oracle = {"new_hash": True, "never1": True, "old_hash": True,
                  "upgraded": True, "approx": False, "never2": True}
    order = sweep_order(registry, has_oracle, str(tmp_path))
    assert order[:2] == ["never1", "never2"]          # registry order
    assert order[2] == "upgraded"                     # oracle upgrade
    assert order[3:] == ["approx", "old_hash", "new_hash"]  # oldest first
    assert sorted(order) == sorted(registry)


def test_sweep_order_without_artifacts_is_registry_order(tmp_path):
    registry = ["q3", "q1", "q2"]
    assert sweep_order(registry, {}, str(tmp_path)) == registry


def _import_verified():
    import importlib
    import sys as _sys

    _sys.path.insert(0, "tools")
    try:
        return importlib.import_module("verified")
    finally:
        _sys.path.remove("tools")


def test_doc_counts_match_artifacts():
    """SURVEY.md / BASELINE.md evidence-count blocks must match what
    tools/verified.py regenerates from the CORRECTNESS_r* artifacts —
    the hand-maintained version drifted in rounds 3, 4 and 5.

    Round-10 verdict item 1: the driver writes CORRECTNESS_r{N} AFTER
    the end-of-round snapshot, so at judge time the on-disk artifacts
    are always one round newer than the committed block. That state is
    EXPECTED and passes ('newer-artifacts'), provided the new artifacts
    only improve the counts (no new failures, no fewer evidenced keys).
    Only 'hand-edit' — committed numbers disagreeing with the artifacts
    they claim to summarize — fails."""
    verified = _import_verified()
    states = verified.drift()
    bad = {d: s for d, s in states.items() if s == "hand-edit"}
    assert not bad, (
        f"evidence-count blocks hand-edited or corrupted: {bad}; run "
        "`python tools/verified.py --write` to regenerate from artifact "
        "truth"
    )
    if any(s == "newer-artifacts" for s in states.values()):
        # post-commit driver artifacts must only IMPROVE the committed
        # claim: never fewer evidenced keys, never new failures.
        committed = verified._committed_block(
            verified.os.path.join(verified.ROOT, "SURVEY.md"))
        hi, _ = verified._block_params(committed)
        then = verified.summary_counts(max_round=hi)
        now = verified.summary_counts()
        assert now["evidenced"] >= then["evidenced"], (then, now)
        assert now["failed"] <= then["failed"], (
            f"driver artifacts newer than the committed r{hi} marker "
            f"record NEW failures: {then['failed']} -> {now['failed']}"
        )


def test_doc_counts_detect_hand_edit(tmp_path):
    """Corrupting a committed number must still FAIL the gate (the
    round-10 verdict's no-silent-rewrite guarantee): build a fake repo
    root with artifacts + docs, verify 'current', add a newer artifact
    (expected -> 'newer-artifacts'), then corrupt a count
    (-> 'hand-edit')."""
    verified = _import_verified()

    _write_round(tmp_path, 1, {"agg_global": HASH_OK, "agg_group": ROWS_OK})
    block = verified.counts_block(str(tmp_path))
    doc = f"header\n{verified.MARK_START}\n{block}\n{verified.MARK_END}\nfooter"
    for name in verified.DOCS:
        (tmp_path / name).write_text(doc)
    assert set(verified.drift(str(tmp_path)).values()) == {"current"}

    # driver writes a newer round after the "commit": expected, green
    _write_round(tmp_path, 2, {"agg_global": HASH_OK, "filter_in": HASH_OK})
    assert set(verified.drift(str(tmp_path)).values()) == {"newer-artifacts"}

    # hand-edit a count inside the committed block: must flag
    corrupted = doc.replace("1 exact DuckDB hash-match", "7 exact DuckDB hash-match")
    assert corrupted != doc
    (tmp_path / "SURVEY.md").write_text(corrupted)
    assert verified.drift(str(tmp_path))["SURVEY.md"] == "hand-edit"


def test_live_ordering_covers_registry():
    """Against the real repo artifacts: queries() must yield every
    registry key exactly once, never-evidenced keys first."""
    import __spark_entry__ as e
    from appstore_aws_etl_spark.registry import REGISTRY

    names = list(e.queries())
    assert sorted(names) == sorted(REGISTRY)
    ev = evidence()
    seen_evidenced = False
    for n in names:
        if n in ev:
            seen_evidenced = True
        else:
            # a never-evidenced key after an evidenced one = stale order
            assert not seen_evidenced, f"unswept key {n} buried mid-order"
