"""Lakehouse table-format tests (lakehouse/log.py, lakehouse/table.py):
ACID commit protocol, snapshot isolation, time travel, checkpoint
replay equivalence, manifest stats pruning, copy-on-write DML
correctness, concurrency conflict rules, vacuum safety."""

from __future__ import annotations

import json
import os

import pytest

from pyspark.sql import functions as F
from pyspark.sql import types as T

from appstore_aws_etl_spark.lakehouse import (
    CommitConflict,
    ConcurrentModification,
    LakeTable,
)
from appstore_aws_etl_spark.lakehouse import log as lakelog
from appstore_aws_etl_spark.lakehouse import table as laketable

SCHEMA = T.StructType([
    T.StructField("k", T.LongType()),
    T.StructField("v", T.StringType()),
    T.StructField("grp", T.LongType()),
])


def _rows(spark, lo, hi, tag="v"):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"),
        F.concat(F.lit(tag), F.col("id")).alias("v"),
        (F.col("id") % 4).alias("grp"),
    )


@pytest.fixture()
def table(spark, tmp_path):
    return LakeTable.create(spark, str(tmp_path / "tbl"), SCHEMA, cluster_by=["grp"])


def test_append_read_and_time_travel(spark, table):
    table.append(_rows(spark, 0, 100))
    table.append(_rows(spark, 100, 150))
    assert table.scan().count() == 150
    assert table.scan(version=1).count() == 100
    assert table.scan(version=0).count() == 0  # empty at CREATE
    # snapshot reads are explicit file lists: a new un-committed batch
    # dir on disk must not leak into any snapshot
    stray = f"{table.root}/data/stray"
    _rows(spark, 900, 910).write.parquet(stray)
    assert table.scan().count() == 150


def test_overwrite_replaces_and_history_records_ops(spark, table):
    table.append(_rows(spark, 0, 50))
    table.overwrite(_rows(spark, 0, 10, tag="ow"))
    assert table.scan().count() == 10
    assert [h["operation"] for h in table.history()] == ["CREATE", "APPEND", "OVERWRITE"]
    # old version still readable until vacuum
    assert table.scan(version=1).count() == 50


def test_delete_where_rewrites_only_matching_files(spark, table):
    # separate appends -> files from append 1 provably contain no k>=100
    table.append(_rows(spark, 0, 100))
    table.append(_rows(spark, 100, 200))
    before = {f.path for f in table.snapshot().files}
    table.delete_where("k >= 100 AND k < 108")
    after = table.snapshot()
    assert table.scan().count() == 192
    assert table.scan().filter("k >= 100 AND k < 108").count() == 0
    # append-1 files contained no matching row and must not be rewritten
    untouched = before & {f.path for f in after.files}
    assert untouched, "delete rewrote every file including non-matching ones"


def test_delete_where_null_predicate_rows_survive(spark, table):
    df = spark.createDataFrame(
        [(1, "a", 1), (2, None, 1), (3, "b", 1)], schema=SCHEMA
    )
    table.append(df)
    table.delete_where("v = 'a'")
    got = {r.k for r in table.scan().collect()}
    assert got == {2, 3}  # NULL-evaluating row kept, SQL DELETE semantics


def test_delete_dv_is_merge_on_read(spark, tmp_path):
    """Deletion-vector delete: end-state identical to CoW delete, but
    zero data files rewritten; DVs accumulate across deletes, apply
    through every reader (scan, CoW update, merge), survive time
    travel of the pre-delete version, and compact purges them."""
    t = LakeTable.create(spark, str(tmp_path / "dv"), SCHEMA,
                         cluster_by=["grp"], stats_cols=["grp", "k"])
    t.append(_rows(spark, 0, 100))
    before = {f.path for f in t.snapshot().files}
    v = t.delete_where_dv("k % 10 = 3")
    snap = t.snapshot()
    assert {f.path for f in snap.files} == before  # NO file rewritten
    assert t.scan().count() == 90
    assert t.scan().filter("k % 10 = 3").count() == 0
    assert sum(f.dv["cardinality"] for f in snap.files if f.dv) == 10
    assert t.scan(version=v - 1).count() == 100  # pre-DV time travel
    # second DV delete accumulates (3s already gone, NULL-safe re-hit)
    t.delete_where_dv("k < 5")
    assert t.scan().count() == 86
    # a CoW update over DV-carrying files must not resurrect deleted rows
    t.update_set("k >= 0", {"v": "'u'"})
    assert t.scan().count() == 86
    assert t.scan().filter("v = 'u'").count() == 86
    # compact applies DVs physically and drops them
    t.compact(target_rows_per_file=1_000_000)
    snap2 = t.snapshot()
    assert not any(f.dv for f in snap2.files)
    assert t.scan().count() == 86
    # vacuum reclaims the superseded DV relations
    assert t.vacuum(retain_versions=1, min_age_seconds=0) > 0
    assert t.scan().count() == 86


def test_delete_dv_null_predicate_rows_survive(spark, table):
    table.append(spark.createDataFrame(
        [(1, "a", 1), (2, None, 1), (3, "b", 1)], schema=SCHEMA))
    table.delete_where_dv("v = 'a'")
    assert {r.k for r in table.scan().collect()} == {2, 3}


def test_update_dv_no_rewrite_and_cow_equivalence(spark, tmp_path):
    """Merge-on-read UPDATE: original files survive byte-identical
    (DV-masked), updated rows appear as new files, and the end state
    equals the copy-on-write twin's on the same inputs."""
    a = LakeTable.create(spark, str(tmp_path / "mor"), SCHEMA, stats_cols=["k"])
    b = LakeTable.create(spark, str(tmp_path / "cow"), SCHEMA, stats_cols=["k"])
    for t in (a, b):
        t.append(_rows(spark, 0, 60))
    files_before = {f.path for f in a.snapshot().files}
    a.update_set_dv("k % 5 = 0", {"v": "'up'", "grp": "grp + 100"})
    b.update_set("k % 5 = 0", {"v": "'up'", "grp": "grp + 100"})
    snap = a.snapshot()
    assert files_before <= {f.path for f in snap.files}  # originals kept
    assert any(f.dv for f in snap.files)
    got_a = sorted((r.k, r.v, r.grp) for r in a.scan().collect())
    got_b = sorted((r.k, r.v, r.grp) for r in b.scan().collect())
    assert got_a == got_b
    assert a.scan().filter("v = 'up'").count() == 12
    # a second MoR update touching both old and new files still agrees
    a.update_set_dv("grp >= 100", {"v": "'again'"})
    b.update_set("grp >= 100", {"v": "'again'"})
    assert (sorted((r.k, r.v, r.grp) for r in a.scan().collect())
            == sorted((r.k, r.v, r.grp) for r in b.scan().collect()))


def test_rename_column_is_metadata_only_and_full_dml_works(spark, tmp_path):
    """Column mapping: rename rewrites nothing (file set unchanged),
    every op speaks the new logical name (filter, stats pruning, CoW
    delete, MoR update, keyed merge, append), and time travel to a
    pre-rename version shows the old name."""
    t = LakeTable.create(spark, str(tmp_path / "ren"), SCHEMA,
                         cluster_by=["grp"], stats_cols=["grp", "k"])
    t.append(_rows(spark, 0, 100))
    files_before = {f.path for f in t.snapshot().files}
    t.rename_column("k", "key_id")
    snap = t.snapshot()
    assert {f.path for f in snap.files} == files_before  # nothing rewritten
    assert t.scan().columns == ["key_id", "v", "grp"]
    assert t.scan().filter("key_id < 10").count() == 10
    # pruning translates the logical name to the physical stats key
    mp = t._layout(snap)[2]
    assert mp == {"key_id": "k"}
    assert len(laketable._prune_files(snap.files, "key_id = 5", mp)) >= 1
    # full DML under the new name
    t.append(_rows(spark, 100, 120).withColumnRenamed("k", "key_id"))
    t.delete_where("key_id < 5")
    t.update_set_dv("key_id >= 115", {"v": "'x'"})
    src = spark.range(110, 125).select(
        F.col("id").alias("key_id"), F.lit("m").alias("v"), F.lit(0).alias("grp"))
    t.merge(src, keys=["key_id"])
    assert t.scan().count() == 120
    assert t.scan().filter("v = 'm'").count() == 15
    assert t.scan(version=1).columns == ["k", "v", "grp"]  # pre-rename
    # rename collisions refuse
    with pytest.raises(ValueError):
        t.rename_column("nope", "x")
    with pytest.raises(ValueError):
        t.rename_column("v", "grp")


def test_merge_txn_idempotent_for_streaming_upsert(spark, table):
    table.append(_rows(spark, 0, 20))
    src = spark.range(10, 25).select(
        F.col("id").alias("k"), F.lit("m").alias("v"), F.lit(0).alias("grp")
    )
    v1 = table.merge(src, keys=["k"], txn=("upsert", 0))
    v2 = table.merge(src, keys=["k"], txn=("upsert", 0))  # replayed batch
    assert v2 == v1
    assert table.scan().count() == 25
    assert table.scan().filter("v = 'm'").count() == 15


def test_update_set_casts_and_preserves_other_rows(spark, table):
    table.append(_rows(spark, 0, 20))
    table.update_set("k >= 15", {"v": "'bumped'", "grp": "grp + 10"})
    out = table.scan().orderBy("k").collect()
    assert [r.v for r in out[15:]] == ["bumped"] * 5
    assert [r.grp for r in out[15:]] == [(k % 4) + 10 for k in range(15, 20)]
    assert [r.v for r in out[:15]] == [f"v{k}" for k in range(15)]


def test_merge_upsert_matches_full_join_semantics(spark, table):
    table.append(_rows(spark, 0, 30))
    src = spark.range(20, 40).select(
        F.col("id").alias("k"), F.lit("m").alias("v"), F.lit(9).alias("grp")
    )
    table.merge(src, keys=["k"])
    out = table.scan()
    assert out.count() == 40
    assert out.filter("v = 'm'").count() == 20
    assert out.filter("k < 20 AND v like 'v%'").count() == 20


def test_merge_range_prunes_untouched_files(spark, tmp_path):
    # stats on the merge key (monotone ingest): files from append 1
    # have k <= 99, so a merge of k >= 100 keys must not rewrite them
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA,
                         cluster_by=["grp"], stats_cols=["grp", "k"])
    t.append(_rows(spark, 0, 100))
    t.append(_rows(spark, 100, 200))
    old_files = {f.path for f in t.snapshot().files}
    snap = t.snapshot()
    src = spark.range(150, 260).select(
        F.col("id").alias("k"), F.lit("m").alias("v"), F.lit(1).alias("grp")
    )
    cand = t._prune_by_source_range(snap.files, src, ["k"], snap)
    assert 0 < len(cand) < len(snap.files)
    assert all(f.stats["k"]["max"] >= 150 for f in cand)
    t.merge(src, keys=["k"])
    after = {f.path for f in t.snapshot().files}
    # append-1 files (k < 100) survive untouched
    low_files = {f.path for f in snap.files if f.stats["k"]["max"] < 100}
    assert low_files <= after
    out = t.scan()
    assert out.count() == 260
    assert out.filter("v = 'm'").count() == 110


def test_merge_when_matched_delete(spark, table):
    table.append(_rows(spark, 0, 30))
    src = spark.range(10, 20).select(
        F.col("id").alias("k"), F.lit("x").alias("v"), F.lit(0).alias("grp")
    )
    table.merge(src, keys=["k"], when_matched="delete", insert_not_matched=False)
    assert {r.k for r in table.scan().collect()} == set(range(10)) | set(range(20, 30))


def test_checkpoint_replay_equivalence(spark, table):
    # drive past CHECKPOINT_INTERVAL commits, then verify a snapshot
    # built from checkpoint+tail equals one built from pure JSON replay
    for i in range(lakelog.CHECKPOINT_INTERVAL + 3):
        table.append(_rows(spark, i * 10, i * 10 + 10))
    _, checkpoints = lakelog.list_versions(spark, table.root)
    assert checkpoints, "no checkpoint written past the interval"
    snap = table.snapshot()
    # pure replay: temporarily hide checkpoints by replaying to a
    # version below the first checkpoint, then rebuild incrementally
    pure = {}
    for v in range(1, snap.version + 1):
        for action in lakelog.read_commit(spark, table.root, v):
            if "add" in action:
                pure[action["add"]["path"]] = action["add"]["numRecords"]
            elif "remove" in action:
                pure.pop(action["remove"]["path"], None)
    assert {f.path: f.num_records for f in snap.files} == pure
    assert table.scan().count() == (lakelog.CHECKPOINT_INTERVAL + 3) * 10


def test_stats_pruning_skips_files_and_keeps_semantics(spark, table):
    # three appends with disjoint grp values -> per-file stats disjoint
    for g in (0, 1, 2):
        df = spark.range(0, 50).select(
            (F.col("id") + g * 1000).alias("k"),
            F.lit(f"g{g}").alias("v"),
            F.lit(g).alias("grp"),
        )
        table.append(df)
    files = table.snapshot().files
    pruned = laketable._prune_files(files, "grp = 1")
    assert 0 < len(pruned) < len(files)
    # and the scan with the same predicate returns exactly the right rows
    assert table.scan(where="grp = 1").count() == 50
    # IN-list conjuncts prune too
    pruned_in = laketable._prune_files(files, "grp IN (0, 2)")
    assert 0 < len(pruned_in) < len(files)
    assert table.scan(where="grp in (0, 2)").count() == 100
    # unparseable predicate -> no pruning, still correct
    assert table.scan(where="grp = 0 OR grp = 2").count() == 100
    # OR mixed with AND must disable pruning ENTIRELY (treating the
    # parseable fragment as a conjunct would prune the OR branch)
    mixed = "grp = 9 AND k >= 0 OR grp = 0"
    assert laketable._prune_files(files, mixed) == files
    assert table.scan(where=mixed).count() == 50


def test_commit_put_if_absent_is_atomic(spark, table):
    v1 = table.append(_rows(spark, 0, 10))
    with pytest.raises(CommitConflict):
        lakelog.publish_commit(spark, table.root, v1, [{"commitInfo": {"operation": "X"}}])


def test_concurrent_appends_rebase_and_both_land(spark, table, monkeypatch):
    table.append(_rows(spark, 0, 10))
    # writer A reads v1; writer B commits v2; A's publish at v2 collides
    # and must rebase to v3 (appends commute)
    real_publish = laketable.publish_commit
    state = {"injected": False}

    def racy_publish(sp, root, version, actions):
        if not state["injected"]:
            state["injected"] = True
            other = LakeTable(sp, root)
            other.append(_rows(sp, 100, 110, tag="b"))
        return real_publish(sp, root, version, actions)

    monkeypatch.setattr(laketable, "publish_commit", racy_publish)
    v = table.append(_rows(spark, 200, 210, tag="a"))
    assert v == 3
    assert table.scan().count() == 30  # nothing lost


def test_concurrent_delete_vs_overwrite_conflicts(spark, table, monkeypatch):
    table.append(_rows(spark, 0, 40))
    real_publish = laketable.publish_commit
    state = {"injected": False}

    def racy_publish(sp, root, version, actions):
        if not state["injected"]:
            state["injected"] = True
            LakeTable(sp, root).overwrite(_rows(sp, 0, 5, tag="ow"))
        return real_publish(sp, root, version, actions)

    monkeypatch.setattr(laketable, "publish_commit", racy_publish)
    with pytest.raises(ConcurrentModification):
        table.delete_where("grp = 1")
    # the winner's state is intact
    assert table.scan().count() == 5


def test_threaded_append_race_serializes_without_loss(spark, table):
    """Four writers racing 3 appends each through the REAL put-if-absent
    path (no monkeypatching): all 12 commits must land at 12 distinct
    versions with every row present."""
    import threading

    errors = []

    def writer(wid: int) -> None:
        try:
            handle = LakeTable(spark, table.root)
            for i in range(3):
                lo = wid * 1000 + i * 100
                handle.append(_rows(spark, lo, lo + 10, tag=f"w{wid}_"))
        except Exception as exc:  # pragma: no cover - failure surface
            errors.append(exc)

    threads = [threading.Thread(target=writer, args=(w,)) for w in range(4)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errors
    snap = table.snapshot()
    assert snap.version == 12
    assert table.scan().count() == 120
    assert [h["operation"] for h in table.history()].count("APPEND") == 12


def test_compact_binpacks_small_files_only(spark, table):
    for i in range(4):
        table.append(_rows(spark, i * 10, i * 10 + 10))
    n_before = len(table.snapshot().files)
    table.compact(target_rows_per_file=1000)
    snap = table.snapshot()
    assert len(snap.files) < n_before
    assert table.scan().count() == 40
    assert [h["operation"] for h in table.history()][-1] == "COMPACT"


def test_vacuum_keeps_retained_versions_deletes_rest(spark, table):
    table.append(_rows(spark, 0, 20))     # v1
    table.overwrite(_rows(spark, 0, 5))   # v2 — v1's files now dead
    table.append(_rows(spark, 5, 8))      # v3
    deleted = table.vacuum(retain_versions=2, min_age_seconds=0)  # keep v2, v3
    assert deleted > 0
    assert table.scan().count() == 8
    assert table.scan(version=2).count() == 5  # inside horizon: still readable
    with pytest.raises(Exception):
        table.scan(version=1).collect()  # outside horizon: bytes gone


def test_vacuum_age_guard_spares_fresh_unreferenced_files(spark, table):
    """The write/vacuum race guard: a just-written (seconds-old)
    unreferenced batch — exactly what an in-flight writer's files look
    like before their commit publishes — must survive a default-guard
    vacuum, and fall to an explicit min_age_seconds=0 one."""
    table.append(_rows(spark, 0, 10))
    _rows(spark, 50, 60).write.parquet(f"{table.root}/data/inflight")
    assert table.vacuum(retain_versions=1) == 0  # default 600 s guard
    assert table.vacuum(retain_versions=1, min_age_seconds=0) > 0
    assert table.scan().count() == 10  # live data untouched either way


def test_schema_evolution_append_new_column(spark, table):
    table.append(_rows(spark, 0, 10))
    wide = _rows(spark, 10, 20).withColumn("score", F.col("k") * 1.5)
    table.append(wide, merge_schema=True)
    out = table.scan()
    assert "score" in out.columns
    assert out.filter("score IS NULL").count() == 10  # old files null-filled
    assert out.filter("score IS NOT NULL").count() == 10
    # type conflict refuses rather than widening silently
    bad = _rows(spark, 30, 35).withColumn("score", F.lit("not-a-double"))
    with pytest.raises(Exception):
        table.append(bad, merge_schema=True)


def test_added_between_is_an_incremental_feed_for_appends(spark, table):
    table.append(_rows(spark, 0, 10))    # v1
    table.append(_rows(spark, 10, 25))   # v2
    table.append(_rows(spark, 25, 30))   # v3
    inc = table.added_between(1, 3)
    assert {r.k for r in inc.collect()} == set(range(10, 30))


def test_zorder_optimize_clusters_both_dimensions(spark, table):
    # k and grp are independent dimensions; ingest arrives clustered by
    # NEITHER (interleaved appends), so pre-zorder stats can't prune k
    df = spark.range(0, 4000).select(
        (F.col("id") % 64).alias("k"),
        F.concat(F.lit("v"), F.col("id")).alias("v"),
        F.floor(F.col("id") / 64).alias("grp"),
    )
    table.append(df)
    before = table.scan().orderBy("k", "grp", "v").collect()
    table.optimize_zorder("k", "grp", files_per_range=8)
    snap = table.snapshot()
    # content identical
    assert table.scan().orderBy("k", "grp", "v").collect() == before
    # stats recorded on both zorder columns
    assert all({"k", "grp"} <= set(f.stats) for f in snap.files)
    # pruning works on EACH dimension independently
    files = snap.files
    for col, val in (("k", "3"), ("grp", "3")):
        pruned = laketable._prune_files(files, f"{col} = {val}")
        assert len(pruned) < len(files), f"no pruning on {col}"
        assert table.scan(where=f"{col} = {val}").count() > 0
    assert [h["operation"] for h in table.history()][-1] == "ZORDER"


def test_txn_append_idempotent_and_checkpoint_durable(spark, table):
    df = _rows(spark, 0, 10)
    v1 = table.append(df, txn=("ingest", 0))
    v2 = table.append(df, txn=("ingest", 0))  # redelivery: must no-op
    assert v2 == v1 and table.scan().count() == 10
    table.append(_rows(spark, 10, 20), txn=("ingest", 1))
    assert table.scan().count() == 20
    # watermark must survive a checkpoint: drive past the interval,
    # then replay through a FRESH handle and redeliver an old batch
    for i in range(lakelog.CHECKPOINT_INTERVAL + 1):
        table.append(_rows(spark, 100 + i, 101 + i), txn=("ingest", 2 + i))
    fresh = LakeTable(spark, table.root)
    n = fresh.scan().count()
    fresh.append(df, txn=("ingest", 1))  # old batch replayed after restart
    assert fresh.scan().count() == n


def test_stream_ingest_exactly_once(spark, table, tmp_path):
    src_dir = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    _rows(spark, 0, 60).repartition(3).write.parquet(src_dir)

    from appstore_aws_etl_spark.streaming.lake_sink import (
        lake_batch_writer,
        start_lake_ingest,
    )

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)  # force several micro-batches
        .parquet(src_dir)
    )
    q = start_lake_ingest(stream, table, ckpt, app_id="ingest-test")
    q.awaitTermination(120)
    assert table.scan().count() == 60
    batches = max(v for v in table.snapshot().txns.values())
    assert batches >= 1  # multiple micro-batches actually ran
    # restart with the same checkpoint: no new data -> no new rows
    q2 = start_lake_ingest(
        spark.readStream.schema(SCHEMA).parquet(src_dir), table, ckpt,
        app_id="ingest-test",
    )
    q2.awaitTermination(120)
    assert table.scan().count() == 60
    # redelivery of an already-committed micro-batch (the crash window
    # between table commit and checkpoint advance) must be a no-op
    writer = lake_batch_writer(table, "ingest-test")
    writer(_rows(spark, 0, 20), 0)
    assert table.scan().count() == 60


def test_restore_is_metadata_only_and_append_only_history(spark, table):
    table.append(_rows(spark, 0, 30))            # v1
    table.delete_where("k < 10")                 # v2
    data_before = sorted(
        f.path for f in table.snapshot(1).files
    )
    v = table.restore(1)                         # v3
    assert table.scan().count() == 30
    assert sorted(f.path for f in table.snapshot().files) == data_before
    assert [h["operation"] for h in table.history()] == [
        "CREATE", "APPEND", "DELETE", "RESTORE"]
    assert v == 3
    # restore target outside the vacuum horizon refuses
    table.overwrite(_rows(spark, 0, 5))          # v4: v1/v3 files now dead
    table.vacuum(retain_versions=1, min_age_seconds=0)
    with pytest.raises(ValueError):
        table.restore(1)


def test_model_random_dml_sequence_matches_reference(spark, tmp_path):
    """Model-based check: a seeded random sequence of DML ops applied
    to BOTH the lake table and an in-memory dict model; after every
    commit the scan must equal the model, and at the end every
    archived version must time-travel back to its model snapshot."""
    import random

    rng = random.Random(20260816)
    t = LakeTable.create(spark, str(tmp_path / "model_tbl"), SCHEMA,
                         cluster_by=["grp"], stats_cols=["grp", "k"])
    model: dict[int, tuple[str, int]] = {}
    by_version: dict[int, dict] = {}
    next_k = 0

    def df_of(rows):
        return spark.createDataFrame(
            [(k, v, g) for k, (v, g) in sorted(rows.items())], schema=SCHEMA
        )

    def verify(version=None):
        want = by_version[version] if version is not None else model
        got = {r.k: (r.v, r.grp) for r in t.scan(version=version).collect()}
        assert got == want

    for step in range(12):
        op = rng.choice(["append", "delete", "delete_dv", "update",
                         "update_dv", "merge", "compact"])
        if op == "append" or not model:
            n = rng.randint(3, 12)
            batch = {next_k + i: (f"a{step}", (next_k + i) % 4) for i in range(n)}
            next_k += n
            t.append(df_of(batch))
            model.update(batch)
        elif op in ("delete", "delete_dv"):
            g = rng.randint(0, 3)
            (t.delete_where_dv if op == "delete_dv" else t.delete_where)(
                f"grp = {g}")
            model = {k: r for k, r in model.items() if r[1] != g}
        elif op in ("update", "update_dv"):
            cut = rng.choice(sorted(model)) if model else 0
            (t.update_set_dv if op == "update_dv" else t.update_set)(
                f"k >= {cut}", {"v": f"'u{step}'"})
            model = {k: (f"u{step}" if k >= cut else r[0], r[1])
                     for k, r in model.items()}
        elif op == "merge":
            existing = rng.sample(sorted(model), min(4, len(model)))
            fresh = [next_k + i for i in range(3)]
            next_k += 3
            batch = {k: (f"m{step}", 1) for k in existing + fresh}
            t.merge(df_of(batch), keys=["k"])
            model.update(batch)
        elif op == "compact":
            t.compact(target_rows_per_file=10_000)
        by_version[t.snapshot().version] = dict(model)
        verify()

    for v in sorted(by_version):  # full time-travel audit at the end
        verify(version=v)


def test_log_relocatable_after_move(spark, table, tmp_path):
    """add paths are root-relative: moving the whole table directory
    must not break snapshot reads (object-store rename / mount moves)."""
    table.append(_rows(spark, 0, 15))
    import shutil

    new_root = str(tmp_path / "moved")
    shutil.move(table.root, new_root)
    moved = LakeTable(spark, new_root)
    assert moved.scan().count() == 15
