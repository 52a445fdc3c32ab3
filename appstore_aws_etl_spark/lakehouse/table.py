"""Lake table operations: the DML surface over the transaction log.

Every operation follows the same copy-on-write shape the Delta paper
describes: write new immutable parquet files under ``data/``, then make
them (and only them) visible with one atomic log commit that pairs the
``add`` actions with ``remove`` actions for the files they supersede.
Readers replay the log to a snapshot and hand Spark an explicit file
list — so reads are repeatable (no half-written batch is ever visible),
time travel is just "replay to an older version", and incremental
consumers diff two versions' file sets.

Partitioning is Iceberg-style *hidden* partitioning rather than Hive
directory layout: cluster columns stay ordinary data columns, the
writer clusters files by them (``repartition`` on the cluster key), and
the manifest records per-file min/max stats. Scan planning prunes on
those stats BEFORE Spark ever lists a file — at 100 TB this is the
difference between planning over a manifest (KBs per thousand files)
and listing an object store. Files that survive pruning still get
Spark's own parquet row-group pushdown on top.

Per-file stats are computed with one distributed aggregation over the
freshly written batch (``groupBy(input_file_name())``) — the collect is
bounded by the batch's file count, never its row count.
"""

from __future__ import annotations

import re
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .log import (
    AddFile,
    CommitConflict,
    ConcurrentModification,
    Snapshot,
    _delete,
    _fs,
    _strip_scheme,
    list_data_files,
    list_versions,
    maybe_checkpoint,
    publish_commit,
    read_commit,
    replay,
)

_MAX_COMMIT_ATTEMPTS = 10

# deletion-vector relation shape — fixed by _commit_dv's writer, so
# readers pass it explicitly instead of paying a schema-inference job
_DV_SCHEMA = T.StructType([
    T.StructField("file", T.StringType()),
    T.StructField("row_index", T.LongType()),
])


class LakeTable:
    """Handle on one log-backed table rooted at ``root``."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root.rstrip("/")
        # latest snapshot this handle has replayed (optimization round
        # 13): snapshot() resumes replay from here instead of re-reading
        # the whole post-checkpoint tail on every call — a key issuing k
        # commits otherwise pays O(k²) commit reads. Snapshots are
        # treated as immutable everywhere (replay copies before
        # applying); the log directory is still re-listed per call, so
        # concurrent writers are never missed.
        self._latest_snap: Snapshot | None = None

    # ------------------------------------------------------- create --

    @classmethod
    def create(
        cls,
        spark: SparkSession,
        root: str,
        schema: T.StructType,
        cluster_by: list[str] | None = None,
        stats_cols: list[str] | None = None,
    ) -> "LakeTable":
        """Commit 0: metadata only (empty table). ``cluster_by`` drives
        the write-side file clustering; ``stats_cols`` (default: the
        cluster columns) names the columns whose per-file min/max land
        in the manifest — stats can cover MORE columns than the layout
        clusters on (e.g. a monotone ingest key gets tight ranges for
        free, making merge-by-key prunable without clustering on it).
        Both are metadata, not directory layout, so they can change
        later without rewriting data."""
        t = cls(spark, root)
        meta = {
            "id": uuid.uuid4().hex,
            "schemaString": schema.json(),
            "clusterBy": list(cluster_by or []),
            "statsCols": list(stats_cols if stats_cols is not None
                              else (cluster_by or [])),
        }
        publish_commit(spark, t.root, 0, [
            {"metaData": meta},
            {"commitInfo": {"operation": "CREATE", "readVersion": None}},
        ])
        return t

    # ------------------------------------------------------ queries --

    def snapshot(self, version: int | None = None) -> Snapshot:
        if version is not None:
            # time travel: resume from the cached latest only when it
            # is at-or-below the pinned version; replay handles both
            base = self._latest_snap
            if base is not None and base.version > version:
                base = None
            return replay(self.spark, self.root, version, base=base)
        snap = replay(self.spark, self.root, None, base=self._latest_snap)
        self._latest_snap = snap
        return snap

    def schema(self, snap: Snapshot | None = None) -> T.StructType:
        snap = snap or self.snapshot()
        return T.StructType.fromJson(__import__("json").loads(snap.metadata["schemaString"]))

    def scan(self, version: int | None = None, where: str | None = None) -> DataFrame:
        """Snapshot read. ``where`` both prunes the manifest (min/max
        stats on simple conjuncts) and is applied as a normal filter —
        semantics never depend on pruning quality."""
        snap = self.snapshot(version)
        schema = self.schema(snap)
        files = snap.files
        if where:
            files = _prune_files(files, where, self._layout(snap)[2])
        df = self._read_files(files, schema, mapping=self._layout(snap)[2])
        return df.filter(where) if where else df

    def history(self) -> list[dict]:
        commits, _ = list_versions(self.spark, self.root)
        out = []
        for v in commits:
            for action in read_commit(self.spark, self.root, v):
                if "commitInfo" in action:
                    out.append({"version": v, **action["commitInfo"]})
        return out

    def added_between(self, since_version: int, until_version: int | None = None) -> DataFrame:
        """CDF-lite incremental scan: rows in files ADDED in
        ``(since, until]``. Exact change feed for append-only flows; for
        copy-on-write commits it returns the rewritten files (file-level
        granularity — the consumer dedups on its key, same contract as
        a Delta change feed without per-row tombstones)."""
        snap = self.snapshot(until_version)
        commits, _ = list_versions(self.spark, self.root)
        hi = snap.version
        added: list[str] = []
        for v in (c for c in commits if since_version < c <= hi):
            for action in read_commit(self.spark, self.root, v):
                if "add" in action:
                    added.append(action["add"]["path"])
        live = {f.path for f in snap.files}
        paths = [p for p in added if p in live]
        schema = self.schema(snap)
        return self._read_files([snap.adds[p] for p in sorted(set(paths))], schema,
                                mapping=self._layout(snap)[2])

    # ---------------------------------------------------------- DML --

    def append(self, df: DataFrame, merge_schema: bool = False,
               txn: tuple[str, int] | None = None) -> int:
        """Blind append — commutes with concurrent appends, so conflicts
        rebase and retry instead of failing.

        ``txn=(app_id, version)`` makes the append IDEMPOTENT for that
        writer: if the log already records ``version`` (or newer) for
        ``app_id`` the append is skipped — the exactly-once handshake a
        restarted streaming micro-batch relies on. The check re-runs
        inside the commit retry loop, so a concurrent attempt of the
        SAME batch cannot double-apply through a rebase."""
        snap = self.snapshot()
        if txn is not None and snap.txns.get(txn[0], -1) >= txn[1]:
            return snap.version
        schema = self.schema(snap)
        if merge_schema:
            schema = _merged_schema(schema, df.schema)
            meta = dict(snap.metadata)
            meta["schemaString"] = schema.json()
            extra = [{"metaData": meta}]
        else:
            extra = []
        if txn is not None:
            extra.append({"txn": {"appId": txn[0], "version": txn[1]}})
        adds = self._write_batch(_conform(df, schema, allow_missing=merge_schema),
                                 *self._layout(snap))
        return self._commit(
            [a.to_action() for a in adds] + extra,
            op="APPEND", read_version=snap.version, removes=set(), txn=txn,
        )

    def overwrite(self, df: DataFrame) -> int:
        snap = self.snapshot()
        adds = self._write_batch(_conform(df, self.schema(snap)),
                                 *self._layout(snap))
        removes = {f.path for f in snap.files}
        actions = [{"remove": {"path": p}} for p in sorted(removes)]
        actions += [a.to_action() for a in adds]
        return self._commit(actions, op="OVERWRITE", read_version=snap.version,
                            removes=removes)

    def delete_where(self, cond: str) -> int:
        """Copy-on-write delete in two narrowing steps: manifest stats
        prune the candidate files without touching data, then one scan
        of the candidates finds the files that actually CONTAIN a
        matching row — only those are rewritten. Rows where ``cond``
        evaluates NULL are kept (SQL DELETE semantics)."""
        snap = self.snapshot()
        schema = self.schema(snap)
        candidates = _prune_files(snap.files, cond, self._layout(snap)[2])
        touched = self._files_containing(candidates, cond, schema,
                                         mapping=self._layout(snap)[2])
        if not touched:
            return snap.version
        survivors = self._read_files(
            [snap.adds[p] for p in touched], schema, mapping=self._layout(snap)[2]
        ).filter(~F.coalesce(F.expr(cond), F.lit(False)))
        adds = self._write_batch(survivors, *self._layout(snap))
        removes = set(touched)
        actions = [{"remove": {"path": p}} for p in sorted(removes)]
        actions += [a.to_action() for a in adds]
        return self._commit(actions, op="DELETE", read_version=snap.version,
                            removes=removes)

    def delete_where_dv(self, cond: str) -> int:
        """Merge-on-read DELETE via deletion vectors (the public Delta
        DV / Iceberg positional-delete design): matching rows' (file,
        row_index) positions are written as a parquet deletion-vector
        relation and the touched adds re-committed pointing at it — NO
        data file is rewritten, so deleting k rows from a 100 TB table
        costs O(k) + one KB commit instead of rewriting every touched
        gigabyte. Readers anti-join the DV (``_read_files``); compact /
        zorder apply DVs physically and drop them. Same SQL semantics
        as ``delete_where`` (NULL-evaluating rows survive) — the two
        are end-state-identical, which lake_delete_dv's shared oracle
        checks."""
        snap = self.snapshot()
        schema = self.schema(snap)
        candidates = _prune_files(snap.files, cond, self._layout(snap)[2])
        if not candidates:
            return snap.version
        hits = (
            self._read_files(candidates, schema, with_positions=True,
                             mapping=self._layout(snap)[2])
            .filter(F.expr(cond))
            .select(F.col("__file").alias("file"), F.col("__row").alias("row_index"))
        )
        touched_paths = sorted(
            r["file"] for r in hits.select("file").distinct().collect()
        )  # bounded: file count
        if not touched_paths:
            return snap.version
        return self._commit_dv(snap, hits, touched_paths, [], op="DELETE_DV")

    def update_set(self, cond: str, assignments: dict[str, str]) -> int:
        """Copy-on-write UPDATE ... SET: narrowed like delete_where."""
        snap = self.snapshot()
        schema = self.schema(snap)
        candidates = _prune_files(snap.files, cond, self._layout(snap)[2])
        touched_paths = self._files_containing(candidates, cond, schema,
                                               mapping=self._layout(snap)[2])
        if not touched_paths:
            return snap.version
        touched = self._read_files([snap.adds[p] for p in touched_paths], schema,
                                   mapping=self._layout(snap)[2])
        hit = F.expr(cond)
        updated = touched.select(*[
            F.when(hit, F.expr(assignments[c]).cast(touched.schema[c].dataType))
            .otherwise(F.col(c)).alias(c) if c in assignments else F.col(c)
            for c in touched.columns
        ])
        adds = self._write_batch(updated, *self._layout(snap))
        removes = set(touched_paths)
        actions = [{"remove": {"path": p}} for p in sorted(removes)]
        actions += [a.to_action() for a in adds]
        return self._commit(actions, op="UPDATE", read_version=snap.version,
                            removes=removes)

    def update_set_dv(self, cond: str, assignments: dict[str, str]) -> int:
        """Merge-on-read UPDATE: the matched rows' positions go into a
        deletion vector and their updated versions are appended as new
        files — ONE commit, O(changed rows) at any table size (the CoW
        twin rewrites every touched file). Readers see the old version
        vanish and the new one appear atomically."""
        snap = self.snapshot()
        schema = self.schema(snap)
        candidates = _prune_files(snap.files, cond, self._layout(snap)[2])
        if not candidates:
            return snap.version
        matched = (
            self._read_files(candidates, schema, with_positions=True,
                             mapping=self._layout(snap)[2])
            .filter(F.expr(cond))
        )
        hits = matched.select(F.col("__file").alias("file"),
                              F.col("__row").alias("row_index"))
        touched_paths = sorted(
            r["file"] for r in hits.select("file").distinct().collect()
        )  # bounded: file count
        if not touched_paths:
            return snap.version
        updated = matched.select(*[
            F.expr(assignments[c]).cast(schema[c].dataType).alias(c)
            if c in assignments else F.col(c)
            for c in [f.name for f in schema.fields]
        ])
        new_adds = self._write_batch(updated, *self._layout(snap))
        return self._commit_dv(snap, hits, touched_paths, new_adds, op="UPDATE_DV")

    def merge(
        self,
        source: DataFrame,
        keys: list[str],
        when_matched: str = "update",  # "update" | "delete" | "ignore"
        insert_not_matched: bool = True,
        txn: tuple[str, int] | None = None,
    ) -> int:
        """MERGE in three narrowing steps, each cheaper than the last
        is avoided:

        1. **Range prune (no I/O)**: the source's min/max on the join
           keys (one parameter-row aggregate) is intersected with every
           file's manifest stats — a file whose key range cannot
           overlap the source cannot contain a match, so it is never
           read. With a monotone ingest key in ``stats_cols`` a trickle
           of recent keys prunes to the recent files however large the
           table (measured: SCALECHECK_LAKE_r13).
        2. **Containment scan (reads survivors only)**: join
           ``input_file_name`` against the source key set to find the
           files that actually hold a matched key.
        3. **Rewrite (touched files only)** + insert detection, whose
           anti-join also reads only the range-surviving files — a
           source key cannot exist in a file the range check excluded.

        ``when_matched="ignore"`` is insert-if-absent: no file is ever
        rewritten (step 2/3 skip entirely), matched rows keep the
        TARGET version — first writer wins per key, the dedup-ingest
        contract. The source must be key-unique for every mode (an
        internal source duplicate would insert twice); dedup it first
        (e.g. min_by on the key) as lake_dedup_ingest does.
        """
        snap = self.snapshot()
        if txn is not None and snap.txns.get(txn[0], -1) >= txn[1]:
            return snap.version  # this batch already merged (restart replay)
        schema = self.schema(snap)
        candidates = self._prune_by_source_range(snap.files, source, keys, snap)
        if not candidates or when_matched == "ignore":
            # "ignore" = insert-if-absent: matched target rows stay
            # byte-identical, so no file is ever rewritten — the commit
            # is a pure append of the unmatched source rows (the
            # dedup-ingest shape: first writer wins per key)
            touched_paths: list[str] = []
        else:
            live = self._read_files(candidates, schema, with_positions=True,
                                    mapping=self._layout(snap)[2])
            # No forced broadcast: a merge source is not SF-bounded (a
            # backfill can be table-sized); AQE broadcasts the key set
            # when it is actually small, which is the trickle-merge case.
            src_keys = source.select(*keys).distinct()
            touched_rows = (
                live.join(src_keys, on=keys, how="left_semi")
                .select("__file").distinct().collect()  # bounded: file count
            )
            touched_paths = sorted(r["__file"] for r in touched_rows)
        src = _conform(source, schema)
        parts = []
        if touched_paths:
            touched = self._read_files(
                [snap.adds[p] for p in touched_paths], schema,
                mapping=self._layout(snap)[2]
            )
            keep = touched.join(src.select(*keys).distinct(), on=keys, how="left_anti")
            parts.append(keep)
            if when_matched == "update":
                matched_src = src.join(
                    touched.select(*keys).distinct(), on=keys, how="left_semi"
                )
                parts.append(matched_src)
            # when_matched == "delete": matched rows simply not rewritten
        if insert_not_matched:
            if candidates:
                live_keys = self._read_files(
                    candidates, schema, mapping=self._layout(snap)[2]
                ).select(*keys).distinct()
                parts.append(src.join(live_keys, on=keys, how="left_anti"))
            else:
                parts.append(src)
        if not parts:
            return snap.version
        new_data = parts[0]
        for p in parts[1:]:
            new_data = new_data.unionByName(p)
        adds = self._write_batch(new_data, *self._layout(snap))
        removes = set(touched_paths)
        actions = [{"remove": {"path": p}} for p in sorted(removes)]
        actions += [a.to_action() for a in adds]
        if txn is not None:
            actions.append({"txn": {"appId": txn[0], "version": txn[1]}})
        return self._commit(actions, op="MERGE", read_version=snap.version,
                            removes=removes, txn=txn)

    def rename_column(self, old: str, new: str) -> int:
        """RENAME COLUMN without rewriting a byte (Delta/Iceberg column
        mapping): the logical schema changes, and a logical->physical
        mapping records that the new name still reads the files'
        original column. Writers keep writing physical names, stats
        stay keyed physical, predicates/keys are translated at prune
        time — so rename is one KB-sized metadata commit at any table
        size. Time travel to a pre-rename version naturally shows the
        old name (that snapshot's metadata IS the old metadata)."""
        import json as _json

        snap = self.snapshot()
        schema = self.schema(snap)
        names = [f.name for f in schema.fields]
        if old not in names:
            raise ValueError(f"rename_column: no column {old!r} (have {names})")
        if new in names:
            raise ValueError(f"rename_column: {new!r} already exists")
        mapping = dict(snap.metadata.get("columnMapping", {}))
        physical = mapping.pop(old, old)
        mapping[new] = physical
        new_schema = T.StructType([
            T.StructField(new if f.name == old else f.name, f.dataType, f.nullable)
            for f in schema.fields
        ])
        meta = dict(snap.metadata)
        meta["schemaString"] = new_schema.json()
        meta["columnMapping"] = {k: v for k, v in mapping.items() if k != v}
        _json.dumps(meta)  # fail fast on unserializable metadata
        return self._commit(
            [{"metaData": meta}],
            op="RENAME_COLUMN", read_version=snap.version, removes=set(),
        )

    def restore(self, version: int) -> int:
        """Roll the table back to ``version`` as a NEW commit (history
        is never rewritten): re-add that snapshot's files, remove the
        current extras. Pure metadata — no data file is read, written,
        or moved, so restoring a 100 TB table costs one KB-sized
        commit. Requires the target's files to still exist (i.e. the
        version is inside the vacuum horizon)."""
        old = self.snapshot(version)
        cur = self.snapshot()
        cur_paths = {f.path for f in cur.files}
        old_paths = set(old.adds)
        needed = sorted(old_paths) + sorted(
            {f.dv["file"] for f in old.adds.values() if f.dv}
        )
        missing = [p for p in needed if not _exists_rel(self.spark, self.root, p)]
        if missing:
            raise ValueError(
                f"restore({version}): {len(missing)} files vacuumed away, "
                f"e.g. {missing[:2]}"
            )
        removes = cur_paths - old_paths
        actions = [{"remove": {"path": p}} for p in sorted(removes)]
        actions += [old.adds[p].to_action() for p in sorted(old_paths - cur_paths)]
        meta = old.metadata
        if meta != cur.metadata:
            actions.append({"metaData": meta})
        return self._commit(actions, op="RESTORE", read_version=cur.version,
                            removes=removes)

    # -------------------------------------------------- maintenance --

    def compact(self, target_rows_per_file: int) -> int:
        """Bin-pack small files (OPTIMIZE): pure metadata + rewrite of
        the small tail; large files are untouched."""
        snap = self.snapshot()
        small = [f for f in snap.files if f.num_records < target_rows_per_file]
        if len(small) < 2:
            return snap.version
        total = sum(f.num_records for f in small)
        n_out = max(1, -(-total // target_rows_per_file))
        packed = self._read_files(small, self.schema(snap),
                                  mapping=self._layout(snap)[2]).repartition(n_out)
        adds = self._write_batch(packed, cluster_by=[])
        removes = {f.path for f in small}
        actions = [{"remove": {"path": p}} for p in sorted(removes)]
        actions += [a.to_action() for a in adds]
        return self._commit(actions, op="COMPACT", read_version=snap.version,
                            removes=removes)

    def optimize_zorder(self, col_a: str, col_b: str,
                        files_per_range: int = 8) -> int:
        """OPTIMIZE ZORDER BY (col_a, col_b): rewrite the live set
        range-clustered on the Morton interleave of the two columns
        (operators/layout.py), and record min/max stats for BOTH
        columns so later ``scan(where=...)`` prunes on either
        dimension. One full rewrite — the once-per-layout cost that
        every subsequent two-predicate scan amortizes at 100 TB."""
        from ..operators.layout import zvalue

        snap = self.snapshot()
        if not snap.files:
            return snap.version
        schema = self.schema(snap)
        live = self._read_files(snap.files, schema,
                                mapping=self._layout(snap)[2])
        clustered = (
            live.withColumn("__z", zvalue(F.col(col_a), F.col(col_b)))
            .repartitionByRange(files_per_range, F.col("__z"))
            .sortWithinPartitions("__z")
            .drop("__z")
        )
        # stats on the zorder columns, whatever clusterBy says — the
        # layout exists to serve predicates on exactly these two
        _, _, mp = self._layout(snap)
        adds = self._write_batch(
            clustered, cluster_by=[mp.get(col_a, col_a), mp.get(col_b, col_b)],
            mapping=mp, repartition=False)
        removes = {f.path for f in snap.files}
        actions = [{"remove": {"path": p}} for p in sorted(removes)]
        actions += [a.to_action() for a in adds]
        return self._commit(actions, op="ZORDER", read_version=snap.version,
                            removes=removes)

    def vacuum(self, retain_versions: int = 2,
               min_age_seconds: int = 600) -> int:
        """Delete data files unreachable from the ``retain_versions``
        newest snapshots. Time travel keeps working inside the horizon;
        older versions lose their bytes (their log entries remain for
        audit). Returns number of files deleted.

        ``min_age_seconds`` guards the write/vacuum race: a concurrent
        writer's batch exists on disk BEFORE its commit publishes, and
        an unguarded vacuum would see it as unreferenced and delete it
        out from under the commit (the same race Delta's retention
        window exists for). Files younger than the guard are skipped;
        set 0 only when no writer can be in flight (tests, single-writer
        maintenance windows)."""
        import time as _time

        commits, _ = list_versions(self.spark, self.root)
        keep_from = commits[max(0, len(commits) - retain_versions)]
        live: set[str] = set()
        for v in commits:
            if v >= keep_from:
                live |= {f.path for f in self.snapshot(v).files}
        live_dv: set[str] = set()
        for v in commits:
            if v >= keep_from:
                live_dv |= {f.dv["file"] for f in self.snapshot(v).files if f.dv}
        cutoff_ms = (_time.time() - min_age_seconds) * 1000.0
        fs, _root = _fs(self.spark, self.root)

        def too_young(jp) -> bool:
            return (min_age_seconds > 0
                    and fs.getFileStatus(jp).getModificationTime() > cutoff_ms)

        deleted = 0
        for rel in list_data_files(self.spark, self.root):
            if rel in live:
                continue
            jp = self.spark._jvm.org.apache.hadoop.fs.Path(f"{self.root}/{rel}")
            if too_young(jp):
                continue  # possibly an in-flight writer's batch
            fs.delete(jp, False)
            deleted += 1
        # deletion-vector relations (Spark-written parquet dirs under dv/)
        dv_root = self.spark._jvm.org.apache.hadoop.fs.Path(f"{self.root}/dv")
        if fs.exists(dv_root):
            for st in fs.listStatus(dv_root):
                rel = f"dv/{st.getPath().getName()}"
                if rel in live_dv or too_young(st.getPath()):
                    continue
                fs.delete(st.getPath(), True)
                deleted += 1
        return deleted

    # ----------------------------------------------------- internals --

    def _commit_dv(self, snap: Snapshot, hits: DataFrame,
                   touched_paths: list[str], extra_adds: list[AddFile],
                   op: str) -> int:
        """Shared tail of the merge-on-read ops: merge ``hits`` (file,
        row_index) with any DVs the touched files already carry, write
        the combined relation, and commit the touched adds re-pointed
        at it (plus ``extra_adds`` — an update's new row files)."""
        touched = [snap.adds[p] for p in touched_paths]
        dv_rel = f"dv/{uuid.uuid4().hex[:12]}.parquet"
        combined = hits
        carrying = [f for f in touched if f.dv]
        if carrying:
            old = self._read_dv(carrying)
            combined = combined.unionByName(
                old.join(
                    self.spark.createDataFrame([(p,) for p in touched_paths], ["file"]),
                    on="file", how="left_semi",
                )
            ).distinct()
        combined.write.mode("errorifexists").parquet(f"{self.root}/{dv_rel}")
        # explicit schema: the DV relation's shape is fixed by this
        # writer, so schema inference here was a pure footer-read job
        # (one extra scheduling floor per DV commit)
        counts = {
            r["file"]: r["n"]
            for r in self.spark.read.schema(_DV_SCHEMA)
            .parquet(f"{self.root}/{dv_rel}")
            .groupBy("file").agg(F.count(F.lit(1)).alias("n")).collect()
        }  # bounded: file count
        removes = set(touched_paths)
        actions = [{"remove": {"path": p}} for p in sorted(removes)]
        actions += [
            AddFile(f.path, f.size, f.num_records, f.stats,
                    {"file": dv_rel, "cardinality": int(counts.get(f.path, 0))}
                    ).to_action()
            for f in touched
        ]
        actions += [a.to_action() for a in extra_adds]
        return self._commit(actions, op=op, read_version=snap.version,
                            removes=removes)

    _FILE_RX = r"(data/[^/]+/[^/]+)$"

    def _read_files(self, files: list[AddFile], schema: T.StructType,
                    with_positions: bool = False,
                    mapping: dict | None = None) -> DataFrame:
        """THE reader every operation goes through: plain files read
        directly; files carrying a deletion vector are read with
        parquet row lineage (``_metadata.row_index``, Spark's native
        row position) and the DV's (file, row_index) pairs anti-joined
        out — merge-on-read, nothing rewritten. ``with_positions``
        keeps ``__file``/``__row`` lineage columns for discovery and
        DV-building passes."""
        names = [f.name for f in schema.fields]
        mapping = mapping or {}
        phys_schema = T.StructType([
            T.StructField(mapping.get(f.name, f.name), f.dataType, f.nullable)
            for f in schema.fields
        ])
        lineage = [
            F.regexp_extract(F.col("_metadata.file_path"), self._FILE_RX, 1)
            .alias("__file"),
            F.col("_metadata.row_index").alias("__row"),
        ]
        keep = names + (["__file", "__row"] if with_positions else [])

        def base(fs: list[AddFile]) -> DataFrame:
            df = self.spark.read.schema(phys_schema).parquet(
                *[f"{self.root}/{f.path}" for f in fs]
            )
            for logical in names:  # physical -> logical, reader-side
                physical = mapping.get(logical, logical)
                if physical != logical:
                    df = df.withColumnRenamed(physical, logical)
            return df

        parts = []
        plain = [f for f in files if not f.dv]
        dved = [f for f in files if f.dv]
        if plain:
            p = base(plain)
            parts.append(p.select(*names, *lineage).select(*keep)
                         if with_positions else p.select(*names))
        if dved:
            d = base(dved).select(*names, *lineage)
            dv = self._read_dv(dved)
            d = d.join(
                dv,
                (d["__file"] == dv["file"]) & (d["__row"] == dv["row_index"]),
                "left_anti",
            )
            parts.append(d.select(*keep))
        if not parts:
            return self.spark.createDataFrame([], schema)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def _read_dv(self, dved: list[AddFile]) -> DataFrame:
        """Union of the deletion-vector relations the given adds point
        at: columns (file, row_index). Stale entries for files not in
        the read set simply never match the anti-join."""
        paths = sorted({f.dv["file"] for f in dved if f.dv})
        # fixed writer-side shape -> explicit schema (no inference job)
        return self.spark.read.schema(_DV_SCHEMA).parquet(
            *[f"{self.root}/{p}" for p in paths]
        )

    def _prune_by_source_range(self, files: list[AddFile], source: DataFrame,
                               keys: list[str], snap: Snapshot) -> list[AddFile]:
        """Merge step 1: drop files whose manifest key range cannot
        overlap the source's key range (computed as ONE parameter-row
        aggregate over the source — never a per-file job). A row can
        only match when every join key matches, so disjointness on ANY
        stats-covered key excludes the file. Keys without stats, files
        without stats, or incomparable types keep the file — pruning
        is an optimization, never a semantic filter."""
        if not files:
            return []
        _, stats_cols, mp = self._layout(snap)
        usable = [k for k in keys if mp.get(k, k) in set(stats_cols)]
        if not usable:
            return list(files)
        aggs = []
        for k in usable:
            aggs += [F.min(k).alias(f"__min_{k}"), F.max(k).alias(f"__max_{k}")]
        row = source.agg(*aggs).collect()[0]  # bounded: 1 parameter row
        bounds = {}
        for k in usable:
            smin, smax = _json_safe(row[f"__min_{k}"]), _json_safe(row[f"__max_{k}"])
            if smin is not None and smax is not None:
                bounds[mp.get(k, k)] = (smin, smax)
        if not bounds:
            return list(files)

        def may_overlap(f: AddFile) -> bool:
            for k, (smin, smax) in bounds.items():
                st = f.stats.get(k)
                if not st or st["min"] is None or st["max"] is None:
                    continue
                try:
                    if st["max"] < smin or st["min"] > smax:
                        return False
                except TypeError:
                    continue
            return True

        return [f for f in files if may_overlap(f)]

    def _rel_paths(self, uris) -> list[str]:
        """file:// URIs from input_file_name -> sorted root-relative paths."""
        prefix = _strip_scheme(self.root).rstrip("/") + "/"
        stripped = (_strip_scheme(u) for u in uris)
        return sorted(p[len(prefix):] if p.startswith(prefix) else p for p in stripped)

    def _files_containing(self, files: list[AddFile], cond: str,
                          schema: T.StructType,
                          mapping: dict | None = None) -> list[str]:
        """The subset of ``files`` that actually contain a row matching
        ``cond`` — one scan of the stats candidates, collect bounded by
        file count."""
        if not files:
            return []
        df = self._read_files(files, schema, with_positions=True, mapping=mapping)
        rows = (df.filter(F.expr(cond))
                .select("__file").distinct().collect())
        return sorted(r["__file"] for r in rows)

    def _layout(self, snap: Snapshot) -> tuple[list[str], list[str], dict]:
        """(cluster cols, stats cols, logical->physical column mapping)
        from table metadata. Cluster/stats names are PHYSICAL (stable
        across renames); the mapping is identity until a rename_column
        commit introduces an indirection."""
        cluster = snap.metadata.get("clusterBy", [])
        return (cluster, snap.metadata.get("statsCols", cluster),
                snap.metadata.get("columnMapping", {}))

    def _write_batch(self, df: DataFrame, cluster_by: list[str],
                     stats_cols: list[str] | None = None,
                     mapping: dict | None = None,
                     repartition: bool = True) -> list[AddFile]:
        """Write immutable files for one commit and return their adds
        with per-file min/max stats on the stats columns (default: the
        cluster columns). ``df`` arrives with LOGICAL column names and
        is written under PHYSICAL ones (``mapping``), so a rename never
        requires rewriting data. ``repartition=False`` keeps an
        upstream layout (Z-order) while still recording stats."""
        if mapping:
            for logical, physical in mapping.items():
                if logical in df.columns and logical != physical:
                    df = df.withColumnRenamed(logical, physical)
        stats_cols = cluster_by if stats_cols is None else stats_cols
        stats_cols = [c for c in stats_cols if c in df.columns]
        batch = f"data/{uuid.uuid4().hex[:12]}"
        abs_batch = f"{self.root}/{batch}"
        out = df
        if cluster_by and repartition:
            out = out.repartition(*[F.col(c) for c in cluster_by])
        out.write.mode("errorifexists").parquet(abs_batch)

        # read back with the KNOWN schema (the writer's own) — schema
        # inference here scheduled a footer-read job per write, one
        # extra scheduling floor per commit for information we already
        # hold. The read-back itself stays: per-file stats must describe
        # the bytes as written, and input_file_name ties rows to files.
        written = self.spark.read.schema(df.schema).parquet(abs_batch)
        aggs = [F.count(F.lit(1)).alias("__n")]
        for c in stats_cols:
            aggs += [F.min(c).alias(f"__min_{c}"), F.max(c).alias(f"__max_{c}")]
        rows = written.groupBy(F.input_file_name().alias("__f")).agg(*aggs).collect()
        prefix = _strip_scheme(abs_batch).rstrip("/") + "/"
        fs, _ = _fs(self.spark, abs_batch)
        # ONE listStatus for every written file's size instead of a
        # py4j getFileStatus round trip per file (O(files) driver calls)
        jdir = self.spark._jvm.org.apache.hadoop.fs.Path(abs_batch)
        sizes = {
            st.getPath().getName(): int(st.getLen())
            for st in fs.listStatus(jdir)
        }
        adds = []
        for r in rows:
            p = _strip_scheme(r["__f"])
            name = p[len(prefix):] if p.startswith(prefix) else p.rsplit("/", 1)[-1]
            size = sizes[name]
            stats = {
                c: {"min": _json_safe(r[f"__min_{c}"]), "max": _json_safe(r[f"__max_{c}"])}
                for c in stats_cols
            }
            adds.append(AddFile(path=f"{batch}/{name}", size=size,
                                num_records=int(r["__n"]), stats=stats))
        return sorted(adds, key=lambda a: a.path)

    def _commit(self, actions: list[dict], op: str, read_version: int,
                removes: set[str], txn: tuple[str, int] | None = None) -> int:
        """Optimistic publish at ``read_version + 1`` — NEVER at
        "latest + 1 from a fresh listing", which would let a stale
        copy-on-write writer slide past every winner without a physical
        collision and silently resurrect rows a concurrent commit
        deleted. On collision, examine the winners: blind appends
        rebase unconditionally (they commute); copy-on-write ops rebase
        only while every file they are removing (= every file they
        read) is still live, else :class:`ConcurrentModification`.
        This is Delta's WriteSerializable level: appends may interleave
        with a delete's predicate window; file-level write-write
        conflicts are always detected."""
        info = {"commitInfo": {"operation": op, "readVersion": read_version}}
        attempt_read = read_version
        for _ in range(_MAX_COMMIT_ATTEMPTS):
            target = attempt_read + 1
            try:
                publish_commit(self.spark, self.root, target, actions + [info])
            except CommitConflict:
                winner = self.snapshot()
                if txn is not None and winner.txns.get(txn[0], -1) >= txn[1]:
                    return winner.version  # same batch already landed
                if removes:
                    still_live = {f.path for f in winner.files}
                    if not removes <= still_live:
                        raise ConcurrentModification(
                            f"{op} at read-version {read_version} lost files "
                            f"{sorted(removes - still_live)[:3]} to a concurrent commit"
                        ) from None
                if winner.version < target:
                    raise ConcurrentModification(
                        f"{op}: version {target} exists but log replays to "
                        f"{winner.version} (corrupt or mid-publish log)"
                    ) from None
                attempt_read = winner.version
                continue
            maybe_checkpoint(self.spark, self.root, self.snapshot(target))
            return target
        raise ConcurrentModification(
            f"{op}: gave up after {_MAX_COMMIT_ATTEMPTS} contended attempts "
            f"(last rebase saw version {attempt_read})"
        )


# ------------------------------------------------------------ helpers --


def _exists_rel(spark, root: str, rel: str) -> bool:
    from .log import _fs

    fs, jpath = _fs(spark, f"{root}/{rel}")
    return fs.exists(jpath)


def _json_safe(v):
    import datetime
    import decimal

    if isinstance(v, (datetime.date, datetime.datetime, decimal.Decimal)):
        return str(v)
    return v


def _merged_schema(base: T.StructType, incoming: T.StructType) -> T.StructType:
    """Append-time schema evolution: new columns join as nullable; a
    type conflict on an existing column is an error (no silent widening)."""
    fields = list(base.fields)
    names = {f.name for f in fields}
    for f in incoming.fields:
        if f.name in names:
            cur = base[f.name].dataType
            if cur != f.dataType:
                raise TypeError(f"schema evolution type conflict on {f.name}: "
                                f"{cur.simpleString()} vs {f.dataType.simpleString()}")
        else:
            fields.append(T.StructField(f.name, f.dataType, nullable=True))
    return T.StructType(fields)


_PLAIN_IDENT = re.compile(r"[A-Za-z_][A-Za-z0-9_]*\Z")


def _ddl_safe(dt: T.DataType) -> bool:
    """True when ``dt.simpleString()`` re-parses to the same type: every
    nested struct field name must be a plain identifier (simpleString
    does not quote nested names, so ``struct<a b:int>`` round-trips
    wrong — ADVICE r13)."""
    if isinstance(dt, T.StructType):
        return all(_PLAIN_IDENT.match(f.name) and _ddl_safe(f.dataType) for f in dt.fields)
    if isinstance(dt, T.ArrayType):
        return _ddl_safe(dt.elementType)
    if isinstance(dt, T.MapType):
        return _ddl_safe(dt.keyType) and _ddl_safe(dt.valueType)
    return True


def _conform(df: DataFrame, schema: T.StructType, allow_missing: bool = False) -> DataFrame:
    """Project/cast ``df`` to the table schema (column order + types).

    Built as ONE ``selectExpr`` parsed JVM-side instead of per-field
    ``F.col().cast().alias()`` chains — the column-object route paid ~3
    py4j round trips per field on every write/merge (optimization round
    13, same driver-fixed-cost class as the log's FS-handle cache); the
    parsed CAST/alias tree is identical. Fields whose type cannot be
    spelled in DDL losslessly (a nested struct field name that needs
    quoting — simpleString never quotes nested names) take the
    column-object cast path instead (r13 ADVICE)."""
    exprs: list = []
    have = set(df.columns)
    any_unsafe = False
    for f in schema.fields:
        if _ddl_safe(f.dataType):
            name = f.name.replace("`", "``")
            ddl = f.dataType.simpleString()
            if f.name in have:
                exprs.append(f"CAST(`{name}` AS {ddl}) AS `{name}`")
            elif allow_missing or f.nullable:
                exprs.append(f"CAST(NULL AS {ddl}) AS `{name}`")
            else:
                raise ValueError(f"append missing non-nullable column {f.name}")
            continue
        any_unsafe = True
        if f.name in have:
            exprs.append(F.col(f.name).cast(f.dataType).alias(f.name))
        elif allow_missing or f.nullable:
            exprs.append(F.lit(None).cast(f.dataType).alias(f.name))
        else:
            raise ValueError(f"append missing non-nullable column {f.name}")
    if not any_unsafe:
        return df.selectExpr(*exprs)
    return df.select(*[F.expr(e) if isinstance(e, str) else e for e in exprs])


_CONJUNCT = re.compile(
    r"^\s*(\w+)\s*(<=|>=|=|<|>)\s*('(?:[^']*)'|-?\d+(?:\.\d+)?)\s*$"
)
_IN_LIST = re.compile(r"^\s*(\w+)\s+IN\s*\(([^()]*)\)\s*$", re.IGNORECASE)


def _prune_files(files: list[AddFile], where: str,
                 mapping: dict | None = None) -> list[AddFile]:
    """Manifest pruning on simple AND-ed conjuncts (range comparisons
    and IN-lists) over stats columns. ALL-OR-NOTHING parse: if any
    " AND "-split part fails to parse, NO pruning happens — a
    disjunction like ``a = 1 OR (b = 2 AND c = 3)`` splits into
    fragments where treating the parseable tail as a top-level
    conjunct would prune files the OR branch matches. Unparseable
    predicates keep every file — pruning is an optimization, never a
    semantic filter (scan re-applies ``where``)."""
    conjuncts = []
    for part in where.split(" AND "):
        m = _CONJUNCT.match(part)
        if m:
            col, op, lit = m.groups()
            lit = lit[1:-1] if lit.startswith("'") else float(lit)
            conjuncts.append(((mapping or {}).get(col, col), op, lit))
            continue
        m = _IN_LIST.match(part)
        if m:
            col, raw = m.groups()
            vals = []
            for tok in raw.split(","):
                tok = tok.strip()
                if tok.startswith("'") and tok.endswith("'"):
                    vals.append(tok[1:-1])
                else:
                    try:
                        vals.append(float(tok))
                    except ValueError:
                        vals = None
                        break
            if vals:
                conjuncts.append(((mapping or {}).get(col, col), "in", vals))
                continue
        return files  # unparseable part -> the conjunct split is unsafe
    if not conjuncts:
        return files

    def may_match(f: AddFile) -> bool:
        for col, op, lit in conjuncts:
            st = f.stats.get(col)
            if not st or st["min"] is None or st["max"] is None:
                continue  # no stats -> cannot prune on this conjunct
            lo, hi = st["min"], st["max"]
            if op == "in":
                if any(isinstance(v, float) and isinstance(lo, str) for v in lit):
                    continue  # any incomparable value might match -> keep
                if lit and not any(lo <= v <= hi for v in lit):
                    return False
                continue
            if isinstance(lit, float) and isinstance(lo, str):
                continue  # type mismatch -> keep
            if op == "=" and not (lo <= lit <= hi):
                return False
            if op in ("<", "<=") and not (lo < lit or (op == "<=" and lo <= lit)):
                return False
            if op in (">", ">=") and not (hi > lit or (op == ">=" and hi >= lit)):
                return False
        return True

    return [f for f in files if may_match(f)]
