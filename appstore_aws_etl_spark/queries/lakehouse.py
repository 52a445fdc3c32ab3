"""Lakehouse DML query keys (SURVEY.md §2.12 L-rows).

Each key builds a real log-backed table (lakehouse/table.py) from the
fixture, runs a DML lifecycle against it — every mutation an atomic
log commit — and returns the resulting snapshot scan, so the DuckDB
oracle checks the END STATE of an ACID sequence, not a single query.
This upgrades the round-12 gap list's #1 item ("MERGE over plain
parquet with tmp-swap atomicity") to real table semantics: concurrent
writers serialize through put-if-absent commits, readers never see a
half-applied operation, and old versions stay readable until vacuum.

Table roots live under the cache dir keyed by (key, fixture) and are
rebuilt from scratch on every call — the lifecycle IS the operator
under test, so stale state from a previous run must never leak in.

Scale: all DML here is copy-on-write over file-granular manifests —
commit cost is O(files touched), never O(table). The merge key's
touched-file discovery and the delete key's stats pruning are the
100 TB story (see lakehouse/table.py docstrings); correctness is
end-state-hashed at every tier.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..lakehouse import LakeTable
from ..registry import query
from .scans import CACHE_DIR

_CUST_COLS = ["c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"]


def _fresh_root(sf_dir: str, key: str) -> str:
    slug = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    root = os.path.join(CACHE_DIR, "lake", slug, key)
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(os.path.dirname(root), exist_ok=True)
    return root


def _customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, sf_dir, "customer").select(*_CUST_COLS)


@query(
    "lake_merge_upsert",
    oracle="""
    WITH source AS (
        SELECT c_custkey, 'upd-' || c_name AS c_name, c_nationkey,
               round(c_acctbal * 1.1, 4) AS c_acctbal, c_mktsegment
        FROM customer WHERE c_custkey % 3 = 0
        UNION ALL
        SELECT -c_custkey, 'new-' || c_name, c_nationkey, 0.0, c_mktsegment
        FROM customer WHERE c_custkey % 1000 = 1
    )
    SELECT coalesce(s.c_custkey, t.c_custkey) AS c_custkey,
           coalesce(s.c_name, t.c_name)       AS c_name,
           coalesce(s.c_nationkey, t.c_nationkey) AS c_nationkey,
           CASE WHEN s.c_custkey IS NOT NULL THEN s.c_acctbal ELSE t.c_acctbal END AS c_acctbal,
           coalesce(s.c_mktsegment, t.c_mktsegment) AS c_mktsegment
    FROM customer t FULL JOIN source s ON t.c_custkey = s.c_custkey
    """,
    tags=("lakehouse", "etl", "custom-operator"),
)
def lake_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ACID MERGE into a log-backed table: updates hit every third
    customer, inserts arrive with negative keys; only target files
    containing a matched key are rewritten, the commit is atomic."""
    cust = _customer(spark, sf_dir)
    t = LakeTable.create(spark, _fresh_root(sf_dir, "merge"), cust.schema)
    t.append(cust)
    updates = cust.filter(F.col("c_custkey") % 3 == 0).withColumn(
        "c_acctbal", F.round(F.col("c_acctbal") * 1.1, 4)
    ).withColumn("c_name", F.concat(F.lit("upd-"), F.col("c_name")))
    inserts = cust.filter(F.col("c_custkey") % 1000 == 1).select(
        (-F.col("c_custkey")).alias("c_custkey"),
        F.concat(F.lit("new-"), F.col("c_name")).alias("c_name"),
        "c_nationkey",
        F.lit(0.0).alias("c_acctbal"),
        "c_mktsegment",
    )
    t.merge(updates.unionByName(inserts), keys=["c_custkey"])
    return t.scan()


@query(
    "lake_delete_where",
    oracle="""
    SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
    FROM customer
    WHERE NOT (c_mktsegment = 'BUILDING' AND c_acctbal < 0)
    """,
    tags=("lakehouse", "etl"),
)
def lake_delete_where(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Copy-on-write DELETE: manifest stats (clustered on c_nationkey)
    prune candidate files, a containment scan narrows to files with
    matching rows, only those are rewritten."""
    cust = _customer(spark, sf_dir)
    t = LakeTable.create(spark, _fresh_root(sf_dir, "delete"), cust.schema,
                         cluster_by=["c_nationkey"])
    t.append(cust)
    t.delete_where("c_mktsegment = 'BUILDING' AND c_acctbal < 0")
    return t.scan()


@query(
    "lake_delete_dv",
    oracle="""
    SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
    FROM customer
    WHERE NOT (c_mktsegment = 'BUILDING' AND c_acctbal < 0)
    """,
    tags=("lakehouse", "etl", "custom-operator"),
)
def lake_delete_dv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge-on-read DELETE via deletion vectors: the same predicate
    (and the same oracle) as lake_delete_where, but no data file is
    rewritten — matching row positions land in a parquet DV relation
    that every reader anti-joins. At 100 TB this turns a GB-rewriting
    trickle delete into an O(deleted rows) commit; the copy-on-write
    twin exists for readers that must not pay the merge-on-read tax."""
    cust = _customer(spark, sf_dir)
    t = LakeTable.create(spark, _fresh_root(sf_dir, "delete_dv"), cust.schema,
                         cluster_by=["c_nationkey"])
    t.append(cust)
    t.delete_where_dv("c_mktsegment = 'BUILDING' AND c_acctbal < 0")
    return t.scan()


@query(
    "lake_update_where",
    oracle="""
    SELECT c_custkey, c_name, c_nationkey,
           CASE WHEN c_acctbal < 0 THEN 0.0 ELSE c_acctbal END AS c_acctbal,
           CASE WHEN c_acctbal < 0 THEN 'RECOVERED' ELSE c_mktsegment END AS c_mktsegment
    FROM customer
    """,
    tags=("lakehouse", "etl"),
)
def lake_update_where(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Copy-on-write UPDATE ... SET over the debtor rows only."""
    cust = _customer(spark, sf_dir)
    t = LakeTable.create(spark, _fresh_root(sf_dir, "update"), cust.schema)
    t.append(cust)
    t.update_set("c_acctbal < 0",
                 {"c_acctbal": "0.0", "c_mktsegment": "'RECOVERED'"})
    return t.scan()


@query(
    "lake_time_travel",
    oracle="""
    SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
    FROM customer
    """,
    tags=("lakehouse", "etl"),
)
def lake_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot isolation across DML: after a DELETE commits, version 1
    must still read the full pre-delete table (removed files keep their
    bytes until vacuum)."""
    cust = _customer(spark, sf_dir)
    t = LakeTable.create(spark, _fresh_root(sf_dir, "timetravel"), cust.schema)
    t.append(cust)
    t.delete_where("c_nationkey < 10")
    return t.scan(version=1)


@query(
    "lake_compact_identity",
    oracle="""
    SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
    FROM customer
    """,
    tags=("lakehouse", "etl"),
)
def lake_compact_identity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OPTIMIZE bin-packing: four small appends then a compact; the
    rewrite must be row-for-row lossless (the oracle checks content,
    the unit tests check the file count actually dropped)."""
    cust = _customer(spark, sf_dir)
    t = LakeTable.create(spark, _fresh_root(sf_dir, "compact"), cust.schema)
    for part in range(4):
        t.append(cust.filter(F.col("c_custkey") % 4 == part))
    t.compact(target_rows_per_file=2_000_000_000)
    return t.scan()


@query(
    "lake_incremental_feed",
    oracle="""
    SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
    FROM customer WHERE c_custkey % 2 = 1
    """,
    tags=("lakehouse", "etl", "custom-operator"),
)
def lake_incremental_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDF-lite incremental consumption: after two appends, the changes
    in (v1, v2] are exactly batch 2 — a downstream job resumes from its
    last-seen version instead of re-reading the table."""
    cust = _customer(spark, sf_dir)
    t = LakeTable.create(spark, _fresh_root(sf_dir, "feed"), cust.schema)
    t.append(cust.filter(F.col("c_custkey") % 2 == 0))
    t.append(cust.filter(F.col("c_custkey") % 2 == 1))
    return t.added_between(1, 2)


@query(
    "lake_scd2_apply",
    oracle="""
    WITH upd AS (
        SELECT c_custkey, round(c_acctbal + 100, 4) AS c_acctbal
        FROM customer WHERE c_custkey % 4 = 0
    )
    SELECT c.c_custkey, c.c_acctbal, 1 AS ver,
           u.c_custkey IS NULL AS is_current
    FROM customer c LEFT JOIN upd u ON c.c_custkey = u.c_custkey
    UNION ALL
    SELECT c_custkey, c_acctbal, 2 AS ver, TRUE AS is_current
    FROM upd
    """,
    tags=("lakehouse", "etl", "custom-operator"),
)
def lake_scd2_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 maintenance as ACID lake DML: the update batch first
    CLOSES each affected key's open row (copy-on-write UPDATE narrowed
    by key-range x manifest stats), then APPENDS the new open rows —
    two commits, and a reader between them still sees a consistent
    snapshot (closed-but-not-yet-replaced is the documented SCD2
    in-flight state; version-pinned readers see neither)."""
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    dim = cust.select(
        "c_custkey", "c_acctbal",
        F.lit(1).alias("ver"), F.lit(True).alias("is_current"),
    )
    t = LakeTable.create(spark, _fresh_root(sf_dir, "scd2"), dim.schema,
                         stats_cols=["c_custkey"])
    t.append(dim)
    updates = cust.filter(F.col("c_custkey") % 4 == 0).withColumn(
        "c_acctbal", F.round(F.col("c_acctbal") + 100, 4)
    )
    t.update_set("c_custkey % 4 = 0 AND is_current", {"is_current": "false"})
    t.append(updates.select(
        "c_custkey", "c_acctbal", F.lit(2).alias("ver"), F.lit(True).alias("is_current")
    ))
    return t.scan()


@query(
    "lake_dedup_ingest",
    oracle="""
    SELECT md5(text) AS fingerprint,
           coalesce(min(CASE WHEN doc_id % 2 = 0 THEN doc_id END),
                    min(doc_id)) AS doc_id,
           min(length(text)) AS n_chars
    FROM documents GROUP BY md5(text)
    """,
    tags=("lakehouse", "llm", "dedup", "custom-operator"),
)
def lake_dedup_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-dedup ingestion as ACID insert-if-absent: each arriving
    batch is key-deduped (min doc_id per content fingerprint) and
    MERGEd with ``when_matched="ignore"`` — already-present
    fingerprints keep their first-written row byte-identical (NO file
    rewrite; the commit is a pure append of the new fingerprints), so
    steady-state corpus ingestion costs O(batch), never O(corpus).
    The ACID twin of llm_dedup_incremental."""
    docs = load(spark, sf_dir, "documents").select(
        F.md5(F.col("text")).alias("fingerprint"),
        "doc_id",
        F.length("text").alias("n_chars"),
    )

    def dedup_batch(batch: DataFrame) -> DataFrame:
        return batch.groupBy("fingerprint").agg(
            F.min_by(F.struct("doc_id", "n_chars"), F.col("doc_id")).alias("r")
        ).select("fingerprint", F.col("r.doc_id").alias("doc_id"),
                 F.col("r.n_chars").alias("n_chars"))

    t = LakeTable.create(spark, _fresh_root(sf_dir, "dedup_ingest"),
                         dedup_batch(docs).schema)
    t.merge(dedup_batch(docs.filter(F.col("doc_id") % 2 == 0)),
            keys=["fingerprint"], when_matched="ignore")
    t.merge(dedup_batch(docs), keys=["fingerprint"], when_matched="ignore")
    return t.scan()


@query(
    "lake_restore",
    oracle="""
    SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
    FROM customer
    """,
    tags=("lakehouse", "etl"),
)
def lake_restore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RESTORE VERSION AS OF: a bad DELETE is rolled back by a pure
    metadata commit re-pointing the live set at version 1 — no data
    moves, history is append-only (DELETE then RESTORE both visible)."""
    cust = _customer(spark, sf_dir)
    t = LakeTable.create(spark, _fresh_root(sf_dir, "restore"), cust.schema)
    t.append(cust)
    t.delete_where("c_custkey % 2 = 0")  # the incident
    t.restore(1)
    return t.scan()


@query(
    "lake_stream_ingest",
    oracle="""
    SELECT event_id, user_id, event_type, round(value, 4) AS value
    FROM events
    """,
    tags=("lakehouse", "streaming", "etl"),
)
def lake_stream_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRUE streaming execution through the exactly-once lake sink:
    the events table re-landed as a multi-file stream source, consumed
    micro-batch by micro-batch (foreachBatch + txn watermarks,
    streaming/lake_sink.py) into an ACID table whose end state the
    oracle checks exactly — availableNow drains the source then stops,
    so the streaming path is deterministic in content (unlike the §2.9
    batch-equivalents, this key actually runs readStream through the
    correctness gate)."""
    from ..streaming.lake_sink import start_lake_ingest

    ev = load(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", F.round("value", 4).alias("value")
    )
    src = _fresh_root(sf_dir, "stream_src")
    ckpt = _fresh_root(sf_dir, "stream_ckpt")
    ev.repartition(4).write.parquet(src)
    t = LakeTable.create(spark, _fresh_root(sf_dir, "stream_tbl"), ev.schema)
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(src)
    )
    q = start_lake_ingest(stream, t, ckpt, app_id="lake_stream_ingest")
    q.awaitTermination()
    return t.scan()


@query(
    "lake_update_dv",
    oracle="""
    SELECT c_custkey, c_name, c_nationkey,
           CASE WHEN c_acctbal < 0 THEN 0.0 ELSE c_acctbal END AS c_acctbal,
           CASE WHEN c_acctbal < 0 THEN 'RECOVERED' ELSE c_mktsegment END AS c_mktsegment
    FROM customer
    """,
    tags=("lakehouse", "etl", "custom-operator"),
)
def lake_update_dv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge-on-read UPDATE: matched rows' positions go into a deletion
    vector and their updated versions append as new files — one commit,
    O(changed rows), no touched-file rewrite. Shares lake_update_where's
    oracle: MoR and CoW update are provably end-state-identical."""
    cust = _customer(spark, sf_dir)
    t = LakeTable.create(spark, _fresh_root(sf_dir, "update_dv"), cust.schema)
    t.append(cust)
    t.update_set_dv("c_acctbal < 0",
                    {"c_acctbal": "0.0", "c_mktsegment": "'RECOVERED'"})
    return t.scan()


@query(
    "lake_stream_upsert",
    oracle="""
    SELECT c_custkey, c_name,
           CASE WHEN c_custkey % 3 = 0 THEN round(c_acctbal * 1.1, 4)
                ELSE c_acctbal END AS c_acctbal
    FROM customer
    """,
    tags=("lakehouse", "streaming", "etl", "custom-operator"),
)
def lake_stream_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming CDC upsert: wave 1 (the full snapshot) then wave 2 (a
    balance-bump changelog for every third customer) arrive as separate
    micro-batches through the exactly-once MERGE sink — each batch a
    transactional keyed merge with a txn watermark, so replays are
    no-ops and the end state is the snapshot with the changelog
    applied. Wave order is pinned via file modification times (the
    file source's batch order), since upsert is last-write-wins."""
    import time as _time

    from ..streaming.lake_sink import start_lake_ingest

    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_acctbal")
    src = _fresh_root(sf_dir, "upsert_src")
    ckpt = _fresh_root(sf_dir, "upsert_ckpt")
    cust.coalesce(1).write.parquet(f"{src}/wave1")
    updates = cust.filter(F.col("c_custkey") % 3 == 0).withColumn(
        "c_acctbal", F.round(F.col("c_acctbal") * 1.1, 4)
    )
    updates.coalesce(1).write.parquet(f"{src}/wave2")
    later = _time.time() + 10
    for base, _dirs, names in os.walk(f"{src}/wave2"):
        for n in names:
            os.utime(os.path.join(base, n), (later, later))
    t = LakeTable.create(spark, _fresh_root(sf_dir, "upsert_tbl"), cust.schema,
                         stats_cols=["c_custkey"])
    stream = (
        spark.readStream.schema(cust.schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    q = start_lake_ingest(stream, t, ckpt, app_id="lake_stream_upsert",
                          merge_keys=["c_custkey"])
    q.awaitTermination()
    return t.scan()


@query(
    "lake_zorder_optimize",
    oracle="""
    SELECT p_partkey, p_name, p_size, round(p_retailprice, 2) AS p_retailprice
    FROM part
    """,
    tags=("lakehouse", "etl", "custom-operator"),
)
def lake_zorder_optimize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OPTIMIZE ZORDER BY (p_partkey, p_size): rewrite the table
    range-clustered on the Morton interleave so manifest min/max stats
    prune on either dimension; the oracle proves the relayout is
    row-for-row lossless (the pruning effect itself is asserted in
    tests/test_lakehouse.py::test_zorder_optimize_clusters_both_dimensions)."""
    part = load(spark, sf_dir, "part").select(
        "p_partkey", "p_name", "p_size",
        F.round("p_retailprice", 2).alias("p_retailprice"),
    )
    t = LakeTable.create(spark, _fresh_root(sf_dir, "zorder"), part.schema)
    t.append(part)
    t.optimize_zorder("p_partkey", "p_size")
    return t.scan()


@query(
    "lake_rename_column",
    oracle="""
    SELECT c_custkey AS customer_id, c_name,
           CASE WHEN c_custkey % 7 = 0 THEN round(c_acctbal + 50, 4)
                ELSE c_acctbal END AS balance
    FROM customer
    """,
    tags=("lakehouse", "etl", "custom-operator"),
)
def lake_rename_column(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RENAME COLUMN via column mapping (metadata-only, zero rewrite),
    then DML addressed by the NEW names — the update's predicate and
    the merge-free write path all translate through the mapping while
    the parquet files keep their original physical column names."""
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_acctbal")
    t = LakeTable.create(spark, _fresh_root(sf_dir, "rename"), cust.schema,
                         stats_cols=["c_custkey"])
    t.append(cust)
    t.rename_column("c_custkey", "customer_id")
    t.rename_column("c_acctbal", "balance")
    t.update_set("customer_id % 7 = 0",
                 {"balance": "round(balance + 50, 4)"})
    return t.scan()


@query(
    "lake_schema_evolution",
    oracle="""
    SELECT c_custkey, c_acctbal, CAST(NULL AS VARCHAR) AS tier
    FROM customer WHERE c_nationkey < 13
    UNION ALL
    SELECT c_custkey, c_acctbal,
           CASE WHEN c_acctbal >= 5000 THEN 'gold' ELSE 'std' END AS tier
    FROM customer WHERE c_nationkey >= 13
    """,
    tags=("lakehouse", "etl"),
)
def lake_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mergeSchema append: batch 2 carries a new ``tier`` column; old
    files read back null-filled under the evolved schema, no rewrite."""
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey", "c_acctbal")
    base = cust.filter(F.col("c_nationkey") < 13).drop("c_nationkey")
    t = LakeTable.create(spark, _fresh_root(sf_dir, "evolve"), base.schema)
    t.append(base)
    wide = cust.filter(F.col("c_nationkey") >= 13).drop("c_nationkey").withColumn(
        "tier", F.when(F.col("c_acctbal") >= 5000, "gold").otherwise("std")
    )
    t.append(wide, merge_schema=True)
    return t.scan()
