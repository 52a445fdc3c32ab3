"""Shared lineage-truncation checkpoint policy.

Every iterative/reused-subtree operator in this repo truncates lineage
with a LAZY ``localCheckpoint`` (materialized by the first action that
needs it, blocks ContextCleaner-released on GC — the established
pattern documented in operators/labelprop.py).

Round 8 pinned the STORAGE LEVEL after the 100x tier found the default
one is a scale landmine: ``Dataset.localCheckpoint`` stores
MEMORY_AND_DISK **deserialized**, so a checkpointed 180M-row edge
relation (graph_pagerank at 100x) unrolls as JVM row objects — it
OOM'd a 8 GB heap and STILL OOM'd at 24 GB, because concurrent
partition unrolls need the deserialized footprint in memory before
anything can spill. ``StorageLevel.MEMORY_AND_DISK`` (the PySpark
constant with ``deserialized=False``) stores the compact serialized
row batches instead and spills them to disk under pressure: the same
checkpoint materializes in bounded memory at ANY data size.

Measured trade (interleaved A/B at driver bench config, sf0.1):
graph_pagerank 4.86 s serialized vs 3.70 s deserialized — its
checkpoint is re-read four times (3 iterations + the n_nodes count)
and each read pays a deserialization pass; llm_dedup_survivors shows
no difference (3.94 vs 4.13, noise). Accepted deliberately: +1.2 s on
one key at 20 MB buys the operator COMPLETING at 100x (124 s) where
the deserialized level hard-OOMs the JVM, and a 100 TB-first engine
prices robustness above micro-bench latency. On a cluster the relation
is sliced across executors and either level fits; the serialized level
is the one that also degrades gracefully on a single fat node.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame

# PySpark's MEMORY_AND_DISK has deserialized=False (serialized bytes);
# the JVM-default deserialized variant is MEMORY_AND_DISK_DESER.
CHECKPOINT_LEVEL = StorageLevel.MEMORY_AND_DISK


def lazy_checkpoint(df: DataFrame) -> DataFrame:
    """Lazy localCheckpoint at the repo-wide serialized storage level."""
    return df.localCheckpoint(eager=False, storageLevel=CHECKPOINT_LEVEL)


def _env_eager_default() -> bool:
    import os

    return os.environ.get("SPARK_GRAFT_EAGER_CKPT", "0") == "1"


# One session-level lever for the eager/durable checkpoint posture
# (round 14, verdict item: the policy used to live in four scattered
# code comments). Checkpoints consumed by MULTIPLE CONCURRENT readers
# (both sides of a verify/self join launching broadcast futures) race
# to first-materialize a LAZY checkpoint and each recomputes the whole
# upstream pipeline. Locally that is wall-neutral-to-better — the twin
# jobs run on idle cores while an eager materialization pays an extra
# scheduling floor (AB_EAGERCKPT_r13opt: llm_dedup_minhash 2.20->2.41 s
# eager) — so the default stays LAZY and the sf0.1 bench is unchanged.
# On a cluster, where executor time is the budget, flip the posture
# once per deployment (SPARK_GRAFT_EAGER_CKPT=1 or
# set_fanin_checkpoint_policy(True)) and every fan-in site serializes
# its upstream pass exactly once. At 100 TB the same sites would
# checkpoint to DURABLE storage instead; this knob is the local-mode
# expression of that policy.
EAGER_FANIN_CHECKPOINTS: bool = _env_eager_default()


def set_fanin_checkpoint_policy(eager: bool) -> None:
    global EAGER_FANIN_CHECKPOINTS
    EAGER_FANIN_CHECKPOINTS = bool(eager)


def fanin_checkpoint(df: DataFrame) -> DataFrame:
    """Checkpoint for a relation read by several concurrent consumers:
    lazy by default, eager under the session policy above."""
    return df.localCheckpoint(
        eager=EAGER_FANIN_CHECKPOINTS, storageLevel=CHECKPOINT_LEVEL
    )


def release_checkpoints(spark) -> None:
    """Deterministically drop every persisted/checkpointed RDD block.

    localCheckpoint blocks release only when the ContextCleaner GCs the
    owning RDD, so checkpoint-heavy keys read inflated under the
    storage accumulated by earlier keys in a long sweep (round-8
    artifacts: graph_degree_distribution 90.4 s in-sweep vs 27-38 s
    idle at 100x; the r8 10x sweep tail needed post-hoc idle
    re-measures). Bench harnesses call this between keys so every
    timing starts from empty executor storage.

    WARNING — released checkpoints are UNRECOVERABLE, not recomputed.
    ``localCheckpoint`` truncates lineage, so once its blocks are
    unpersisted a re-read of any still-held DataFrame built on them
    fails with ``Checkpoint block rdd_X_Y not found`` instead of
    recomputing (plain ``persist`` recomputes; local checkpoints do
    not). This helper is bench/sweep-only: call it ONLY after every
    DataFrame referencing the checkpoints has been discarded — bench
    keys rebuild their plans per run, so the boundary between keys is
    safe by construction."""
    import gc

    gc.collect()  # drop py4j proxies so dead JVM RDDs are collectable
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    for jrdd in list(jmap.values()):
        # BLOCKING unpersist (round 11): with blocking=False the blocks
        # only actually drop when the BlockManager gets around to it, so
        # a key whose predecessor checkpointed heavily starts with the
        # unified region's protected storage half still resident — the
        # exact concurrent-pressure regime where the 100x sweep's
        # UNABLE_TO_ACQUIRE_MEMORY task deaths happened. Synchronous
        # release costs milliseconds between keys and makes the next
        # key's starting memory state deterministic.
        jrdd.unpersist(True)
    # nudge the ContextCleaner's JVM side too: broadcast blocks from the
    # previous key release on GC, and an explicit collection between
    # keys beats waiting for heap pressure mid-sort.
    spark.sparkContext._jvm.System.gc()
