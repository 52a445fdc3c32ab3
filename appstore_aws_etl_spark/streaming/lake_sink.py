"""Exactly-once streaming ingestion into a lakehouse table.

The production landing path the reference only gestures at (its ingest
is a synchronous boto3 ``put_object``, reference utils/utils/s3.py:26):
a Structured Streaming query whose sink is an ACID lake table, with
end-to-end exactly-once on top of at-least-once micro-batch delivery.

The mechanism is the public Delta pattern: ``foreachBatch`` gives each
micro-batch a monotonically increasing ``batchId``; the sink appends
with ``txn=(query_id, batchId)``, and the table's log records the
watermark atomically WITH the data files. When a failed/restarted query
re-delivers a batch, the append sees its batchId already committed and
becomes a no-op — replays change nothing, so the at-least-once source
plus the idempotent transactional sink compose to exactly-once table
contents. Spark's own checkpoint handles source offsets; the ``txn``
action covers the window where the batch committed to the table but
the checkpoint had not yet advanced.

Scale: per micro-batch cost is one batch write + one KB-sized commit —
identical to any append; nothing accumulates with stream lifetime
except the ordinary log (checkpointed every CHECKPOINT_INTERVAL).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from ..lakehouse import LakeTable


def lake_batch_writer(table: LakeTable, app_id: str,
                      merge_keys: list[str] | None = None):
    """The ``foreachBatch`` callable: idempotent transactional append,
    or — with ``merge_keys`` — idempotent transactional MERGE (the
    streaming-CDC upsert apply: each micro-batch's last change per key
    wins, replays are no-ops via the same txn watermark)."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        if merge_keys:
            table.merge(batch_df, keys=merge_keys, txn=(app_id, int(batch_id)))
        else:
            table.append(batch_df, txn=(app_id, int(batch_id)))

    return write_batch


def start_lake_ingest(
    stream_df: DataFrame,
    table: LakeTable,
    checkpoint_dir: str,
    app_id: str = "lake-ingest",
    merge_keys: list[str] | None = None,
) -> StreamingQuery:
    """Wire a streaming DataFrame into ``table`` exactly-once —
    append-only by default, keyed upsert when ``merge_keys`` is given.
    NOTE for the upsert mode: each micro-batch must be key-unique
    (dedup upstream, e.g. last_value per key over the batch) — the
    merge contract, enforced semantics documented in table.merge."""
    return (
        stream_df.writeStream.foreachBatch(
            lake_batch_writer(table, app_id, merge_keys)
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
