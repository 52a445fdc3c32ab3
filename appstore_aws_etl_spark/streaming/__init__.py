"""Structured Streaming operators (SURVEY.md §2.9).

The batch-equivalent semantics of T1-T7 are oracle-checked in
queries/streaming_batch.py; this package holds the real incremental
implementations: file-source streams, watermarked windowed
aggregations, dedup-within-watermark, stream-static enrichment, an
arbitrary-stateful funnel, and availableNow execution helpers.
"""

from .pipeline import (  # noqa: F401
    run_to_memory,
    sliding_counts,
    stream_dedup,
    stream_enrich,
    stream_events,
    session_counts,
    tumbling_counts,
)
from .stateful import funnel_counts, funnel_counts_tws  # noqa: F401
