"""Sequence packing: greedy bin assignment of documents into fixed
token budgets (the pre-training batch-construction step).

Packing is a prefix-dependent recurrence (a bin closes when the next
doc would overflow it), so it is not expressible as a window function;
it runs as ``applyInPandas`` per pack-group with a deterministic
ordering. Groups (e.g. source shards) pack independently and in
parallel — the group key is the scale unit, exactly how a 100 TB
corpus is packed shard-by-shard.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def pack_documents(
    docs: DataFrame,
    budget: int,
    group_col: str = "source",
    id_col: str = "doc_id",
    size_col: str = "n_tokens",
) -> DataFrame:
    """Assign (bin_id, offset) per doc: greedy first-fit-in-order
    within each group, ordered by ``id_col`` (deterministic). Docs
    larger than the budget get a singleton bin. Returns
    (group, doc_id, n_tokens, bin_id, offset)."""
    out_schema = T.StructType(
        [
            T.StructField(group_col, T.StringType()),
            T.StructField(id_col, T.LongType()),
            T.StructField(size_col, T.LongType()),
            T.StructField("bin_id", T.LongType()),
            T.StructField("offset", T.LongType()),
        ]
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col).reset_index(drop=True)
        bins, offsets = [], []
        bin_id, fill = 0, 0
        for size in pdf[size_col]:
            if fill > 0 and fill + size > budget:
                bin_id += 1
                fill = 0
            offsets.append(fill)
            bins.append(bin_id)
            fill += size
            if fill >= budget:  # exactly full or oversized singleton
                bin_id += 1
                fill = 0
        pdf["bin_id"] = pd.Series(bins, dtype="int64")
        pdf["offset"] = pd.Series(offsets, dtype="int64")
        return pdf[[group_col, id_col, size_col, "bin_id", "offset"]]

    sized = docs.select(group_col, id_col, F.col(size_col).cast("long").alias(size_col))
    return sized.groupBy(group_col).applyInPandas(pack, schema=out_schema)
