"""Custom stateful streaming operators via ``applyInPandasWithState``
(engine extension; the reference is batch-only — SURVEY.md §2.10 — but
a continuous harvest tail needs streaming-native dedup).

``streaming_dedup_first`` is the streaming counterpart of the batch
snapshot/dedup family (operators/dedup.py): keep the FIRST record ever
seen per key across micro-batches. State is one marker per key in the
state store, checkpoint-persisted, so re-running an availableNow
pipeline never re-emits old keys — exactly the incremental-harvest
semantics the reference gets from file memoization, with exactly-once
bookkeeping instead of mtime comparisons.

Scale notes: state is hash-partitioned by key across executors; the
per-key payload is a single boolean-sized row, so 1e9 keys is a few GB
of state spread over the cluster. For bounded retention pass a
watermark + timeout variant (state TTL) — not needed for parity.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import StructType


def streaming_dedup_first(
    stream: DataFrame,
    key_cols: Sequence[str],
    output_schema: StructType | str | None = None,
) -> DataFrame:
    """Emit only the first occurrence of each key, across micro-batches.

    Within one batch, the first row by arrival order wins (pin an
    upstream sort or use a deterministic source for reproducibility);
    across batches the state store guarantees a key never re-emits.
    """
    schema = output_schema or stream.schema
    state_schema = "seen boolean"

    def dedup(
        key: tuple[Any, ...],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            for _ in batches:  # drain; key already emitted in a prior batch
                pass
            return
        first = None
        for pdf in batches:
            if first is None and len(pdf):
                first = pdf.iloc[[0]]
        state.update((True,))
        if first is not None:
            yield first

    return stream.groupBy(*[stream[c] for c in key_cols]).applyInPandasWithState(
        dedup,
        outputStructType=schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
