"""Streaming semantic-dedup gate: `incremental_semdedup` as a
Structured Streaming sink (engine extension; the reference is
batch-only — SURVEY.md §2.10 — and its ingest tail is cron-shaped; a
continuous embedding feed needs the SAME daily-gate economics per
micro-batch).

``semdedup_gate_writer`` returns a ``foreachBatch`` function that, per
micro-batch: admits the batch against the persisted cell index
(functions/vectors.py:incremental_semdedup — chunked GEMM admit,
nprobe, SQ8 all apply unchanged), anti-joins the duplicate pairs off
(incremental_semdedup_keep), lands the survivors under a
batch-deterministic path, and appends them to the index under the
write-ahead ledger.

Exactly-once: Structured Streaming may REPLAY a micro-batch after a
failure (same ``batch_id``). Every side effect here is keyed on that
id — the survivors land at ``out_dir/gate_batch=<id>`` with
``mode=overwrite`` (the standard idempotent-foreachBatch pattern), and
the index append passes ``batch_id='stream-<id>'`` into the meta
ledger, so a replay overwrites the same files and no-ops the append
instead of double-placing vectors. Replaying an ALREADY-APPENDED batch
also re-admits it against an index that now CONTAINS it — every batch
vector would pair with its own indexed copy and the survivor set would
collapse to empty, clobbering the good output. The writer therefore
consults the ledger FIRST and skips the whole batch when its id is
already committed (the crash-between-write-and-ledger case replays
correctly: files are overwritten, the pending marker is swept).

Concurrency contract: ONE streaming query per index_dir (micro-batches
within a query are already serial). The index meta ledger is
single-writer — see functions/vectors.py:semdedup_index_append.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame


def semdedup_gate_writer(
    index_dir: str,
    out_dir: str,
    *,
    threshold: float = 0.95,
    engine: str = "gemm",
    append: bool = True,
    nprobe: int = 1,
    batch_id_prefix: str = "stream",
    **admit_kwargs,
) -> Callable[[DataFrame, int], None]:
    """Build the ``foreachBatch`` callable for
    ``stream.writeStream.foreachBatch(...)``. The batch frame must
    carry the index's id/vector columns (meta ``id_col``/``vec_col``,
    same contract as the batch admit). ``admit_kwargs`` pass through
    to :func:`~siskin_spark.functions.vectors.incremental_semdedup`
    (``batch_chunk_rows``, ``batch_budget_bytes``,
    ``max_batch_cell_rows``, ...).

    Scale: each micro-batch costs one batch-sized GEMM assignment +
    co-cell compares — the index never reshuffles, the driver/broadcast
    bound stays the admit CHUNK, and the survivors parquet write is
    partition-parallel. Backlog catch-up (``availableNow`` over a
    directory feed) and live tailing run the identical code path.
    """
    from siskin_spark.functions.vectors import (
        _sem_meta_read,
        incremental_semdedup,
        incremental_semdedup_keep,
        semdedup_index_append,
    )

    def gate(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        meta = _sem_meta_read(index_dir)
        id_col = meta.get("id_col", "vec_id")
        ledger_id = f"{batch_id_prefix}-{int(batch_id)}"
        if append and ledger_id in meta.get("appended", []):
            # replay of a COMMITTED batch: survivors are already on
            # disk and in the index; re-admitting would self-pair
            return
        if append and ledger_id in meta.get("pending", []):
            # replay of a CRASHED append (files may be half-placed):
            # sweep this batch's prefix-named cell files BEFORE the
            # admit, or the batch's own vectors sit in the index and
            # every survivor pairs with its indexed self, collapsing
            # the replayed survivor set to empty. Same sweep the
            # append retry runs (operators/layout.py:staged_append) —
            # done here too because the gate ADMITS before it appends.
            # The stale histogram is recounted by the append below.
            import re
            import shutil

            tag = re.sub(r"[^A-Za-z0-9._-]", "_", ledger_id)
            cells_dir = os.path.join(index_dir, "cells")
            for f in os.listdir(cells_dir):
                if f.startswith(f"batch-{tag}-"):
                    os.remove(os.path.join(cells_dir, f))
            shutil.rmtree(
                os.path.join(index_dir, f"_append_{tag}"), ignore_errors=True
            )
        pairs = incremental_semdedup(
            spark,
            batch,
            index_dir,
            threshold=threshold,
            engine=engine,
            nprobe=nprobe,
            **admit_kwargs,
        )
        kept = incremental_semdedup_keep(batch, pairs, id_col=id_col)
        # batch-deterministic landing: a replay overwrites, never dups
        kept.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"gate_batch={int(batch_id)}")
        )
        if append:
            survivors = spark.read.parquet(
                os.path.join(out_dir, f"gate_batch={int(batch_id)}")
            )
            semdedup_index_append(survivors, index_dir, batch_id=ledger_id)

    return gate
