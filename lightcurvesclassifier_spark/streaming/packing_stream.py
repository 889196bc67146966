"""Streaming sequence packing: ingest-time token-offset assignment.

Batch ``operators/corpus.pack_sequences`` assigns every document its
offset in a per-shard token stream with a running-sum window. At ingest
time the same decision must be made incrementally — a document's offset
depends on every document that entered its shard before it. This
operator keeps ONE scalar per shard (the running token count) in
``applyInPandasWithState`` and emits batch-identical packing rows as
documents arrive.

Parity contract: offsets equal the batch operator's exactly when
documents arrive in ``doc_id`` order within each shard (append-ordered
ingest logs — the normal case). Out-of-order arrival still packs
contiguously (no gaps, no overlaps) but in arrival order; the test
pins the in-order case against the batch plan.

100 TB story: state is one long per shard (shards ~ thousands), sharded
by group key across executors with checkpointed fault tolerance; each
micro-batch does a per-shard cumulative sum over its own rows only.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "tok long"
OUTPUT_SCHEMA = (
    "doc_id long, shard long, n_tokens long, start_tok long, "
    "first_chunk long, last_chunk long"
)


def _make_update(seq_len: int):
    def _update(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        shard = int(key[0])
        tok = int(state.get[0]) if state.exists else 0
        rows = pd.concat(list(pdfs))
        # within a micro-batch, pack in doc_id order (the batch
        # operator's per-shard total order)
        rows = rows.sort_values("doc_id").reset_index(drop=True)
        # whitespace token count; split('') -> [''] matches F.split
        n = rows["text"].str.split(" ").str.len().astype("int64")
        ends = n.cumsum()
        starts = tok + ends - n
        out = pd.DataFrame(
            {
                "doc_id": rows["doc_id"].astype("int64"),
                "shard": shard,
                "n_tokens": n,
                "start_tok": starts,
                "first_chunk": starts // seq_len,
                "last_chunk": (starts + n - 1) // seq_len,
            }
        )
        state.update((tok + int(n.sum()),))
        yield out

    return _update


def packing_stream(
    stream_df: DataFrame, seq_len: int = 512, n_shards: int = 8
) -> DataFrame:
    """Incremental GPT-style packing over a document stream with columns
    (doc_id, text). Mirrors ``corpus.pack_sequences`` (same shard rule
    ``doc_id % n_shards``, same chunk arithmetic)."""
    from pyspark.sql import functions as F

    # Poison-pill guard: a single malformed ingest line (PERMISSIVE-mode
    # all-null row) would otherwise reach the stateful function as
    # key=(None,) / text=None, raise inside _update, and kill the query
    # PERMANENTLY — the checkpoint replays the same file on every
    # restart. Null rows carry no packable tokens; drop them up front.
    clean = stream_df.filter(
        F.col("doc_id").isNotNull() & F.col("text").isNotNull()
    )
    sharded = clean.withColumn(
        "shard", (F.col("doc_id") % n_shards).cast("long")
    )
    return sharded.groupBy("shard").applyInPandasWithState(
        _make_update(seq_len),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
