"""Streaming sequence packing for continuous export pipelines.

The streaming twin of operators/packing.pack_concat_windows: documents
arrive as a stream, and each shard keeps ONE running token offset in the
state store (applyInPandasWithState) so window ids continue seamlessly
across micro-batches and restarts. With docs arriving in id order the
emitted spans are IDENTICAL to the batch packer's — the streaming/batch
parity contract, pinned by test.

State per shard = a single long; batches arrive Arrow-encoded; spans
per doc are O(doc_tokens / budget) so the emitter is output-bounded."""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from cm_well_spark.operators.text import whitespace_token_count

_PACK_STATE = T.StructType([T.StructField("off", T.LongType())])
_OUT = "doc_id long, shard int, window long, win_tokens int, start_off int"


def streaming_pack(
    stream: DataFrame,
    budget: int = 256,
    n_shards: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Assign context-window spans to streaming documents under
    concat-and-chunk packing. Token counts and shard routing happen as
    columnar expressions BEFORE the stateful step; the per-shard state
    is only the running offset."""
    if budget <= 0 or n_shards <= 0:
        raise ValueError("budget and n_shards must be positive")
    base = stream.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.pmod(F.col(id_col), F.lit(n_shards)).cast("int").alias("shard"),
        whitespace_token_count(F.col(text_col)).cast("long").alias("__tok"),
    )

    def pack(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        (off,) = state.get if state.exists else (0,)
        shard = int(key[0])
        out_rows = []
        for pdf in pdfs:
            pdf = pdf.sort_values("doc_id")
            for doc, tok in zip(pdf["doc_id"].tolist(), pdf["__tok"].tolist()):
                start, end = off, off + int(tok)
                for w in range(start // budget, (end - 1) // budget + 1):
                    out_rows.append(
                        (
                            int(doc),
                            shard,
                            w,
                            min(end, (w + 1) * budget) - max(start, w * budget),
                            max(start - w * budget, 0),
                        )
                    )
                off = end
        state.update((off,))
        if out_rows:
            yield pd.DataFrame(
                out_rows, columns=["doc_id", "shard", "window", "win_tokens", "start_off"]
            )

    return base.groupBy("shard").applyInPandasWithState(
        pack,
        outputStructType=_OUT,
        stateStructType=_PACK_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
