"""Streaming deduplication for continuous ingestion pipelines.

A 100 TB corpus is rarely loaded once — it streams in. These operators
are the streaming twins of operators/dedup.py's exact dedup, built on
Structured Streaming's native stateful operators (state lives in the
checkpointed state store, scales with executors, ages out by watermark —
no unbounded driver or executor memory):

  streaming_exact_dedup    keep the first document per normalized-text
                           fingerprint within the watermark horizon
                           (dropDuplicatesWithinWatermark: late
                           duplicates beyond the horizon age out of
                           state — the bounded-state contract a real
                           pipeline needs)
  streaming_seen_filter    stateful per-key first-seen gate via
                           applyInPandasWithState (Arrow-batched, one
                           boolean per key in the state store) — the
                           custom-stateful-operator seam for logic the
                           built-ins can't express (e.g. emit the first
                           K per key, count-based admission).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from cm_well_spark.operators.text import normalize_text


def streaming_exact_dedup(
    stream: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Exact dedup over a stream: one row per content fingerprint within
    the watermark horizon. State = fingerprint keys inside the horizon;
    duplicates later than the watermark are dropped by the engine, so
    state is bounded — the streaming analog of dedup.distinct_documents."""
    fp = F.md5(normalize_text(F.col(text_col)))
    return (
        stream.withColumn("__fp", fp)
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["__fp"])
        .drop("__fp")
    )


_SEEN_STATE = T.StructType([T.StructField("n", T.LongType())])


def streaming_seen_filter(
    stream: DataFrame,
    key_col: str,
    limit: int = 1,
    timeout: str = "NoTimeout",
) -> DataFrame:
    """Admit at most `limit` rows per key over the stream's lifetime —
    a custom stateful operator via applyInPandasWithState (the seam the
    built-in dropDuplicates family can't cover: count-based admission,
    first-K sampling per domain/source). State per key is ONE counter in
    the state store; batches arrive Arrow-encoded."""
    out_schema = T.StructType(
        [stream.schema[f] for f in stream.schema.fieldNames()]
    )

    def admit(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        (seen,) = state.get if state.exists else (0,)
        budget = limit - seen
        taken = 0
        for pdf in pdfs:
            if budget <= 0:
                break
            take = pdf.head(budget)
            budget -= len(take)
            taken += len(take)
            if len(take):
                yield take
        if taken:
            state.update((seen + taken,))

    return (
        stream.groupBy(key_col)
        .applyInPandasWithState(
            admit,
            outputStructType=out_schema,
            stateStructType=_SEEN_STATE,
            outputMode="append",
            timeoutConf=getattr(GroupStateTimeout, timeout),
        )
    )


def streaming_incremental_dedup(
    stream: DataFrame,
    seen_hashes: DataFrame,
    text_col: str = "text",
    hash_col: str = "h",
) -> DataFrame:
    """Streaming twin of dedup.incremental_dedup's exact stage: drop
    stream rows whose normalized-content md5 already exists in the
    STATIC seen-signature table (the ingested store's precomputed hash
    column). A stream-static left_anti join — the static side is planned
    per micro-batch, so re-materializing the signature table between
    batches is picked up automatically; no state store is used at all
    (the store IS the state). Compose with streaming_exact_dedup to also
    dedup the stream against itself within the watermark horizon."""
    fp = F.md5(normalize_text(F.col(text_col)))
    seen = seen_hashes.select(F.col(hash_col).alias("__seen_h")).distinct()
    return (
        stream.withColumn("__fp", fp)
        .join(seen, F.col("__fp") == F.col("__seen_h"), "left_anti")
        .drop("__fp")
    )
