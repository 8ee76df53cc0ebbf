"""Checkpoint discipline for long iterative operators (PageRank,
neighborhood sampling, SPARQL property-path fixpoints).

`localCheckpoint` stores blocks in executor storage: fastest, and fine
at local[32] or for short chains — but on a real cluster an executor
loss DESTROYS the checkpointed blocks, and because a local checkpoint
also truncates lineage there is nothing to recompute from: a deep
PageRank or 15-round closure dies instead of recovering. `checkpoint()`
(reliable) writes the blocks to the configured checkpoint directory
(HDFS/object store on a cluster), so recovery re-reads durable files.

Callers pass `reliable=True` per call, or set it fleet-wide via the
CMW_RELIABLE_CHECKPOINTS env var (how you'd flip it for a 1000-executor
deployment without threading a flag through every operator). The plans
are identical either way — only the storage tier of the materialized
iteration state changes.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

#: fleet-wide default for reliable (checkpoint-dir) iteration state.
RELIABLE_CHECKPOINTS = os.environ.get("CMW_RELIABLE_CHECKPOINTS", "").lower() in (
    "1",
    "true",
    "yes",
)


def iter_checkpoint(df: DataFrame, reliable: bool | None = None) -> DataFrame:
    """Materialize one round of iteration state. `reliable=None` defers
    to the fleet-wide default (CMW_RELIABLE_CHECKPOINTS)."""
    if reliable is None:
        reliable = RELIABLE_CHECKPOINTS
    if not reliable:
        return df.localCheckpoint(eager=True)
    sc = df.sparkSession.sparkContext
    if sc._jsc.sc().getCheckpointDir().isEmpty():
        raise RuntimeError(
            "reliable=True needs a durable checkpoint dir: call "
            "spark.sparkContext.setCheckpointDir('hdfs://... or s3://...') first"
        )
    return df.checkpoint(eager=True)
