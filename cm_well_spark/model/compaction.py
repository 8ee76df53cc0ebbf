"""Incremental write batches + compaction: the second half of the
ingest story.

The materializer (lakehouse.materialize) writes shuffle-free — local
sortWithinPartitions only, file-level clustering deliberately deferred
"to compaction, as on a real cluster". This module is that compaction,
plus the merge-on-read delta layer that makes incremental writes cheap
between compactions:

  - `write_batch` folds a command batch (W2/W3 merge semantics,
    operators/merge.py) against the reconciled store and APPENDS only
    the new version rows under `infotons_delta/batch=N/`. Nothing is
    rewritten and no EAV copy is persisted (the delta's triples are
    re-derived at read time from the batch-sized doc slice) — the write
    cost is proportional to the batch, exactly like the reference's
    imp/indexer appending to Cassandra + ES (ImpStream.scala:96-137,
    IndexerStream.scala).
  - `reconciled_infotons` / `reconciled_triples` give the merge-on-read
    view: base files' `current` flags may be stale for delta-affected
    paths (parquet is immutable — the reference instead flips
    `system.current` in ES in place, IndexerStream.scala:100-137), so
    the read recomputes `current` for the affected paths ONLY; the
    untouched bulk passes through a broadcast anti-join, shuffle-free.
    Affected-path sets are batch-sized, so the reconciliation overhead
    is bounded by write volume since the last compaction — the standard
    Hudi-MoR / Iceberg-equality-delete read shape.
  - `compact` folds the deltas into the base for good: ONE clustering
    shuffle (repartitionByRange) rewrites each table with globally
    disjoint file ranges — path-range files in the doc table, (p, o)
    ranges inside each predicate partition of the EAV table — restoring
    the min-max skipping the append-only phase eroded, bounds the file
    count, drops the delta dirs, and re-collects predicate_stats so the
    BGP reorderer plans against post-merge cardinalities.

At 100 TB: write_batch touches only batch-sized data; compact is the
scheduled maintenance job (per cold partition, off-peak) whose single
range shuffle is the clustering work ingest deferred. Readers never see
a half-compacted store: the fold is written to fresh directories and
swapped in with atomic renames.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cm_well_spark.model.lakehouse import collect_predicate_stats, triples_of

_INF_DELTA = "infotons_delta"
_TRI_DELTA = "triples_delta"


def _delta_batches(out: str, name: str) -> list[str]:
    d = os.path.join(out, name)
    if not os.path.isdir(d):
        return []
    return sorted(
        os.path.join(d, b) for b in os.listdir(d) if b.startswith("batch=")
    )


def _read_base_infotons(spark: SparkSession, out: str) -> DataFrame:
    return spark.read.parquet(os.path.join(out, "infotons"))


def reconciled_infotons(spark: SparkSession, out: str) -> DataFrame:
    """Merge-on-read doc table: base + all delta batches, `current`
    recomputed per path for delta-affected paths only (window over the
    affected slice; broadcast anti-join passes the untouched bulk
    through with zero shuffle)."""
    base = _read_base_infotons(spark, out)
    batches = _delta_batches(out, _INF_DELTA)
    if not batches:
        return base
    deltas = spark.read.parquet(*batches).select(*base.columns)
    affected = deltas.select(F.col("path").alias("__ap")).distinct()
    untouched = base.alias("__b").join(
        F.broadcast(affected.alias("__a")), F.col("__b.path") == F.col("__a.__ap"), "left_anti"
    )
    touched = (
        base.alias("__b2")
        .join(F.broadcast(affected.alias("__a2")), F.col("__b2.path") == F.col("__a2.__ap"), "left_semi")
        .unionByName(deltas)
    )
    w = Window.partitionBy("path").orderBy(F.desc("index_time"))
    touched = touched.withColumn("current", F.row_number().over(w) == 1)
    return untouched.unionByName(touched)


def reconciled_triples(spark: SparkSession, out: str) -> DataFrame:
    """Merge-on-read EAV table: base rows for untouched subjects (their
    flags are still true) + re-derived rows for delta-affected subjects
    (index_time/current changed, so their EAV rows are re-exploded from
    the reconciled doc slice — batch-sized work)."""
    base = spark.read.parquet(os.path.join(out, "triples"))
    batches = _delta_batches(out, _INF_DELTA)
    if not batches:
        return base
    deltas = spark.read.parquet(*batches)
    affected = deltas.select(F.col("path").alias("__ap")).distinct()
    untouched = base.alias("__t").join(
        F.broadcast(affected.alias("__a")), F.col("__t.s") == F.col("__a.__ap"), "left_anti"
    )
    inf = reconciled_infotons(spark, out)
    touched_docs = inf.alias("__i").join(
        F.broadcast(affected.alias("__a2")), F.col("__i.path") == F.col("__a2.__ap"), "left_semi"
    )
    return untouched.unionByName(triples_of(touched_docs).select(*base.columns))


def write_batch(spark: SparkSession, out: str, commands: DataFrame) -> int:
    """Fold one command batch against the reconciled store and append
    the resulting NEW version rows as a delta. Returns the batch id.

    Only merge_versions' output (rows for affected paths) is written —
    write cost is O(batch), never O(store). The rows carry the writer's
    best-known `current` flag (true for the last version per path in
    this batch); the read-side reconciliation recomputes it anyway, and
    compaction makes it durable."""
    from cm_well_spark.operators.merge import apply_commands

    inf = reconciled_infotons(spark, out)
    updated = apply_commands(inf, commands)
    affected = commands.select(F.col("path").alias("__ap")).distinct()
    base_max = inf.agg(F.max("index_time").alias("m")).first()["m"] or 0
    new_rows = (
        updated.alias("__u")
        .join(F.broadcast(affected.alias("__a")), F.col("__u.path") == F.col("__a.__ap"), "left_semi")
        .where(F.col("index_time") > F.lit(base_max))
    )
    n = len(_delta_batches(out, _INF_DELTA))
    new_rows.write.mode("overwrite").parquet(
        os.path.join(out, _INF_DELTA, f"batch={n}")
    )
    return n


def compact(
    spark: SparkSession,
    out: str,
    target_rows_per_file: int = 4_000_000,
) -> dict:
    """Fold deltas into the base and restore scan-optimal layout.

    The ONE range shuffle per table is the clustering work ingest
    deferred: repartitionByRange gives tasks disjoint key ranges, so the
    written files' parquet min-max footers are globally disjoint —
    read_point / path-prefix scans and bound-predicate (p, o) scans
    prune at the FILE level again, however many incremental batches
    accumulated. File count is bounded by target_rows_per_file. The fold
    lands in fresh directories and swaps in by atomic rename, so
    concurrent readers see either the old store or the new, never a mix.

    Returns {"infoton_files": n, "triple_files": n, "folded_batches": n}.
    """
    batches = _delta_batches(out, _INF_DELTA)
    inf = reconciled_infotons(spark, out)
    tri = reconciled_triples(spark, out)

    n_inf = max(1, int((inf.count() + target_rows_per_file - 1) // target_rows_per_file))
    n_tri = max(1, int((tri.count() + target_rows_per_file - 1) // target_rows_per_file))

    inf_tmp = os.path.join(out, "infotons__compacting")
    tri_tmp = os.path.join(out, "triples__compacting")
    (
        inf.repartitionByRange(n_inf, "path", "index_time")
        .sortWithinPartitions("path", "index_time")
        .write.mode("overwrite")
        .partitionBy("kind")
        .parquet(inf_tmp)
    )
    (
        tri.repartitionByRange(n_tri, "p", "o", "s")
        .sortWithinPartitions("p", "o", "s")
        .write.mode("overwrite")
        .partitionBy("p")
        .parquet(tri_tmp)
    )
    for name, tmp in (("infotons", inf_tmp), ("triples", tri_tmp)):
        final = os.path.join(out, name)
        old = os.path.join(out, f"{name}__old")
        if os.path.exists(old):
            shutil.rmtree(old)
        os.rename(final, old)
        os.rename(tmp, final)
        shutil.rmtree(old)
    for name in (_INF_DELTA, _TRI_DELTA):
        d = os.path.join(out, name)
        if os.path.isdir(d):
            shutil.rmtree(d)
    collect_predicate_stats(spark, out)

    def _n_files(table: str) -> int:
        total = 0
        for root, _dirs, files in os.walk(os.path.join(out, table)):
            total += sum(1 for f in files if f.endswith(".parquet"))
        return total

    return {
        "infoton_files": _n_files("infotons"),
        "triple_files": _n_files("triples"),
        "folded_batches": len(batches),
    }
