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

# above this many distinct paths the isin literal stops being a sane
# pushdown predicate — and a forced broadcast of the affected-path set
# stops being safe (a backfill batch touching millions of paths would
# OOM the executors exactly like an unbounded broadcast dim). Both the
# write-side isin route and the read-side reconcile broadcasts use the
# same counted gate; above it we hand AQE a plain join.
_ISIN_PUSHDOWN_CAP = 100_000


def _gated_broadcast(affected: DataFrame, n_affected: int) -> DataFrame:
    """Broadcast the affected-path set only when it is provably bounded;
    otherwise return it un-hinted and let AQE pick the join strategy
    (sort-merge / shuffled-hash for a backfill-sized set)."""
    return F.broadcast(affected) if n_affected <= _ISIN_PUSHDOWN_CAP else affected


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
    # counted gate: the count is an O(delta) action; a normal-cadence
    # batch broadcasts, a millions-of-paths backfill falls through to AQE
    n_affected = affected.count()
    untouched = base.alias("__b").join(
        _gated_broadcast(affected.alias("__a"), n_affected),
        F.col("__b.path") == F.col("__a.__ap"),
        "left_anti",
    )
    touched = (
        base.alias("__b2")
        .join(
            _gated_broadcast(affected.alias("__a2"), n_affected),
            F.col("__b2.path") == F.col("__a2.__ap"),
            "left_semi",
        )
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
    n_affected = affected.count()
    untouched = base.alias("__t").join(
        _gated_broadcast(affected.alias("__a"), n_affected),
        F.col("__t.s") == F.col("__a.__ap"),
        "left_anti",
    )
    inf = reconciled_infotons(spark, out)
    touched_docs = inf.alias("__i").join(
        _gated_broadcast(affected.alias("__a2"), n_affected),
        F.col("__i.path") == F.col("__a2.__ap"),
        "left_semi",
    )
    return untouched.unionByName(triples_of(touched_docs).select(*base.columns))


_WATERMARK = "_WATERMARK.json"


def _read_watermark(out: str) -> int | None:
    p = os.path.join(out, _WATERMARK)
    if not os.path.exists(p):
        return None
    import json

    with open(p) as fh:
        return int(json.load(fh)["max_index_time"])


def _write_watermark(out: str, value: int) -> None:
    import json

    with open(os.path.join(out, _WATERMARK), "w") as fh:
        json.dump({"max_index_time": int(value)}, fh)


def write_batch(spark: SparkSession, out: str, commands: DataFrame) -> int:
    """Fold one command batch against the reconciled store and append
    the resulting NEW version rows as a delta. Returns the batch id.

    Write cost is O(batch), never O(store), by construction:
      - the index_time watermark comes from `_WATERMARK.json` (written
        here and by compact), not a max() scan of 8.9M+ rows — the
        aggregate runs once to seed a store that predates the file;
      - the affected-path set (batch-sized by definition) collects to
        the driver and pushes into the base read as an `isin` literal,
        so the parquet scan FILE-SKIPS on path min-max ranges (exactly
        what compaction's clustering buys) instead of scanning the
        store to feed a semi-join;
      - only merge_versions' affected-path output is decorated
        (decorate_versions — the same writer semantics as
        apply_commands) and appended; no untouched row is ever read,
        rewritten, or flag-flipped (read-side reconciliation recomputes
        `current`, compaction makes it durable)."""
    from cm_well_spark.operators.merge import decorate_versions, merge_versions

    inf = reconciled_infotons(spark, out)
    base_max = _read_watermark(out)
    if base_max is None:
        base_max = inf.agg(F.max("index_time").alias("m")).first()["m"] or 0
    batch_paths = [r["p"] for r in commands.select(F.col("path").alias("p")).distinct().collect()]
    base = inf
    if batch_paths and len(batch_paths) <= _ISIN_PUSHDOWN_CAP:
        # The between() envelope is the sargable half: parquet pushes
        # min/max range filters at ANY batch size, while an IN list
        # beyond spark.sql.parquet.pushdown.inFilterThreshold (~10)
        # silently stops pushing — measured 45s vs 5s per batch on the
        # compacted sf1 store. Envelope prunes row groups; the exact
        # isin then filters the residue rows.
        base = inf.where(
            F.col("path").between(min(batch_paths), max(batch_paths))
            & F.col("path").isin(batch_paths)
        )
    versions = merge_versions(base, commands)
    new_rows = decorate_versions(versions, base_max + 1)
    # writer's best-known `current`: the last version per path IN THIS
    # BATCH (an O(batch) window). Read-side reconciliation recomputes it
    # against the whole store anyway; carrying the flag keeps the delta
    # files directly usable as a change feed (qstream tails them).
    w = Window.partitionBy("path").orderBy(F.desc("index_time"))
    new_rows = new_rows.withColumn("current", F.row_number().over(w) == 1)
    n = len(_delta_batches(out, _INF_DELTA))
    target = os.path.join(out, _INF_DELTA, f"batch={n}")
    new_rows.write.mode("overwrite").parquet(target)
    written_max = (
        spark.read.parquet(target).agg(F.max("index_time").alias("m")).first()["m"]
    )
    _write_watermark(out, written_max if written_max is not None else base_max)
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
    # seed/refresh the write_batch watermark (maintenance-job cost: one
    # column scan of the fresh files)
    m = (
        spark.read.parquet(os.path.join(out, "infotons"))
        .agg(F.max("index_time").alias("m"))
        .first()["m"]
    )
    _write_watermark(out, m or 0)

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


def compact_deltas(spark: SparkSession, out: str) -> dict:
    """MINOR compaction: fold every pending delta batch into ONE batch —
    O(accumulated deltas), the base tables untouched. The maintenance
    move between major `compact` runs: merge-on-read cost grows with the
    delta FILE count (every reconciled read lists and unions all batch
    dirs), so a write-heavy window can cheaply re-bound read cost
    without paying the base rewrite. Same Hudi-minor/major split.

    Rows are preserved exactly (a qstream tail consumer sees the same
    change rows, renumbered into batch=0); the writer-side `current`
    hint is recomputed across the merged rows with the same window
    write_batch uses, so the combined batch keeps the
    one-current-per-path invariant within itself. The fold lands in a
    fresh directory and swaps in by atomic rename — readers see the old
    delta set or the new, never a mix.

    Returns {"folded_batches": n, "rows": n}."""
    batches = _delta_batches(out, _INF_DELTA)
    if len(batches) <= 1:
        return {"folded_batches": 0, "rows": 0}
    deltas = spark.read.parquet(*batches)
    w = Window.partitionBy("path").orderBy(F.desc("index_time"))
    merged = deltas.withColumn("current", F.row_number().over(w) == 1)
    n_rows = merged.count()
    tmp_root = os.path.join(out, f"{_INF_DELTA}__compacting")
    if os.path.exists(tmp_root):
        shutil.rmtree(tmp_root)
    merged.sortWithinPartitions("path", "index_time").write.mode("overwrite").parquet(
        os.path.join(tmp_root, "batch=0")
    )
    old_root = os.path.join(out, _INF_DELTA)
    retired = os.path.join(out, f"{_INF_DELTA}__old")
    if os.path.exists(retired):
        shutil.rmtree(retired)
    os.rename(old_root, retired)
    os.rename(tmp_root, old_root)
    shutil.rmtree(retired)
    return {"folded_batches": len(batches), "rows": int(n_rows)}
