"""Versioned merge writer — the write-path operator (W1-W4, SURVEY.md §2.8).

Re-implements the reference's pure merge logic (cmwell-bg Merger.scala:55-239)
as a batch/micro-batch fold over commands grouped by path:

  write    field-UNION with the previous version (merge_f:55-75); a write
           on top of a DeletedInfoton resurrects (write_merge:180).
  update   delete-then-add in one version (update_f:121-127); if nothing
           remains -> DeletedInfoton tombstone (update_merge:147).
  delete_attributes
           value/field/quad-precise deletes (delete_f:77-119):
             {field: []}                      -> wipe the whole field
             {field: [(value,quad)]}          -> that value; quad None
                                                 matches untagged, '*' any
             {field: [(None, quad)]}          -> every value tagged quad
             {'*':   [(None, quad-or-'*')]}   -> wildcard across all fields
           empty result -> DeletedInfoton (delete_merge:133-137).
  delete_path
           tombstone; delete-on-delete is a no-op (delete_merge:141).

Execution: `apply_commands` cogroups (current-version rows, commands) by
path with applyInPandas — Arrow-batched, distributed, and only the CHANGED
paths flow through Python; the rest of the table is untouched until the
final current-flag flip (the Spark analog of ImpStream's
group-commands-by-path micro-batching, ImpStream.scala:96-99). The new
version's uuid recomputes with the same content-hash recipe as ingest
(Infoton.scala:139-168 shape); index_time is assigned by the writer like
the reference assigns it at index time (SURVEY §3.4).
"""

from __future__ import annotations

import hashlib
from datetime import datetime

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cm_well_spark.model.schema import FIELD_VALUE_TYPE

# ---------------------------------------------------------------------------
# pure merge logic (python dicts: fields = {name: [fv dict]})
# fv dict keys: value, vtype, lang, quad, num, ts, bool  (value None = FNull)
# ---------------------------------------------------------------------------


def merge_fields(prev: dict | None, curr: dict | None) -> dict:
    """Field-union (merge_f): per-field set union of values."""
    prev = prev or {}
    curr = curr or {}
    out: dict = {}
    for k in set(prev) | set(curr):
        seen, vals = set(), []
        for fv in list(prev.get(k, [])) + list(curr.get(k, [])):
            key = (fv.get("value"), fv.get("quad"), fv.get("lang"))
            if key not in seen:
                seen.add(key)
                vals.append(fv)
        if vals:
            out[k] = vals
    return out


def delete_fields_f(curr: dict | None, deletes: dict) -> dict:
    """Value/field/quad-precise delete (delete_f)."""
    curr = dict(curr or {})
    star = deletes.get("*")
    asterix = star is not None
    star_quads = {fv.get("quad") for fv in (star or []) if fv.get("value") is None}
    star_all = "*" in star_quads

    def quad_matches_star(q):
        return asterix and (star_all or q in star_quads)

    named = {k: v for k, v in deletes.items() if k != "*"}
    out: dict = {}
    for k, vs in curr.items():
        if k in named or asterix:
            spec = named.get(k)
            if spec is not None and len(spec) == 0:
                continue  # field wipe
            kept = []
            for fv in vs:
                dead = quad_matches_star(fv.get("quad"))
                for d in spec or []:
                    if dead:
                        break
                    dv, dq = d.get("value"), d.get("quad")
                    if dv is None:  # FNull: quad-targeted delete within field
                        dead = dq == "*" or fv.get("quad") == dq
                    elif dv == fv.get("value"):
                        if dq is None:
                            dead = fv.get("quad") is None
                        elif dq == "*":
                            dead = True
                        else:
                            dead = fv.get("quad") == dq
                if not dead:
                    kept.append(fv)
            if kept:
                out[k] = kept
        else:
            out[k] = vs
    return out


def apply_command(state: tuple[str, dict], cmd: dict) -> tuple[str, dict]:
    """Fold one command into (kind, fields) state. kind 'missing' means no
    previous version exists."""
    kind, fields = state
    op = cmd["op"]
    if op == "delete_path":
        return ("DeletedInfoton", {})
    if op == "delete_attributes":
        if kind == "DeletedInfoton":
            return (kind, fields)  # delete-on-delete no-op
        nf = delete_fields_f(fields, cmd.get("delete_fields") or {})
        return (("ObjectInfoton", nf) if nf else ("DeletedInfoton", {}))
    if op == "update":
        if kind == "DeletedInfoton" or kind == "missing":
            nf = merge_fields(None, cmd.get("fields") or {})
        else:
            after_del = delete_fields_f(fields, cmd.get("delete_fields") or {})
            nf = merge_fields(after_del, cmd.get("fields") or {})
        return (("ObjectInfoton", nf) if nf else ("DeletedInfoton", {}))
    if op == "write":
        if kind in ("DeletedInfoton", "missing"):
            return ("ObjectInfoton", merge_fields(None, cmd.get("fields") or {}))
        return ("ObjectInfoton", merge_fields(fields, cmd.get("fields") or {}))
    raise ValueError(f"unknown command op {op!r}")


def content_uuid(path: str, last_modified: datetime, fields: dict) -> str:
    """Same canonical recipe as the ingest builder (model/builder.py) so
    batch-built and merge-written versions hash identically."""
    canon = ";".join(
        sorted(
            f"{k}:" + "|".join(sorted(str(fv.get("value")) for fv in vs))
            for k, vs in fields.items()
            if vs
        )
    )
    lm = last_modified.strftime("%Y-%m-%dT%H:%M:%SZ")
    return hashlib.md5(f"{path}\n{lm}\n{canon}".encode()).hexdigest()


# ---------------------------------------------------------------------------
# Spark surface
# ---------------------------------------------------------------------------

COMMAND_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType(), False),
        T.StructField("seq", T.LongType(), False),  # per-path ordering
        T.StructField("op", T.StringType(), False),
        T.StructField("fields", T.MapType(T.StringType(), T.ArrayType(FIELD_VALUE_TYPE))),
        T.StructField("delete_fields", T.MapType(T.StringType(), T.ArrayType(FIELD_VALUE_TYPE))),
        T.StructField("last_modified", T.TimestampType()),
        T.StructField("protocol", T.StringType()),
    ]
)

_VERSION_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("uuid", T.StringType()),
        T.StructField("kind", T.StringType()),
        T.StructField("last_modified", T.TimestampType()),
        T.StructField("fields", T.MapType(T.StringType(), T.ArrayType(FIELD_VALUE_TYPE))),
        T.StructField("protocol", T.StringType()),
        T.StructField("seq", T.LongType()),
    ]
)


def _fields_sig(fields: dict) -> frozenset:
    return frozenset(
        (k, frozenset((v.get("value"), v.get("quad"), v.get("lang")) for v in vs)) for k, vs in fields.items()
    )


def _fields_to_py(m) -> dict:
    if m is None:
        return {}
    out = {}
    for k, vs in (m.items() if isinstance(m, dict) else m):
        # `vs` may be a list OR a numpy array (Arrow hands map values as
        # ndarrays depending on the parquet writer) — `vs or []` raises
        # on an ndarray, so test None explicitly
        vals = [] if vs is None else vs
        out[k] = [v.asDict() if hasattr(v, "asDict") else dict(v) for v in vals]
    return out


def _merge_group(base_pdf: pd.DataFrame, cmd_pdf: pd.DataFrame) -> pd.DataFrame:
    """Cogrouped fold: current version (0/1 rows) + ordered commands ->
    one output row per command (the version it produced)."""
    if len(cmd_pdf) == 0:
        return pd.DataFrame(columns=[f.name for f in _VERSION_SCHEMA.fields])
    path = cmd_pdf["path"].iloc[0]
    if len(base_pdf):
        b = base_pdf.iloc[0]
        state = (b["kind"], _fields_to_py(b["fields"]))
        protocol = b.get("protocol", "https")
    else:
        state = ("missing", {})
        protocol = "https"
    rows = []
    prev_sig = (state[0], _fields_sig(state[1])) if state[0] != "missing" else None
    for _, cmd in cmd_pdf.sort_values("seq").iterrows():
        c = {
            "op": cmd["op"],
            "fields": _fields_to_py(cmd["fields"]),
            "delete_fields": _fields_to_py(cmd["delete_fields"]),
        }
        state = apply_command(state, c)
        # null-update detection: identical merged content produces NO new
        # version (the reference's merger skips no-op merges)
        sig = (state[0], _fields_sig(state[1]))
        if sig == prev_sig:
            continue
        prev_sig = sig
        lm = cmd["last_modified"].to_pydatetime() if hasattr(cmd["last_modified"], "to_pydatetime") else cmd["last_modified"]
        rows.append(
            {
                "path": path,
                "uuid": content_uuid(path, lm, state[1]),
                "kind": state[0],
                "last_modified": lm,
                "fields": state[1] or None,
                "protocol": cmd["protocol"] or protocol,
                "seq": int(cmd["seq"]),
            }
        )
    return pd.DataFrame(rows)


# Cap for routing the write plan through literal isin predicates. r12
# (ADVICE r11 item 5): the apply_commands plan embeds the list at THREE
# sites, and the py4j + analyzer cost of the In expressions grows
# superlinearly — measured at sf0.1 (3 reps, build = plan construction,
# exec = .count of the rewritten 986k-row table):
#   batch      isin build / exec      join build / exec
#   4          0.62 / 0.99            0.51 / 0.71
#   100        0.51 / 1.46            0.43 / 1.96
#   500        3.17 / 5.70            1.34 / 6.38
#   1,000      1.25 / 6.08            0.39 / 6.36
#   10,000     9.9-28.8 / ~40         0.5 / ~40
#   95,000     101-120 / 66-81        0.5-0.6 / 45-102
# The isin route's storage-pruning edge only survives below a few
# hundred scattered paths; past ~500 the exec advantage is gone and the
# driver cost explodes. 256 keeps the measured-win region; bigger
# batches fall back to the broadcast semi/anti joins (AQE-sized, no
# driver literals). model/compaction keeps its own 100k gate: its isin
# is one site behind a sargable between() envelope, a different curve.
_ISIN_PUSHDOWN_CAP = 256


def _bounded_command_paths(commands: DataFrame) -> list[str] | None:
    """Distinct command paths as driver literals when bounded by the cap
    (one narrow limit-capped job over the command batch); None above it.

    A literal path set turns every affected-path join in the write plan
    into an isin predicate that reaches the STORAGE layer — parquet
    row-group min/max or in-memory batch pruning on the path-sorted store
    — instead of a runtime semi/anti join that must deserialize the wide
    fields column of every row before filtering (measured 4x on the
    current-flip plan at sf0.1: the cogroup base side scanned all 891k
    cached rows' maps to keep 4 paths)."""
    # distinct-then-limit measured FASTER than the exchange-free plain
    # limit (A/B min-of-4: build 0.90 s vs 1.46 s): collect on a bare
    # limit goes through executeTake's incremental partition escalation —
    # several serial mini-jobs — while the distinct's single shuffle is
    # one round trip. Keep the distinct.
    rows = commands.select("path").distinct().limit(_ISIN_PUSHDOWN_CAP + 1).collect()
    if len(rows) > _ISIN_PUSHDOWN_CAP:
        return None
    return [r["path"] for r in rows]


def merge_versions(
    infotons: DataFrame,
    commands: DataFrame,
    affected_paths: list[str] | None = None,
) -> DataFrame:
    """Fold commands into new version rows (one per command), distributed
    per-path via cogrouped applyInPandas. Only affected paths are read.
    `affected_paths` (optional, from _bounded_command_paths) routes the
    base read through an isin literal instead of a runtime semi join."""
    if affected_paths is not None:
        base = infotons.where(
            F.col("current")
            & (F.col("path").isin(affected_paths) if affected_paths else F.lit(False))
        ).select("path", "kind", "fields", "protocol")
    else:
        # alias both sides: commands may derive from this very table (e.g.
        # recursive delete), which otherwise trips the ambiguous-self-join
        # check
        affected = commands.select(F.col("path").alias("__ap")).distinct().alias("__aff")
        base = (
            infotons.alias("__base")
            .where(F.col("current"))
            .join(F.broadcast(affected), F.col("__base.path") == F.col("__aff.__ap"), "left_semi")
            .select("path", "kind", "fields", "protocol")
        )
    return (
        base.groupBy("path")
        .cogroup(commands.groupBy("path"))
        .applyInPandas(_merge_group, schema=_VERSION_SCHEMA)
    )


def decorate_versions(versions: DataFrame, index_time_base: int | Column) -> DataFrame:
    """Turn merge_versions output into full infoton rows: writer-assigned
    index_time (per-path row_number over base — monotone batch semantics,
    scale-safe: no global sort), parent/hierarchy derivation, writer
    constants. Shared by apply_commands (in-memory full-table update) and
    the lakehouse delta writer (model/compaction.write_batch), so the two
    write paths can never drift. `current` is left False — the caller
    flips it (window for the full table, or read-side reconciliation for
    deltas)."""
    from pyspark.sql import Window

    w_seq = F.row_number().over(Window.partitionBy("path").orderBy("seq"))
    base = index_time_base if isinstance(index_time_base, Column) else F.lit(index_time_base)
    return (
        versions.withColumn("index_time", base + w_seq - 1)
        .withColumn("parent", F.when(F.regexp_replace("path", "/[^/]+$", "") == "", "/").otherwise(F.regexp_replace("path", "/[^/]+$", "")))
        .withColumn(
            "parent_hierarchy",
            F.concat(
                F.array(F.lit("/")),
                # guard: sequence(1, 0) runs DESCENDING in Spark, so a
                # 2-segment path ("/x") would list ITSELF as an ancestor
                F.when(
                    F.size(F.split(F.col("path"), "/")) >= 3,
                    F.filter(
                        F.transform(
                            F.sequence(F.lit(1), F.size(F.split(F.col("path"), "/")) - F.lit(2)),
                            lambda i: F.concat_ws("/", F.slice(F.split(F.col("path"), "/"), 1, i + 1)),
                        ),
                        lambda p: p != "",
                    ),
                ).otherwise(F.array().cast("array<string>")),
            ),
        )
        .withColumn("last_modified_by", F.lit("merge-writer"))
        .withColumn("dc", F.lit("local"))
        .withColumn("current", F.lit(False))
        .withColumn("mime_type", F.lit(None).cast("string"))
        .withColumn("data", F.lit(None).cast("binary"))
        .withColumn("data_pointer", F.lit(None).cast("string"))
        .withColumn("link_to", F.lit(None).cast("string"))
        .withColumn("link_kind", F.lit(None).cast("int"))
        .drop("seq")
    )


def apply_commands(infotons: DataFrame, commands: DataFrame, index_time_base: int | None = None) -> DataFrame:
    """Full write-path batch: returns the UPDATED infoton table (old
    versions kept with current=False, new versions appended; only the last
    version per path is current — W3+W4 'current flip' in one plan).

    index_time: writer-assigned, monotonically after the table's max
    (the reference assigns indexTime at index time, SURVEY §3.4)."""
    cmd_paths = _bounded_command_paths(commands)
    versions = merge_versions(infotons, commands, affected_paths=cmd_paths)
    if index_time_base is None:
        # The table max rides the plan as a broadcast 1-row cross join
        # instead of a serial .first() probe job at CONSTRUCTION (r11,
        # guide §5 driver latency): same exact base — max(index_time)+1 —
        # but computed inside the caller's own action, in parallel with
        # everything else. BroadcastNestedLoopJoin of a 1-row build side
        # costs nothing.
        mx = infotons.agg(
            (F.coalesce(F.max("index_time"), F.lit(0)) + 1).alias("__itb")
        )
        versions = versions.crossJoin(F.broadcast(mx))
        index_time_base = F.col("__itb")
    # Writer-assigned index_time semantics live in decorate_versions
    # (per-path row_number — monotone batch, no global sort; cross-path
    # collisions allowed exactly like the reference's parallel indexers,
    # ImpStream.scala:96-137).
    new_rows = decorate_versions(versions, index_time_base)
    if "__itb" in new_rows.columns:
        new_rows = new_rows.drop("__itb")
    from pyspark.sql import Window

    # Affected paths come from COMMANDS, not from the merged versions:
    # merge_versions' cogroup keys are a subset of the command paths, so
    # this is the same path set for routing purposes — but deriving it
    # from `versions` made the Python cogroup subtree appear THREE times
    # in the physical plan (anti-join build, semi-join build, new_rows),
    # re-running the whole merge per reference. Commands-derived routing
    # keeps the cogroup at exactly one evaluation. A no-op command's path
    # now routes through the current-flip window instead of the untouched
    # branch; the window recomputes the identical flag (one current =
    # latest index_time), so the output is row-identical.
    # Only affected paths pay the current-flip window; the untouched bulk of
    # the table passes through untouched. With a bounded command batch the
    # split is two isin predicates that prune at the storage layer (the
    # null-keep arm makes ~isin exactly anti-join-equivalent); an unbounded
    # batch falls back to broadcast anti/semi joins.
    if cmd_paths is not None:
        hit = F.col("path").isin(cmd_paths) if cmd_paths else F.lit(False)
        untouched = infotons.where(~hit | F.col("path").isNull())
        touched_old = infotons.where(hit)
    else:
        affected = commands.select(F.col("path").alias("__ap")).distinct()
        untouched = infotons.alias("__t").join(
            F.broadcast(affected.alias("__a1")), F.col("__t.path") == F.col("__a1.__ap"), "left_anti"
        )
        touched_old = infotons.alias("__t2").join(
            F.broadcast(affected.alias("__a2")), F.col("__t2.path") == F.col("__a2.__ap"), "left_semi"
        )
    touched = touched_old.unionByName(new_rows.select(*infotons.columns))
    w = Window.partitionBy("path").orderBy(F.desc("index_time"))
    # current marks the latest version per path — tombstones included; the
    # search visibility filter excludes DeletedInfoton separately
    # (FTSService.scala:850-854).
    touched = touched.withColumn("current", F.row_number().over(w) == 1)
    return untouched.unionByName(touched)
