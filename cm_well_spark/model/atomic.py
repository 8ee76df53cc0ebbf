"""Atomic versioned parquet tables (ADVICE r1: write-tmp-then-overwrite
loses the table on a crash between the two writes, and concurrent readers
can observe a half-written directory).

Layout:  <root>/_VERSION   — text file naming the live version dir
         <root>/v<seq>_*/  — immutable version directories

Writers write a NEW version dir, then atomically repoint _VERSION
(os.replace of a one-line file). A crash at any point leaves the previous
version live. The current and immediately-previous versions are kept so a
reader that resolved the pointer just before a swap still sees its files;
older versions are GC'd. This is the classic snapshot-pointer scheme any
lakehouse table format uses — done here with plain files because the
contract (atomic swap + reader grace) is what matters, not the format.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession


def resolve_version(root: str) -> str | None:
    ptr = os.path.join(root, "_VERSION")
    if not os.path.exists(ptr):
        return None
    with open(ptr) as f:
        name = f.read().strip()
    return os.path.join(root, name) if name else None


def swap_version(root: str, name: str) -> None:
    """Point _VERSION at `name` atomically (temp file + rename)."""
    ptr = os.path.join(root, "_VERSION")
    tmp = ptr + ".tmp"
    with open(tmp, "w") as f:
        f.write(name)
    os.replace(tmp, ptr)


def next_version_name(root: str) -> str:
    live = resolve_version(root)
    if live is None:
        return "v1"
    seq = os.path.basename(live).split("_")[0].lstrip("v")
    try:
        return f"v{int(seq) + 1}"
    except ValueError:
        return "v1"


def write_versioned(root: str, tables: dict[str, DataFrame]) -> str:
    """Write `tables` (subdir name -> DataFrame) as a new version and swap
    the pointer. Returns the new version dir. Keeps current + previous."""
    os.makedirs(root, exist_ok=True)
    live = resolve_version(root)
    vname = next_version_name(root)
    vdir = os.path.join(root, vname)
    for sub, df in tables.items():
        df.write.mode("overwrite").parquet(os.path.join(vdir, sub))
    swap_version(root, vname)
    keep = {vname, os.path.basename(live) if live else vname}
    for d in os.listdir(root):
        if d.startswith("v") and d not in keep:
            shutil.rmtree(os.path.join(root, d), ignore_errors=True)
    return vdir


def read_versioned(spark: SparkSession, root: str, sub: str) -> DataFrame | None:
    live = resolve_version(root)
    if live is None:
        return None
    return spark.read.parquet(os.path.join(live, sub))
