"""JSONL (newline-delimited JSON) document corpus source/sink.

The reference ingests RDF documents (S6, sources/rdf.py); training-data
pipelines overwhelmingly move documents as JSONL shards (Common Crawl
derivatives, HF datasets, internal dumps). This is the thin, contract-
heavy wrapper that makes that path first-class:

  - EXPLICIT schema, never inference: spark.read.json without a schema
    runs a full inference scan over 100 TB before the first real job,
    and silently widens/narrows types per shard. Callers pass (or get)
    the documents schema and malformed lines land in a corrupt-record
    column instead of poisoning types.
  - One file = one split for typical shard sizes; Spark parallelizes
    across shards, so ingest scales with shard count — write side
    repartitions to a target shard count for the same reason.
  - Round-trip fidelity is oracle-checked (source_jsonl_roundtrip):
    write-then-read hash-matches the original table, newlines, quotes
    and unicode included — JSON escaping, not luck.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

#: the documents-table schema (TESTDATA.md); the default contract for
#: corpus JSONL shards. `_corrupt_record` collects malformed lines.
DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
        T.StructField("_corrupt_record", T.StringType()),
    ]
)


def read_jsonl_documents(
    spark: SparkSession,
    path: str,
    schema: T.StructType = DOCUMENTS_SCHEMA,
    drop_corrupt: bool = True,
) -> DataFrame:
    """Read JSONL document shards with the EXPLICIT schema (PERMISSIVE
    mode: malformed lines fill `_corrupt_record` instead of failing the
    shard or re-typing columns). `drop_corrupt=True` filters them and
    drops the marker column — pass False to route them to a quarantine
    sink instead."""
    df = spark.read.schema(schema).option("mode", "PERMISSIVE").json(path)
    if drop_corrupt and "_corrupt_record" in df.columns:
        df = df.where(df["_corrupt_record"].isNull()).drop("_corrupt_record")
    return df


def write_jsonl_documents(
    df: DataFrame, path: str, shards: int | None = None
) -> None:
    """Write a corpus as JSONL shards (overwrite). `shards` repartitions
    to a target shard count first — downstream read parallelism equals
    shard count, so size shards to the consumer, not the producer's
    partitioning."""
    out = df.repartition(shards) if shards else df
    out.write.mode("overwrite").json(path)
