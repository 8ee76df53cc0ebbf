"""JSONL source/sink: explicit-schema read, corrupt handling, roundtrip."""

import json
import os

import pytest

from cm_well_spark.sources.jsonl import (
    DOCUMENTS_SCHEMA,
    read_jsonl_documents,
    write_jsonl_documents,
)

TMP = "/tmp/cmw_jsonl_tests"


@pytest.fixture()
def shard(tmp_path):
    p = tmp_path / "docs.jsonl"
    rows = [
        {"doc_id": 1, "text": "line one\nline two", "lang": "en", "source": "s", "n_chars": 17},
        {"doc_id": 2, "text": 'quote " and unicode é', "lang": "fr", "source": "s", "n_chars": 20},
    ]
    with open(p, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
        f.write("{not valid json\n")
    return str(p)


def test_read_drops_corrupt_by_default(spark, shard):
    got = {r["doc_id"]: r for r in read_jsonl_documents(spark, shard).collect()}
    assert set(got) == {1, 2}
    assert got[1]["text"] == "line one\nline two"
    assert got[2]["text"] == 'quote " and unicode é'


def test_read_keeps_corrupt_when_asked(spark, shard):
    df = read_jsonl_documents(spark, shard, drop_corrupt=False)
    bad = df.where(df["_corrupt_record"].isNotNull()).collect()
    assert len(bad) == 1 and bad[0]["_corrupt_record"].startswith("{not valid")


def test_roundtrip_lossless_and_sharded(spark, tmp_path):
    rows = [(i, f"text {i}\twith tab", "en", "src", 14) for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string, n_chars long")
    out = str(tmp_path / "out")
    write_jsonl_documents(df, out, shards=3)
    parts = [f for f in os.listdir(out) if f.startswith("part-")]
    assert len(parts) == 3
    back = read_jsonl_documents(spark, out)
    assert sorted((r["doc_id"], r["text"]) for r in back.collect()) == sorted(
        (r[0], r[1]) for r in rows
    )


def test_explicit_schema_never_infers(spark, shard):
    # schema fields present even when the shard omits columns entirely
    df = read_jsonl_documents(spark, shard)
    assert [f.name for f in df.schema.fields] == [
        f.name for f in DOCUMENTS_SCHEMA.fields if f.name != "_corrupt_record"
    ]
