import pytest
from pyspark.sql import functions as F

from cm_well_spark.operators.consume import (
    ConsumeState,
    bulk_consume,
    consume,
    create_consumer,
    create_iterator,
    decode_token,
    drain,
    encode_token,
    next_chunk,
    stream,
)

NOW = 1_800_000_000_000  # far beyond all synthetic index_times


def test_token_roundtrip():
    st = ConsumeState(123456, qp="rdfType::Customer", path="/tpch", descendants=True, history=False)
    assert decode_token(encode_token(st)) == st


def test_token_empty_rejected():
    with pytest.raises(ValueError, match="position cannot be empty"):
        decode_token("")


def test_consume_chunks_ordered_and_complete(infotons):
    token = create_consumer(path="/tpch/nation", descendants=False)
    token, chunks = drain(infotons, token, chunk=10, now_ms=NOW)
    rows = [r for df in chunks for r in df.collect()]
    # every nation delivered exactly once (unique index_times here)
    assert len(rows) == 25
    its = [r["index_time"] for r in rows]
    assert its == sorted(its)
    # resumed consumer sees nothing new -> 204, token unchanged
    t2, df, status = consume(infotons, token, now_ms=NOW)
    assert status == 204 and t2 == token


def test_consume_with_qp(infotons):
    token = create_consumer(qp="rdfType::Region")
    token, df, status = consume(infotons, token, chunk=3000, now_ms=NOW)
    assert status == 200 and df.count() == 5


def test_consume_watermark_guard(infotons):
    # now such that horizon excludes everything -> 204 (late-data guard)
    token = create_consumer(path="/tpch/nation")
    _, _, status = consume(infotons, token, now_ms=0)
    assert status == 204


def test_consume_resumes_across_waves(infotons):
    # first wave: regions (index_time slot 0); nations arrive 'later'
    token = create_consumer(qp="[*rdfType::Region,*rdfType::Nation]")
    token, df1, s1 = consume(infotons, token, chunk=5, now_ms=NOW)
    assert s1 == 200 and df1.count() == 5  # all regions (lowest index_times)
    token, df2, s2 = consume(infotons, token, chunk=3000, now_ms=NOW)
    assert s2 == 200 and df2.count() == 25  # nations
    _, _, s3 = consume(infotons, token, now_ms=NOW)
    assert s3 == 204


def test_bulk_consume_hint(infotons):
    token = create_consumer(path="/tpch/lineitem")
    total = stream(infotons, path="/tpch/lineitem").count()
    token, df, status = bulk_consume(infotons, token, length_hint=1000, now_ms=NOW)
    assert status == 200
    n = df.count()
    # within the reference's 0.5 tolerance band (threshold factor), and
    # strictly monotonic progress
    assert 0 < n < total
    assert n <= 2 * 1000 + 1000  # loose upper band
    # draining via bulk eventually delivers everything exactly once
    seen = n
    for _ in range(100):
        token, df, status = bulk_consume(infotons, token, length_hint=1000, now_ms=NOW)
        if status == 204:
            break
        seen += df.count()
    assert seen == total


def test_bulk_consume_exact_rank_boundary(infotons):
    """exact=True: the delivered chunk is PRECISELY the length_hint
    smallest index_times (deterministic sort-limit boundary — the
    oracle-replayable mode behind the bulk_consume_range registry
    promotion, VERDICT r9 item 4), and the resumed token continues from
    the exact boundary with no row lost or repeated."""
    from pyspark.sql import functions as F

    token = create_consumer(path="/tpch/lineitem")
    feed = stream(infotons, path="/tpch/lineitem")
    total = feed.count()
    token2, df, status = bulk_consume(infotons, token, length_hint=100, now_ms=NOW, exact=True)
    assert status == 200 and df.count() == 100
    want = {
        r["uuid"]
        for r in feed.orderBy(F.asc("index_time")).limit(100).select("uuid").collect()
    }
    got = {r["uuid"] for r in df.select("uuid").collect()}
    assert got == want
    # exact drain delivers everything exactly once, like the sketch path
    seen = 100
    for _ in range(total // 100 + 2):
        token2, df, status = bulk_consume(infotons, token2, length_hint=100, now_ms=NOW, exact=True)
        if status == 204:
            break
        seen += df.count()
    assert seen == total


def test_iterator_pages(infotons):
    token = create_iterator(path="/tpch/region")
    token, p1, s1 = next_chunk(infotons, token, length=3)
    token, p2, s2 = next_chunk(infotons, token, length=3)
    _, _, s3 = next_chunk(infotons, token, length=3)
    assert s1 == 200 and s2 == 200 and s3 == 204
    paths = {r["path"] for r in p1.collect()} | {r["path"] for r in p2.collect()}
    assert len(paths) == 5


def test_stream_full_export(infotons):
    assert stream(infotons, path="/tpch/nation").count() == 25


def test_iterator_boundary_ties_not_dropped(spark):
    """ADVICE r1: >length rows sharing one index_time must all be
    delivered — the tied page extends past `length` rather than skipping."""
    from cm_well_spark.operators.consume import create_iterator, next_chunk

    rows = [(f"/t/doc{i}", "/t", f"u{i}", 1_000, True, "ObjectInfoton") for i in range(7)] + [
        ("/t/doc7", "/t", "u7", 2_000, True, "ObjectInfoton")
    ]
    inf = spark.createDataFrame(
        rows, "path string, parent string, uuid string, index_time long, current boolean, kind string"
    )
    token = create_iterator(path="/t")
    token, p1, s1 = next_chunk(inf, token, length=3)
    assert s1 == 200 and p1.count() == 7  # all tied rows in one page
    token, p2, s2 = next_chunk(inf, token, length=3)
    assert s2 == 200 and p2.count() == 1
    _, _, s3 = next_chunk(inf, token, length=3)
    assert s3 == 204
