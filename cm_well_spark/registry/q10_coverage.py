"""Round-4 oracle coverage for the previously pytest-only surface.

Registry tranche split out of the former single-module registry
(VERDICT r10 item 9); entry code is unchanged — shared helpers live in
`cm_well_spark.registry._core`.
"""

from cm_well_spark.registry._core import *  # noqa: F401,F403

@register(
    "read_by_uuid",
    oracle="""
    SELECT '/tpch/region/2' AS path, r_name AS name FROM region WHERE r_regionkey = 2
    """,
)
def read_by_uuid(spark, sf_dir):
    """S2 op=read by uuid (CRUDServiceFS.getInfotonByUuid): resolve the
    content-hash uuid of a known path (one point lookup), then read by
    uuid — exercises the uuid index route end-to-end."""
    inf = _inf(spark, sf_dir)
    uuid = S.read_path(inf, "/tpch/region/2").select("uuid").first()["uuid"]
    df = S.read_uuid(inf, uuid)
    return df.select("path", fv.first_value("name").alias("name"))


@register(
    "search_dates_range",
    oracle="""
    SELECT '/tpch/customer/' || c_custkey AS path,
           strftime(TIMESTAMP '2020-01-01 00:00:00'
                    + (c_custkey % 10000000) * INTERVAL 1 SECOND,
                    '%Y-%m-%dT%H:%M:%SZ') AS last_modified
    FROM customer
    WHERE TIMESTAMP '2020-01-01 00:00:00' + (c_custkey % 10000000) * INTERVAL 1 SECOND
          BETWEEN TIMESTAMP '2020-01-01 00:05:00' AND TIMESTAMP '2020-01-01 00:10:00'
    """,
)
def search_dates_range(spark, sf_dir):
    """F4 lastModifiedAfter/Before window (`from`/`to` params,
    FieldFilterParser dates route): a min/max-prunable range scan on the
    doc table's last_modified column."""
    from datetime import datetime, timezone

    df = S.search(
        _inf(spark, sf_dir),
        qp="rdfType::Customer",
        dates_from=datetime(2020, 1, 1, 0, 5, 0, tzinfo=timezone.utc),
        dates_to=datetime(2020, 1, 1, 0, 10, 0, tzinfo=timezone.utc),
        length=10_000,
        triples=_tri(spark, sf_dir),
    )
    return df.select(
        "path", F.date_format("last_modified", "yyyy-MM-dd'T'HH:mm:ss'Z'").alias("last_modified")
    )


@register(
    "search_fields_mask",
    oracle="""
    SELECT '/tpch/customer/' || c_custkey AS path, c_name AS name,
           CAST(1 AS BIGINT) AS n_fields
    FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
    ORDER BY path LIMIT 10000
    """,
)
def search_fields_mask(spark, sf_dir):
    """F7 fields=... projection mask: non-requested fields drop from the
    map (wsutil fields masking) — column pruning the formatter sees."""
    df = S.search(
        _inf(spark, sf_dir),
        qp="rdfType::Customer,mktsegment::AUTOMOBILE",
        fields_mask=["name"],
        sort_by="path",
        length=10_000,
        triples=_tri(spark, sf_dir),
    )
    return df.select(
        "path",
        fv.first_value("name").alias("name"),
        F.size(F.map_keys("fields")).cast("long").alias("n_fields"),
    )


@register(
    "stream_export",
    oracle="""
    SELECT '/tpch/supplier/' || s_suppkey AS path FROM supplier WHERE s_acctbal > 5000
    """,
)
def stream_export(spark, sf_dir):
    """T1 op=stream: uncapped filtered export (no sort, no paging) — the
    partition-parallel scan that replaces the ES scroll."""
    from cm_well_spark.operators.consume import stream

    df = stream(_inf(spark, sf_dir), path="/tpch/supplier", qp="acctbal>5000", descendants=True)
    return df.select("path")


@register(
    "scroll_first_chunk",
    oracle="""
    SELECT '/tpch/supplier/' || s_suppkey AS path FROM supplier
    ORDER BY s_suppkey LIMIT 10
    """,
)
def scroll_first_chunk(spark, sf_dir):
    """T3 _createIterator/_next: stateless scroll cursor over
    (index_time, uuid) total order; first page."""
    from cm_well_spark.operators.consume import create_iterator, next_chunk

    token = create_iterator(path="/tpch/supplier", descendants=True)
    _, df, status = next_chunk(_inf(spark, sf_dir), token, length=10)
    assert status == 200
    return df.select("path")


@register(
    "scroll_resume_chunk",
    oracle="""
    WITH ranked AS (
        SELECT s_suppkey, row_number() OVER (ORDER BY s_suppkey) AS rn,
               count(*) OVER () AS n
        FROM supplier
    )
    SELECT '/tpch/supplier/' || s_suppkey AS path FROM ranked WHERE rn > n / 2
    """,
)
def scroll_resume_chunk(spark, sf_dir):
    """T3 scroll resume: the returned cursor token continues exactly after
    the first page's boundary (snapshot-stable, no session actor).
    sf-robust (VERDICT r5 item 8): page size = half the table, derived at
    runtime, so a second 200 page exists at every fixture scale."""
    from cm_well_spark.operators.consume import create_iterator, next_chunk

    inf = _inf(spark, sf_dir)
    token = create_iterator(path="/tpch/supplier", descendants=True)
    total = inf.where(
        F.col("path").startswith("/tpch/supplier/") & F.col("current")
    ).count()
    half = max(1, total // 2)
    token, _, _ = next_chunk(inf, token, length=half)
    _, df, status = next_chunk(inf, token, length=total)
    assert status == 200
    return df.select("path")


@register("sstream_partitions")
def sstream_partitions(spark, sf_dir):
    """T2 sstream/mstream: per-partition row counts — the observable analog
    of per-shard scroll fan-out. Partitioning is an engine artifact, not
    SQL-expressible -> rows-only check; pytest asserts the row totals."""
    from cm_well_spark.operators.consume import sstream_partition_counts

    return sstream_partition_counts(_inf(spark, sf_dir), path="/tpch/nation")


@register(
    "tracking_status_done",
    oracle="""
    SELECT '/tpch/nation/' || n_nationkey AS path, 'Done' AS status
    FROM nation WHERE n_nationkey < 5
    UNION ALL
    SELECT '/tpch/nation/9999', 'InProgress'
    """,
)
def tracking_status_done(spark, sf_dir):
    """W6 _track: per-path write status — Done when a current version
    exists, InProgress otherwise (tracking actor -> plain join)."""
    from cm_well_spark.operators.admin import assign_tracking_ids, tracking_status

    paths = [(f"/tpch/nation/{k}",) for k in range(5)] + [("/tpch/nation/9999",)]
    commands = spark.createDataFrame(paths, "path string")
    _tid, tracked = assign_tracking_ids(commands)
    return tracking_status(_inf(spark, sf_dir), tracked).select("path", "status")


@register(
    "zz_store_roundtrip",
    oracle="""
    SELECT 'registry-k1' AS key, 'v1' AS value
    UNION ALL SELECT 'registry-k2', 'v2-updated'
    """,
)
def zz_store_roundtrip(spark, sf_dir):
    """S10 zz KV surface: put/overwrite/get round-trip through the
    versioned atomic store (zStore analog; last write wins)."""
    import tempfile

    from cm_well_spark.operators.admin import ZzStore

    zz = ZzStore(spark, tempfile.mkdtemp(prefix="zz_registry_"))
    zz.put("registry-k1", b"v1")
    zz.put("registry-k2", b"v0")
    zz.put("registry-k2", b"v2-updated")
    rows = [(k, zz.get(k).decode()) for k in sorted(zz.list_keys())]
    return spark.createDataFrame(rows, "key string, value string")


@register(
    "format_csv_lines",
    oracle="""
    SELECT '/tpch/nation/' || n_nationkey || ','
           || strftime(TIMESTAMP '2020-01-01 00:00:00'
                       + (n_nationkey % 10000000) * INTERVAL 1 SECOND,
                       '%Y-%m-%dT%H:%M:%SZ')
           || ',' || n_name AS line
    FROM nation
    """,
)
def format_csv_lines(spark, sf_dir):
    """S9 format=csv: one printable line per infoton (path, lastModified,
    masked fields) — rendering is a Column expression, so a 100 TB export
    formats inside the scan, never on the driver (CSVFormatter parity)."""
    from cm_well_spark.formats.render import to_delimited

    df = S.list_children(_inf(spark, sf_dir), "/tpch/nation")
    return to_delimited(df, ["name"])


@register(
    "format_ntriples_lines",
    oracle="""
    SELECT '<cmwell://tpch/region/' || r_regionkey || '> <name> "' || r_name || '" .' AS line
    FROM region
    UNION ALL
    SELECT '<cmwell://tpch/region/' || r_regionkey || '> <regionkey> "' || r_regionkey
           || '"^^<http://www.w3.org/2001/XMLSchema#long> .'
    FROM region
    UNION ALL
    SELECT '<cmwell://tpch/region/' || r_regionkey || '> <rdfType> "Region" .'
    FROM region
    """,
)
def format_ntriples_lines(spark, sf_dir):
    """S9 format=ntriples: per-triple line rendering with typed-literal
    suffixes and IRI references (RDFFormatter parity; round-trips through
    sources/rdf.py)."""
    from cm_well_spark.formats.render import triple_lines

    t = _tri(spark, sf_dir).where(F.col("current") & F.col("s").startswith("/tpch/region/"))
    return triple_lines(t)


