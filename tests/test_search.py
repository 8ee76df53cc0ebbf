from pyspark.sql import functions as F

from cm_well_spark.operators.search import (
    PathFilter,
    batch_get,
    history,
    irretrievable_paths,
    list_children,
    read_path,
    search,
)


def test_point_read(infotons):
    rows = read_path(infotons, "/tpch/region/0").collect()
    assert len(rows) == 1


def test_path_filter_children(infotons):
    n = list_children(infotons, "/tpch/nation").count()
    assert n == 25


def test_path_filter_descendants(infotons, spark, sf_dir):
    from cm_well_spark.sources import tables as tbl

    raw = tbl.load(spark, sf_dir)
    tpch_total = sum(raw[t].count() for t in ["region", "nation", "customer", "supplier", "part", "orders", "lineitem"])
    got = search(infotons, path_filter=PathFilter("/tpch", descendants=True), length=10_000).count()
    assert got == min(tpch_total, 10_000)


def test_qp_equals(infotons):
    df = search(infotons, qp="rdfType::Nation", length=10_000)
    assert df.count() == 25


def test_qp_range_typed(infotons, spark, sf_dir):
    from cm_well_spark.sources import tables as tbl

    cust = tbl.load_table(spark, sf_dir, "customer")
    expected = cust.where(F.col("c_acctbal") > 1000.0).count()
    got = search(infotons, qp="rdfType::Customer,acctbal>1000", length=10_000).count()
    assert got == expected


def test_qp_mustnot(infotons, spark, sf_dir):
    from cm_well_spark.sources import tables as tbl

    cust = tbl.load_table(spark, sf_dir, "customer")
    expected = cust.where(F.col("c_mktsegment") != "BUILDING").count()
    got = search(infotons, qp="rdfType::Customer,-mktsegment::BUILDING", length=10_000).count()
    assert got == expected


def test_qp_should_group(infotons, spark, sf_dir):
    from cm_well_spark.sources import tables as tbl

    cust = tbl.load_table(spark, sf_dir, "customer")
    expected = cust.where(F.col("c_mktsegment").isin("BUILDING", "MACHINERY")).count()
    got = search(
        infotons, qp="rdfType::Customer,[*mktsegment::BUILDING,*mktsegment::MACHINERY]", length=10_000
    ).count()
    assert got == expected


def test_qp_existence(infotons):
    # every customer has acctbal; no nation does
    got = search(infotons, qp="acctbal:,rdfType::Nation", length=10_000).count()
    assert got == 0


def test_qp_contains_analyzed(infotons, spark, sf_dir):
    from cm_well_spark.sources import tables as tbl

    part = tbl.load_table(spark, sf_dir, "part")
    any_row = part.first()
    token = any_row["p_type"].split(" ")[0]
    expected = part.where(
        F.concat(F.lit(" "), F.lower(F.regexp_replace("p_type", r"[^\p{L}\p{N}]+", " ")), F.lit(" ")).contains(
            f" {token.lower()} "
        )
    ).count()
    got = search(infotons, qp=f"ptype:{token}", length=10_000).count()
    assert got == expected


def test_sort_and_paging(infotons):
    page1 = search(infotons, qp="rdfType::Nation", sort_by="name", length=10)
    page2 = search(infotons, qp="rdfType::Nation", sort_by="name", offset=10, length=10)
    names1 = [dict(r["fields"])["name"][0]["value"] for r in page1.collect()]
    names2 = [dict(r["fields"])["name"][0]["value"] for r in page2.collect()]
    assert names1 == sorted(names1)
    assert len(names1) == 10 and len(names2) == 10
    assert set(names1).isdisjoint(names2)
    assert max(names1) <= min(names2)


def test_sort_numeric_desc(infotons):
    rows = search(infotons, qp="rdfType::Customer", sort_by="-acctbal", length=5).collect()
    bals = [dict(r["fields"])["acctbal"][0]["num"] for r in rows]
    assert bals == sorted(bals, reverse=True)


def test_batch_get_and_missing(infotons, spark):
    keys = spark.createDataFrame([("/tpch/region/0",), ("/tpch/region/1",), ("/nope/zzz",)], ["path"])
    assert batch_get(infotons, keys).count() == 2
    missing = irretrievable_paths(infotons, keys).collect()
    assert [r["path"] for r in missing] == ["/nope/zzz"]


def test_fields_mask(infotons):
    row = search(infotons, qp="rdfType::Nation", fields_mask=["name"], length=1).first()
    assert set(dict(row["fields"]).keys()) == {"name"}


def test_history_single_version(infotons):
    assert history(infotons, "/tpch/region/0").count() == 1


def test_quad_filter(infotons, spark, sf_dir):
    from cm_well_spark.sources import tables as tbl

    docs = tbl.load_table(spark, sf_dir, "documents")
    any_source = docs.first()["source"]
    expected = docs.where(F.col("source") == any_source).count()
    got = search(infotons, qp=f"system.quad::/graphs/{any_source}", length=10_000).count()
    assert got == expected


def test_score_sort_ranks_by_term_frequency(spark):
    """-system.score ranks docs with more term occurrences first
    (TF analog of FTSService _score sort; functions/scoring.py)."""
    from cm_well_spark.operators.search import search

    rows = [
        ("/t/a", "/t", True, "ObjectInfoton", {"txt": [("widget widget widget", "s")]}),
        ("/t/b", "/t", True, "ObjectInfoton", {"txt": [("one widget", "s")]}),
        ("/t/c", "/t", True, "ObjectInfoton", {"txt": [("widget widget", "s")]}),
        ("/t/d", "/t", True, "ObjectInfoton", {"txt": [("no match here", "s")]}),
    ]
    from pyspark.sql import types as T

    vt = T.StructType([T.StructField("value", T.StringType()), T.StructField("vtype", T.StringType())])
    schema = T.StructType(
        [
            T.StructField("path", T.StringType()),
            T.StructField("parent", T.StringType()),
            T.StructField("current", T.BooleanType()),
            T.StructField("kind", T.StringType()),
            T.StructField("fields", T.MapType(T.StringType(), T.ArrayType(vt))),
        ]
    )
    inf = spark.createDataFrame(rows, schema)
    out = search(inf, qp="txt:widget", sort_by="-system.score", length=10)
    assert [r["path"] for r in out.collect()] == ["/t/a", "/t/c", "/t/b"]
    assert "__score" not in out.columns


# ---- LinkInfoton forward resolution (S1 completeness) ---------------------


def _with_links(infotons, chain):
    from pyspark.sql import functions as F

    base = infotons.where("path = '/tpch/region/0' AND current")
    out = infotons
    for path, to, kind in chain:
        out = out.unionByName(
            base.withColumn("path", F.lit(path))
            .withColumn("kind", F.lit("LinkInfoton"))
            .withColumn("link_to", F.lit(to))
            .withColumn("link_kind", F.lit(kind).cast("int"))
            .withColumn("uuid", F.lit(f"link-{path}"))
        )
    return out


def test_read_path_follows_forward_chain(infotons):
    from cm_well_spark.operators.search import read_path

    inf2 = _with_links(
        infotons, [("/l/a", "/l/b", 2), ("/l/b", "/tpch/region/0", 2)]
    )
    row = read_path(inf2, "/l/a", follow_links=30).first()
    assert row["path"] == "/tpch/region/0"


def test_read_path_permanent_link_not_followed(infotons):
    from cm_well_spark.operators.search import read_path

    inf2 = _with_links(infotons, [("/l/p", "/tpch/region/0", 0)])
    row = read_path(inf2, "/l/p", follow_links=30).first()
    assert row["path"] == "/l/p"  # HTTP layer would redirect; read returns the link


def test_read_path_link_cycle_raises(infotons):
    import pytest

    from cm_well_spark.operators.search import read_path

    inf2 = _with_links(infotons, [("/l/x", "/l/y", 2), ("/l/y", "/l/x", 2)])
    with pytest.raises(ValueError, match="too deep forward link chain"):
        read_path(inf2, "/l/x", follow_links=30)


def test_read_path_depth_budget(infotons):
    import pytest

    from cm_well_spark.operators.search import read_path

    inf2 = _with_links(
        infotons, [("/l/0", "/l/1", 2), ("/l/1", "/l/2", 2), ("/l/2", "/tpch/region/0", 2)]
    )
    with pytest.raises(ValueError, match="too deep"):
        read_path(inf2, "/l/0", follow_links=2)
    assert read_path(inf2, "/l/0", follow_links=3).first()["path"] == "/tpch/region/0"


def test_resolve_forward_links_batch(infotons):
    from cm_well_spark.operators.search import resolve_forward_links

    inf2 = _with_links(
        infotons,
        [
            ("/l/a", "/l/b", 2),
            ("/l/b", "/tpch/region/0", 2),
            ("/l/c1", "/l/c2", 2),  # cycle -> NULL
            ("/l/c2", "/l/c1", 2),
        ],
    )
    got = {r["link_path"]: r["resolved"] for r in resolve_forward_links(inf2).collect()}
    assert got["/l/a"] == "/tpch/region/0"
    assert got["/l/b"] == "/tpch/region/0"
    assert got["/l/c1"] is None and got["/l/c2"] is None


def test_quad_alias_unknown_raises(infotons, triples):
    import pytest

    from cm_well_spark.operators.search import search

    with pytest.raises(ValueError, match="register a new alias"):
        search(infotons, qp="system.quad::nosuchalias", length=None, triples=triples)


def test_quad_alias_uri_passthrough(infotons, triples):
    from cm_well_spark.operators.search import search

    # explicit URI quads bypass alias resolution entirely
    n = search(infotons, qp="system.quad::/graphs/src3", length=None, triples=triples).count()
    assert n > 0
