from pyspark.sql import functions as F


def test_builder_counts(infotons, spark, sf_dir):
    # one infoton per source entity row
    from cm_well_spark.sources import tables as tbl

    raw = tbl.load(spark, sf_dir)
    expected = sum(raw[t].count() for t in raw if t != "embeddings")
    assert infotons.count() == expected


def test_paths_and_parent(infotons):
    row = infotons.where(F.col("path") == "/tpch/customer/1").first()
    assert row is not None
    assert row["parent"] == "/tpch/customer"
    assert row["parent_hierarchy"] == ["/", "/tpch", "/tpch/customer"]
    assert row["kind"] == "ObjectInfoton"
    assert row["current"] is True


def test_fields_typed(infotons):
    row = infotons.where(F.col("path") == "/tpch/customer/1").first()
    f = dict(row["fields"])
    assert f["rdfType"][0]["value"] == "Customer"
    assert f["acctbal"][0]["vtype"] == "w"
    assert f["acctbal"][0]["num"] is not None
    assert f["inNation"][0]["value"].startswith("/tpch/nation/")


def test_uuid_deterministic(spark, sf_dir):
    from cm_well_spark.model.builder import build_infotons

    a = build_infotons(spark, sf_dir, only=["region"]).select("path", "uuid").collect()
    b = build_infotons(spark, sf_dir, only=["region"]).select("path", "uuid").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    assert all(len(u) == 32 for _, u in a)


def test_quad_tag(infotons):
    row = infotons.where(F.col("path") == "/docs/1").first()
    f = dict(row["fields"])
    assert f["source"][0]["quad"].startswith("/graphs/")


def test_triples_view(triples):
    t = triples.where((F.col("s") == "/tpch/nation/3") & (F.col("p") == "ofRegion"))
    rows = t.collect()
    assert len(rows) == 1
    assert rows[0]["o"].startswith("/tpch/region/")
