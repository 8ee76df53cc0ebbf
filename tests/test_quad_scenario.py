"""End-to-end named-graph scenario — the reference's QuadTests arc
(server/cmwell-it/.../QuadTests.scala: batman/joker fixtures) replayed
through this engine's public surface: N-Quads ingest -> GRAPH queries ->
quad-filtered search -> graph-alias resolution -> quad-precise delete ->
store-wide replaceGraph."""

import pytest
from pyspark.sql import functions as F

BATMAN = "http://example.org/comics/characters/batman"
G_BATMAN = "http://example.org/graphs/batman"
G_JOKER = "http://example.org/graphs/joker"
ENEMY_URI = "http://purl.org/vocab/relationship/enemyOf"
ENEMY = "enemyOf"  # ingest localizes predicate names (infotons_from_rdf)

NQUADS = f"""
<{BATMAN}> <{ENEMY_URI}> <http://example.org/comics/characters/joker> <{G_BATMAN}> .
<{BATMAN}> <{ENEMY_URI}> <http://example.org/comics/characters/riddler> <{G_BATMAN}> .
<{BATMAN}> <{ENEMY_URI}> <http://example.org/comics/characters/bane> <{G_JOKER}> .
<{BATMAN}> <http://example.org/name> "Batman" .
<http://example.org/comics/characters/superman> <http://example.org/name> "Superman" .
""".strip()


@pytest.fixture(scope="module")
def quad_store(spark):
    from cm_well_spark.model.lakehouse import triples_of
    from cm_well_spark.sources.rdf import infotons_from_rdf, parse_rdf_lines

    lines = spark.createDataFrame([(l,) for l in NQUADS.split("\n")], ["value"])
    docs = infotons_from_rdf(parse_rdf_lines(lines))
    # enrich to the full infoton schema (what the merge writer would do)
    inf = docs.select(
        "path",
        F.md5("path").alias("uuid"),
        F.lit("ObjectInfoton").alias("kind"),
        F.lit(True).alias("current"),
        (F.abs(F.xxhash64("path")) % 1000000).alias("index_time"),
        F.to_timestamp(F.lit("2024-01-01 00:00:00")).alias("last_modified"),
        "fields",
    ).localCheckpoint(eager=True)
    return inf, triples_of(inf).localCheckpoint(eager=True)


def test_ingest_preserves_graph_labels(quad_store):
    _, tri = quad_store
    got = {
        (r["o"], r["g"])
        for r in tri.where(F.col("p") == ENEMY).select("o", "g").collect()
    }
    # subjects become paths; object URIs keep their lexical form
    assert got == {
        ("http://example.org/comics/characters/joker", G_BATMAN),
        ("http://example.org/comics/characters/riddler", G_BATMAN),
        ("http://example.org/comics/characters/bane", G_JOKER),
    }


def test_graph_scoped_sparql(quad_store):
    from cm_well_spark.operators.sparql import sparql_query

    _, tri = quad_store
    batman_only = sparql_query(
        tri, f"SELECT ?e WHERE {{ GRAPH <{G_BATMAN}> {{ ?s <{ENEMY}> ?e }} }}"
    )
    assert batman_only.count() == 2
    per_graph = sparql_query(
        tri,
        f"SELECT ?g (COUNT(?e) AS ?n) WHERE {{ GRAPH ?g {{ ?s <{ENEMY}> ?e }} }} GROUP BY ?g",
    )
    assert {r["g"]: r["n"] for r in per_graph.collect()} == {G_BATMAN: 2, G_JOKER: 1}


def test_quad_filtered_search(quad_store):
    from cm_well_spark.operators.search import search

    inf, tri = quad_store
    hits = search(inf, qp=f"system.quad::{G_JOKER}", length=None, triples=tri)
    assert [r["path"] for r in hits.select("path").collect()] == [
        "/example.org/comics/characters/batman"
    ]


def test_quad_alias_roundtrip(quad_store, spark):
    """graphAlias registration (QuadTests.scala:258) then search by alias."""
    from cm_well_spark.model.lakehouse import triples_of
    from cm_well_spark.operators.search import search

    inf, _ = quad_store
    base = inf.limit(1)
    reg = (
        base.withColumn("path", F.lit("/meta/quad/joker"))
        .withColumn("uuid", F.lit("alias-joker"))
        .withColumn(
            "fields",
            F.create_map(
                F.lit("graphAlias"),
                F.array(
                    F.struct(
                        F.lit("joker").alias("value"), F.lit("s").alias("vtype"),
                        F.lit(None).cast("string").alias("lang"),
                        F.lit(G_JOKER).alias("quad"),
                        F.lit(None).cast("double").alias("num"),
                        F.lit(None).cast("timestamp").alias("ts"),
                        F.lit(None).cast("boolean").alias("bool"),
                    )
                ),
            ),
        )
    )
    inf2 = inf.unionByName(reg)
    hits = search(inf2, qp="system.quad::joker", length=None, triples=triples_of(inf2))
    paths = {r["path"] for r in hits.select("path").collect()}
    assert "/example.org/comics/characters/batman" in paths


def test_quad_precise_mark_delete(quad_store):
    """markDelete scoped to one quad (QuadTests.scala:350-377): only the
    batman-graph enemyOf values die; the joker-graph one survives."""
    from cm_well_spark.operators.merge import delete_fields_f

    inf, _ = quad_store
    row = inf.where(F.col("path") == "/example.org/comics/characters/batman").first()
    fields = {k: [v.asDict() for v in vs] for k, vs in row["fields"].items()}
    out = delete_fields_f(
        fields,
        {ENEMY: [{"value": None, "vtype": "s", "lang": None, "quad": G_BATMAN,
                  "num": None, "ts": None, "bool": None}]},
    )
    assert [v["quad"] for v in out[ENEMY]] == [G_JOKER]


def test_replace_graph_store_wide(quad_store):
    from cm_well_spark.operators.admin import replace_graph

    inf, _ = quad_store
    out = replace_graph(inf, G_BATMAN)
    cur = out.where(F.col("current"))
    batman = cur.where(F.col("path") == "/example.org/comics/characters/batman").first()
    enemy_quads = [v["quad"] for v in batman["fields"].get(ENEMY, [])]
    assert enemy_quads == [G_JOKER]  # batman-graph statements retracted
    # untagged name statement survives; history retained
    assert [v["value"] for v in batman["fields"]["name"]] == ["Batman"]
    assert out.where(F.col("path") == "/example.org/comics/characters/batman").count() == 2
