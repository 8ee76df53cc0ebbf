"""RDF source parser (S6) + output formatters (S9), incl. round trip."""

import json

import pytest
from pyspark.sql import functions as F

from cm_well_spark.formats.render import to_delimited, to_json_rows, triple_lines
from cm_well_spark.sources.rdf import infotons_from_rdf, parse_rdf_lines, uri_to_path

NT_FIXTURE = [
    '<http://example.org/people/alice> <http://purl.org/vocab/relationship/friendOf> <http://example.org/people/bob> .',
    '<http://example.org/people/alice> <http://xmlns.com/foaf/0.1/name> "Alice" .',
    '<http://example.org/people/alice> <http://example.org/age> "33"^^<http://www.w3.org/2001/XMLSchema#integer> .',
    '<http://example.org/people/bob> <http://xmlns.com/foaf/0.1/name> "Bob le \\"grand\\""@fr .',
    '# a comment line',
    '',
    '<http://example.org/people/bob> <http://example.org/score> "1.5"^^<http://www.w3.org/2001/XMLSchema#double> <http://example.org/graphs/g1> .',
]


@pytest.fixture(scope="module")
def nt_df(spark):
    return spark.createDataFrame([(l,) for l in NT_FIXTURE], ["value"])


def test_parse_basic_triples(nt_df):
    t = parse_rdf_lines(nt_df)
    rows = t.collect()
    assert len(rows) == 5  # comment + blank skipped
    by_p = {(r["s"], r["p"]): r for r in rows}
    friend = by_p[("http://example.org/people/alice", "http://purl.org/vocab/relationship/friendOf")]
    assert friend["o"] == "http://example.org/people/bob" and friend["vtype"] == "s"


def test_parse_typed_literal(nt_df):
    t = parse_rdf_lines(nt_df)
    age = t.where(F.col("p") == "http://example.org/age").first()
    assert age["o"] == "33" and age["vtype"] == "l"


def test_parse_lang_and_escapes(nt_df):
    t = parse_rdf_lines(nt_df)
    name = t.where((F.col("s").endswith("bob")) & (F.col("p").endswith("name"))).first()
    assert name["lang"] == "fr"
    assert name["o"] == 'Bob le "grand"'


def test_parse_quad(nt_df):
    t = parse_rdf_lines(nt_df)
    q = t.where(F.col("g").isNotNull()).first()
    assert q["g"] == "http://example.org/graphs/g1" and q["vtype"] == "w"


def test_infotons_from_rdf(nt_df):
    docs = infotons_from_rdf(parse_rdf_lines(nt_df))
    rows = {r["path"]: dict(r["fields"]) for r in docs.collect()}
    alice = rows["/example.org/people/alice"]
    assert alice["name"][0]["value"] == "Alice"
    assert alice["age"][0]["num"] == 33.0
    bob = rows["/example.org/people/bob"]
    assert bob["score"][0]["quad"] == "http://example.org/graphs/g1"


def test_json_formatter(infotons):
    out = to_json_rows(infotons.where(F.col("path") == "/tpch/region/0")).first()["json"]
    obj = json.loads(out)
    assert obj["system"]["path"] == "/tpch/region/0"
    assert obj["fields"]["name"] == ["AFRICA"]
    assert "uuid" in obj["system"] and "indexTime" in obj["system"]


def test_delimited_formatter(infotons):
    lines = to_delimited(
        infotons.where(F.col("path") == "/tpch/region/0"), ["name", "rdfType"], sep="\t"
    ).first()["line"]
    parts = lines.split("\t")
    assert parts[0] == "/tpch/region/0" and parts[2] == "AFRICA" and parts[3] == "Region"


def test_ntriples_round_trip(spark, triples):
    sample = triples.where((F.col("s") == "/tpch/nation/3") & F.col("current"))
    lines = triple_lines(sample, quads=False)
    reparsed = parse_rdf_lines(lines, text_col="line")
    back = {(r["p"], r["o"]) for r in reparsed.collect()}
    orig = {(r["p"], "cmwell://" + r["o"][1:] if r["o"].startswith("/") and r["vtype"] == "s" else r["o"])
            for r in sample.select("p", "o", "vtype").collect()}
    # predicates survive; reference objects render as IRIs with the base
    assert {p for p, _ in back} == {p for p, _ in orig}
    assert len(back) == len(orig)


def test_nquads_graph_tag(spark, infotons):
    from cm_well_spark.model.lakehouse import triples_of

    docs = infotons.where(F.col("path") == "/docs/1")
    t = triples_of(docs).where(F.col("p") == "source")
    line = triple_lines(t, quads=True).first()["line"]
    # s + p + g are IRIs; the object is a quoted literal
    assert line.count("<") == 3 and line.rstrip().endswith(".")
    assert '"src' in line
    assert "cmwell://graphs/" in line


# ---- S6 document formats: Turtle / JSON-LD / RDF-XML ----------------------


TTL_FIXTURE = """
@prefix ex: <http://example.org/> .
@prefix foaf: <http://xmlns.com/foaf/0.1/> .

ex:alice a foaf:Person ;
    foaf:name "Alice" , "Alicia"@es ;
    ex:age 33 ;
    ex:score 1.5 ;
    foaf:knows ex:bob , [ foaf:name "Anon" ] .

ex:bob foaf:name \"\"\"Bob
multi\"\"\" ;
    ex:birth "1990-01-01"^^<http://www.w3.org/2001/XMLSchema#date> .
"""


def test_turtle_parse_distributed(spark):
    from cm_well_spark.sources.rdf_formats import parse_rdf_documents

    docs = spark.createDataFrame([(TTL_FIXTURE,)], ["value"])
    t = parse_rdf_documents(docs, "ttl")
    rows = t.collect()
    assert len(rows) == 10
    by = {(r["s"], r["p"], r["o"]): r for r in rows}
    assert ("http://example.org/alice", "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
            "http://xmlns.com/foaf/0.1/Person") in by
    age = by[("http://example.org/alice", "http://example.org/age", "33")]
    assert age["vtype"] == "l"
    alicia = by[("http://example.org/alice", "http://xmlns.com/foaf/0.1/name", "Alicia")]
    assert alicia["lang"] == "es"
    assert any(r["o"].startswith("_:") for r in rows)  # [ ... ] bnode linked


def test_turtle_to_infotons(spark):
    from cm_well_spark.sources.rdf import infotons_from_rdf
    from cm_well_spark.sources.rdf_formats import parse_rdf_documents

    docs = spark.createDataFrame([(TTL_FIXTURE,)], ["value"])
    inf = infotons_from_rdf(parse_rdf_documents(docs, "ttl"))
    rows = {r["path"]: dict(r["fields"]) for r in inf.collect()}
    alice = rows["/example.org/alice"]
    assert {v["value"] for v in alice["name"]} == {"Alice", "Alicia"}
    assert alice["age"][0]["num"] == 33.0


def test_turtle_collections_rejected(spark):
    from cm_well_spark.sources.rdf_formats import RdfParseError, turtle_to_triples

    with pytest.raises(RdfParseError, match="collections"):
        turtle_to_triples('@prefix ex: <http://e.org/> . ex:a ex:list (1 2 3) .')


def test_jsonld_parse(spark):
    from cm_well_spark.sources.rdf_formats import parse_rdf_documents

    doc = json.dumps({
        "@context": {"@vocab": "http://example.org/",
                     "foaf": "http://xmlns.com/foaf/0.1/",
                     "name": "foaf:name",
                     "knows": {"@id": "foaf:knows", "@type": "@id"}},
        "@graph": [
            {"@id": "http://example.org/alice", "@type": "foaf:Person",
             "name": "Alice", "age": 33,
             "knows": "http://example.org/bob"},
            {"@id": "http://example.org/bob",
             "name": {"@value": "Bobo", "@language": "fr"}},
        ],
    })
    docs = spark.createDataFrame([(doc,)], ["value"])
    rows = parse_rdf_documents(docs, "jsonld").collect()
    by = {(r["s"], r["p"]): r for r in rows}
    assert by[("http://example.org/alice", "http://example.org/age")]["vtype"] == "l"
    assert by[("http://example.org/alice", "http://xmlns.com/foaf/0.1/knows")]["o"] == "http://example.org/bob"
    assert by[("http://example.org/bob", "http://xmlns.com/foaf/0.1/name")]["lang"] == "fr"


def test_rdfxml_parse(spark):
    from cm_well_spark.sources.rdf_formats import parse_rdf_documents

    xml = (
        '<?xml version="1.0"?>'
        '<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"'
        ' xmlns:foaf="http://xmlns.com/foaf/0.1/" xmlns:ex="http://example.org/">'
        '<foaf:Person rdf:about="http://example.org/alice">'
        '<foaf:name xml:lang="en">Alice</foaf:name>'
        '<ex:age rdf:datatype="http://www.w3.org/2001/XMLSchema#integer">33</ex:age>'
        '<foaf:knows rdf:resource="http://example.org/bob"/>'
        "</foaf:Person></rdf:RDF>"
    )
    docs = spark.createDataFrame([(xml,)], ["value"])
    rows = parse_rdf_documents(docs, "rdfxml").collect()
    by = {(r["s"], r["p"]): r for r in rows}
    assert by[("http://example.org/alice", "http://www.w3.org/1999/02/22-rdf-syntax-ns#type")]["o"].endswith("Person")
    assert by[("http://example.org/alice", "http://xmlns.com/foaf/0.1/name")]["lang"] == "en"
    assert by[("http://example.org/alice", "http://example.org/age")]["vtype"] == "l"


def test_unknown_format_rejected(spark):
    from cm_well_spark.sources.rdf_formats import RdfParseError, parse_rdf_documents

    docs = spark.createDataFrame([("x",)], ["value"])
    with pytest.raises(RdfParseError, match="unknown RDF format"):
        parse_rdf_documents(docs, "nosuchfmt")


# ---- S9 output formatters (r2): ttl/rdfxml/jsonld round trips + the rest ---


@pytest.fixture(scope="module")
def nations3(infotons):
    return infotons.where(F.col("path").isin("/tpch/nation/1", "/tpch/nation/2", "/tpch/nation/3"))


def _roundtrip(spark, docs_df, fmt):
    from cm_well_spark.sources.rdf_formats import parse_rdf_documents

    return parse_rdf_documents(docs_df.withColumnRenamed("doc", "value"), fmt)


def test_turtle_render_roundtrip(spark, nations3):
    from cm_well_spark.formats.render import to_turtle

    t = _roundtrip(spark, to_turtle(nations3), "ttl")
    rows = t.collect()
    # every nation renders name/nationkey/ofRegion/rdfType; typed values keep vtype
    assert {r["s"] for r in rows} == {f"cmwell://tpch/nation/{i}" for i in (1, 2, 3)}
    nk = [r for r in rows if r["p"].endswith("nationkey")]
    assert all(r["vtype"] == "l" for r in nk) and len(nk) == 3
    refs = [r for r in rows if r["p"].endswith("ofRegion")]
    assert all(r["o"].startswith("cmwell://tpch/region/") for r in refs)


def test_rdfxml_render_roundtrip(spark, nations3):
    from cm_well_spark.formats.render import RDFXML_CLOSE, RDFXML_OPEN, to_rdfxml

    docs = to_rdfxml(nations3).collect()
    xml = RDFXML_OPEN + "".join(r["doc"] for r in docs) + RDFXML_CLOSE
    t = _roundtrip(spark, spark.createDataFrame([(xml,)], ["doc"]), "rdfxml")
    rows = t.collect()
    assert {r["s"] for r in rows} == {f"cmwell://tpch/nation/{i}" for i in (1, 2, 3)}
    nk = [r for r in rows if r["p"].endswith("nationkey")]
    assert all(r["vtype"] == "l" for r in nk)


def test_jsonld_render_roundtrip(spark, nations3):
    from cm_well_spark.formats.render import to_jsonld

    t = _roundtrip(spark, to_jsonld(nations3), "jsonld")
    rows = t.collect()
    assert {r["s"] for r in rows} == {f"cmwell://tpch/nation/{i}" for i in (1, 2, 3)}
    by = {(r["s"], r["p"].split("/")[-1]): r for r in rows}
    assert by[("cmwell://tpch/nation/2", "nationkey")]["vtype"] == "l"
    assert by[("cmwell://tpch/nation/2", "name")]["o"] == "NATION_2"


def test_yaml_and_atom_and_trix(spark, nations3, triples):
    from cm_well_spark.formats.render import (
        ATOM_CLOSE,
        ATOM_OPEN,
        TRIX_CLOSE,
        TRIX_OPEN,
        to_atom_entries,
        to_trig,
        to_trix,
        to_yaml,
    )
    import xml.etree.ElementTree as ET

    y = to_yaml(nations3).first()["doc"]
    assert y.startswith('path: "') and "fields:" in y and '    - "' in y
    entries = to_atom_entries(nations3).collect()
    feed = ATOM_OPEN + "".join(r["doc"] for r in entries) + ATOM_CLOSE
    parsed = ET.fromstring(feed)
    assert len(parsed.findall("{http://www.w3.org/2005/Atom}entry")) == 3
    tri3 = triples.where(F.col("s") == "/tpch/nation/3")
    trix = TRIX_OPEN + "".join(r["line"] for r in to_trix(tri3).collect()) + TRIX_CLOSE
    assert ET.fromstring(trix) is not None
    trig = to_trig(tri3).first()["line"]
    assert trig.endswith(" . }") and "{ <cmwell://tpch/nation/3>" in trig


def test_formatters_registry_covers_reference_list():
    from cm_well_spark.formats.render import FORMATTERS, TRIPLE_FORMATTERS

    # FormatExtractor.scala:50-66 families, minus api-only ones
    assert {"json", "jsonl", "yaml", "text", "ttl", "n3", "rdfxml", "jsonld", "atom"} <= set(FORMATTERS)
    assert {"nt", "nq", "trig", "trix", "jsonldq"} <= set(TRIPLE_FORMATTERS)


def test_trig_parse_and_render_roundtrip(spark, triples):
    from cm_well_spark.formats.render import to_trig
    from cm_well_spark.sources.rdf_formats import parse_rdf_documents, trig_to_triples

    trig = (
        "@prefix ex: <http://e.org/> .\n"
        "<http://g.org/g1> { ex:a ex:name \"A\" . ex:a ex:knows ex:b . }\n"
        "GRAPH ex:g2 { ex:b ex:name \"B\"@en . }\n"
        "ex:d ex:name \"D\" .\n"
    )
    rows = trig_to_triples(trig)
    assert len(rows) == 4
    assert {r[3] for r in rows} == {"http://g.org/g1", "http://e.org/g2", None}
    assert [r for r in rows if r[5] == "en"][0][3] == "http://e.org/g2"
    # render the engine's own triples as TriG, parse back, compare rows
    tri3 = triples.where(F.col("s") == "/tpch/nation/3")
    rendered = to_trig(tri3)
    docs = spark.createDataFrame([("\n".join(r["line"] for r in rendered.collect()),)], ["value"])
    back = parse_rdf_documents(docs, "trig")
    assert back.count() == tri3.count()
    assert back.select("g").distinct().first()["g"] == "urn:x-cmwell:default"


def test_formatters_handle_empty_fields(spark):
    """Every doc formatter must survive infotons with empty/null fields
    (deleted docs, bare directories) without raising."""
    from pyspark.sql import types as T

    from cm_well_spark.formats.render import FORMATTERS

    vt = T.StructType(
        [
            T.StructField("value", T.StringType()),
            T.StructField("vtype", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("quad", T.StringType()),
            T.StructField("num", T.DoubleType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("bool", T.BooleanType()),
        ]
    )
    schema = T.StructType(
        [
            T.StructField("path", T.StringType()),
            T.StructField("uuid", T.StringType()),
            T.StructField("kind", T.StringType()),
            T.StructField("parent", T.StringType()),
            T.StructField("last_modified", T.TimestampType()),
            T.StructField("last_modified_by", T.StringType()),
            T.StructField("dc", T.StringType()),
            T.StructField("index_time", T.LongType()),
            T.StructField("protocol", T.StringType()),
            T.StructField("fields", T.MapType(T.StringType(), T.ArrayType(vt))),
        ]
    )
    inf = spark.createDataFrame(
        [("/t/empty", "u1", "ObjectInfoton", "/t", None, None, None, None, None, {}),
         ("/t/null", "u2", "ObjectInfoton", "/t", None, None, None, None, None, None)],
        schema,
    )
    for name, fn in FORMATTERS.items():
        rows = fn(inf).collect()
        assert len(rows) == 2, name


def test_trix_render_parse_roundtrip(spark, triples):
    from cm_well_spark.formats.render import TRIX_CLOSE, TRIX_OPEN, to_trix
    from cm_well_spark.sources.rdf_formats import parse_rdf_documents

    tri3 = triples.where(F.col("s").isin("/tpch/nation/3", "/tpch/nation/4"))
    doc = TRIX_OPEN + "".join(r["line"] for r in to_trix(tri3).collect()) + TRIX_CLOSE
    back = parse_rdf_documents(spark.createDataFrame([(doc,)], ["value"]), "trix")
    rows = back.collect()
    assert len(rows) == tri3.count()
    # typed values keep their vtype codes through the round trip
    by_p = {(r["s"].split("/")[-1], r["p"]): r for r in rows}
    assert by_p[("3", "nationkey")]["vtype"] == "l"
    assert by_p[("3", "name")]["o"] == "NATION_3"


def test_delimited_header_matches_layout(spark, infotons):
    from cm_well_spark.formats.render import delimited_header, to_delimited

    hdr = delimited_header(["name", "acctbal"], sep="\t")
    assert hdr == "path\tlastModified\tname\tacctbal"
    line = to_delimited(
        infotons.where(F.col("path") == "/tpch/nation/3"), ["name", "acctbal"], sep="\t"
    ).first()["line"]
    assert len(line.split("\t")) == len(hdr.split("\t"))


def test_atom_pagination_links_contract():
    """PaginationInfo parity (Application.scala:2250-2288): next only
    while another page exists; previous clamps a partial back-step to 0
    and disappears at offset 0; last rounds total down to a page
    boundary."""
    from cm_well_spark.formats.render import atom_pagination_links

    def rels(total, offset, length):
        return {
            l.split('"')[1]: l.split('href="')[1].rsplit("&amp;offset=", 1)[1].rstrip('"/>')
            for l in atom_pagination_links("u", total, offset, length)
        }

    # first page of 10/2: no previous, next=2, last=(10//2)*2=10
    r = rels(10, 0, 2)
    assert r == {"self": "0", "first": "0", "last": "10", "next": "2"}
    # middle page: both directions
    r = rels(10, 4, 2)
    assert r["previous"] == "2" and r["next"] == "6"
    # final page: no next
    assert "next" not in rels(10, 8, 2)
    # partial back-step clamps to 0 (offset < length but > 0)
    assert rels(10, 1, 2)["previous"] == "0"
    # empty result: last collapses to 0
    assert rels(0, 0, 0)["last"] == "0"


def test_jsonldq_quad_aware_lines(spark, triples):
    """r7 jsonldq (JsonLDQFormatter parity): every line is valid JSON
    with a graph @id and one node object; quads land in their named
    graph, quad-less values in the default graph; the enveloped
    concatenation is a valid JSON array."""
    import json

    from cm_well_spark.formats.render import JSONLDQ_CLOSE, JSONLDQ_OPEN, to_jsonldq

    tri = triples.where(F.col("s") == "/tpch/nation/3")
    lines = [r["line"] for r in to_jsonldq(tri).collect()]
    assert lines
    doc = json.loads(JSONLDQ_OPEN + ",".join(lines) + JSONLDQ_CLOSE)
    for obj in doc:
        assert set(obj) == {"@id", "@graph"} and len(obj["@graph"]) == 1
        node = obj["@graph"][0]
        assert node["@id"] == "cmwell://tpch/nation/3"
    # typed numeric value carries @type; graph ids resolve
    flat = json.dumps(doc)
    assert "XMLSchema#" in flat
    gids = {obj["@id"] for obj in doc}
    assert any(g == "urn:x-cmwell:default" or g.startswith("cmwell://") or ":" in g for g in gids)
