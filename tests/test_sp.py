"""`POST /_sp` payload front-end: grammar, populate scoping, engines.
Reference arcs: SPParser (SpHandler.scala:165-251), populate
(PopulateAndQuery:406-442), SparqlTests.scala:73-119."""

import pytest
from pyspark.sql import functions as F

from cm_well_spark.operators.sp import SpParseError, parse_sp_payload, populate, sp_eval


# ---------------------------------------------------------------------------
# grammar
# ---------------------------------------------------------------------------


def test_parse_sections_case_insensitive():
    req = parse_sp_payload("Paths\n/a/b\n\nSPARQL\nSELECT ?x WHERE { ?x ?y ?z }")
    assert req.sources == ["/a/b"] and req.engine == "sparql" and len(req.queries) == 1


def test_parse_multi_query_split_on_minuses():
    req = parse_sp_payload(
        "PATHS\n/a\n\nSPARQL\nSELECT ?x WHERE {?x ?y ?z}\n----\nSELECT ?z WHERE {?x ?y ?z}"
    )
    assert len(req.queries) == 2


def test_parse_import_section():
    req = parse_sp_payload(
        "PATHS\n/a\n\nIMPORT\nsome/jar\n\nGREMLIN\ng.V().paths()"
    )
    assert req.imports == ["some/jar"] and req.engine == "gremlin"


@pytest.mark.parametrize(
    "payload",
    [
        "/a\n\nSPARQL\nSELECT ?x WHERE {?x ?y ?z}",  # missing PATHS header
        "PATHS\n\nSPARQL\nSELECT ?x WHERE {?x ?y ?z}",  # no sources
        "PATHS\n/a\n\nSELECT ?x WHERE {?x ?y ?z}",  # missing engine header
        "PATHS\n/a\n\nSPARQL\n",  # empty query body
    ],
)
def test_parse_errors(payload):
    with pytest.raises(SpParseError):
        parse_sp_payload(payload)


def test_unregistered_jar_import_errors_clearly(infotons, triples):
    """A .jar/.scala import whose basename names no registered function
    errors with a message pointing at the FunctionRegistry contract
    (the reference hot-compiles the jar, SpHandler.scala:525-548)."""
    with pytest.raises(KeyError, match="no function 'some' is registered"):
        sp_eval(
            infotons,
            triples,
            "PATHS\n/a\n\nIMPORT\nsome.jar\n\nSPARQL\nSELECT ?x WHERE {?x ?y ?z}",
        )


def test_jar_import_resolves_registered_udf(spark, infotons, triples):
    """The Spark analog of the Jena FunctionRegistry arc: the import's
    basename resolves to a registered SQL function, callable by bare
    name (BIND) and by IRI (<jar:...#fn>) inside the query body."""
    from cm_well_spark.functions.udfs import FunctionRegistry

    reg = FunctionRegistry(spark)
    reg.register_sql("shout", ["x"], "UPPER(x)")
    frames = sp_eval(
        infotons,
        triples,
        "PATHS\n/tpch/region?op=search&recursive\n\n"
        "IMPORT\n/lib/shout.scala\n\n"
        "SPARQL\nSELECT ?s ?up WHERE { ?s <name> ?n . BIND(shout(?n) AS ?up) }\n"
        "----\n"
        "SELECT ?s WHERE { ?s <name> ?n . FILTER(<jar:lib.Shout#shout>(?n) = \"ASIA\") }\n",
        functions=reg,
    )
    rows = {r["up"] for r in frames[0].collect()}
    assert rows and all(v == v.upper() for v in rows)
    assert [r["s"] for r in frames[1].collect()] == ["/tpch/region/2"]


def test_unadmitted_function_call_is_compile_error(infotons, triples):
    """Calling a function that no import admitted raises the compiler's
    clear error, not a Spark analysis exception."""
    from cm_well_spark.operators.sparql import SparqlCompileError

    with pytest.raises(SparqlCompileError, match="unknown function 'mystery'"):
        sp_eval(
            infotons,
            triples,
            "PATHS\n/a\n\nSPARQL\nSELECT ?x WHERE { ?x <name> ?n . BIND(mystery(?n) AS ?x2) }",
        )


# ---------------------------------------------------------------------------
# populate
# ---------------------------------------------------------------------------


def test_populate_merges_and_dedups_sources(infotons, triples):
    paths = populate(
        infotons,
        triples,
        ["/tpch/region?op=search&recursive", "/tpch/region/1", "/tpch/region/1"],
    )
    n_regions = infotons.where(
        F.col("current") & F.col("path").startswith("/tpch/region/")
    ).count()
    assert paths.count() == n_regions  # the bare read is already in the search


def test_populate_bare_path_is_point_read(infotons, triples):
    paths = populate(infotons, triples, ["/tpch/region/2"])
    assert [r["path"] for r in paths.collect()] == ["/tpch/region/2"]


def test_populate_rejects_unknown_op(infotons, triples):
    with pytest.raises(SpParseError):
        populate(infotons, triples, ["/a?op=purge"])


# ---------------------------------------------------------------------------
# scoped evaluation
# ---------------------------------------------------------------------------


def test_sparql_sees_only_the_subgraph(infotons, triples):
    """A whole-graph pattern over the scoped run returns only rows whose
    subject survived populate — the scope IS the dataset."""
    dfs = sp_eval(
        infotons,
        triples,
        "PATHS\n/tpch/region?op=search&recursive\n\n"
        "SPARQL\nSELECT ?s ?n WHERE { ?s <name> ?n }",
    )
    subjects = {r["s"] for r in dfs[0].collect()}
    assert subjects and all(s.startswith("/tpch/region/") for s in subjects)


def test_gremlin_engine_scoped(infotons, triples):
    dfs = sp_eval(
        infotons,
        triples,
        "PATHS\n/tpch/nation?op=search&recursive\n\n"
        "GREMLIN\ng.V().has(\"rdfType\", \"Nation\").paths()",
    )
    assert dfs[0].count() == 25


def test_multi_query_returns_one_frame_each(infotons, triples):
    dfs = sp_eval(
        infotons,
        triples,
        "PATHS\n/tpch/region?op=search&recursive\n\n"
        "SPARQL\nSELECT ?s WHERE { ?s <name> ?n }\n---\n"
        "SELECT ?n WHERE { ?s <name> ?n }",
    )
    assert len(dfs) == 2
    assert dfs[0].columns == ["s"] and dfs[1].columns == ["n"]


# ---------------------------------------------------------------------------
# imports + placeholders
# ---------------------------------------------------------------------------


def test_placeholder_substitution():
    from cm_well_spark.operators.sp import substitute_placeholders

    assert substitute_placeholders("x %Seg% %other%", {"seg": "'A'"}) == "x 'A' other"


def test_import_requires_stored_source(infotons, triples):
    with pytest.raises(KeyError):
        sp_eval(
            infotons,
            triples,
            "PATHS\n/a\n\nIMPORT\n/queries/q1\n\nSPARQL\nSELECT ?x WHERE {?x ?y ?z}",
        )


def test_import_expands_dataset(infotons, triples):
    """The constructed predicate exists only through the import — without
    it the query matches nothing, with it the inferred triples join."""
    payload = (
        "PATHS\n/tpch/nation?op=search&recursive\n/tpch/region?op=search&recursive\n\n"
        "IMPORT\n/queries/rollup\n\n"
        "SPARQL\nSELECT ?n ?r WHERE { ?n <partOf> ?r }"
    )
    stored = {"/queries/rollup": "CONSTRUCT { ?n <partOf> ?r } WHERE { ?n <ofRegion> ?r }"}
    dfs = sp_eval(infotons, triples, payload, stored=stored)
    assert dfs[0].count() == 25
    no_import = sp_eval(
        infotons,
        triples,
        "PATHS\n/tpch/nation?op=search&recursive\n\n"
        "SPARQL\nSELECT ?n ?r WHERE { ?n <partOf> ?r }",
    )
    assert no_import[0].count() == 0


# ---------------------------------------------------------------------------
# parser error contract (fuzz)
# ---------------------------------------------------------------------------

from hypothesis import given, settings, strategies as st


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet=st.characters(codec="ascii"), max_size=200))
def test_parser_never_raises_foreign_exceptions(payload):
    """Arbitrary input either parses or raises SpParseError — never an
    IndexError/AttributeError escape (the reference wraps everything in
    ParsingException the same way)."""
    try:
        req = parse_sp_payload(payload)
        assert req.sources and req.engine in ("sparql", "gremlin")
    except SpParseError:
        pass


@settings(max_examples=100, deadline=None)
@given(
    st.lists(st.from_regex(r"/[a-z0-9/]{0,20}", fullmatch=True), min_size=1, max_size=4),
    st.sampled_from(["SPARQL", "sparql", "GREMLIN", "Gremlin"]),
    st.integers(min_value=1, max_value=3),
)
def test_parser_roundtrips_wellformed_payloads(paths, engine, n_queries):
    body = "\n---\n".join(f"SELECT ?x{i} WHERE {{ ?x{i} ?y ?z }}" for i in range(n_queries))
    req = parse_sp_payload("PATHS\n" + "\n".join(paths) + "\n\n" + engine + "\n" + body)
    assert req.sources == paths
    assert req.engine == engine.lower()
    assert len(req.queries) == n_queries
